"""Second conv shootout: time-fold variants of the 1-D banded conv.

Folding adjacent time rows into lanes ([B,T,C] -> [B,T/2,2C], a free
contiguous reshape) converts the stride-2 conv1 into a stride-1 conv
and doubles every matmul's K/N dims (fewer, fatter MXU ops).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (conv2d_init, conv2d_matmul_apply,
                                       _band_matrices, _same_pad)

N_CHAIN = 10


def timed_chain(name, params, body):
    @jax.jit
    def run(p):
        def step(carry, _):
            out = body(carry)
            eps = (out * 1e-30).astype(jnp.float32)
            carry = jax.tree.map(lambda a: a + eps.astype(a.dtype), carry)
            return carry, None
        p2, _ = jax.lax.scan(step, p, None, length=N_CHAIN)
        return jax.tree_util.tree_leaves(p2)[0].ravel()[0]

    float(run(params))
    t0 = time.perf_counter()
    float(run(params))
    dt = (time.perf_counter() - t0) / N_CHAIN
    print(f"{name:34s} {dt*1000:9.2f} ms/iter", flush=True)
    return dt


def fold2_apply(params, x, strides, compute_dtype=jnp.bfloat16):
    """1-D banded conv with time rows folded in pairs.

    stride 2: out rows = folded rows, taps ceil((kt+1)/2), each tap a
    [2*FC, f_out*cout] matrix (pair j contributes samples 2j, 2j+1).
    stride 1: outputs also fold in pairs -> [T/2, 2*f_out*cout]."""
    w = params["w"]
    kt = w.shape[0]
    cout = w.shape[3]
    B, T, F, C = x.shape
    st, sf = strides
    Wb = _band_matrices(w, F, sf)                 # [kt, FC, O] f32
    FC = Wb.shape[1]
    O = Wb.shape[2]
    t_out, pt_lo, pt_hi = _same_pad(T, kt, st)
    xp = jnp.pad(x.reshape(B, T, FC), ((0, 0), (pt_lo, pt_hi), (0, 0)))
    Tp = xp.shape[1]
    if Tp % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 0)))
        Tp += 1
    xf = xp.reshape(B, Tp // 2, 2 * FC).astype(compute_dtype)

    if st == 2:
        # folded row r holds samples (2r, 2r+1) of xp; output row o needs
        # xp[2o + k] = fold row o + k//2, half k%2.
        n_tap = (kt + 1) // 2
        Wf = jnp.zeros((n_tap, 2 * FC, O), jnp.float32)
        for k in range(kt):
            j, h = k // 2, k % 2
            Wf = Wf.at[j, h * FC:(h + 1) * FC].add(Wb[k])
        y = None
        for j in range(n_tap):
            tap = jax.lax.slice_in_dim(xf, j, j + t_out, 1, axis=1)
            # t_out folded rows j..j+t_out-1 (out row o = fold row o+j)
            yd = jnp.dot(tap, Wf[j].astype(compute_dtype),
                         preferred_element_type=jnp.float32)
            y = yd if y is None else y + yd
        return y.reshape(B, t_out, O // cout, cout) + params["b"]

    # stride 1: fold outputs too. out fold row r = (y[2r], y[2r+1]);
    # y[2r+e] = sum_k xp[2r+e+k] @ Wb[k] -> tap j of xf contributes
    # Wb rows for both halves and both output halves.
    n_tap = kt // 2 + 1
    Wf = jnp.zeros((n_tap, 2 * FC, 2 * O), jnp.float32)
    for e in (0, 1):                               # output half
        for k in range(kt):
            s = e + k                              # input sample offset
            j, h = s // 2, s % 2
            Wf = Wf.at[j, h * FC:(h + 1) * FC, e * O:(e + 1) * O].add(Wb[k])
    R = t_out // 2
    y = None
    for j in range(n_tap):
        tap = jax.lax.slice_in_dim(xf, j, j + R, 1, axis=1)
        yd = jnp.dot(tap, Wf[j].astype(compute_dtype),
                     preferred_element_type=jnp.float32)
        y = yd if y is None else y + yd
    y = y.reshape(B, R, 2, O).reshape(B, t_out, O // cout, cout)
    return y + params["b"]


def main():
    B, T, F = 16, 800, 80
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.device_put(jax.random.normal(k1, (B, T, F, 1), jnp.float32))
    p1 = conv2d_init(k2, 11, 41, 1, 32)
    p2 = conv2d_init(k3, 11, 21, 32, 32)
    params = {"c1": p1, "c2": p2}

    # parity first (CPU-safe math, runs on device)
    y_ref = conv2d_matmul_apply(
        p2, jnp.clip(conv2d_matmul_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    y_new = fold2_apply(
        p2, jnp.clip(fold2_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    print("parity max|diff| =", float(jnp.max(jnp.abs(y_new - y_ref))))

    impls = {"conv1d (current)": conv2d_matmul_apply,
             "fold2 tap matmuls": fold2_apply}
    for name, fn in impls.items():
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x, (2, 2)), 0, 20)
            return jnp.sum(fn(p["c2"], y1, (1, 2)))
        timed_chain(f"{name} fwd", params, fwd)

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(y2 * y2) * 1e-6
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]
        timed_chain(f"{name} fwd+bwd", params, fwdbwd)


if __name__ == "__main__":
    main()
