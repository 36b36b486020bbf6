"""Conv-frontend formulation shootout on the TPU (honest chained timing).

Candidates for the DS2 frontend (conv1 11x41/s(2,2) 1->32,
conv2 11x21/s(1,2) 32->32, B=16, T=800, F=80):

  a. xla2d   — lax.conv_general_dilated NHWC (channels lane-padded)
  b. banded  — current conv2d_matmul_apply (im2col concat: kt x input
               replication; conv2's xcat is ~180 MB bf16)
  c. conv1d  — 1-D time conv over freq-banded channels: the freq kernel
               folds into a dense [F*cin -> f_out*cout] band per time
               tap, so C_in/C_out are MXU-sized and nothing replicates
  d. tapsum  — same band matrices, explicit per-tap strided-slice
               matmuls accumulated in f32
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (conv2d_apply, conv2d_init,
                                       conv2d_matmul_apply, _same_pad)

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
    s = float(run(params))
    dt = (time.perf_counter() - t0) / N_CHAIN
    print(f"{name:28s} {dt*1000:9.2f} ms/iter", flush=True)
    return dt


def _band_matrices(w, F, strides):
    """[kt, kf, cin, cout] -> per-tap banded [kt, F*cin, f_out*cout]."""
    kt, kf, cin, cout = w.shape
    st, sf = strides
    f_out, pf_lo, _ = _same_pad(F, kf, sf)
    cols = []
    for fo in range(f_out):
        lo = fo * sf - pf_lo
        k_lo = max(0, -lo)
        k_hi = min(kf, F - lo)
        wk = w[:, k_lo:k_hi]
        cols.append(jnp.pad(wk, ((0, 0), (lo + k_lo, F - (lo + k_hi)),
                                 (0, 0), (0, 0))))
    Wb = jnp.stack(cols, axis=3)                    # [kt, F, cin, fo, co]
    return Wb.reshape(kt, F * cin, f_out * cout), f_out


def conv1d_banded_apply(params, x, strides, compute_dtype=jnp.bfloat16):
    w = params["w"]
    kt = w.shape[0]
    B, T, F, C = x.shape
    st, _ = strides
    Wb, f_out = _band_matrices(w, F, strides)       # [kt, F*cin, fo*co]
    cout = w.shape[3]
    y = jax.lax.conv_general_dilated(
        x.reshape(B, T, F * C).astype(compute_dtype),
        Wb.astype(compute_dtype),
        window_strides=(st,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"))
    t_out = y.shape[1]
    return y.astype(jnp.float32).reshape(B, t_out, f_out, cout) + params["b"]


def tapsum_apply(params, x, strides, compute_dtype=jnp.bfloat16):
    w = params["w"]
    kt = w.shape[0]
    B, T, F, C = x.shape
    st, _ = strides
    t_out, pt_lo, pt_hi = _same_pad(T, kt, st)
    Wb, f_out = _band_matrices(w, F, strides)
    cout = w.shape[3]
    Wb = Wb.astype(compute_dtype)
    xp = jnp.pad(x, ((0, 0), (pt_lo, pt_hi), (0, 0), (0, 0)))
    xp = xp.reshape(B, -1, F * C).astype(compute_dtype)
    y = None
    for dt in range(kt):
        tap = jax.lax.slice_in_dim(xp, dt, dt + (t_out - 1) * st + 1, st,
                                   axis=1)
        yd = jnp.dot(tap, Wb[dt], preferred_element_type=jnp.float32)
        y = yd if y is None else y + yd
    return y.reshape(B, t_out, f_out, cout) + params["b"]


def main():
    B, T, F = 16, 800, 80
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.device_put(jax.random.normal(k1, (B, T, F, 1), jnp.float32))
    p1 = conv2d_init(k2, 11, 41, 1, 32)
    p2 = conv2d_init(k3, 11, 21, 32, 32)
    params = {"c1": p1, "c2": p2}

    impls = {
        "xla2d": conv2d_apply,
        "banded": conv2d_matmul_apply,
        "conv1d": conv1d_banded_apply,
        "tapsum": tapsum_apply,
    }

    for name, fn in impls.items():
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x, (2, 2)), 0, 20)
            y2 = fn(p["c2"], y1, (1, 2))
            return jnp.sum(y2)
        timed_chain(f"{name} fwd", params, fwd)

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(y2 * y2) * 1e-6
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]
        timed_chain(f"{name} fwd+bwd", params, fwdbwd)

    # numeric parity spot check
    y_ref = conv2d_apply(p2, jnp.clip(conv2d_apply(p1, x, (2, 2)), 0, 20),
                         (1, 2))
    for name, fn in impls.items():
        if name == "xla2d":
            continue
        y = fn(p2, jnp.clip(fn(p1, x, (2, 2)), 0, 20), (1, 2))
        d = float(jnp.max(jnp.abs(y - y_ref)))
        print(f"parity {name:8s} max|diff| = {d:.4e}")


if __name__ == "__main__":
    main()
