"""Frequency-blocked banded conv vs the committed full-band 1-D conv.

The committed conv1d banded form (models/layers.py:conv2d_matmul_apply)
folds the WHOLE frequency axis into one dense band matrix. For DS2
conv2 (kf=21, F=40, sf=2) the dense [1280 -> 640] band carries ~3.8x
the true conv FLOPs. Blocking the OUTPUT frequency axis into groups of
GFo columns shrinks the band to the receptive slab
(Gin_f = (GFo-1)*sf + kf input rows), cutting the waste to
Gin_f/kf ~ 1.28x at GFo=4 while keeping every matmul MXU-dense
(N = GFo*cout = 128).

Run on the TPU: python scripts/diag_conv3.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (_band_matrices, _same_pad,
                                       conv2d_init, conv2d_matmul_apply)

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


def pick_gfo(f_out: int, cout: int) -> int:
    """Largest block size with f_out % GFo == 0 and GFo*cout % 128 == 0,
    preferring the smallest band waste (smallest GFo that lane-fills)."""
    for gfo in range(1, f_out + 1):
        if f_out % gfo == 0 and (gfo * cout) % 128 == 0:
            return gfo
    return f_out  # fall back to full band


def blocked_bands(w, F: int, sf: int, gfo: int):
    """Per-block band matrices + slab starts.

    Returns (starts [Gb] py-ints, Wg [Gb, kt, Gin_f*cin, gfo*cout]).
    Block g computes output freqs [g*gfo, (g+1)*gfo) from input slab
    rows [starts[g], starts[g]+Gin_f).
    """
    kt, kf, cin, cout = w.shape
    f_out, pf_lo, _ = _same_pad(F, kf, sf)
    gin_f = min((gfo - 1) * sf + kf, F)
    Wb = _band_matrices(w, F, sf)                 # [kt, F*cin, f_out*cout]
    Wb = Wb.reshape(kt, F, cin, f_out * cout)
    nblk = f_out // gfo
    starts, mats = [], []
    for g in range(nblk):
        lo = g * gfo * sf - pf_lo
        s = max(0, min(lo, F - gin_f))
        starts.append(s)
        mats.append(Wb[:, s:s + gin_f, :, g * gfo * cout:(g + 1) * gfo * cout]
                    .reshape(kt, gin_f * cin, gfo * cout))
    return starts, jnp.stack(mats)


def conv1d_blocked_apply(params, x, strides, compute_dtype=jnp.bfloat16):
    """Blocked-band equivalent of conv2d_matmul_apply (NHWC, SAME)."""
    w = params["w"]
    kt, kf, cin, cout = w.shape
    B, T, F, C = x.shape
    st, sf = strides
    f_out, _, _ = _same_pad(F, kf, sf)
    gfo = pick_gfo(f_out, cout)
    starts, Wg = blocked_bands(w, F, sf, gfo)
    gin_f = Wg.shape[2] // cin
    xb = x.astype(compute_dtype)
    outs = []
    for g, s in enumerate(starts):
        slab = xb[:, :, s:s + gin_f].reshape(B, T, gin_f * cin)
        y = jax.lax.conv_general_dilated(
            slab, Wg[g].astype(compute_dtype),
            window_strides=(st,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"))
        outs.append(y)
    y = jnp.concatenate(outs, axis=-1)
    t_out = y.shape[1]
    return y.astype(jnp.float32).reshape(B, t_out, f_out, cout) + params["b"]


def main():
    B, T, F = 16, 800, 80
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.device_put(jax.random.normal(k1, (B, T, F, 1), jnp.float32))
    p1 = conv2d_init(k2, 11, 41, 1, 32)
    p2 = conv2d_init(k3, 11, 21, 32, 32)
    params = {"c1": p1, "c2": p2}

    # parity first
    y_ref = conv2d_matmul_apply(p2, jnp.clip(
        conv2d_matmul_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    y_blk = conv1d_blocked_apply(p2, jnp.clip(
        conv1d_blocked_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    err = float(jnp.max(jnp.abs(y_ref - y_blk)))
    scale = float(jnp.max(jnp.abs(y_ref)))
    print(f"parity max|diff| = {err:.5f}  (max|ref| {scale:.2f})")

    impls = {"fullband": conv2d_matmul_apply,
             "blocked": conv1d_blocked_apply}
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


if __name__ == "__main__":
    main()
