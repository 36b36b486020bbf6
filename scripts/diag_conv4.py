"""Isolate band-ASSEMBLY cost from band-CONV cost.

Hypothesis (from diag_conv3: fwd 3.7 ms but fwd+bwd only 4.4 ms): the
per-call _band_matrices build — 40+20 tiny pad/stack ops traced inside
jit — dominates the conv itself. Candidates:

  prebuilt  — bands passed in as params (pure conv cost; gradient in
              band space, NOT equivalent training, measurement only)
  padstack  — committed assembly (per-column jnp.pad + stack)
  einsum    — one-shot assembly: Wb = einsum(w, A) with a precomputed
              0/1 placement tensor A[kf, F, f_out] (traced as ONE op)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (_band_matrices, _same_pad,
                                       conv2d_init)

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


def placement(F: int, kf: int, sf: int) -> np.ndarray:
    """A[kf, F, f_out]: 1 where input row f feeds tap kf of output fo."""
    f_out, pf_lo, _ = _same_pad(F, kf, sf)
    A = np.zeros((kf, F, f_out), np.float32)
    for fo in range(f_out):
        for k in range(kf):
            f = fo * sf - pf_lo + k
            if 0 <= f < F:
                A[k, f, fo] = 1.0
    return A


def einsum_bands(w, A):
    """[kt,kf,cin,cout],[kf,F,f_out] -> [kt, F*cin, f_out*cout]."""
    kt, kf, cin, cout = w.shape
    F, f_out = A.shape[1], A.shape[2]
    Wb = jnp.einsum("kfio,fFg->kFigo", w, A)       # [kt, F, cin, f_out, cout]
    return Wb.reshape(kt, F * cin, f_out * cout)


def band_conv(xb, Wb, st, compute_dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        xb, Wb.astype(compute_dtype), window_strides=(st,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"))


def main():
    B, T, F = 16, 800, 80
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.device_put(jax.random.normal(k1, (B, T, F), jnp.float32))
    p1 = conv2d_init(k2, 11, 41, 1, 32)
    p2 = conv2d_init(k3, 11, 21, 32, 32)

    A1 = jnp.asarray(placement(80, 41, 2))
    A2 = jnp.asarray(placement(40, 21, 2))

    # parity of einsum assembly vs padstack
    for (p, Fdim, sf, A) in ((p1, 80, 2, A1), (p2, 40, 2, A2)):
        ref = _band_matrices(p["w"], Fdim, sf)
        got = einsum_bands(p["w"], A)
        print("assembly parity max|diff|",
              float(jnp.max(jnp.abs(ref - got))))

    Wb1 = _band_matrices(p1["w"], 80, 2)
    Wb2 = _band_matrices(p2["w"], 40, 2)
    params = {"p1": p1, "p2": p2, "Wb1": Wb1, "Wb2": Wb2}

    def fwd_prebuilt(p):
        xb = x.astype(jnp.bfloat16)
        y1 = jnp.clip(band_conv(xb, p["Wb1"], 2).astype(jnp.float32), 0, 20)
        B_, t1, _ = y1.shape
        y1 = y1.reshape(B_, t1, -1).astype(jnp.bfloat16)
        y2 = band_conv(y1, p["Wb2"], 1)
        return jnp.sum(y2.astype(jnp.float32))

    def fwd_padstack(p):
        Wb1_ = _band_matrices(p["p1"]["w"], 80, 2)
        Wb2_ = _band_matrices(p["p2"]["w"], 40, 2)
        xb = x.astype(jnp.bfloat16)
        y1 = jnp.clip(band_conv(xb, Wb1_, 2).astype(jnp.float32), 0, 20)
        B_, t1, _ = y1.shape
        y1 = y1.reshape(B_, t1, -1).astype(jnp.bfloat16)
        y2 = band_conv(y1, Wb2_, 1)
        return jnp.sum(y2.astype(jnp.float32))

    def fwd_einsum(p):
        Wb1_ = einsum_bands(p["p1"]["w"], A1)
        Wb2_ = einsum_bands(p["p2"]["w"], A2)
        xb = x.astype(jnp.bfloat16)
        y1 = jnp.clip(band_conv(xb, Wb1_, 2).astype(jnp.float32), 0, 20)
        B_, t1, _ = y1.shape
        y1 = y1.reshape(B_, t1, -1).astype(jnp.bfloat16)
        y2 = band_conv(y1, Wb2_, 1)
        return jnp.sum(y2.astype(jnp.float32))

    for name, fn in (("prebuilt", fwd_prebuilt),
                     ("padstack", fwd_padstack),
                     ("einsum", fwd_einsum)):
        timed_chain(f"{name} fwd", params, fn)

        def fwdbwd(p, fn=fn):
            def loss(pp):
                return fn(pp) * 1e-6
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]
        timed_chain(f"{name} fwd+bwd", params, fwdbwd)


if __name__ == "__main__":
    main()
