"""Decompose Pallas conv time: raw kernel vs wrapper vs bwd pieces."""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import conv2d_init
from ctc_asr_tpu.ops.conv_pallas import (band_matrices, banded_conv_valid,
                                         conv2d_pallas_apply,
                                         _conv_fwd_pallas)

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
    print(f"{name:40s} {dt*1000:9.2f} ms/iter", flush=True)
    return dt


def main():
    B = 16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    # conv2 raw shapes: x2 [16, 410ish, 1280] bf16, w [11, 1280, 640]
    x2 = jax.device_put(jax.random.normal(
        ks[0], (B, 522, 1280), jnp.bfloat16))
    w2 = jax.device_put(jax.random.normal(
        ks[1], (11, 1280, 640), jnp.bfloat16) * 0.05)
    # conv1 raw (after fold2): x [16, 412, 256], w [6, 256, 1280]
    x1 = jax.device_put(jax.random.normal(
        ks[2], (B, 534, 256), jnp.bfloat16))
    w1 = jax.device_put(jax.random.normal(
        ks[3], (6, 256, 1280), jnp.bfloat16) * 0.05)

    timed_chain("raw kernel conv1 fwd", {"x": x1, "w": w1},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))
    timed_chain("raw kernel conv2 fwd", {"x": x2, "w": w2},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))

    # dW einsums alone (conv2 shapes)
    g2 = jax.device_put(jax.random.normal(
        ks[4], (B, 512, 640), jnp.bfloat16))

    def dw_only(p):
        out_len = 512
        dw = jnp.stack([
            jnp.einsum("btk,btn->kn", p["x"][:, k:k + out_len], g2,
                       preferred_element_type=jnp.float32)
            for k in range(11)])
        return jnp.sum(dw)
    timed_chain("dW einsums conv2", {"x": x2}, dw_only)

    # dx kernel alone (conv2 shapes): gp [16, 532, 640] x wrev [11,640,1280]
    gp = jax.device_put(jax.random.normal(
        ks[5], (B, 532, 640), jnp.bfloat16))
    wrev = jax.device_put(jnp.swapaxes(jnp.flip(w2, 0), 1, 2))
    timed_chain("dx kernel conv2", {"x": gp, "w": wrev},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))

    # full wrapper fwd per conv
    x_raw = jax.device_put(jax.random.normal(ks[6], (B, 800, 80, 1)))
    p1 = conv2d_init(ks[7], 11, 41, 1, 32)
    timed_chain("wrapper conv1 fwd", {"p": p1}, lambda pp:
                jnp.sum(conv2d_pallas_apply(pp["p"], x_raw, (2, 2))))
    y1 = jax.device_put(jax.random.normal(ks[6], (B, 400, 40, 32)))
    p2 = conv2d_init(ks[5], 11, 21, 32, 32)
    timed_chain("wrapper conv2 fwd", {"p": p2}, lambda pp:
                jnp.sum(conv2d_pallas_apply(pp["p"], y1, (1, 2))))

    # band assembly alone
    timed_chain("band assembly conv1+conv2", {"p1": p1, "p2": p2},
                lambda pp: jnp.sum(band_matrices(pp["p1"]["w"], 80, 2)) +
                jnp.sum(band_matrices(pp["p2"]["w"], 40, 2)))


if __name__ == "__main__":
    main()
