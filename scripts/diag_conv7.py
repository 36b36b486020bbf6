"""Conv timing with RTT-corrected harness (N_CHAIN=50, fetch RTT
subtracted — the older diag_conv* scripts folded ~2.5 ms/iter of axon
tunnel round-trip into every number at N_CHAIN=10)."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import conv2d_init, conv2d_matmul_apply
from ctc_asr_tpu.ops.conv_pallas import (band_matrices, banded_conv_valid,
                                         conv2d_pallas_apply,
                                         _conv_fwd_pallas)

N_CHAIN = 50


def _rtt():
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(2):
        float(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(x + 1)
    return (time.perf_counter() - t0) / 5


RTT = None


def timed_chain(name, params, body):
    global RTT

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
    if RTT is None:
        RTT = _rtt()
    t0 = time.perf_counter()
    float(run(params))
    dt = (time.perf_counter() - t0 - RTT) / N_CHAIN
    print(f"{name:40s} {dt*1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    B = 16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    x2 = jax.device_put(jax.random.normal(
        ks[0], (B, 522, 1280), jnp.bfloat16))
    w2 = jax.device_put(jax.random.normal(
        ks[1], (11, 1280, 640), jnp.bfloat16) * 0.05)
    x1 = jax.device_put(jax.random.normal(
        ks[2], (B, 534, 256), jnp.bfloat16))
    w1 = jax.device_put(jax.random.normal(
        ks[3], (6, 256, 1280), jnp.bfloat16) * 0.05)

    timed_chain("raw kernel conv1 fwd", {"x": x1, "w": w1},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))
    timed_chain("raw kernel conv2 fwd", {"x": x2, "w": w2},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))

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

    gp = jax.device_put(jax.random.normal(
        ks[5], (B, 532, 640), jnp.bfloat16))
    wrev = jax.device_put(jnp.swapaxes(jnp.flip(w2, 0), 1, 2))
    timed_chain("dx kernel conv2", {"x": gp, "w": wrev},
                lambda p: jnp.sum(_conv_fwd_pallas(p["x"], p["w"])))

    x_raw = jax.device_put(jax.random.normal(ks[6], (B, 800, 80, 1)))
    p1 = conv2d_init(ks[7], 11, 41, 1, 32)
    p2 = conv2d_init(ks[5], 11, 21, 32, 32)
    params = {"c1": p1, "c2": p2}
    timed_chain("band assembly conv1+conv2", params,
                lambda pp: jnp.sum(band_matrices(pp["c1"]["w"], 80, 2)) +
                jnp.sum(band_matrices(pp["c2"]["w"], 40, 2)))

    for name, fn in (("xla-banded", conv2d_matmul_apply),
                     ("pallas", conv2d_pallas_apply)):
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x_raw, (2, 2)), 0, 20)
            y2 = fn(p["c2"], y1, (1, 2))
            return jnp.sum(y2)
        timed_chain(f"{name} both-convs fwd", params, fwd)

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x_raw, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(y2 * y2) * 1e-6
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]
        timed_chain(f"{name} both-convs fwd+bwd", params, fwdbwd)


def blocked_main():
    """RTT-corrected fullband vs freq-blocked (diag_conv3 impl)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from diag_conv3 import conv1d_blocked_apply
    from ctc_asr_tpu.models.layers import conv2d_init, conv2d_matmul_apply
    B = 16
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x_raw = jax.device_put(jax.random.normal(k1, (B, 800, 80, 1)))
    params = {"c1": conv2d_init(k2, 11, 41, 1, 32),
              "c2": conv2d_init(k3, 11, 21, 32, 32)}
    for name, fn in (("fullband", conv2d_matmul_apply),
                     ("blocked", conv1d_blocked_apply)):
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x_raw, (2, 2)), 0, 20)
            return jnp.sum(fn(p["c2"], y1, (1, 2)))
        timed_chain(f"{name} fwd", params, fwd)

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x_raw, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(y2 * y2) * 1e-6
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]
        timed_chain(f"{name} fwd+bwd", params, fwdbwd)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocked", action="store_true",
                    help="run the fullband-vs-freq-blocked comparison")
    if ap.parse_args().blocked:
        blocked_main()
    else:
        main()
