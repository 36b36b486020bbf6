"""Pallas banded-conv kernel vs committed XLA banded conv (TPU, chained)."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import conv2d_init, conv2d_matmul_apply
from ctc_asr_tpu.ops.conv_pallas import conv2d_pallas_apply

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


def main():
    B, T, F = 16, 800, 80
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.device_put(jax.random.normal(k1, (B, T, F, 1), jnp.float32))
    p1 = conv2d_init(k2, 11, 41, 1, 32)
    p2 = conv2d_init(k3, 11, 21, 32, 32)
    params = {"c1": p1, "c2": p2}

    # parity on hardware (bf16 both paths)
    y_ref = conv2d_matmul_apply(p2, jnp.clip(
        conv2d_matmul_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    y_pal = conv2d_pallas_apply(p2, jnp.clip(
        conv2d_pallas_apply(p1, x, (2, 2)), 0, 20), (1, 2))
    err = float(jnp.max(jnp.abs(y_ref - y_pal)))
    print(f"parity max|diff| = {err:.5f} (max|ref| "
          f"{float(jnp.max(jnp.abs(y_ref))):.2f})")

    impls = {"xla-banded": conv2d_matmul_apply,
             "pallas": conv2d_pallas_apply}
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
