"""Conv-frontend backward decomposition at large batch (B=128).

diag_step_breakdown at B=128 shows conv fwd ~7 ms of a 63.7 ms step;
the fwd+bwd share is ~3x that. This isolates, per conv layer of the
DS2 frontend (banded 1-D formulation, layers.conv2d_matmul_apply):

  - fwd only
  - fwd + dx only   (grad wrt input; dy path = base-dilated conv when
                     the time stride is 2 — historically weak on TPU)
  - fwd + dw only   (grad wrt kernel)
  - fwd + full bwd

with true-FLOP and banded-FLOP rooflines, to decide whether a custom
VJP (parity-decomposed stride-1 dx, tap-matmul dw) pays.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import conv2d_init, conv2d_matmul_apply
from diag_common import timed


def conv_flops(B, T_out, f_out, cout, kt, kf, cin):
    return 2 * B * T_out * f_out * cout * kt * kf * cin


def banded_flops(B, T_out, F, cin, f_out, cout, kt):
    return 2 * B * T_out * (F * cin) * (f_out * cout) * kt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = 801
    F = 80
    layers = [
        # (name, kt, kf, cin, cout, st, sf, T_in, F_in)
        ("conv1 k(11,41) s(2,2) 1->32", 11, 41, 1, 32, 2, 2, T, F),
        ("conv2 k(11,21) s(1,2) 32->32", 11, 21, 32, 32, 1, 2,
         -(-T // 2), F // 2),
    ]
    rng = jax.random.PRNGKey(0)
    for (name, kt, kf, cin, cout, st, sf, Ti, Fi) in layers:
        params = conv2d_init(rng, kt, kf, cin, cout)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, Ti, Fi, cin),
                              jnp.float32) * 0.1
        T_out, f_out = -(-Ti // st), -(-Fi // sf)
        tf_ = conv_flops(B, T_out, f_out, cout, kt, kf, cin)
        bf_ = banded_flops(B, T_out, Fi, cin, f_out, cout, kt)
        print(f"-- {name}: true {tf_/1e9:.1f} GF (SOL "
              f"{tf_/197e12*1e3:.2f} ms), banded {bf_/1e9:.1f} GF (SOL "
              f"{bf_/197e12*1e3:.2f} ms)")
        st_sf = (st, sf)

        def fwd_body(p, x=x, st_sf=st_sf):
            y = conv2d_matmul_apply(p, x, st_sf)
            return jnp.sum(y.astype(jnp.float32)) * 1e-6, None

        def dx_body(p, x=x, st_sf=st_sf):
            l, gx = jax.value_and_grad(
                lambda xx: jnp.sum(
                    conv2d_matmul_apply(p, xx, st_sf).astype(jnp.float32))
                * 1e-6)(x)
            return l, {"gx": gx}

        def dw_body(p, x=x, st_sf=st_sf):
            l, gw = jax.value_and_grad(
                lambda pp: jnp.sum(
                    conv2d_matmul_apply(pp, x, st_sf).astype(jnp.float32))
                * 1e-6)(p)
            return l, gw

        def full_body(p, x=x, st_sf=st_sf):
            def loss(pp, xx):
                return jnp.sum(
                    conv2d_matmul_apply(pp, xx, st_sf).astype(jnp.float32)) \
                    * 1e-6
            l, (gw, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
            return l, {"gw": gw, "gx": gx}

        timed("  fwd", params, fwd_body, flops=bf_)
        timed("  fwd+dx", params, dx_body, flops=2 * bf_)
        timed("  fwd+dw", params, dw_body, flops=2 * bf_)
        timed("  fwd+dx+dw", params, full_body, flops=3 * bf_)


if __name__ == "__main__":
    main()
