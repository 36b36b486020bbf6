"""Conv-frontend diagnostic suite (modes: blocked, bwd) (consolidates the round-1 one-offs
diag_conv{,2..8,_bwd}.py into one parameterized script, VERDICT r1 #9).

All modes use the RTT-corrected chained protocol from diag_common
(N_CHAIN=50, scalar-fetch RTT subtracted, full gradient tree chained —
see BASELINE.md "Timing methodology notes").

Modes:
  (a former `kernels` mode A/B'd the Pallas banded-conv kernel; the
  kernel lost its bake-off and was deleted in round 4 — see the note
  above mode_blocked and DESIGN.md §4b)
  blocked  fullband conv2d_matmul_apply vs the committed frequency-
           blocked conv2d_blocked_apply at large batch, with true-FLOP
           roofline columns [was diag_conv8; result: blocked wins at
           B<=128, fullband wins at B>=192 — DESIGN.md §4b]
  bwd      per-layer fwd / fwd+dx / fwd+dw / fwd+full-bwd decomposition
           with true- and banded-FLOP rooflines [was diag_conv_bwd;
           result: banded formulation executes at ~93% of MXU peak]

Usage: python scripts/diag_conv.py --mode {blocked,bwd} [-B N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ctc_asr_tpu.models.layers import (conv2d_blocked_apply, conv2d_init,
                                       conv2d_matmul_apply)
from diag_common import timed

T, F = 801, 80  # 8 s at 10 ms hop, mel-80 (the bench shapes)


def _ds2_params(rng):
    k1, k2 = jax.random.split(rng)
    return {"c1": conv2d_init(k1, 11, 41, 1, 32),
            "c2": conv2d_init(k2, 11, 21, 32, 32)}


def conv_flops(B, T_out, f_out, cout, kt, kf, cin):
    return 2 * B * T_out * f_out * cout * kt * kf * cin


def banded_flops(B, T_out, F_in, cin, f_out, cout, kt):
    return 2 * B * T_out * (F_in * cin) * (f_out * cout) * kt


def true_fwd_flops(B):
    t1, f1 = -(-T // 2), F // 2
    return (conv_flops(B, t1, f1, 32, 11, 41, 1)
            + conv_flops(B, t1, f1 // 2, 32, 11, 21, 32))


# mode_kernels (the Pallas banded-conv kernel vs XLA bake-off) was
# removed with the kernel in round 4. Final piece-level measurement
# (B=16, chained, RTT-corrected): raw Pallas kernels conv1 0.145 +
# conv2 0.630 ms fwd vs XLA-banded BOTH-convs E2E 0.807 ms fwd — XLA's
# end-to-end time already matches the raw kernel compute, so no glue
# reduction could produce a meaningful win; E2E fwd+bwd 2.656 (XLA) vs
# 3.216 ms (Pallas). One conv path remains: the banded-matmul XLA
# formulation (models/layers.py). See DESIGN.md §4b.


def mode_blocked(B):
    """Fullband vs committed frequency-blocked formulation (+parity)."""
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jax.device_put(jax.random.normal(k1, (B, T, F, 1),
                                         jnp.float32) * 0.1)
    params = _ds2_params(k2)

    y_ref = conv2d_matmul_apply(params["c2"], jnp.clip(
        conv2d_matmul_apply(params["c1"], x, (2, 2)), 0, 20), (1, 2))
    y_blk = conv2d_blocked_apply(params["c2"], jnp.clip(
        conv2d_blocked_apply(params["c1"], x, (2, 2)), 0, 20), (1, 2))
    err = float(jnp.max(jnp.abs(y_ref - y_blk)))
    print(f"parity max|diff| = {err:.5f} (max|ref| "
          f"{float(jnp.max(jnp.abs(y_ref))):.2f})")

    tf_fwd = true_fwd_flops(B)
    for name, fn in [("fullband", conv2d_matmul_apply),
                     ("blocked", conv2d_blocked_apply)]:
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x, (2, 2)), 0, 20)
            y2 = fn(p["c2"], y1, (1, 2))
            return jnp.sum(y2.astype(jnp.float32)) * 1e-6, None

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(jnp.square(y2.astype(jnp.float32))) * 1e-6
            return jax.value_and_grad(loss)(p)
        timed(f"{name} fwd", params, fwd, flops=tf_fwd)
        timed(f"{name} fwd+bwd", params, fwdbwd, flops=3 * tf_fwd)


def mode_bwd(B):
    """Per-layer fwd / dx / dw / full-bwd decomposition."""
    layers = [
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
                    conv2d_matmul_apply(pp, xx, st_sf)
                    .astype(jnp.float32)) * 1e-6
            l, (gw, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
            return l, {"gw": gw, "gx": gx}

        timed("  fwd", params, fwd_body, flops=bf_)
        timed("  fwd+dx", params, dx_body, flops=2 * bf_)
        timed("  fwd+dw", params, dw_body, flops=2 * bf_)
        timed("  fwd+dx+dw", params, full_body, flops=3 * bf_)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("blocked", "bwd"),
                    default="blocked")
    ap.add_argument("-B", type=int, default=None,
                    help="batch (default 128)")
    args = ap.parse_args()
    B = args.B or 128
    print(f"[diag_conv] mode={args.mode} B={B}")
    {"blocked": mode_blocked,
     "bwd": mode_bwd}[args.mode](B)
