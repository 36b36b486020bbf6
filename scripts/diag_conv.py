"""Conv-frontend diagnostic suite (consolidates the round-1 one-offs
diag_conv{,2..8,_bwd}.py into one parameterized script, VERDICT r1 #9).

All modes use the RTT-corrected chained protocol from diag_common
(N_CHAIN=50, scalar-fetch RTT subtracted, full gradient tree chained —
see BASELINE.md "Timing methodology notes").

Modes:
  kernels  Pallas banded-conv kernel vs the committed XLA banded conv
           (raw kernel pieces + E2E both-convs fwd / fwd+bwd)
           [was diag_conv7; result: raw kernels at roofline but XLA
           banded wins E2E — kernel stays flag-gated]
  blocked  fullband conv2d_matmul_apply vs the committed frequency-
           blocked conv2d_blocked_apply at large batch, with true-FLOP
           roofline columns [was diag_conv8; result: blocked wins at
           B<=128, fullband wins at B>=192 — DESIGN.md §4b]
  bwd      per-layer fwd / fwd+dx / fwd+dw / fwd+full-bwd decomposition
           with true- and banded-FLOP rooflines [was diag_conv_bwd;
           result: banded formulation executes at ~93% of MXU peak]

Usage: python scripts/diag_conv.py --mode {kernels,blocked,bwd} [-B N]
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


def mode_kernels(B):
    """Raw Pallas banded kernel pieces + E2E XLA-banded vs Pallas."""
    from ctc_asr_tpu.ops.conv_pallas import (_conv_fwd_pallas,
                                             band_matrices,
                                             conv2d_pallas_apply)
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    # raw banded-kernel shapes for the two DS2 convs at B
    x1 = jax.device_put(jax.random.normal(ks[2], (B, 534, 256),
                                          jnp.bfloat16))
    w1 = jax.device_put(jax.random.normal(ks[3], (6, 256, 1280),
                                          jnp.bfloat16) * 0.05)
    x2 = jax.device_put(jax.random.normal(ks[0], (B, 522, 1280),
                                          jnp.bfloat16))
    w2 = jax.device_put(jax.random.normal(ks[1], (11, 1280, 640),
                                          jnp.bfloat16) * 0.05)
    timed("raw kernel conv1 fwd", {"x": x1, "w": w1},
          lambda p: (jnp.sum(_conv_fwd_pallas(p["x"], p["w"])
                             .astype(jnp.float32)) * 1e-6, None))
    timed("raw kernel conv2 fwd", {"x": x2, "w": w2},
          lambda p: (jnp.sum(_conv_fwd_pallas(p["x"], p["w"])
                             .astype(jnp.float32)) * 1e-6, None))

    g2 = jax.device_put(jax.random.normal(ks[4], (B, 512, 640),
                                          jnp.bfloat16))

    def dw_only(p):
        out_len = 512
        dw = jnp.stack([
            jnp.einsum("btk,btn->kn", p["x"][:, k:k + out_len], g2,
                       preferred_element_type=jnp.float32)
            for k in range(11)])
        return jnp.sum(dw) * 1e-6, None
    timed("dW einsums conv2", {"x": x2}, dw_only)

    gp = jax.device_put(jax.random.normal(ks[5], (B, 532, 640),
                                          jnp.bfloat16))
    wrev = jax.device_put(jnp.swapaxes(jnp.flip(w2, 0), 1, 2))
    timed("dx kernel conv2", {"x": gp, "w": wrev},
          lambda p: (jnp.sum(_conv_fwd_pallas(p["x"], p["w"])
                             .astype(jnp.float32)) * 1e-6, None))

    x_raw = jax.device_put(jax.random.normal(ks[6], (B, T - 1, F, 1)))
    params = _ds2_params(ks[7])
    timed("band assembly conv1+conv2", params,
          lambda pp: (jnp.sum(band_matrices(pp["c1"]["w"], F, 2))
                      + jnp.sum(band_matrices(pp["c2"]["w"], F // 2, 2)),
                      None))

    for name, fn in (("xla-banded", conv2d_matmul_apply),
                     ("pallas", conv2d_pallas_apply)):
        def fwd(p, fn=fn):
            y1 = jnp.clip(fn(p["c1"], x_raw, (2, 2)), 0, 20)
            y2 = fn(p["c2"], y1, (1, 2))
            return jnp.sum(y2.astype(jnp.float32)) * 1e-6, None

        def fwdbwd(p, fn=fn):
            def loss(pp):
                y1 = jnp.clip(fn(pp["c1"], x_raw, (2, 2)), 0, 20)
                y2 = fn(pp["c2"], y1, (1, 2))
                return jnp.sum(jnp.square(y2.astype(jnp.float32))) * 1e-6
            return jax.value_and_grad(loss)(p)
        timed(f"{name} both-convs fwd", params, fwd)
        timed(f"{name} both-convs fwd+bwd", params, fwdbwd)


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
    ap.add_argument("--mode", choices=("kernels", "blocked", "bwd"),
                    default="blocked")
    ap.add_argument("-B", type=int, default=None,
                    help="batch (default: 16 for kernels, 128 otherwise)")
    args = ap.parse_args()
    B = args.B or (16 if args.mode == "kernels" else 128)
    print(f"[diag_conv] mode={args.mode} B={B}")
    {"kernels": mode_kernels, "blocked": mode_blocked,
     "bwd": mode_bwd}[args.mode](B)
