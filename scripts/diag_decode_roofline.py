"""Absolute roofline accounting for the CTC and beam Pallas kernels
(VERDICT r4 next #2).

BASELINE.json:5 claims "per-chip CTC-loss and beam-search Pallas kernels
at speed-of-light roofline"; the LSTM kernels have a real FLOP/bytes
accounting (scripts/diag_rnn_layer.py) but CTC and beam so far carry
only RELATIVE wins (3.9x / 3.0x vs their XLA twins). This script
produces the absolute side:

- **CTC** (grid (B/8, T), streaming [8, S] tiles): the kernel is
  HBM-bytes-bound by construction — per grid step it streams one
  lp_z block in and one alpha block out (beta: lp_z + alpha in, grad
  out), while the DP math is a handful of VPU ops per element. Floors:
  bytes/BW (the real wall) and an EMPIRICAL elementwise ceiling
  measured on this chip with an XLA kernel of the same op mix (exp/max/
  add at the same [T,B,S] footprint) — fairer than a paper VPU number.
- **Beam** (grid (B, T) serial, state-in-VMEM): bytes are negligible
  ([1,C] row per step); the wall is the serial per-grid-step critical
  path. Decomposition: sweep B*T (per-step cost), K (the top-K
  fori_loop is O(K) iterations of [K,C]+[K,U] work), and U (the [K,U]
  prefix-rebuild term) and fit
      t_step ~= c0 + c1*K*ceil(C/128)*ceil(K/8) + c2*K*ceil(U/128)*ceil(K/8)
  in VPU-tile units.

Usage: python scripts/diag_decode_roofline.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# TPU v5e (v5 lite) nominal HBM bandwidth. Source: public v5e specs
# (16 GB HBM2 @ ~819 GB/s). Used for the bytes floor only.
HBM_GBPS = 819.0


def _fetch(x):
    """True barrier: host scalar fetch (bench.py protocol)."""
    import jax.numpy as jnp
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=10):
    import jax
    out = fn(*args)
    _fetch(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    _fetch(out[0] if isinstance(out, (tuple, list)) else out)
    rtt = (time.perf_counter() - t0) / 3  # includes 1/3 fetch each
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out[0] if isinstance(out, (tuple, list)) else out)
    dt = time.perf_counter() - t0
    # subtract one fetch RTT (approximated by the min of the warm reps)
    return max(dt / reps, 1e-9)


def chain_time(fn_scalar, x, reps=24):
    """Time ``fn_scalar(x) -> scalar`` by scan-chaining ``reps``
    invocations inside ONE jit (one dispatch, one host fetch): the
    per-dispatch tunnel jitter (~±0.5 ms) would otherwise swamp
    ms-scale kernels. A per-iteration input perturbation defeats CSE."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, i):
            out = fn_scalar(x + 1e-9 * i)
            return c + out, None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.float32))
        return tot
    _fetch(run(x))  # compile
    t0 = time.perf_counter()
    _fetch(run(x))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(run(x))
    two = time.perf_counter() - t0
    return min(one, two) / reps


def ctc_accounting(B=128, T=400, U=96, reps=24):
    import jax
    import jax.numpy as jnp
    from ctc_asr_tpu.ops import ctc_pallas as cp

    C = 29
    S = 2 * U + 1
    Sp = cp._round_up(S, cp.LANE)
    Bp = cp._round_up(B, cp.TB)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    llens = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(0, 28, (B, U)), jnp.int32)
    lablens = jnp.full((B,), U, jnp.int32)

    # forward only (alpha kernel): nll
    t_fwd = chain_time(lambda lg: cp.ctc_loss_pallas(
        lg, llens, labels, lablens).sum(), logits, reps=reps)

    # fwd + bwd (alpha + beta kernels + XLA softmax/scatter chain)
    grad_fn = jax.grad(lambda lg: cp.ctc_loss_pallas(
        lg, llens, labels, lablens).sum())
    t_fb = chain_time(lambda lg: grad_fn(lg).sum(), logits, reps=reps)

    # --- DP-core-only timings (the custom-vjp boundary) ---------------
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    z = cp.extended_labels(labels, cp.BLANK_ID)
    lp_z = jnp.take_along_axis(log_probs, z[:, None, :].astype(jnp.int32),
                               axis=2)
    lpz_t = jnp.moveaxis(lp_z, 0, 1)
    s_idx = jnp.arange(S)[None, :]
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), cp.BLANK_ID, z.dtype), z[:, :-2]], axis=1)
    can_skip = (((s_idx % 2) == 1) & (z != z_prev2) & (s_idx >= 2)
                ).astype(jnp.float32)
    ends = (2 * lablens).astype(jnp.int32)
    lpz_p, skip_p, lens_p, ends_p, _, _, _ = cp._pad_inputs(
        lpz_t, can_skip, llens, ends)

    t_alpha = chain_time(lambda a: cp._run_alpha(
        a, skip_p, lens_p, ends_p, False)[1].sum(), lpz_p, reps=reps)

    alphas, nll_p = jax.jit(lambda a: cp._run_alpha(
        a, skip_p, lens_p, ends_p, False))(lpz_p)
    t_beta = chain_time(lambda a: cp._run_beta(
        a, alphas, skip_p, lens_p, ends_p, nll_p, False).sum(),
        lpz_p, reps=reps)

    # --- floors -------------------------------------------------------
    blk = T * Bp * Sp * 4  # one [T,B,S] f32 array
    alpha_bytes = blk * 2 + Bp * Sp * 4          # lpz in, alphas out
    beta_bytes = blk * 3 + Bp * Sp * 4           # lpz+alphas in, grad out
    t_alpha_floor = alpha_bytes / (HBM_GBPS * 1e9)
    t_beta_floor = beta_bytes / (HBM_GBPS * 1e9)

    # empirical elementwise ceiling: same op mix (3 exp + ~10 max/add +
    # 1 log per element) on the same [T,Bp,Sp] footprint, pure XLA (no
    # sequential dependence). This is what a PERFECT pipeline could do
    # if HBM were free and the DP had no serial chain.
    x = jnp.asarray(rng.standard_normal((T, Bp, Sp)), jnp.float32)

    def elem_mix(v):
        a = jnp.maximum(v, -1.0)
        b = jnp.maximum(v * 0.5 + 1.0, a)
        m = jnp.maximum(jnp.maximum(a, b), v)
        out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m)
                          + jnp.exp(v - m))
        return jnp.maximum(out, -1e30).sum()
    t_elem = chain_time(elem_mix, x, reps=reps)

    elems = T * Bp * Sp
    return {
        "shape": {"B": B, "T": T, "U": U, "S_pad": Sp, "B_pad": Bp},
        "t_fwd_ms": round(t_fwd * 1e3, 4),
        "t_fwd_bwd_ms": round(t_fb * 1e3, 4),
        "t_alpha_ms": round(t_alpha * 1e3, 4),
        "t_beta_ms": round(t_beta * 1e3, 4),
        "alpha_bytes_mb": round(alpha_bytes / 1e6, 1),
        "beta_bytes_mb": round(beta_bytes / 1e6, 1),
        "t_alpha_bytes_floor_ms": round(t_alpha_floor * 1e3, 4),
        "t_beta_bytes_floor_ms": round(t_beta_floor * 1e3, 4),
        "alpha_vs_bytes_floor": round(t_alpha / t_alpha_floor, 2),
        "beta_vs_bytes_floor": round(t_beta / t_beta_floor, 2),
        "t_elem_mix_ms": round(t_elem * 1e3, 4),
        "alpha_vs_elem_ceiling": round(t_alpha / t_elem, 2),
        "achieved_GBps_alpha": round(alpha_bytes / t_alpha / 1e9, 1),
        "achieved_GBps_beta": round(beta_bytes / t_beta / 1e9, 1),
        "elems": elems,
    }


def beam_point(B, T, K, U, C=29, lm=False, reps=5):
    import jax
    import jax.numpy as jnp
    from ctc_asr_tpu.ops.beam_pallas import beam_search_decode_pallas

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    table = None
    if lm:
        n_ctx = 24392  # order-4-ish, rides bf16
        table = jnp.asarray(
            rng.standard_normal((n_ctx, C - 1)) - 3.0, jnp.float32)

    fn = jax.jit(lambda lg, ln: beam_search_decode_pallas(
        lg, ln, beam_width=K, max_decode_len=U, lm_table=table,
        lm_weight=0.3 if lm else 0.0)[1])
    t = timeit(fn, logits, lens, reps=reps)
    return t


def beam_accounting(quick=False):
    """Per-grid-step decomposition. All times in us per (b,t) step."""
    out = {"points": []}
    base = dict(B=8, T=200, K=64, U=256)
    # per-step cost directly: time / (B*T)
    sweeps = [
        dict(B=8, T=200, K=64, U=256),
        dict(B=8, T=400, K=64, U=256),   # T slope
        dict(B=16, T=200, K=64, U=256),  # B slope == T slope?
        dict(B=8, T=200, K=32, U=256),   # K scaling
        dict(B=8, T=200, K=16, U=256),
        dict(B=8, T=200, K=64, U=128),   # U scaling
        dict(B=8, T=200, K=64, U=1024),
        dict(B=8, T=200, K=16, U=128),
    ]
    if not quick:
        sweeps.append(dict(B=128, T=400, K=64, U=256))  # contract shape
        sweeps.append(dict(B=128, T=400, K=64, U=256, lm=True))
    for s in sweeps:
        lm = s.pop("lm", False)
        t = beam_point(**s, lm=lm)
        rec = {**s, "lm": lm, "t_ms": round(t * 1e3, 3),
               "us_per_step": round(t / (s["B"] * s["T"]) * 1e6, 3)}
        out["points"].append(rec)
        print("[beam] " + json.dumps(rec), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-ctc", action="store_true")
    ap.add_argument("--skip-beam", action="store_true")
    args = ap.parse_args()
    import jax
    print(f"# devices: {jax.devices()}", flush=True)
    if not args.skip_ctc:
        rec = ctc_accounting()
        print("[ctc] " + json.dumps(rec), flush=True)
    if not args.skip_beam:
        beam_accounting(args.quick)


if __name__ == "__main__":
    main()
