"""Analytic DP-scaling roofline for the flagship config (VERDICT r1 #2).

Real multi-chip hardware is unavailable in this environment (one v5e
chip via the axon tunnel) and the virtual CPU mesh shares one host's
cores, so its weak-scaling "efficiency" measures host saturation, not
ICI. This model predicts multi-chip/multi-host parallel efficiency from
first principles:

  grad all-reduce (ring): t_comm = 2*(N-1)/N * bytes / BW
  efficiency           = t_step / (t_step + exposed_comm)

with the measured single-chip device step time, the flagship's actual
parameter count (init'd and counted), and public TPU v5e bandwidths
(ICI ~200 GB/s/chip; DCN ~25 GB/s/host). XLA overlaps the gradient
all-reduce with the backward pass (layer i's psum runs during layer
i-1's grads), so exposed_comm = max(0, t_comm - overlap_window); we
report both zero-overlap (worst case) and full-overlap bounds.

Emits JSON + a markdown table for docs/MULTIHOST.md / BASELINE.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_GBPS = 200.0   # v5e: 1600 Gbit/s/chip ICI
DCN_GBPS = 25.0    # ~200 Gbit/s NIC per host
CHIPS_PER_HOST = 8  # v5e host


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=61.9,
                    help="measured single-chip device step time "
                         "(BASELINE.md B=128x8s flagship)")
    ap.add_argument("--grad-bytes-per-param", type=float, default=4.0,
                    help="f32 gradient psum (bf16 would halve)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax
    from ctc_asr_tpu.config import Config, FeatureConfig, ModelConfig
    from ctc_asr_tpu.models import init_params

    cfg = Config(features=FeatureConfig(feature_type="mel", n_mels=80),
                 model=ModelConfig(frontend="conv", rnn_layers=3,
                                   rnn_units=512, bidirectional=True))
    params = init_params(jax.random.PRNGKey(0), cfg.model,
                         cfg.features.feature_dim)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    gbytes = n_params * args.grad_bytes_per_param
    t_step = args.step_ms / 1e3

    rows = []
    for n_chips in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        # hierarchical all-reduce: ring over ICI inside the host,
        # ring over DCN across hosts on the 1/CHIPS_PER_HOST shard
        n_hosts = max(1, n_chips // CHIPS_PER_HOST)
        ici_n = min(n_chips, CHIPS_PER_HOST)
        t_ici = 2 * (ici_n - 1) / ici_n * gbytes / (ICI_GBPS * 1e9) \
            if ici_n > 1 else 0.0
        shard = gbytes / ici_n
        t_dcn = 2 * (n_hosts - 1) / n_hosts * shard / (DCN_GBPS * 1e9) \
            if n_hosts > 1 else 0.0
        t_comm = t_ici + t_dcn
        eff_worst = t_step / (t_step + t_comm)
        # full overlap: backward is ~2/3 of the step; comm hides under it
        exposed = max(0.0, t_comm - (2 / 3) * t_step)
        eff_best = t_step / (t_step + exposed)
        rows.append({
            "chips": n_chips, "hosts": n_hosts,
            "comm_ms": round(t_comm * 1e3, 3),
            "eff_no_overlap": round(eff_worst, 4),
            "eff_overlapped": round(eff_best, 4),
        })

    out = {"flagship_params": int(n_params),
           "grad_mbytes": round(gbytes / 1e6, 1),
           "step_ms": args.step_ms,
           "ici_gbps": ICI_GBPS, "dcn_gbps": DCN_GBPS,
           "rows": rows}
    print(json.dumps(out))
    print()
    print("| chips | hosts | all-reduce ms | eff (no overlap) | "
          "eff (overlapped) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['chips']} | {r['hosts']} | {r['comm_ms']} | "
              f"{100*r['eff_no_overlap']:.1f}% | "
              f"{100*r['eff_overlapped']:.1f}% |")


if __name__ == "__main__":
    main()
