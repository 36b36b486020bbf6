"""Weak-scaling benchmark: audio-s/s vs mesh size (SURVEY.md §7 M5).

Runs the SAME sharded train step over growing device meshes (1, 2, 4,
..., all devices), holding per-device batch constant (weak scaling), and
reports throughput + parallel efficiency vs linear. On real pod slices
this produces the BASELINE.md 1-chip/1-host/N-host table; on this
single-chip environment it validates the SPMD path on the virtual CPU
mesh (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --per-device-batch 2 --tiny
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def decode_scaling(args):
    """Weak-scaling of the batch-sharded distributed beam decoder:
    per-device batch held constant, devices 1..N, beam width fixed.
    Random peaked posteriors (the decode cost is shape-, not
    content-determined). On the virtual CPU mesh the absolute numbers
    are host-saturation-bounded — the point is the EFFICIENCY curve of
    the sharded decode path (each device's beam state stays on-device;
    the only cross-device op is the output gather)."""
    import jax
    from ctc_asr_tpu.config import Config, DecodeConfig, MeshConfig
    from ctc_asr_tpu.parallel.dist import make_distributed_beam_decoder
    from ctc_asr_tpu.parallel.mesh import build_mesh

    devices = jax.devices()
    rng = np.random.default_rng(0)
    C = 29
    T = max(8, int(args.seconds * 100))  # 10 ms hop
    sizes = []
    n = 1
    while n <= len(devices):
        sizes.append(n)
        n *= 2
    results, base_tput = [], None
    for n in sizes:
        cfg = Config(decode=DecodeConfig(beam_width=args.beam),
                     mesh=MeshConfig(model_axis=1))
        mesh = build_mesh(cfg.mesh, devices=devices[:n])
        B = args.per_device_batch * n
        # peaked posteriors so the beam's merge path does real work
        logits = rng.standard_normal((B, T, C)).astype(np.float32) * 3.0
        lens = np.full((B,), T, np.int32)
        dec = make_distributed_beam_decoder(cfg, mesh)
        ids, out_lens = dec(logits, lens)
        np.asarray(ids)  # compile + barrier
        t0 = time.perf_counter()
        for _ in range(args.steps):
            ids, out_lens = dec(logits, lens)
        np.asarray(ids)
        dt = (time.perf_counter() - t0) / args.steps
        audio_s = B * args.seconds
        tput = audio_s / dt
        if base_tput is None:
            base_tput = tput
        eff = tput / (base_tput * n)
        results.append({"devices": n, "batch": B, "beam": args.beam,
                        "decode_ms": round(dt * 1000, 2),
                        "audio_s_per_s": round(tput, 2),
                        "rtf": round(dt / audio_s, 5),
                        "efficiency_vs_linear": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"decode_scaling": results}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--mode", choices=("train", "decode"), default="train",
                    help="decode: weak-scale the batch-sharded beam-64 "
                         "decoder (BASELINE.json:11 distributed-decode "
                         "rung; VERDICT r2 next #8) instead of the "
                         "train step")
    ap.add_argument("--beam", type=int, default=64)
    args = ap.parse_args()

    if args.mode == "decode":
        return decode_scaling(args)

    import jax
    import jax.numpy as jnp
    from ctc_asr_tpu.config import (Config, FeatureConfig, MeshConfig,
                                    ModelConfig, TrainConfig)
    from ctc_asr_tpu.parallel.dist import make_sharded_train_step
    from ctc_asr_tpu.parallel.mesh import build_mesh
    from ctc_asr_tpu.train import init_train_state

    devices = jax.devices()
    n_dev = len(devices)
    if args.tiny:
        model = ModelConfig(frontend="conv", conv_channels=(4, 4),
                            conv_kernels=((5, 5), (3, 3)),
                            conv_strides=((2, 2), (1, 2)), rnn_layers=1,
                            rnn_units=128, bidirectional=True, dropout=0.0,
                            compute_dtype="float32")
    else:
        model = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                            bidirectional=True, dropout=0.0)

    sizes = []
    n = args.model_axis
    while n <= n_dev:
        sizes.append(n)
        n *= 2
    results = []
    base_tput = None
    rng = np.random.default_rng(0)
    for n in sizes:
        cfg = Config(
            features=FeatureConfig(use_pallas=True),
            model=model,
            train=TrainConfig(seed=0),
            mesh=MeshConfig(model_axis=args.model_axis,
                            shard_model=args.model_axis > 1),
        )
        mesh = build_mesh(cfg.mesh, devices=devices[:n])
        data_size = n // args.model_axis
        B = args.per_device_batch * data_size
        S = int(args.seconds * 16000)
        U = max(16, int(args.seconds * 12))
        samples = (rng.standard_normal((B, S)) * 0.1).astype(np.float32)
        slens = np.full((B,), S, np.int32)
        labels = rng.integers(0, 28, (B, U)).astype(np.int32)
        llens = np.full((B,), U, np.int32)

        state = init_train_state(cfg)
        step = make_sharded_train_step(cfg, mesh, state, donate=False)
        state, m = step(state, samples, slens, labels, llens)
        float(m["loss"])  # compile + barrier
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, samples, slens, labels, llens)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        tput = B * args.seconds / dt
        if base_tput is None:
            base_tput = tput
        eff = tput / (base_tput * (n // sizes[0]))
        results.append({"devices": n, "mesh": f"{data_size}x"
                        f"{args.model_axis}", "batch": B,
                        "step_ms": round(dt * 1000, 2),
                        "audio_s_per_s": round(tput, 2),
                        "efficiency_vs_linear": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
