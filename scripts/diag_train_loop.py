"""E2E train-LOOP throughput diagnosis (host + transfer + dispatch).

bench.py's headline number is the pure DEVICE step (state-chained,
RTT-corrected) — it cannot see host-side walls. Real training walls
through the axon PJRT tunnel showed ~0.23 s/step at B=32 where the
device step is ~17 ms, i.e. the LOOP was ~10x off the device floor.
This script decomposes that gap:

1. upload bandwidth: jax.device_put wall for batch-sized buffers
   (the tunnel's practical MB/s, the hard floor for raw-audio feeds);
2. pure device step: state-chained, for the same config/batch;
3. full train() loop on a real manifest: audio_s_per_s as trained,
   with the async bounded-runahead loop (train.sync_every) vs the
   fully-synchronous loop (sync_every=1, the pre-round-4 behavior).

Usage:
  python scripts/diag_train_loop.py --manifest /tmp/.../train.csv \
      [--steps 120] [--batch 32] [--preset conv_bilstm3]
"""

import argparse
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_upload(sizes_mb=(1, 4, 16, 64)):
    import jax
    print("# upload bandwidth (host -> device, jax.device_put)")
    for mb in sizes_mb:
        n = int(mb * 1e6 / 2)
        host = np.zeros((n,), np.int16)
        d = jax.device_put(host)
        jax.block_until_ready(d)  # warm path
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            d = jax.device_put(host)
            jax.block_until_ready(d)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {mb:5.1f} MB: {dt*1e3:7.2f} ms  "
              f"({mb/dt:8.1f} MB/s)")


def measure_device_step(cfg, bucket_samples, batch):
    """State-chained pure device step at the manifest's bucket shape.

    Barrier = host scalar fetch (float(loss)): block_until_ready through
    the axon tunnel returns at ENQUEUE, not completion (bench.py
    docstring), so it cannot time anything."""
    import jax.numpy as jnp
    from ctc_asr_tpu.train import init_train_state, make_train_step

    state = init_train_state(cfg)
    step_fn = make_train_step(cfg, donate=False)
    samples = jnp.zeros((batch, bucket_samples), jnp.int16)
    slens = jnp.full((batch,), bucket_samples, jnp.int32)
    labels = jnp.ones((batch, 16), jnp.int32)
    llens = jnp.full((batch,), 16, jnp.int32)
    state, m = step_fn(state, samples, slens, labels, llens)
    float(m["loss"])  # compile + settle
    # measured RTT of a scalar fetch, subtracted from the chain
    t0 = time.perf_counter()
    for _ in range(5):
        float(m["loss"])
    rtt = (time.perf_counter() - t0) / 5
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step_fn(state, samples, slens, labels, llens)
    float(m["loss"])  # one true barrier at the end of the chain
    dt = (time.perf_counter() - t0 - rtt) / n
    print(f"# pure device step (chained, T={bucket_samples} samples, "
          f"B={batch}): {dt*1e3:.1f} ms  (scalar-fetch RTT "
          f"{rtt*1e3:.1f} ms)")
    return dt


def measure_host_loader(cfg, manifest, n_batches=40):
    """Host-side loader drain rate (wav read + decode + pad + wire),
    no device involved: the floor the loop's prefetch must hide."""
    from ctc_asr_tpu.data import DataLoader, read_manifest
    loader = DataLoader(read_manifest(manifest), cfg.data, cfg.features)
    it = iter(loader)
    next(it)  # warm: thread pool up, first epoch plan built
    t0 = time.perf_counter()
    audio = 0.0
    for _ in range(n_batches):
        audio += next(it).audio_seconds
    dt = (time.perf_counter() - t0) / n_batches
    print(f"# host loader drain: {dt*1e3:.1f} ms/batch "
          f"({audio/(time.perf_counter()-t0):.0f} audio-s/s)")
    try:
        it.close()
    except AttributeError:
        pass
    return dt


def measure_loop(cfg, steps, sync_every, tag):
    """Steady-state loop ms/step from the metrics step_time_s windows,
    excluding the first window (compile + warmup) and the step==total
    window — train() computes the latter as (now-t_last)/log_every even
    when fewer than log_every steps elapsed, and it absorbs the
    mandatory final-step checkpoint, so keeping it would bias the
    sync1-vs-sync8 comparison. Only full windows at step % log_every ==
    0 and step != total count."""
    import json
    import shutil
    from ctc_asr_tpu.train import train
    tdir = f"/tmp/diag_train_loop/{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    log_every = 50
    cfg = dc.replace(cfg, train=dc.replace(
        cfg.train, total_steps=steps, sync_every=sync_every,
        log_every=log_every, eval_every=0, checkpoint_every=0,
        precompile=False, train_dir=tdir))
    train(cfg)
    windows = []
    with open(os.path.join(tdir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if ("step_time_s" in r and r["step"] % log_every == 0
                    and r["step"] != steps):
                windows.append(r["step_time_s"])
    steady = windows[1:] or windows
    ms = sum(steady) / len(steady) * 1e3
    print(f"# full loop [{tag}] sync_every={sync_every}: "
          f"{ms:.1f} ms/step steady-state "
          f"({len(steady)} windows of {log_every})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--preset", default="conv_bilstm3")
    ap.add_argument("--wire", default="int16",
                    choices=("int16", "ulaw", "float32"))
    ap.add_argument("--skip-upload", action="store_true")
    args = ap.parse_args()

    from ctc_asr_tpu.config import preset
    cfg = preset(args.preset)
    cfg = dc.replace(cfg, data=dc.replace(
        cfg.data, train_manifest=args.manifest, batch_size=args.batch,
        num_buckets=2, min_audio_seconds=0.3, max_audio_seconds=12.0,
        wire_dtype=args.wire))

    if not args.skip_upload:
        measure_upload()

    # bucket geometry from the manifest (what the loop really uploads)
    from ctc_asr_tpu.data import DataLoader, read_manifest
    loader = DataLoader(read_manifest(args.manifest), cfg.data,
                        cfg.features)
    for i, b in enumerate(loader.spec.buckets):
        print(f"# bucket {i}: max_samples={b.max_samples} "
              f"({b.max_samples/16000:.1f}s) -> upload "
              f"{args.batch*b.max_samples*2/1e6:.1f} MB/batch (int16)")
    biggest = max(b.max_samples for b in loader.spec.buckets)

    measure_host_loader(cfg, args.manifest)
    measure_device_step(cfg, biggest, args.batch)
    measure_loop(cfg, args.steps, sync_every=1, tag="sync1")
    measure_loop(cfg, args.steps, sync_every=8, tag="sync8")


if __name__ == "__main__":
    main()
