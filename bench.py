"""Benchmark harness: train throughput + decode RTF on the current device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-s/s/chip", "vs_baseline": N,
   ..., "decode_rtf": R}

Both north-star metrics (BASELINE.json:2) are measured by default:
train audio-seconds/s/chip (the headline ``value``) and beam-decode
real-time factor (``decode_rtf``; --no-decode skips it, and any decode
failure degrades to a ``decode_error`` field rather than losing the
train headline).

North-star metrics per BASELINE.json:2 — audio-seconds/s/chip for
training and decode RTF at matched WER. The reference repo has no
retrievable published throughput (BASELINE.md: "published": {}), so
``vs_baseline`` is the ratio against the pure-JAX (non-Pallas) path of
THIS framework measured in the same run when ``--compare`` is on, else
1.0; BASELINE.md's measured-baseline table records absolute values per
round.

The default line also carries the ds3 FLAGSHIP arm as secondary keys
(``ds3_value``, ``ds3_step_mfu``; --no-ds3 skips) and, when converged
bench assets exist (--decode-ckpt/--decode-manifest, the
CTC_ASR_BENCH_CKPT/CTC_ASR_BENCH_MANIFEST env vars, or the default
/tmp/ctc_asr_tpu/bench_assets/{ckpt,manifest.csv}), the converged
decode RTF at matched WER — so the driver-captured artifact shows both
north-star arms without extra flags (VERDICT r4 next #7).

Runs on whatever jax.devices() provides (the driver invokes it on one
real TPU chip; CPU works for smoke via --steps 3 --tiny).
"""

import argparse
import json
import time

import numpy as np


def build_cfg(arm: str):
    from ctc_asr_tpu.config import (Config, DataConfig, FeatureConfig,
                                    ModelConfig, TrainConfig)
    if arm == "tiny":
        model = ModelConfig(frontend="conv", conv_channels=(8, 8),
                            conv_kernels=((5, 5), (3, 3)),
                            conv_strides=((2, 2), (1, 2)), rnn_layers=1,
                            rnn_units=128, bidirectional=True, dropout=0.0)
        batch, seconds = 4, 2.0
    elif arm == "ds3":
        # BASELINE.json:9 flagship: conv frontend + 5x BiLSTM-800 (37M).
        # First-class tuned record (VERDICT r3 next #3) — batch from the
        # r4 hardware sweep (BASELINE.md): B=32: 4.85k, B=48: 5.35k,
        # B=64: 5.64k, B=96: 5.63k, B=128: 5.86k (peak, MFU 0.674),
        # B=160: 5.61k audio-s/s/chip.
        model = ModelConfig(frontend="conv", rnn_layers=5, rnn_units=800,
                            bidirectional=True, dropout=0.0)
        batch, seconds = 128, 8.0
    else:  # "ds2" default
        # The BASELINE.json:8 config family: conv frontend + 3x BiLSTM.
        # B=128 after the batch sweep (BASELINE.md): per-step cost is
        # recurrence-latency-bound at small B, so larger batches
        # amortize it (B=16: ~11.5k, B=32: ~15.1k, B=64: ~15.0k,
        # B=128: ~15.8k audio-s/s/chip once the fused-RNN VMEM model
        # admits it — lstm_pallas._pick_tt). The JSON line reports the
        # batch; --batch overrides for the sweep.
        model = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                            bidirectional=True, dropout=0.0)
        batch, seconds = 128, 8.0
    cfg = Config(
        # Pallas kernels default-on (auto-fallback to pure JAX on CPU).
        features=FeatureConfig(feature_type="mel", n_mels=80,
                               use_pallas=True),
        model=model,
        data=DataConfig(batch_size=batch),
        train=TrainConfig(learning_rate=1e-4, seed=0),
    )
    return cfg, batch, seconds


# TPU v5e (v5 lite) peak dense bf16 matmul throughput per chip.
_PEAK_FLOPS = {"TPU v5": 197e12, "TPU v5 lite": 197e12,
               "TPU v4": 275e12, "TPU v6": 918e12}


def model_step_flops(cfg, batch: int, seconds: float) -> float:
    """Analytic ALGORITHMIC matmul FLOPs of one train step (fwd ~x3 for
    fwd+bwd, the standard MFU convention — counts the math the model
    defines, not the banded/padded formulation actually executed).
    Elementwise/DSP work is excluded (<2% of the dot FLOPs here)."""
    fcfg, m = cfg.features, cfg.model
    T = int(seconds * 1000 / fcfg.hop_ms)          # feature frames
    F = fcfg.feature_dim
    fwd = 0.0
    if m.frontend == "conv":
        t, f, cin = T, F, 1
        for ch, (kt, kf), (st, sf) in zip(m.conv_channels, m.conv_kernels,
                                          m.conv_strides):
            t, f = -(-t // st), -(-f // sf)
            fwd += 2.0 * t * f * ch * kt * kf * cin
            cin = ch
        d, Tp = f * cin, t
    else:
        d, Tp = F, T
        for _ in range(m.dense_layers):
            fwd += 2.0 * Tp * d * m.dense_units
            d = m.dense_units
    H = m.rnn_units
    gates = {"lstm": 4, "gru": 3, "rnn": 1}[m.rnn_type]
    nd = 2 if m.bidirectional else 1
    for _ in range(m.rnn_layers):
        fwd += nd * 2.0 * Tp * (d * gates * H + H * gates * H)
        d = nd * H
    fwd += 2.0 * Tp * d * m.num_classes
    return 3.0 * fwd * batch


def make_batch(cfg, batch, seconds, rng):
    sr = cfg.features.sample_rate
    S = int(seconds * sr)
    U = max(16, int(seconds * 12))  # ~12 chars/s of speech
    samples = (rng.standard_normal((batch, S)) * 0.1).astype(np.float32)
    slens = np.full((batch,), S, np.int32)
    labels = rng.integers(0, 28, (batch, U)).astype(np.int32)
    llens = np.full((batch,), U, np.int32)
    audio_seconds = batch * seconds
    return (samples, slens, labels, llens), audio_seconds


def make_synth_batch(cfg, batch, seconds, rng):
    """Rendered synth utterances with REAL transcripts, shaped exactly
    like make_batch's random batch so the already-compiled train step
    is reused. Training a few steps on this gives peaked, structured
    posteriors — decoding random-logit posteriors under-exercises the
    beam's merge path (VERDICT r1 next #4)."""
    from ctc_asr_tpu.data.synth import build_vocabulary, render_transcript
    from ctc_asr_tpu.text import encode
    sr = cfg.features.sample_rate
    S = int(seconds * sr)
    U = max(16, int(seconds * 12))
    vocab = build_vocabulary(64)
    # leave headroom: rendering is ~0.09 s/char with jittered envelopes;
    # clamp so sub-second --seconds still yields non-empty transcripts
    # (ADVICE r2: int(seconds/0.09)-4 goes non-positive below ~0.6 s,
    # which would silently degenerate the trained-posterior RTF rung)
    max_chars = min(U, max(4, int(seconds / 0.09) - 4))
    samples = np.zeros((batch, S), np.float32)
    slens = np.empty((batch,), np.int32)
    labels = np.zeros((batch, U), np.int32)
    llens = np.empty((batch,), np.int32)
    for i in range(batch):
        words = []
        n = 0
        while True:
            w = str(vocab[int(rng.integers(len(vocab)))])
            if n + len(w) + (1 if words else 0) > max_chars:
                break
            n += len(w) + (1 if words else 0)
            words.append(w)
        tr = " ".join(words)
        sig = render_transcript(tr, sr=sr, seed=1000 + i)
        ln = min(len(sig), S)
        samples[i, :ln] = sig[:ln]
        slens[i] = ln
        ids = encode(tr)
        labels[i, :len(ids)] = ids
        llens[i] = len(ids)
    audio_seconds = float(slens.sum()) / sr
    return (samples, slens, labels, llens), audio_seconds


def _scalar_fetch_rtt():
    """Round-trip latency of a scalar host fetch (subtracted from timed
    loops; double-digit ms through the axon tunnel)."""
    import jax.numpy as jnp
    import jax
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(2):
        float(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(x + 1)
    return (time.perf_counter() - t0) / 5


def bench_train(cfg, batch, seconds, steps, warmup):
    """True device throughput: inputs device-resident, N state-chained
    steps forced by ONE scalar fetch at the end.

    NB: block_until_ready through the axon tunnel returns at enqueue,
    not completion — only a host value fetch is a real barrier, so we
    chain steps (each consumes the previous state) and fetch once.

    Returns (audio_s_per_s, step_time, device_step_time): the first two
    include per-step dispatch through the tunnel (what a Python train
    loop pays here); device_step_time chains the same steps inside one
    jitted lax.scan — pure device time, the number a production loop
    without the tunnel approaches.
    """
    import jax
    from ctc_asr_tpu.train import (init_train_state, make_step_fn,
                                   make_train_step)

    rng = np.random.default_rng(0)
    state = init_train_state(cfg)
    step_fn = make_train_step(cfg, donate=False)
    (b, audio_s) = make_batch(cfg, batch, seconds, rng)
    b = tuple(jax.device_put(x) for x in b)

    for _ in range(max(warmup, 1)):
        state, m = step_fn(state, *b)
    float(m["loss"])  # true barrier (also completes compile)
    rtt = _scalar_fetch_rtt()

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, *b)
    float(m["loss"])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    # device-only: the same step scan-chained inside one dispatch
    raw_step = make_step_fn(cfg)

    @jax.jit
    def run_chained(st):
        def body(carry, _):
            c2, _m = raw_step(carry, *b)
            return c2, None
        st2, _ = jax.lax.scan(body, st, None, length=steps)
        return jax.tree_util.tree_leaves(st2["params"])[0].ravel()[0]

    float(run_chained(state))  # compile
    t0 = time.perf_counter()
    float(run_chained(state))
    dev_dt = max(time.perf_counter() - t0 - rtt, 1e-9) / steps

    return (steps * audio_s) / dt, dt / steps, dev_dt, step_fn, state


def bench_decode(cfg, batch, seconds, steps, warmup, step_fn=None,
                 state=None, train_steps=40, beam_widths=(64, 16)):
    """Decode RTF at the CONTRACT beam width (64, BASELINE.json:9's
    deepspeech_beam preset) plus secondaries, on posteriors trained for
    ``train_steps`` on a rendered synth batch (reusing bench_train's
    compiled step — same shapes — so no extra compile).

    Returns {beam_width: rtf}."""
    import jax
    import jax.numpy as jnp
    from ctc_asr_tpu.ops.beam import make_beam_decoder
    from ctc_asr_tpu.ops.dispatch import pallas_supported
    from ctc_asr_tpu.train import init_train_state, make_eval_step

    rng = np.random.default_rng(0)
    if state is None:
        state = init_train_state(cfg)
    (b, audio_s) = make_synth_batch(cfg, batch, seconds, rng)
    b = tuple(jax.device_put(jnp.asarray(x)) for x in b)
    if step_fn is not None and train_steps > 0:
        for _ in range(train_steps):
            state, m = step_fn(state, *b)
        float(m["loss"])  # barrier

    eval_step = make_eval_step(cfg)
    samples, slens_d = b[0], b[1]
    out = {}
    for bw in beam_widths:
        decoder = make_beam_decoder(beam_width=bw,
                                    use_pallas=pallas_supported())
        for _ in range(warmup):
            logits, logit_lens = eval_step(state["params"], samples,
                                           slens_d)
            ids, lens = decoder(logits, logit_lens)
        int(lens[0])  # true barrier (see bench_train)
        rtt = _scalar_fetch_rtt()
        t0 = time.perf_counter()
        for _ in range(steps):
            logits, logit_lens = eval_step(state["params"], samples,
                                           slens_d)
            ids, lens = decoder(logits, logit_lens)
            int(lens[0])  # decode outputs don't chain; fetch each round
        dt = max(time.perf_counter() - t0 - rtt * steps, 1e-9)
        # RTF: wall seconds per audio second (lower is better, <1 =
        # faster than real time)
        out[bw] = (dt / steps) / audio_s
    return out


def bench_converged_decode(cfg, batch: int, ckpt: str, manifest_path: str):
    """Beam-64 (and greedy) decode RTF with CONVERGED params on real
    manifest utterances at the bench batch — the 'RTF at matched WER'
    counterpart to the 40-step synth proxy (BASELINE.json:2). Uses
    evaluate()'s steady-state protocol (first batch excluded)."""
    import dataclasses as dc
    import os
    import jax
    from ctc_asr_tpu import checkpoint as ckpt_mod
    from ctc_asr_tpu.config import DataConfig, DecodeConfig, from_json
    from ctc_asr_tpu.data import DataLoader, read_manifest
    from ctc_asr_tpu.evaluate import evaluate
    from ctc_asr_tpu.train import init_train_state

    # an assets dir may pin the checkpoint's own model/feature geometry
    # (config.json, written by the run that left the checkpoint) — the
    # bench --model template need not match the converged asset family
    if not ckpt.endswith(".npz"):
        cj = os.path.join(ckpt, "config.json")
        if os.path.exists(cj):
            with open(cj) as f:
                acfg = from_json(f.read())
            cfg = dc.replace(cfg, model=acfg.model,
                             features=acfg.features)
    cfg = dc.replace(
        cfg,
        data=dc.replace(DataConfig(), batch_size=batch, num_buckets=2,
                        min_audio_seconds=0.3, max_audio_seconds=12.0),
        decode=dc.replace(DecodeConfig(), method="beam", beam_width=64))
    path = ckpt
    if not path.endswith(".npz"):
        path = ckpt_mod.latest_checkpoint(path.rstrip("/") + "/ckpt") \
            or path
    template = init_train_state(cfg)
    state, _ = ckpt_mod.load_checkpoint(path, template)
    man = read_manifest(manifest_path)
    out = {}
    for name, dcfg in (("beam64", cfg.decode),
                       ("greedy", dc.replace(cfg.decode,
                                             method="greedy"))):
        c = dc.replace(cfg, decode=dcfg)
        # two passes, min steady rtf: the steady window is only
        # ~6 batches at B=128/n=1024, so one pass is exposed to
        # multi-second tunnel/host jitter (observed 0.0024-0.014 for
        # the same greedy eval); min-of-two is the chain_time rule
        rtfs = []
        for _ in range(2):
            loader = DataLoader(man, c.data, c.features,
                                drop_last=False)
            r = evaluate(c, state["params"], loader=loader,
                         log_samples=0)
            rtfs.append(r["rtf"])
        out[f"decode_rtf_converged_{name}"] = round(min(rtfs), 5)
        out[f"decode_wer_converged_{name}"] = round(r["wer"], 4)
    out["decode_converged_ckpt"] = path
    out["decode_converged_model"] = (
        f"{cfg.model.frontend}+{cfg.model.rnn_layers}x"
        f"{'bi' if cfg.model.bidirectional else 'uni'}-"
        f"{cfg.model.rnn_units}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="small model/batch (CPU smoke)")
    ap.add_argument("--decode", action="store_true",
                    help="(kept for compat; decode RTF is on by default)")
    ap.add_argument("--no-decode", action="store_true",
                    help="skip the beam-decode RTF measurement")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size")
    ap.add_argument("--seconds", type=float, default=0,
                    help="override utterance seconds")
    ap.add_argument("--decode-train-steps", type=int, default=40,
                    help="train steps on the synth batch before the "
                         "decode-RTF measurement (0 = random init)")
    ap.add_argument("--model", default="ds2", choices=["ds2", "ds3",
                                                       "tiny"],
                    help="bench arm: ds2 (conv+3xBiLSTM-512, default) "
                         "or the ds3 flagship (conv+5xBiLSTM-800)")
    ap.add_argument("--decode-ckpt", default="",
                    help="checkpoint (.npz or train dir) for a "
                         "CONVERGED-model decode-RTF measurement "
                         "(BASELINE.json:2 'RTF at matched WER')")
    ap.add_argument("--decode-manifest", default="",
                    help="manifest of real utterances for the converged "
                         "decode (pairs with --decode-ckpt)")
    ap.add_argument("--no-ds3", action="store_true",
                    help="skip the ds3 flagship secondary record")
    ap.add_argument("--compare", action="store_true",
                    help="also bench the pure-XLA (non-Pallas) twin "
                         "path and report vs_baseline = pallas/xla "
                         "throughput ratio (the only baseline that "
                         "exists: the reference has no published "
                         "numbers, BASELINE.md)")
    args = ap.parse_args()

    import jax
    devs = jax.devices()
    n_chips = len(devs)
    cfg, batch, seconds = build_cfg("tiny" if args.tiny else args.model)
    if args.batch:
        batch = args.batch
    if args.seconds:
        seconds = args.seconds

    kind = str(devs[0].device_kind if hasattr(devs[0], "device_kind")
               else devs[0])
    tput, step_time, dev_step_time, step_fn, state = bench_train(
        cfg, batch, seconds, args.steps, args.warmup)
    per_chip = tput / n_chips
    extra = {}
    if not args.no_decode:
        # Decode RTF is the second north-star metric (BASELINE.json:2),
        # measured at the CONTRACT beam width 64 (deepspeech_beam
        # preset) on briefly-trained posteriors; beam 16 is secondary.
        # Guarded: a decode failure must never cost the train headline.
        try:
            rtfs = bench_decode(
                cfg, batch, seconds, max(args.steps // 2, 2),
                args.warmup, step_fn=step_fn, state=state,
                train_steps=args.decode_train_steps)
            extra["decode_rtf"] = round(rtfs[64], 5)
            extra["decode_rtf_beam16"] = round(rtfs[16], 5)
            extra["decode_beam_width"] = 64
            extra["decode_trained_steps"] = args.decode_train_steps
        except Exception as e:  # pragma: no cover - defensive
            extra["decode_error"] = f"{type(e).__name__}: {e}"[:200]

    # converged-model decode RTF on REAL utterances at the bench batch
    # (the contract metric is RTF at matched WER; the 40-step synth
    # proxy above is shape-level). Assets resolve from flags, env vars,
    # or the default drop location, so the driver's flagless run picks
    # them up whenever a round leaves a converged checkpoint behind.
    # Auto-discovery is gated off under --tiny/--no-decode (explicit
    # flags/env still win): the CPU smoke path must not pick up a real
    # flagship checkpoint from the default drop dir.
    import os
    ckpt = args.decode_ckpt or os.environ.get("CTC_ASR_BENCH_CKPT", "")
    man = args.decode_manifest or os.environ.get(
        "CTC_ASR_BENCH_MANIFEST", "")
    if not (ckpt and man) and not (args.tiny or args.no_decode):
        default_dir = "/tmp/ctc_asr_tpu/bench_assets"
        dman = os.path.join(default_dir, "manifest.csv")
        if os.path.exists(dman) and \
                os.path.isdir(os.path.join(default_dir, "ckpt")):
            # bench_converged_decode appends "/ckpt" to non-.npz paths
            ckpt, man = default_dir, dman
    if ckpt and man:
        try:
            extra.update(bench_converged_decode(cfg, batch, ckpt, man))
        except Exception as e:  # pragma: no cover - defensive
            extra["decode_converged_error"] = \
                f"{type(e).__name__}: {e}"[:200]

    if not args.no_ds3 and not args.tiny and args.model == "ds2":
        # ds3 flagship secondary record (VERDICT r4 next #7): the other
        # north-star training arm, in the SAME driver artifact. Guarded:
        # its failure must not cost the ds2 headline.
        try:
            cfg3, batch3, seconds3 = build_cfg("ds3")
            tput3, _, dev3, _, _ = bench_train(
                cfg3, batch3, seconds3, max(args.steps // 2, 3),
                args.warmup)
            flops3 = model_step_flops(cfg3, batch3, seconds3)
            extra["ds3_value"] = round(tput3 / n_chips, 3)
            extra["ds3_device_step_time_s"] = round(dev3, 4)
            extra["ds3_batch"] = batch3
            if _PEAK_FLOPS.get(kind):
                extra["ds3_step_mfu"] = round(
                    flops3 / (dev3 * _PEAK_FLOPS[kind] * n_chips), 4)
        except Exception as e:  # pragma: no cover - defensive
            extra["ds3_error"] = f"{type(e).__name__}: {e}"[:200]

    if args.compare:
        # the pure-XLA twin path of THIS framework — the only
        # measurable baseline (reference published numbers: none)
        try:
            import dataclasses as dc
            cfgx = dc.replace(
                cfg,
                features=dc.replace(cfg.features, use_pallas=False),
                model=dc.replace(cfg.model, use_pallas_rnn=False),
                train=dc.replace(cfg.train, use_pallas_ctc=False))
            tputx, _, devx, _, _ = bench_train(
                cfgx, batch, seconds, max(args.steps // 2, 3),
                args.warmup)
            extra["xla_twin_value"] = round(tputx / n_chips, 3)
            extra["xla_twin_device_step_time_s"] = round(devx, 4)
        except Exception as e:  # pragma: no cover - defensive
            extra["compare_error"] = f"{type(e).__name__}: {e}"[:200]

    flops = model_step_flops(cfg, batch, seconds)
    peak = _PEAK_FLOPS.get(kind)
    rec = {
        "metric": "train_throughput",
        "value": round(per_chip, 3),
        "unit": "audio-s/s/chip",
        # ratio vs the pure-XLA twin when --compare measured it; 1.0
        # otherwise (no external baseline exists — BASELINE.md)
        "vs_baseline": round(per_chip / extra["xla_twin_value"], 4)
        if extra.get("xla_twin_value") else 1.0,
        "step_time_s": round(step_time, 4),
        "device_step_time_s": round(dev_step_time, 4),
        "batch": batch,
        "utterance_seconds": seconds,
        "model": "tiny" if args.tiny else args.model,
        "n_chips": n_chips,
        "device": kind,
        **({"step_mfu": round(flops / (dev_step_time * peak * n_chips), 4)}
           if peak else {}),
        **extra,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
