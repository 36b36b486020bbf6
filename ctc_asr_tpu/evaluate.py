"""Evaluation driver: checkpoint -> dev/test decode -> corpus WER/CER.

Capability parity with the reference's ``asr/evaluate.py`` (SURVEY.md
§2a/§3.2: restore checkpoint, run dev/test set, decode, mean WER/edit
distance, log sample transcripts) — with decoding ON DEVICE (greedy or
vectorized beam search) instead of the reference's per-utterance CPU
beam decoder (§3.2 hot loop).
"""

from __future__ import annotations

import jax
import numpy as np

from .config import Config
from .data import DataLoader, read_manifest
from .metrics import ErrorRateAccumulator
from .text import decode_ids
from .train import make_eval_step


def make_decoder(cfg: Config):
    """Returns jitted ``(logits, logit_lens) -> (ids, lens)`` per config
    (greedy or beam, with optional LM fusion)."""
    if cfg.decode.method == "greedy":
        from .ops.greedy import greedy_decode

        def decode(logits, logit_lens):
            return greedy_decode(logits, logit_lens)
        return jax.jit(decode)
    if cfg.decode.method == "beam":
        from .ops import beam as beam_mod
        lm = None
        if cfg.decode.lm_path:
            from .ops import lm as lm_mod
            lm = lm_mod.load_lm(cfg.decode.lm_path)
        return beam_mod.make_beam_decoder(
            beam_width=cfg.decode.beam_width, lm=lm,
            lm_weight=cfg.decode.lm_weight,
            word_bonus=cfg.decode.word_bonus,
            use_pallas=cfg.decode.use_pallas)
    raise ValueError(f"unknown decode method {cfg.decode.method!r}")


def evaluate(cfg: Config, params, loader: DataLoader | None = None,
             max_batches: int | None = None, log_samples: int = 3) -> dict:
    """Decode the eval manifest; returns corpus metrics summary."""
    if loader is None:
        manifest = read_manifest(cfg.data.eval_manifest)
        loader = DataLoader(manifest, cfg.data, cfg.features,
                            shard_idx=jax.process_index(),
                            num_shards=jax.process_count(),
                            drop_last=False)
    eval_step = make_eval_step(cfg)
    decoder = make_decoder(cfg)
    acc = ErrorRateAccumulator()
    total_audio = 0.0
    import time
    t0 = time.perf_counter()
    shown = 0
    for bi, batch in enumerate(loader.iter_epoch(0)):
        if max_batches is not None and bi >= max_batches:
            break
        logits, logit_lens = eval_step(params, batch.samples,
                                       batch.sample_lengths)
        ids, lens = decoder(logits, logit_lens)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for i in range(batch.valid):
            hyp = decode_ids(ids[i, :lens[i]])
            ref = batch.transcripts[i]
            acc.add(ref, hyp)
            if shown < log_samples:
                print(f"[eval] ref: {ref!r}\n[eval] hyp: {hyp!r}",
                      flush=True)
                shown += 1
        total_audio += batch.audio_seconds
    wall = time.perf_counter() - t0
    out = acc.summary()
    # RTF: processing time per second of audio (north-star decode metric,
    # BASELINE.json:2). <1 means faster than real time.
    out["rtf"] = wall / max(total_audio, 1e-9)
    out["audio_seconds"] = total_audio
    out["wall_seconds"] = wall
    return out
