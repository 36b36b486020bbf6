"""A/B: bf16 split-float DFT vs f32 DFT in the Pallas STFT kernel
(VERDICT r3 next #4 / STATUS round-3 "projected 0.5-1 ms" candidate).

Protocol: diag_common chained scan, RTT-corrected, at the bench batch
(B=128 x 8 s, mel-80) plus the B=16 shape of the round-1 kernel table.
Also prints max/mean |feature diff| between the two kernel variants on
the same signal (the interpret-mode parity bound lives in
tests/test_stft_pallas.py::test_split_dft_parity).

Usage: python scripts/diag_stft_split.py [-B 128] [--seconds 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.config import FeatureConfig
from ctc_asr_tpu.ops import stft_pallas
from diag_common import timed


def run(B, seconds):
    cfg = FeatureConfig(feature_type="mel", n_mels=80, use_pallas=True)
    sr = cfg.sample_rate
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    sig = np.stack([np.sin(2 * np.pi * (200 + 37 * b) * t)
                    + 0.3 * rng.standard_normal(len(t))
                    for b in range(B)]).astype(np.float32)
    x = jax.device_put(jnp.asarray(sig))

    # numerics: same signal through both kernel variants
    f32 = stft_pallas.features_pallas(x, cfg, split_dft=False)
    spl = stft_pallas.features_pallas(x, cfg, split_dft=True)
    d = np.abs(np.asarray(spl) - np.asarray(f32))
    print(f"[stft-split] B={B} {seconds}s  parity vs f32 kernel: "
          f"max|diff|={d.max():.3e} mean|diff|={d.mean():.3e}")

    for name, split in (("f32 DFT ", False), ("split bf16", True)):
        timed(f"stft {name} B={B}", {"x": x},
              lambda p, split=split: (
                  jnp.sum(stft_pallas.features_pallas(
                      p["x"], cfg, split_dft=split)) * 1e-6, None))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=0,
                    help="single batch size (default: sweep 16 and 128)")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    for B in ([args.B] if args.B else [16, 128]):
        run(B, args.seconds)


if __name__ == "__main__":
    main()
