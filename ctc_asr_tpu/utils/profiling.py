"""Tracing/profiling (SURVEY.md §5 tracing row).

The reference had nothing beyond TensorBoard summaries; the build
provides: ``jax.profiler`` trace capture (viewable in perfetto /
tensorboard-profile), a device-time sampler for quick per-part
breakdowns, and roofline accounting helpers used to sanity-check the
Pallas kernels against speed-of-light (BASELINE.json:5).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_trace(log_dir: str):
    """trace(log_dir) when non-empty, else a no-op context."""
    return trace(log_dir) if log_dir else contextlib.nullcontext()


def time_fn(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median-free simple wall timing of a jitted fn (seconds/call).
    Blocks on the first output leaf."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# Roofline accounting (v5e per-chip peaks; adjust per generation).
TPU_V5E_BF16_FLOPS = 394e12
TPU_V5E_F32_FLOPS = 98.5e12
TPU_V5E_HBM_BYTES_S = 819e9


def roofline_seconds(flops: float = 0.0, bytes_accessed: float = 0.0,
                     f32: bool = False,
                     peak_flops: float | None = None,
                     peak_bw: float = TPU_V5E_HBM_BYTES_S) -> float:
    """Lower-bound execution time: max(compute, memory) limb."""
    if peak_flops is None:
        peak_flops = TPU_V5E_F32_FLOPS if f32 else TPU_V5E_BF16_FLOPS
    return max(flops / peak_flops, bytes_accessed / peak_bw)


def ctc_kernel_roofline(B: int, T: int, S: int) -> dict:
    """Speed-of-light estimate for the CTC alpha+beta kernel: it is
    HBM-bound — lp_z read twice, alphas written+read, grads written,
    each B*T*S f32."""
    bytes_total = 5 * B * T * S * 4
    return {"bytes": bytes_total,
            "seconds": roofline_seconds(bytes_accessed=bytes_total)}


def stft_kernel_roofline(B: int, T: int, win: int, n_fft: int,
                         n_mels: int) -> dict:
    """The STFT kernel is MXU-bound: 2 DFT matmuls + mel matmul per
    frame (f32)."""
    bins = n_fft // 2 + 1
    flops = 2 * B * T * (2 * win * bins + bins * n_mels)
    bytes_total = (B * T * 160 + B * T * n_mels) * 4  # samples + out
    return {"flops": flops, "bytes": bytes_total,
            "seconds": roofline_seconds(flops=flops,
                                        bytes_accessed=bytes_total,
                                        f32=True)}
