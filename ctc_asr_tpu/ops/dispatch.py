"""Platform-aware kernel dispatch.

Pallas Mosaic kernels compile only for TPU backends; CPU runs (tests,
local smoke) use the pure-JAX reference paths unless interpret mode is
forced. ``config.use_pallas`` flags mean "use the kernel where the
platform supports it".
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when the default backend can compile Mosaic TPU kernels."""
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    # the axon PJRT plugin reports platform 'axon' but is a TPU
    return platform in ("tpu", "axon")


def resolve_use_pallas(flag: bool | None) -> bool:
    """None -> auto (platform default); bool -> respect, but never try
    to mosaic-compile on CPU."""
    if flag is None:
        return pallas_supported()
    return bool(flag) and pallas_supported()
