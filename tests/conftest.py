"""Test harness setup: force a pure-CPU JAX with a virtual 8-device mesh.

Two environment fixes must happen BEFORE jax initializes:

1. The axon TPU session detach happens in ``_pytest_axon_guard.py``
   (see its docstring) before this file loads.

2. SURVEY.md §4(3): distributed tests run without a cluster via
   ``--xla_force_host_platform_device_count=8`` so pjit shardings, psum
   gradient math and loader sharding are exercised in one process.
"""

import os
import sys

# The axon re-exec lives in _pytest_axon_guard.py (pytest.ini addopts -p)
# because it must run before pytest's fd capture starts; by the time this
# conftest loads, the process is already axon-free.

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of pytest rootdir.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SURVEY.md §5 "race detection/sanitizers": NaN-trap gate — run the
# whole suite with every jit raising on the first NaN it produces via
#   CTC_ASR_DEBUG_NANS=1 python -m pytest tests/ -q
# Off by default: legitimate -inf arithmetic in the log-space CTC /
# beam tests makes it a debugging mode, not a CI default.
if os.environ.get("CTC_ASR_DEBUG_NANS"):
    import jax
    jax.config.update("jax_debug_nans", True)
