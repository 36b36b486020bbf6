"""Early pytest plugin: detach test runs from the axon TPU session.

This container's ``sitecustomize`` registers the axon TPU PJRT plugin in
every Python process (gated on ``PALLAS_AXON_POOL_IPS``) and routes XLA
compilation through a remote relay. For CPU-only unit tests that is a
measured ~25-100x slowdown, and concurrent test processes serialize
against each other's TPU session claim. Tests never need the TPU, so we
re-exec the interpreter once with the gate variable cleared; the fresh
process gets a plain local-LLVM CPU JAX.

Loaded via ``addopts = -p _pytest_axon_guard`` in pytest.ini so the
import (and re-exec) happens BEFORE pytest's capture plugin replaces
fd 1/2 — re-execing from a conftest would leak all output into the
about-to-be-orphaned capture tempfiles.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        os.environ.get("_CTC_ASR_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_CTC_ASR_TPU_TEST_REEXEC"] = "1"
    argv = [sys.executable, "-m", "pytest"] + sys.argv[1:]
    os.execve(sys.executable, argv, env)
