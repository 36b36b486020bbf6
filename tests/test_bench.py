"""bench.py emits the driver artifact — one JSON line with the
contract keys. A broken bench silently costs the round's BENCH_r*.json,
so the smoke path is CI-protected (tiny arm, CPU)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tiny_emits_contract_line():
    env = dict(os.environ)
    env.pop("_CTC_ASR_TPU_TEST_REEXEC", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny",
         "--steps", "2", "--warmup", "1", "--no-decode", "--no-ds3"],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "batch",
                "device_step_time_s", "n_chips", "model"):
        assert key in rec, key
    assert rec["metric"] == "train_throughput"
    assert rec["unit"] == "audio-s/s/chip"
    assert rec["value"] > 0
    assert rec["model"] == "tiny"
