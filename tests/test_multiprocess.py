"""REAL multi-process jax.distributed execution (VERDICT r3 next #2).

Everything else multi-device in the suite runs in ONE process on a
virtual mesh; these tests launch separate OS processes that coordinate
through ``jax.distributed.initialize`` (parallel/dist.py
``initialize_distributed``) with a local TCP coordinator, so the
genuinely multi-process behaviors are executed, not simulated:

- the process group forms (process_count == 2, 2 global devices);
- the sharded DP train step's gradient pmean crosses a process
  boundary (gloo CPU collectives) and its loss matches the
  single-process virtual-mesh step BITWISE on the same global batches;
- per-process loaders feed disjoint strided shards assembled with
  jax.make_array_from_process_local_data;
- process 0 alone writes the checkpoint;
- all processes resume from it bit-identically with exact data order.

The workers (tests/multiproc_worker.py) run a tiny dense+LSTM config on
the synth corpus; each phase is a fresh process group.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ctc_asr_tpu.data.synth import generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")
STEPS, CKPT_AT = 4, 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # the workers pin platform/collectives themselves; scrub pytest's
    # re-exec marker and any forced device count from this process
    env.pop("_CTC_ASR_TPU_TEST_REEXEC", None)
    env.pop("XLA_FLAGS", None)
    return env


def _launch(n_procs, manifest, out, train_dir, steps=STEPS, ckpt_at=0,
            resume=False, extra=()):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        cmd = [sys.executable, WORKER, "--manifest", manifest,
               "--out", out, "--train-dir", train_dir,
               "--steps", str(steps), "--ckpt-at", str(ckpt_at),
               "--num-processes", str(n_procs), "--process-id", str(pid)]
        if n_procs > 1:
            cmd += ["--coordinator", f"127.0.0.1:{port}"]
        if resume:
            cmd.append("--resume")
        cmd += list(extra)
        procs.append(subprocess.Popen(
            cmd, env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    results = []
    for pid in range(n_procs):
        with open(os.path.join(out, f"result_p{pid}.json")) as f:
            results.append(json.load(f))
    return results


@pytest.fixture(scope="module")
def mp_setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("mp_corpus")
    manifest = generate_corpus(str(out), num_utterances=16, seed=3,
                               min_words=1, max_words=2)
    root = str(tmp_path_factory.mktemp("mp_runs"))

    # single-process 2-virtual-device reference, uninterrupted
    single = _launch(1, manifest, os.path.join(root, "single_out"),
                     os.path.join(root, "single_dir"))[0]
    # two real processes, checkpoint mid-run
    multi = _launch(2, manifest, os.path.join(root, "multi_out"),
                    os.path.join(root, "multi_dir"), ckpt_at=CKPT_AT)
    return manifest, root, single, multi


def test_process_group_forms(mp_setup):
    _, _, single, multi = mp_setup
    assert single["process_count"] == 1
    assert single["global_devices"] == 2
    for r in multi:
        assert r["process_count"] == 2
        assert r["global_devices"] == 2


def test_multiprocess_loss_matches_single_process(mp_setup):
    """Cross-process psum + per-process loader shards reproduce the
    single-process virtual-mesh step exactly (2 equal shards => the
    all-reduce has identical terms; addition is commutative)."""
    _, _, single, multi = mp_setup
    assert len(single["losses"]) == STEPS
    np.testing.assert_array_equal(single["losses"], multi[0]["losses"])
    np.testing.assert_array_equal(multi[0]["losses"], multi[1]["losses"])
    assert single["params_sha"] == multi[0]["params_sha"]


def test_process_zero_writes_checkpoint(mp_setup):
    _, root, _, multi = mp_setup
    assert multi[0]["ckpt_path"] is not None
    assert multi[1]["ckpt_path"] is None
    assert os.path.exists(multi[0]["ckpt_path"])


def test_cli_train_multiprocess(mp_setup, tmp_path):
    """The PRODUCT surface end-to-end in 2 real processes: cmd_train ->
    initialize_distributed -> train()'s mesh regime (sharded step,
    process-local batch assembly) -> evaluate() with cross-process
    count aggregation -> process-0-only metrics + checkpoint files."""
    manifest, _, _, _ = mp_setup
    port = _free_port()
    train_dir = str(tmp_path / "cli_dir")
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "ctc_asr_tpu.cli", "train",
               f"--data.train_manifest={manifest}",
               f"--data.eval_manifest={manifest}",
               "--data.batch_size=2", "--data.num_buckets=1",
               "--data.num_workers=1", "--data.min_audio_seconds=0.05",
               "--features.feature_type=mfcc", "--features.n_mfcc=13",
               "--features.use_pallas=false",
               "--model.frontend=dense", "--model.dense_layers=1",
               "--model.dense_units=32", "--model.rnn_layers=1",
               "--model.rnn_units=32", "--model.dropout=0.0",
               "--model.compute_dtype=float32",
               "--model.use_pallas_rnn=false",
               "--train.use_pallas_ctc=false", "--train.total_steps=3",
               "--train.log_every=1", "--train.eval_every=3",
               "--train.checkpoint_every=3",
               f"--train.train_dir={train_dir}",
               f"--mesh.coordinator_address=127.0.0.1:{port}",
               "--mesh.num_processes=2", f"--mesh.process_id={pid}"]
        env = _worker_env()
        env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"cli train failed:\n{o[-3000:]}"
    # process 0 owns the metrics stream; the eval record carries the
    # cross-process aggregated corpus counts (16 utts, not 8)
    metrics = [json.loads(line) for line in
               open(os.path.join(train_dir, "metrics.jsonl"))]
    evals = [m for m in metrics if "eval_wer" in m]
    assert evals and evals[-1]["eval_utterances"] == 16
    assert os.path.exists(os.path.join(train_dir, "ckpt",
                                       "step_00000003.npz"))
    # both processes printed the same final step; only one wrote files
    assert "done at step 3" in outs[0] and "done at step 3" in outs[1]


def test_multiprocess_dp_tp_matches_single_process(mp_setup, tmp_path):
    """The HYBRID DP x TP regime across REAL process boundaries
    (VERDICT r4 next #4): 4 OS processes (1 CPU device each) form a 2x2
    ('data','model') mesh — GSPMD shards the 256-wide dense frontend
    over 'model' (so its matmul + gradient psum cross processes), the
    CTC/feature shard_map islands pmean over 'data' across processes,
    and the data-row-aware loader sharding gives processes in the same
    data row IDENTICAL batch shards. Losses must match the
    single-process 4-virtual-device 2x2 reference bitwise, and all
    replicas must agree."""
    manifest, _, _, _ = mp_setup
    extra = ("--model-axis", "2", "--global-devices", "4",
             "--dense-units", "256")
    single = _launch(1, manifest, str(tmp_path / "tp_single_out"),
                     str(tmp_path / "tp_single_dir"), extra=extra)[0]
    multi = _launch(4, manifest, str(tmp_path / "tp_multi_out"),
                    str(tmp_path / "tp_multi_dir"), extra=extra)
    assert single["global_devices"] == 4
    for r in multi:
        assert r["process_count"] == 4
        assert r["global_devices"] == 4
    assert len(single["losses"]) == STEPS
    for r in multi:
        np.testing.assert_array_equal(single["losses"], r["losses"])
        assert r["params_sha"] == single["params_sha"]


def test_multiprocess_eval_dump_matches_single(mp_setup, tmp_path):
    """Corpus-consistent multi-process eval artifacts (VERDICT r4 next
    #5): evaluate() allgathers the per-utterance records, so a 2-process
    `cli evaluate --dump-utts` must produce the SAME corpus metrics,
    bootstrap CI, and per-utt multiset as the 1-process run on the same
    manifest + checkpoint (not a 1/N shard-local dump)."""
    manifest, _, _, _ = mp_setup

    # build a checkpoint for the eval config (untrained params suffice —
    # the comparison is between process topologies, not quality)
    import jax as _jax
    from ctc_asr_tpu import checkpoint as ckpt_mod
    from ctc_asr_tpu.config import (Config, DataConfig, FeatureConfig,
                                    ModelConfig)
    from ctc_asr_tpu.train import init_train_state
    cfg = Config(
        features=FeatureConfig(feature_type="mfcc", n_mfcc=13,
                               use_pallas=False),
        model=ModelConfig(frontend="dense", dense_layers=1,
                          dense_units=32, rnn_layers=1, rnn_units=32,
                          dropout=0.0, compute_dtype="float32",
                          use_pallas_rnn=False),
        data=DataConfig(eval_manifest=manifest, batch_size=2,
                        num_buckets=1, num_workers=1,
                        min_audio_seconds=0.05, max_audio_seconds=10.0))
    state = _jax.device_get(init_train_state(cfg))
    ckpt = ckpt_mod.save_checkpoint(str(tmp_path / "ckpt"), 1, state)

    overrides = [f"--data.eval_manifest={manifest}",
                 "--data.batch_size=2", "--data.num_buckets=1",
                 "--data.num_workers=1", "--data.min_audio_seconds=0.05",
                 "--features.feature_type=mfcc", "--features.n_mfcc=13",
                 "--features.use_pallas=false",
                 "--model.frontend=dense", "--model.dense_layers=1",
                 "--model.dense_units=32", "--model.rnn_layers=1",
                 "--model.rnn_units=32", "--model.dropout=0.0",
                 "--model.compute_dtype=float32",
                 "--model.use_pallas_rnn=false",
                 "--decode.use_pallas=false"]

    def run_eval(n_procs, tag):
        port = _free_port()
        procs = []
        for pid in range(n_procs):
            dump = str(tmp_path / f"{tag}_p{pid}.json")
            cmd = [sys.executable, "-m", "ctc_asr_tpu.cli", "evaluate",
                   "--ckpt", ckpt, "--dump-utts", dump] + overrides
            if n_procs > 1:
                cmd += [f"--mesh.coordinator_address=127.0.0.1:{port}",
                        f"--mesh.num_processes={n_procs}",
                        f"--mesh.process_id={pid}"]
            env = _worker_env()
            env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=420)[0] for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"cli evaluate failed:\n{o[-3000:]}"
        # summary = last JSON object on stdout of process 0
        summary = json.loads(
            outs[0][outs[0].index("{"):outs[0].rindex("}") + 1])
        with open(str(tmp_path / f"{tag}_p0.json")) as f:
            dump = json.load(f)
        return summary, dump

    s1, d1 = run_eval(1, "single")
    s2, d2 = run_eval(2, "multi")
    assert s2["utterances"] == s1["utterances"] == 16
    assert s2["wer"] == s1["wer"] and s2["cer"] == s1["cer"]
    # per-utt dump: same corpus multiset (ordering is process-major
    # under sharding), and the CI computed FROM those records agrees
    assert sorted(map(tuple, d2["per_utt"])) == \
        sorted(map(tuple, d1["per_utt"]))
    assert len(d2["per_utt"]) == 16
    # no shard-local dump should exist for process 1
    assert not os.path.exists(str(tmp_path / "multi_p1.json"))


def test_multiprocess_resume_bit_identical(mp_setup):
    """Fresh 2-process group restores the step-2 checkpoint on every
    process, resumes with exact data order, and lands bit-identical to
    the uninterrupted run: same remaining losses, same final params."""
    manifest, root, single, multi = mp_setup
    resumed = _launch(2, manifest, os.path.join(root, "resume_out"),
                      os.path.join(root, "multi_dir"), resume=True)
    for r in resumed:
        assert r["final_step"] == STEPS
        np.testing.assert_array_equal(r["losses"],
                                      multi[0]["losses"][CKPT_AT:])
        assert r["params_sha"] == multi[0]["params_sha"]
        assert r["loader_cursor"] == multi[0]["loader_cursor"]
