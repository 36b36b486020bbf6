"""Dataset generators (SURVEY.md §2a row: per-corpus converters ->
length-sorted CSV manifests). Fake corpora use .wav inputs so the
tests run without ffmpeg/sox on PATH."""

import os

import numpy as np

from ctc_asr_tpu import audio as audio_mod
from ctc_asr_tpu.data.generate import (merge_manifests, parse_stm_line,
                                       prepare_common_voice,
                                       prepare_librispeech,
                                       prepare_tatoeba, prepare_timit)
from ctc_asr_tpu.data.manifest import read_manifest


def _wav(path, seconds, sr=16000, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    audio_mod.write_wav(
        path, (rng.standard_normal(int(seconds * sr)) * 0.1)
        .astype(np.float32), sr)


def test_prepare_librispeech(tmp_path):
    root = tmp_path / "LibriSpeech"
    chap = root / "dev-mini" / "84" / "121123"
    _wav(str(chap / "84-121123-0000.wav"), 1.5)
    _wav(str(chap / "84-121123-0001.wav"), 0.8)
    (chap / "84-121123.trans.txt").write_text(
        "84-121123-0000 HELLO, World!\n"
        "84-121123-0001 IT'S A TEST\n")
    out = tmp_path / "out"
    paths = prepare_librispeech(str(root), str(out))
    assert len(paths) == 1
    man = read_manifest(paths[0])
    # sorted by duration: the 0.8s utt first
    assert len(man) == 2
    assert man.utterances[0].duration < man.utterances[1].duration
    texts = [u.transcript for u in man.utterances]
    # charset-normalized (lowercase, punctuation stripped, ' kept)
    assert "hello world" in texts
    assert "it's a test" in texts
    for u in man.utterances:
        assert os.path.exists(u.path) and u.path.endswith(".wav")


def test_prepare_common_voice(tmp_path):
    root = tmp_path / "cv"
    _wav(str(root / "clips" / "a1.wav"), 1.0)
    _wav(str(root / "clips" / "a2.wav"), 0.5)
    (root / "validated.tsv").write_text(
        "client_id\tpath\tsentence\n"
        "x\ta1.wav\tFirst Sentence\n"
        "y\ta2.wav\tSecond one\n"
        "z\tmissing.wav\tskipped row\n")
    out = tmp_path / "out"
    p = prepare_common_voice(str(root), str(out))
    man = read_manifest(p)
    assert len(man) == 2  # missing clip dropped
    assert man.utterances[0].duration <= man.utterances[1].duration


def test_prepare_timit(tmp_path):
    root = tmp_path / "TIMIT"
    d = root / "TRAIN" / "DR1" / "FABC0"
    _wav(str(d / "SI1234.wav"), 0.6)
    (d / "SI1234.TXT").write_text("0 9600 She washed dishes.\n")
    # SA sentences are skipped by design
    _wav(str(d / "SA1.wav"), 0.6)
    (d / "SA1.TXT").write_text("0 9600 skip me\n")
    out = tmp_path / "out"
    p = prepare_timit(str(root), str(out))
    man = read_manifest(p)
    assert len(man) == 1
    assert man.utterances[0].transcript == "she washed dishes"


def test_prepare_tatoeba_and_merge(tmp_path):
    root = tmp_path / "tatoeba"
    _wav(str(root / "audio" / "101.wav"), 0.4)
    _wav(str(root / "audio" / "102.wav"), 0.9)
    (root / "sentences.csv").write_text(
        "101\teng\tGood morning\n"
        "102\teng\tSee you later\n"
        "103\tdeu\tGuten Morgen\n")
    out = tmp_path / "out"
    p = prepare_tatoeba(str(root), str(out))
    man = read_manifest(p)
    assert len(man) == 2  # non-eng filtered

    # merge keeps everything and re-sorts by duration (reference's
    # merged length-sorted train.csv, SURVEY.md §3.4)
    ls_root = tmp_path / "LibriSpeech"
    chap = ls_root / "dev-mini" / "1" / "2"
    _wav(str(chap / "1-2-0000.wav"), 0.2)
    (chap / "1-2.trans.txt").write_text("1-2-0000 TINY\n")
    ls_paths = prepare_librispeech(str(ls_root), str(tmp_path / "out2"))
    merged = merge_manifests([p] + ls_paths, str(tmp_path / "merged.csv"))
    man = read_manifest(merged)
    assert len(man) == 3
    durs = [u.duration for u in man.utterances]
    assert durs == sorted(durs)


def test_parse_stm_line():
    line = ("TalkA 1 spk1 12.50 15.75 <o,f0,male> hello there world")
    talk, t0, t1, text = parse_stm_line(line)
    assert talk == "TalkA" and abs(t0 - 12.5) < 1e-9 \
        and abs(t1 - 15.75) < 1e-9
    assert "hello there world" in text
    assert parse_stm_line(";; comment") is None
    assert parse_stm_line("") is None


def test_prepare_tedlium(tmp_path):
    root = tmp_path / "TEDLIUM"
    _wav(str(root / "train" / "sph" / "TalkA.sph").replace(".sph", "_tmp"),
         0.1)  # placeholder to create dirs
    # sph inputs need a converter; use a wav-named source instead by
    # pre-placing the converted talk wav where prepare_tedlium expects it
    out = tmp_path / "out"
    _wav(str(out / "train" / "wav" / "TalkA.wav"), 3.0)
    (root / "train" / "stm").mkdir(parents=True, exist_ok=True)
    (root / "train" / "stm" / "TalkA.stm").write_text(
        "TalkA 1 spk 0.50 1.20 <o> hello world\n"
        ";; comment line\n"
        "TalkA 1 spk 1.80 2.70 <o> second segment here\n")
    from ctc_asr_tpu.data.generate import prepare_tedlium
    p = prepare_tedlium(str(root), str(out))
    man = read_manifest(p)
    assert len(man) == 2
    durs = sorted(u.duration for u in man.utterances)
    assert abs(durs[0] - 0.7) < 0.05 and abs(durs[1] - 0.9) < 0.05
    texts = {u.transcript for u in man.utterances}
    assert texts == {"hello world", "second segment here"}
