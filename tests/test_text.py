import numpy as np

from ctc_asr_tpu import text
from ctc_asr_tpu.metrics import ErrorRateAccumulator, cer, levenshtein, wer


def test_charset_size():
    assert text.NUM_CLASSES == 29
    assert text.BLANK_ID == 28
    assert len(text.ALPHABET) == 28


def test_roundtrip():
    s = "hello world's end"
    ids = text.encode(s)
    assert text.decode_ids(ids) == s


def test_normalize():
    assert text.normalize_transcript("Hello,  World!") == "hello world"
    assert text.normalize_transcript("IT'S ME") == "it's me"
    assert text.normalize_transcript("a-b_c") == "a b c"
    assert text.normalize_transcript("  x  ") == "x"


def test_encode_batch_padding():
    batch, lens = text.encode_batch(["ab", "a"], max_len=4)
    assert batch.shape == (2, 4)
    np.testing.assert_array_equal(lens, [2, 1])
    assert batch[1, 1] == text.PAD_ID
    assert batch[0, 0] == text.encode("a")[0]


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein(["a", "b"], ["a", "c", "b"]) == 1


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == 1 / 3
    assert wer("", "") == 0.0
    assert wer("", "x") == 1.0
    assert cer("abc", "axc") == 1 / 3


def test_corpus_accumulator():
    acc = ErrorRateAccumulator()
    acc.add("the cat", "the cat")
    acc.add("a b c d", "a x c d")
    # corpus WER = total edits / total ref words = 1/6
    assert abs(acc.wer - 1 / 6) < 1e-9
    assert acc.utterances == 2
