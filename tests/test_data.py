"""Data pipeline parity: vocab order, <s> framing, batchify layout."""

import numpy as np
import pytest

from bayeslms_tpu.data.corpus import apply_data_fraction, batchify, get_batch, windows
from bayeslms_tpu.data.vocab import Vocab


@pytest.fixture
def tmp_corpus(tmp_path):
    (tmp_path / "words.txt").write_text("<s> 0\n<unk> 1\nhello 2\nworld 3\n")
    (tmp_path / "train.txt").write_text("hello world\nworld OOV hello\n")
    (tmp_path / "valid.txt").write_text("hello\n")
    (tmp_path / "test.txt").write_text("world\n")
    return tmp_path


def test_vocab_first_occurrence_wins(tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("a 0\nb 1\na 7\nc 2\n")
    v = Vocab.from_file(str(p))
    assert v.idx2word == ["a", "b", "c"]
    assert v.word2idx["c"] == 2


def test_tokenize_appends_bos_and_maps_oov(tmp_corpus):
    from bayeslms_tpu.data.corpus import Corpus

    c = Corpus(str(tmp_corpus))
    # "hello world <s> world <unk> hello <s>"
    assert c.train.tolist() == [2, 3, 0, 3, 1, 2, 0]
    assert c.valid.tolist() == [2, 0]


def test_batchify_layout():
    stream = np.arange(10, dtype=np.int32)
    rows = batchify(stream, 3)  # 3 streams of 3
    assert rows.shape == (3, 3)
    # torch: view(bsz, -1).t() -> column j holds stream j
    np.testing.assert_array_equal(rows[:, 0], [0, 1, 2])
    np.testing.assert_array_equal(rows[:, 1], [3, 4, 5])
    np.testing.assert_array_equal(rows[:, 2], [6, 7, 8])


def test_get_batch_window_and_ragged():
    rows = batchify(np.arange(20, dtype=np.int32), 2)  # (10, 2)
    d, t = get_batch(rows, 0, 4)
    assert d.shape == (4, 2)
    np.testing.assert_array_equal(t[:, 0], rows[1:5, 0])
    d2, t2 = get_batch(rows, 8, 4)  # ragged: only 1 step left
    assert d2.shape == (1, 2)


def test_windows_static_shapes():
    rows = batchify(np.arange(40, dtype=np.int32), 2)  # (20, 2)
    d, t = windows(rows, 6)
    assert d.shape == (3, 6, 2) and t.shape == (3, 6, 2)
    np.testing.assert_array_equal(t[0], rows[1:7])


def test_data_fraction():
    s = np.arange(100)
    assert len(apply_data_fraction(s, 0.25)) == 25
    assert len(apply_data_fraction(s, 1.0)) == 100
