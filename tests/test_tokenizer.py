"""BPE tokenizer semantics with a small synthetic merges file."""

import gzip
import os

import numpy as np
import pytest

from transductive_clip_tpu.models.clip.tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
)


@pytest.fixture
def tok(tmp_path):
    """A miniature BPE vocabulary: enough merges to fuse 'cat' and 'dog'."""
    merges = [
        "#version: 0.2",
        "c a",
        "ca t</w>",
        "d o",
        "do g</w>",
        "a t</w>",
    ]
    # pad to the slice the loader takes (it reads merges[1:49152-256-2+1])
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges) + "\n")
    return SimpleTokenizer(bpe_path=str(path))


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_known_merges_fuse(tok):
    cat = tok.encode("cat")
    dog = tok.encode("dog")
    assert len(cat) == 1 and len(dog) == 1
    assert cat != dog
    # unmerged word falls back to char-level pieces
    assert len(tok.encode("bird")) > 1


def test_lowercasing_and_whitespace(tok):
    assert tok.encode("  CAT  ") == tok.encode("cat")
    assert tok.encode("cat dog") == tok.encode("cat") + tok.encode("dog")


def test_encode_padded(tok):
    out = tok.encode_padded("cat dog", context_length=8)
    assert out.shape == (8,)
    assert out.dtype == np.int32
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert out[0] == sot
    assert eot in out
    # eot is the maximum id -> argmax pooling finds it
    assert out.max() == eot


def test_truncation_keeps_eot(tok):
    out = tok.encode_padded("cat " * 50, context_length=6)
    assert out.shape == (6,)
    assert out[-1] == tok.encoder["<|endoftext|>"]


def test_missing_vocab_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="BPE"):
        SimpleTokenizer(bpe_path=str(tmp_path / "nope.gz"))
