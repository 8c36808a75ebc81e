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


def test_hand_computed_token_ids(tok):
    """Exact ids derived by hand from the vocab layout (256 byte chars,
    then 256 'X</w>' chars, then merges in file order, then SOT/EOT).

    The byte alphabet orders printables first ('!'=33 at index 0), so
    'a'(97) -> id 64, 'a</w>' -> 256+64 = 320 — which is also the real CLIP
    id for the word "a" (the first 512 vocab entries are construction-
    identical to OpenAI's), 'o' -> 78, 'f</w>' -> 325, etc. Merge ids:
    512='ca', 513='cat</w>', 514='do', 515='dog</w>', 516='at</w>',
    517=SOT, 518=EOT.
    """
    assert tok.encoder["<|startoftext|>"] == 517
    assert tok.encoder["<|endoftext|>"] == 518
    # "cat": (c,a,t</w>) -> rank0 merge (c,a) -> (ca,t</w>) -> rank1 -> cat</w>
    assert tok.encode("cat") == [513]
    assert tok.encode("dog") == [515]
    # "at": (a,t</w>) -> rank4 merge
    assert tok.encode("at") == [516]
    # "photo" has no applicable merges -> byte-level pieces
    assert tok.encode("a photo of a cat") == [
        320,                      # a</w>
        79, 71, 78, 83, 334,      # p h o t o</w>
        78, 325,                  # o f</w>
        320,                      # a</w>
        513,                      # cat</w>
    ]
    padded = tok.encode_padded("a photo of a cat", context_length=16)
    assert padded[:12].tolist() == [517, 320, 79, 71, 78, 83, 334, 78, 325,
                                    320, 513, 518]
    assert padded[12:].tolist() == [0, 0, 0, 0]


def test_nfd_input_normalized_to_nfc(tok):
    """NFD-decomposed accents must tokenize like their NFC form (the
    reference's ftfy.fix_text applies NFC; see tokenizer.basic_clean)."""
    import unicodedata

    word = "café cat"
    nfd = unicodedata.normalize("NFD", word)
    assert nfd != word  # actually decomposed
    assert tok.encode(nfd) == tok.encode(word)


def test_truncate_false_raises(tok):
    """Reference clip.tokenize default raises on over-length prompts."""
    with pytest.raises(RuntimeError, match="too long"):
        tok.encode_padded("cat " * 50, context_length=6, truncate=False)


def test_missing_vocab_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="BPE"):
        SimpleTokenizer(bpe_path=str(tmp_path / "nope.gz"))
