#!/usr/bin/env python
"""Generate tests/fixtures/bpe_excerpt.txt — a small merges table in the
real ``bpe_simple_vocab_16e6.txt`` on-disk layout (version header line,
then one space-separated merge per line, rank = line order).

The excerpt is built so that every word used by the 11 dataset prompt
templates (data/catalog.py) fuses to a SINGLE token under greedy
lowest-rank-first BPE — like the real vocabulary, where common English
words are single tokens — while the sample classnames split into a few
pieces (like rare words do). A fixpoint guarantees the fusion property
*under interference*: a hand-written chain like ``ph ot`` + ``phot o</w>``
silently breaks when an earlier generic merge (``t o</w>``) consumes the
``t`` first, so instead of asserting an intended chain, the generator
SIMULATES greedy BPE with the table built so far and appends a merge for
the first still-unfused adjacent pair until every template word is one
token. Appended merges rank below everything existing, so earlier words'
tokenizations never regress.

The simulator here is an independent reimplementation (NOT an import of
transductive_clip_tpu.models.clip.tokenizer), so the token-id goldens it
prints are an oracle for tests/test_tokenizer.py, not an echo.

    python scripts/make_bpe_fixture.py          # rewrite fixture + print goldens

(reference: the `clip` package's simple_tokenizer semantics, used by
src/utils.py:363-377 when building the zero-shot classifier prompts)
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "bpe_excerpt.txt")

# words every template uses — must each fuse to ONE token, like the real
# vocab (all are single tokens in bpe_simple_vocab_16e6)
TEMPLATE_WORDS = [
    "a", "photo", "of", "centered", "satellite", "texture", "type",
    "flower", "food", "pet", "person", "doing", "aircraft",
]
# sample classnames (one per dataset family) — these may split into
# several pieces, but their tokenization must be deterministic; they seed
# extra generic merges so the splits look like real BPE pieces
CLASSNAMES = [
    "face", "dotted", "forest", "rose", "pizza", "beagle", "sedan",
    "street", "archery", "boeing", "goldfish", "cat", "dog", "car",
]

# the 11 dataset templates (data/catalog.py COOP_SPECS + FGVCAircraft +
# ImageNet), each formatted with a plausible classname
TEMPLATES = {
    "caltech101": ("a photo of a {}.", "face"),
    "dtd": ("{} texture.", "dotted"),
    "eurosat": ("a centered satellite photo of {}.", "forest"),
    "flowers102": ("a photo of a {}, a type of flower.", "rose"),
    "food101": ("a photo of {}, a type of food.", "pizza"),
    "oxfordpets": ("a photo of a {}, a type of pet.", "beagle"),
    "stanfordcars": ("a photo of a {}.", "sedan"),
    "sun397": ("a photo of a {}.", "street"),
    "ucf101": ("a photo of a person doing {}.", "archery"),
    "fgvcaircraft": ("a photo of a {}, a type of aircraft.", "boeing"),
    "imagenet": ("a photo of a {}.", "goldfish"),
}

# hand-written head of the table: high-frequency English merges in
# realistic frequency order (the real file opens the same way: in/th/an/re
# ...). These deliberately interfere with the word chains below — that is
# what the fixpoint is for.
BASE_MERGES = [
    ("i", "n"), ("t", "h"), ("a", "n"), ("r", "e"), ("e", "r"),
    ("o", "n"), ("e", "r</w>"), ("a", "t"), ("e", "n"), ("o", "n</w>"),
    ("o", "u"), ("e", "s</w>"), ("i", "n</w>"), ("e", "d</w>"),
    ("a", "r"), ("a", "l"), ("t", "o</w>"), ("o", "r"), ("s", "t"),
    ("i", "s</w>"), ("i", "t"), ("l", "e"), ("a", "s"), ("o", "f</w>"),
    ("i", "on"), ("e", "l"), ("e", "t</w>"), ("a", "n</w>"),
    ("s", "e"), ("n", "d</w>"), ("th", "e</w>"), ("i", "c"),
    ("a", "t</w>"), ("i", "r"), ("r", "a"), ("o", "a"), ("c", "a"),
    ("p", "h"), ("in", "g</w>"), ("o", "t"), ("o", "w"), ("o", "d</w>"),
    ("o", "g</w>"), ("t", "e"), ("u", "r"), ("p", "e"), ("l", "o"),
    ("d", "o"), ("f", "l"), ("f", "o"), ("s", "a"), ("c", "e"),
    ("c", "r"), ("t", "y"), ("x", "t"), ("e", "e"), ("s", "h"),
    ("e", "a"), ("r", "o"), ("b", "o"), ("p", "i"), ("g", "o"),
    ("a", "c"), ("e", "t"), ("en", "t"),
]


def simulate_bpe(word: str, ranks: dict) -> tuple:
    """Greedy lowest-rank-first BPE of one lowercase word (independent
    reimplementation of the clip package's algorithm)."""
    pieces = tuple(word[:-1]) + (word[-1] + "</w>",)
    while len(pieces) > 1:
        pairs = {(pieces[i], pieces[i + 1]) for i in range(len(pieces) - 1)}
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        first, second = best
        out, i = [], 0
        while i < len(pieces):
            if (i < len(pieces) - 1 and pieces[i] == first
                    and pieces[i + 1] == second):
                out.append(first + second)
                i += 2
            else:
                out.append(pieces[i])
                i += 1
        pieces = tuple(out)
    return pieces


def build():
    merges = list(BASE_MERGES)
    ranks = {m: i for i, m in enumerate(merges)}
    # vocab formability check for the hand-written head: each side of a
    # merge must be a base symbol or the product of an earlier merge
    formed = set("abcdefghijklmnopqrstuvwxyz")
    formed |= {c + "</w>" for c in "abcdefghijklmnopqrstuvwxyz"}
    for a, b in merges:
        assert a in formed and b in formed, f"unformable merge {(a, b)}"
        formed.add(a + b)

    # fixpoint: fuse every template word to a single token under greedy
    # rank order; one pass can perturb later words, so loop to stability
    changed = True
    while changed:
        changed = False
        for w in TEMPLATE_WORDS:
            pieces = simulate_bpe(w, ranks)
            if len(pieces) > 1:
                m = (pieces[0], pieces[1])
                assert m not in ranks
                ranks[m] = len(merges)
                merges.append(m)
                changed = True
    for w in TEMPLATE_WORDS:
        assert len(simulate_bpe(w, ranks)) == 1, w
    return merges, ranks


def vocab_ids(merges):
    """Token -> id under the loader's layout: 256 byte chars, 256
    'X</w>' byte chars, merges in rank order, SOT, EOT."""
    # byte alphabet in bytes_to_unicode order: printables '!'..'~' first
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = [chr(b) for b in bs]
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(chr(256 + len(cs) - len(bs) + 1 + 255))  # unused here
    vocab = cs + [c + "</w>" for c in cs]
    for m in merges:
        vocab.append("".join(m))
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    return {t: i for i, t in enumerate(vocab)}


def encode(text, ranks, ids):
    import re

    out = []
    for tok in re.findall(r"[a-z]+|[^\w\s]", text.lower()):
        if tok.isalpha():
            out.extend(ids[p] for p in simulate_bpe(tok, ranks))
        else:
            out.append(ids[tok + "</w>"])
    return out


def main():
    merges, ranks = build()
    ids = vocab_ids(merges)
    with open(OUT, "w") as f:
        f.write("#version: 0.2 - template-word excerpt in the reference "
                "file's exact on-disk layout\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {OUT}: {len(merges)} merges")
    print("\nGOLDENS = {")
    for name, (tpl, cls) in TEMPLATES.items():
        prompt = tpl.format(cls)
        print(f"    {name!r}: ({prompt!r},\n"
              f"        {encode(prompt, ranks, ids)}),")
    print("}")
    for w in TEMPLATE_WORDS + CLASSNAMES:
        print(f"# {w!r}: {simulate_bpe(w, ranks)}")


if __name__ == "__main__":
    main()
