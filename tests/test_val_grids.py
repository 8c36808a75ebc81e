"""The vendored validation grids (results_few_shot/val/**, data files from
the reference's published hyperparameter sweeps) must drive tuned test runs
out of the box, and set_method_opt_param must pick exactly the row the
reference's selection logic picks (reference: eval_few_shot.py:168-182 —
skip header + first grid row, argmax accuracy, last occurrence on ties)."""

import os

import numpy as np
import pytest

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.eval.few_shot import VAL_PARAM, EvaluatorFewShot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAL_DIR = os.path.join(REPO, "results_few_shot", "val")


def reference_selection(path):
    """Independent re-implementation of the reference's argmax rule."""
    params, accs = [], []
    with open(path) as f:
        for i, line in enumerate(f):
            if i < 2 or not line.strip():
                continue
            cols = line.split("\t")
            params.append(float(cols[0]))
            accs.append(float(cols[1]))
    accs = np.array(accs)
    return params[int(np.argwhere(accs == accs.max())[-1][0])]


def all_grid_files():
    out = []
    for ds in sorted(os.listdir(VAL_DIR)):
        for fname in sorted(os.listdir(os.path.join(VAL_DIR, ds))):
            if fname.endswith(".txt"):
                out.append((ds, fname))
    return out


def test_grids_vendored_complete():
    files = all_grid_files()
    assert len(files) == 398
    datasets = {ds for ds, _ in files}
    assert "caltech101" in datasets and "eurosat" in datasets
    assert len(datasets) == 10  # imagenet redirects to caltech101


def test_set_method_opt_param_matches_reference_on_every_grid(monkeypatch):
    monkeypatch.chdir(REPO)
    checked = 0
    for ds, fname in all_grid_files():
        method, word, stag = fname[:-4].rsplit("_", 2)
        if method not in VAL_PARAM:
            continue
        args = CfgNode(dict(
            name_method=method,
            dataset=ds,
            shots=int(stag[1:]),
            use_softmax_feature=(word == "softmax"),
        ))
        args[VAL_PARAM[method]] = None
        ev = EvaluatorFewShot(args=args)
        ev.set_method_opt_param()
        want = reference_selection(os.path.join(VAL_DIR, ds, fname))
        assert args[VAL_PARAM[method]] == want, (ds, fname)
        checked += 1
    assert checked >= 390


def test_imagenet_redirects_to_caltech101(monkeypatch):
    monkeypatch.chdir(REPO)
    args = CfgNode(dict(name_method="PADDLE", dataset="imagenet", shots=4,
                        use_softmax_feature=True, lambd=None))
    EvaluatorFewShot(args=args).set_method_opt_param()
    want = reference_selection(
        os.path.join(VAL_DIR, "caltech101", "PADDLE_softmax_s4.txt"))
    assert args.lambd == want


def test_known_grid_value(monkeypatch):
    """Spot-check one grid by hand: dtd PADDLE softmax 4-shot."""
    monkeypatch.chdir(REPO)
    path = os.path.join(VAL_DIR, "dtd", "PADDLE_softmax_s4.txt")
    rows = [l.split("\t") for l in open(path) if l.strip()][2:]
    accs = [float(r[1]) for r in rows]
    best = max(accs)
    args = CfgNode(dict(name_method="PADDLE", dataset="dtd", shots=4,
                        use_softmax_feature=True, lambd=None))
    EvaluatorFewShot(args=args).set_method_opt_param()
    picked = [float(r[0]) for r in rows if float(r[1]) == best]
    assert args.lambd == picked[-1]
