"""Pickle helpers for the feature cache (reference: src/utils.py:241-248).

Stored payloads are plain numpy arrays so caches are portable and do not
require torch to read. ``load_pickle`` transparently converts torch tensors
(written by the reference implementation) to numpy if torch is importable.
"""

from __future__ import annotations

import pickle

import numpy as np


def save_pickle(file: str, data) -> None:
    with open(file, "wb") as f:
        pickle.dump(data, f)


def _to_numpy(x):
    if isinstance(x, np.ndarray):
        return x
    # torch tensors from caches written by the reference implementation
    if hasattr(x, "detach") and hasattr(x, "cpu"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_pickle(file: str):
    with open(file, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict):
        return {k: _to_numpy(v) if not isinstance(v, (str, int, float)) else v for k, v in data.items()}
    return data
