"""Feature cache.

The cache is the framework's checkpoint system (as in the reference, where
rerun skips straight to loading — reference: src/utils.py:266-271). Layout
and naming match the reference so existing caches are reusable:

    data/<dataset>/saved_features/{set}_softmax_{backbone}_T{T}.plk
    data/<dataset>/saved_features/{set}_visual_{backbone}.plk

Payload: {'concat_features': [N, K or D] float32, 'concat_labels': [N]}.
Files written by the torch reference (torch tensors) load transparently.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.io import load_pickle, save_pickle


# config `feature_store` -> cache filename suffix (features/store.py)
_SUFFIXES = {"plk": ".plk", "npz": ".npz", "orbax": ".orbax"}


def _ext(store):
    try:
        return _SUFFIXES[store]
    except KeyError:
        raise ValueError(
            f"Unknown feature_store {store!r}; choose from {sorted(_SUFFIXES)}"
        ) from None


def softmax_cache_path(dataset, set_name, backbone, T, root="data",
                       store="plk"):
    return os.path.join(
        root, dataset, "saved_features",
        f"{set_name}_softmax_{backbone}_T{T}{_ext(store)}",
    )


def visual_cache_path(dataset, set_name, backbone, root="data", store="plk"):
    return os.path.join(
        root, dataset, "saved_features",
        f"{set_name}_visual_{backbone}{_ext(store)}",
    )


def load_feature_cache(path):
    """Returns (features [N, d] float32 ndarray, labels [N] int64 ndarray).

    Non-pickle caches (npz/orbax, suffix-encoded) dispatch to their store
    backend."""
    if not path.endswith(".plk"):
        from .store import store_for_path

        return store_for_path(path).load(path)
    d = load_pickle(path)
    feats = np.asarray(d["concat_features"], np.float32)
    labels = np.asarray(d["concat_labels"], np.int64)
    return feats, labels


def save_feature_cache(path, features, labels):
    if not path.endswith(".plk"):
        from .store import store_for_path

        return store_for_path(path).save(path, features, labels)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_pickle(
        path,
        {
            "concat_features": np.asarray(features, np.float32),
            "concat_labels": np.asarray(labels, np.int64),
        },
    )
