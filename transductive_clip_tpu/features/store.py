"""Feature store backends.

The default cache is reference-compatible pickle (features/cache.py). Two
TPU-native alternatives:

* ``npz`` — compressed numpy archives, no pickle execution risk, portable.
* ``orbax`` — Orbax PyTree checkpoints: sharded, async-writable arrays,
  the idiomatic JAX checkpoint format (the "checkpoint/resume" subsystem the
  reference implements with pickles; reference: src/utils.py:299-306).

``open_store(kind)`` returns an object with save(path, features, labels) /
load(path) -> (features, labels). The evaluators and the extraction
pipeline pick the backend from the ``feature_store`` config key (the cache
path's suffix encodes it; loading dispatches on the suffix, so mixed
stores coexist). ``scripts/convert_feature_cache.py`` converts between
formats.
"""

from __future__ import annotations

import os

import numpy as np


class PickleStore:
    """Reference-compatible pickle payload
    {'concat_features', 'concat_labels'} (reference: src/utils.py:299-306);
    files written by the torch reference (torch tensors) load transparently
    — via torch when importable, else via the torch-free unpickler in
    core/io.py (numpy reconstruction of the tensor pickle protocol), so a
    core-deps-only install reads reference caches too."""

    suffix = ".plk"

    def save(self, path, features, labels):
        from ..core.io import save_pickle

        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_pickle(
            path,
            {
                "concat_features": np.asarray(features, np.float32),
                "concat_labels": np.asarray(labels, np.int64),
            },
        )

    def load(self, path):
        from ..core.io import load_pickle

        d = load_pickle(path)
        return (
            np.asarray(d["concat_features"], np.float32),
            np.asarray(d["concat_labels"], np.int64),
        )


class NpzStore:
    suffix = ".npz"

    def save(self, path, features, labels):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(
            path,
            concat_features=np.asarray(features, np.float32),
            concat_labels=np.asarray(labels, np.int64),
        )

    def load(self, path):
        with np.load(path) as z:
            return (
                z["concat_features"].astype(np.float32),
                z["concat_labels"].astype(np.int64),
            )


class OrbaxStore:
    suffix = ".orbax"

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer()

    def save(self, path, features, labels):
        ckpt = self._checkpointer()
        ckpt.save(
            os.path.abspath(path),
            {
                "concat_features": np.asarray(features, np.float32),
                "concat_labels": np.asarray(labels, np.int64),
            },
            force=True,
        )

    def load(self, path):
        ckpt = self._checkpointer()
        tree = ckpt.restore(os.path.abspath(path))
        return (
            np.asarray(tree["concat_features"], np.float32),
            np.asarray(tree["concat_labels"], np.int64),
        )


_STORES = {"plk": PickleStore, "pickle": PickleStore, "npz": NpzStore,
           "orbax": OrbaxStore}


def open_store(kind: str = "plk"):
    if kind not in _STORES:
        raise ValueError(f"Unknown feature store {kind!r}; choose from {sorted(_STORES)}")
    return _STORES[kind]()


def store_for_path(path: str):
    """The store whose suffix matches ``path`` (caches self-describe)."""
    for cls in _STORES.values():
        if path.endswith(cls.suffix):
            return cls()
    raise ValueError(f"No feature store for path {path!r}")
