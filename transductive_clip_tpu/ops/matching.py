"""Cluster -> class matching for the zero-shot clustering accuracy path.

Two strategies, mirroring the reference (src/utils.py:380-417):

* ``hungarian_matching`` — optimal one-to-one assignment of the clusters
  present in the predictions to classes, maximizing total prototype
  probability. Solved per task on a rectangular cost of shape
  [n_present <= n_query, K] (75 x K at the paper protocol — tiny), using the
  native C++ Jonker-Volgenant solver when built (``native/lapjv.cpp``) and
  scipy's C++ solver otherwise.
* ``basic_matching`` — per-cluster argmax probability (vectorized, no LAP).

These run once per task batch, outside jit; the O(iter) hot loops never touch
them.
"""

from __future__ import annotations

import numpy as np

from .common import EPS
from ..native import lap_solve  # C++ JV solver with scipy fallback


def cluster_prototypes(u_or_preds_one_hot, query, eps: float = EPS):
    """Mean query feature of each predicted cluster (numpy, [N, K, d]).

    preds_one_hot: [N, n, K]; query: [N, n, d].
    Empty clusters get all-zero prototypes (reference: em_dirichlet.py:61-70).
    """
    one_hot = np.asarray(u_or_preds_one_hot, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    counts = one_hot.sum(axis=1)                        # [N, K]
    protos = np.einsum("tnk,tnd->tkd", one_hot, query)
    protos /= np.maximum(counts, eps)[..., None]
    protos *= (counts > eps)[..., None]
    return protos


def hungarian_matching(preds, probs):
    """Optimal cluster->class matching per task.

    preds: [N, n] int cluster ids; probs: [N, K, C] prototype class
    probabilities. Returns new_preds [N, n] with clusters renamed to their
    matched classes. Cost rows are built only for clusters present in
    ``preds`` (ordered by first appearance, like the reference) so the LAP is
    rectangular with at most n rows.
    """
    preds = np.asarray(preds)
    probs = np.asarray(probs)
    n_task = preds.shape[0]
    new_preds = np.zeros_like(preds)
    for t in range(n_task):
        # distinct clusters in order of first appearance
        clusters, first_idx = np.unique(preds[t], return_index=True)
        clusters = clusters[np.argsort(first_idx)]
        cost = -probs[t, clusters, :]                   # [n_present, C]
        _, matched_cols = lap_solve(cost)
        lut = np.zeros(probs.shape[1], dtype=preds.dtype)
        lut[clusters] = matched_cols
        new_preds[t] = lut[preds[t]]
    return new_preds


def basic_matching(preds, probs):
    """Per-cluster argmax-probability matching (reference: utils.py:408-417)."""
    preds = np.asarray(preds)
    probs = np.asarray(probs)
    matched = probs.argmax(axis=-1)                     # [N, K]
    return np.take_along_axis(matched, preds, axis=1)


# ---- compressed-row variants ------------------------------------------------
# The device prototype path (methods/base.py:_proto_rows_device) returns class
# probabilities only for the top-R clusters by population, R = min(K, n_query).
# preds holds at most n_query distinct clusters, and every present cluster has
# count >= 1 while absent ones have 0, so the top-R rows always contain ALL
# present clusters — these variants are exact, not approximations.


def hungarian_matching_rows(preds, row_idx, row_probs, n_class):
    """``hungarian_matching`` over compressed prototype rows.

    preds: [N, n]; row_idx: [N, R] cluster ids of the rows; row_probs:
    [N, R, C] their class probabilities.
    """
    preds = np.asarray(preds)
    row_idx = np.asarray(row_idx)
    row_probs = np.asarray(row_probs)
    new_preds = np.zeros_like(preds)
    for t in range(preds.shape[0]):
        clusters, first_idx = np.unique(preds[t], return_index=True)
        clusters = clusters[np.argsort(first_idx)]      # first-appearance order
        pos = np.full(n_class, -1, np.int64)
        pos[row_idx[t]] = np.arange(row_idx.shape[1])
        cost = -row_probs[t, pos[clusters], :]          # [n_present, C]
        _, matched_cols = lap_solve(cost)
        lut = np.zeros(n_class, dtype=preds.dtype)
        lut[clusters] = matched_cols
        new_preds[t] = lut[preds[t]]
    return new_preds


def scatter_matching_rows(preds, row_idx, matched_cols, n_class):
    """Rename clusters to classes given per-row matched columns
    (basic/auction backends): lut[row_idx] = matched_cols; preds -> lut[preds]."""
    preds = np.asarray(preds)
    row_idx = np.asarray(row_idx)
    lut = np.zeros((preds.shape[0], n_class), preds.dtype)
    np.put_along_axis(lut, row_idx, np.asarray(matched_cols, preds.dtype), axis=1)
    return np.take_along_axis(lut, preds, axis=1)
