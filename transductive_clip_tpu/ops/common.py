"""Small shared tensor ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the epsilon used throughout the reference methods
# (reference: src/methods/zero_shot/em_dirichlet.py:20).
EPS = 1e-15
# the TIM loss epsilon (reference: src/methods/few_shot/tim.py log/power guards);
# shared by the autodiff loss, the closed-form gradient, and the Pallas kernel,
# whose equivalence depends on using one value
TIM_EPS = 1e-12


def get_one_hot(y, n_class, dtype=jnp.float32):
    """One-hot encode integer labels [..., n] -> [..., n, n_class]."""
    return (y[..., None] == jnp.arange(n_class, dtype=y.dtype)).astype(dtype)


def l2_normalize(x, axis=-1, eps=1e-12):
    """Row-normalize to unit L2 norm (zero rows stay finite)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def device_sync(x):
    """Block until ``x`` is computed.

    ``block_until_ready`` returns immediately on some remote/tunneled
    backends (observed on the axon TPU plugin), so timing and completion
    barriers instead force a scalar reduction + host transfer, which cannot
    complete before the producing computation does.
    """
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))
    return x


def rank_select_rows(counts, R, thresh=EPS):
    """Sort-free selection of ``R`` rows covering every populated one.

    TPU ``top_k`` is sort-based; when downstream code only needs the
    selected SET to contain every row with ``counts > thresh`` (and freezes
    the rest), the ordering by mass is irrelevant and a cumsum-rank +
    dense compare/argmax picks the same coverage without the sort:
    populated rows first (in row-index order), then empty rows (also in
    index order), so the R indices are DISTINCT exactly like ``top_k``'s.

    Whenever the populated count is <= R the selected set contains every
    populated row — the same guarantee top-R-by-count gives (only the
    ordering differs). With MORE than R populated rows top_k keeps the
    heaviest while this keeps the lowest-indexed; callers gate on the
    populated count (or accept the deviation their sparsity check warns
    about) in that regime.

    ``thresh`` must match the caller's populated predicate
    (``counts > thresh``).

    Returns (cnt [..., R], idx [..., R] int32, present [..., R] bool).
    """
    nonzero = counts > thresh
    nz = nonzero.astype(jnp.int32)
    rank_nz = jnp.cumsum(nz, axis=-1)                   # rank among populated
    rank_z = jnp.cumsum(1 - nz, axis=-1)                # rank among empty
    n_nz = rank_nz[..., -1:]
    grank = jnp.where(nonzero, rank_nz, n_nz + rank_z)  # 1..K, a permutation
    targets = jnp.arange(1, R + 1, dtype=jnp.int32)
    eq = grank[..., :, None] == targets                 # [..., K, R]
    idx = jnp.argmax(eq, axis=-2).astype(jnp.int32)     # [..., R]
    present = targets <= n_nz
    cnt = jnp.take_along_axis(counts, idx, axis=-1)
    return cnt, idx, present


def select_rows_covering(counts, R, thresh, impl):
    """Top-R row selection for the compact EM steps: ``impl='topk'`` is
    ``lax.top_k`` (mass-ordered); ``impl='rank'`` is the sort-free
    :func:`rank_select_rows`, SELF-GUARDED by a ``lax.cond`` that falls back
    to ``top_k`` in-trace whenever some task has more than ``R`` populated
    rows — the only regime where the two selections differ (rank keeps the
    lowest-INDEXED populated rows there, which would silently discard the
    heaviest clusters; top_k degrades gracefully by keeping the heaviest).
    With the guard, 'rank' is exact wherever 'topk' is and never worse.

    Returns (cnt [..., R], idx [..., R] int32).
    """
    if impl == "rank":
        populated = jnp.sum(counts > thresh, axis=-1)

        def _rank(c):
            cnt, idx, _ = rank_select_rows(c, R, thresh=thresh)
            return cnt, idx

        def _topk(c):
            cnt, idx = jax.lax.top_k(c, R)      # returns a [cnt, idx] list
            return cnt, idx

        return jax.lax.cond(
            jnp.max(populated) <= R, _rank, _topk, counts,
        )
    cnt, idx = jax.lax.top_k(counts, R)
    return cnt, idx


def constrainer(mesh):
    """Build a sharding-constraint function for ``mesh``.

    Returns ``con(x, *axis_names)`` placing ``x`` with
    ``PartitionSpec(*axis_names)`` on ``mesh`` — or the identity when mesh is
    None, so single-chip and multi-chip code paths share one implementation
    (the jitted math is annotated once; GSPMD inserts the collectives when a
    mesh is live).
    """
    if mesh is None:
        return lambda x, *spec: x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def con(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    return con
