"""Pallas Dirichlet solver vs the XLA solvers (interpret mode on CPU)."""

import numpy as np
from scipy.special import digamma as sp_digamma

import jax.numpy as jnp

from transductive_clip_tpu.ops.dirichlet import minka_update_alpha
from transductive_clip_tpu.ops.pallas_dirichlet import pallas_dirichlet_solve


def test_pallas_solver_matches_minka(rng):
    n_task, rows, k = 2, 20, 40
    x = rng.dirichlet(np.ones(k) * 0.4, size=300)
    base = np.log(x + 1e-15).mean(0)
    y = np.tile(base, (n_task, rows, 1)).astype(np.float32)
    y += rng.normal(scale=0.05, size=y.shape).astype(np.float32)
    a0 = np.ones((n_task, rows, k), np.float32)

    a_ref = np.asarray(minka_update_alpha(jnp.asarray(a0), jnp.asarray(y)))
    a_pal = np.asarray(
        pallas_dirichlet_solve(jnp.asarray(a0), jnp.asarray(y), interpret=True)
    )
    assert a_pal.shape == a0.shape
    rel = np.abs(a_pal - a_ref) / np.maximum(np.abs(a_ref), 1e-6)
    assert rel.max() < 5e-3

    # stationarity of the pallas solution
    row = a_pal[0, 0]
    resid = sp_digamma(row) - sp_digamma(row.sum()) - y[0, 0]
    assert np.abs(resid).max() < 5e-3


def test_pallas_solver_unaligned_shapes(rng):
    """K not a multiple of 128 and rows not a multiple of the block."""
    n_task, rows, k = 1, 13, 150
    y = np.full((n_task, rows, k), -6.0, np.float32)
    y += rng.normal(scale=0.1, size=y.shape).astype(np.float32)
    a0 = np.ones((n_task, rows, k), np.float32)
    a_ref = np.asarray(minka_update_alpha(jnp.asarray(a0), jnp.asarray(y)))
    a_pal = np.asarray(
        pallas_dirichlet_solve(jnp.asarray(a0), jnp.asarray(y), interpret=True)
    )
    rel = np.abs(a_pal - a_ref) / np.maximum(np.abs(a_ref), 1e-6)
    assert rel.max() < 5e-3


def test_pallas_mm_matches_xla_mm(rng):
    """The VMEM-resident MM kernel must agree with the XLA reference-exact
    MM loop (same surrogate update, tolerance, and check cadence)."""
    from transductive_clip_tpu.ops.dirichlet import mm_update_alpha
    from transductive_clip_tpu.ops.pallas_dirichlet import pallas_mm_solve

    n_task, rows, k = 2, 20, 40
    x = rng.dirichlet(np.ones(k) * 0.4, size=300)
    base = np.log(x + 1e-15).mean(0)
    y = np.tile(base, (n_task, rows, 1)).astype(np.float32)
    y += rng.normal(scale=0.05, size=y.shape).astype(np.float32)
    a0 = np.ones((n_task, rows, k), np.float32)

    a_ref = np.asarray(
        mm_update_alpha(jnp.asarray(a0), jnp.asarray(y), iter_mm=1000))
    a_pal = np.asarray(
        pallas_mm_solve(jnp.asarray(a0), jnp.asarray(y), interpret=True))
    rel = np.abs(a_pal - a_ref) / np.maximum(np.abs(a_ref), 1e-6)
    assert rel.max() < 5e-3

    # stationarity: psi(a) - psi(sum a) = y
    row = a_pal[0, 0]
    resid = sp_digamma(row) - sp_digamma(row.sum()) - y[0, 0]
    assert np.abs(resid).max() < 5e-3


def test_pallas_mm_unaligned_and_empty_rows(rng):
    from transductive_clip_tpu.ops.dirichlet import mm_update_alpha
    from transductive_clip_tpu.ops.pallas_dirichlet import pallas_mm_solve

    n_task, rows, k = 1, 13, 150
    y = np.full((n_task, rows, k), -6.0, np.float32)
    y += rng.normal(scale=0.1, size=y.shape).astype(np.float32)
    y[0, 5] = -10.0                       # empty-cluster row (constant fill)
    a0 = np.ones((n_task, rows, k), np.float32)
    a_ref = np.asarray(
        mm_update_alpha(jnp.asarray(a0), jnp.asarray(y), iter_mm=1000))
    a_pal = np.asarray(
        pallas_mm_solve(jnp.asarray(a0), jnp.asarray(y), interpret=True))
    rel = np.abs(a_pal - a_ref) / np.maximum(np.abs(a_ref), 1e-6)
    assert rel.max() < 5e-3
