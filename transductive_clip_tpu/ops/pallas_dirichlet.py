"""Fused Pallas TPU kernel for the Dirichlet concentration solve.

The XLA path (ops/dirichlet.py) runs each fixed-point iteration as its own
fusion, streaming the [N, K, K] alpha state through HBM every iteration and
testing one *global* convergence criterion. This kernel instead:

* tiles alpha into [BK, K] cluster-row blocks that stay **VMEM-resident
  across all solver iterations** (zero HBM traffic between iterations),
* runs Minka's inverse-digamma fixed point with the positive-axis special
  functions from ops/special.py (cheap polynomial/series forms, no generic
  reflection paths),
* early-exits **per block** via a `lax.while_loop` on the block's own
  relative-change criterion — rows of near-empty clusters converge in a
  couple of iterations and stop paying for the slow rows elsewhere.

Same stationary equation as the reference's MM loop
(reference: src/methods/zero_shot/em_dirichlet.py:157-177).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dirichlet import TRIGAMMA_1 as _TRIGAMMA_1
from .special import digamma_pos, inv_digamma, lgamma_pos


def _round_up(x, m):
    return (x + m - 1) // m * m


# Row-freeze sentinel: a y row whose first lane is >= ROW_FREEZE/2 is kept at
# its incoming alpha and EXCLUDED from the block's convergence criterion.
# Genuine y entries are weighted means of log(simplex + eps), always
# <= ~1e-15 (and the empty-cluster fill is -10), so a positive value cannot
# occur naturally. Used for (a) row padding — padded rows must not couple
# into the stop decision — and (b) the compact EM steps' populated-row mask,
# which makes the two-tier solve width bit-exact (ops/dirichlet.py:
# update_alpha folds ``row_mask`` into y with this value).
ROW_FREEZE = 1.0


def _row_live(y, valid):
    """[1, BK, 1] bool: rows NOT carrying the freeze sentinel."""
    first_lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1) == 0
    marker = jnp.sum(jnp.where(first_lane & valid, y, 0.0), axis=-1,
                     keepdims=True)
    return marker < ROW_FREEZE / 2


def _solver_kernel(alpha_ref, y_ref, out_ref, *, n_valid, max_iters, tol,
                   newton_iters):
    alpha0 = alpha_ref[:]                                        # [1, BK, Kp]
    y = y_ref[:]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, alpha0.shape, alpha0.ndim - 1
    )
    valid = lane < n_valid
    live = _row_live(y, valid)                                   # [1, BK, 1]

    def one_iter(alpha):
        s = jnp.sum(jnp.where(valid, alpha, 0.0), axis=-1, keepdims=True)
        z = digamma_pos(s) + y
        new = inv_digamma(z, newton_iters=newton_iters)
        return jnp.where(live & valid, new, jnp.where(valid, alpha, 0.0))

    def body(carry):
        alpha, it, _ = carry
        new = one_iter(alpha)                  # frozen rows: new == alpha
        num = jnp.sum((new - alpha) * (new - alpha))
        den = jnp.maximum(jnp.sum(jnp.where(live, alpha, 0.0) ** 2), 1e-30)
        return new, it + 1, num / den

    def cond(carry):
        _, it, crit = carry
        return jnp.logical_and(it < max_iters, crit >= tol)

    init = (
        jnp.where(valid, alpha0, 0.0),
        jnp.zeros((), jnp.int32),
        jnp.full((), jnp.inf, jnp.float32),
    )
    alpha, _, _ = jax.lax.while_loop(cond, body, init)
    out_ref[:] = alpha


def _mm_kernel(alpha_ref, y_ref, out_ref, *, n_valid, iter_mm, tol,
               check_every, alpha_floor=1e-11):
    """The reference's MM quadratic-surrogate iteration, VMEM-resident.

    Same update equation and tolerance as ops/dirichlet.py:mm_update_alpha
    (reference: em_dirichlet.py:157-177), but alpha never leaves VMEM
    between iterations. Stopping differs in granularity: the XLA path tests
    one global ||delta||^2/||alpha||^2 over the whole [N, R, K] tensor,
    while each block here tests its own ratio (padded lanes and frozen
    sentinel rows masked out), so per-block iteration counts can differ from
    the global rule's by a few — all stopping happens below the same tol
    (solutions agree to solver tolerance; equivalence-tested).
    ``dirichlet_solver: 'mm'`` remains the bit-for-bit reference iteration
    path.
    """
    alpha0 = alpha_ref[:]                                        # [1, BK, Kp]
    y = y_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, alpha0.shape, alpha0.ndim - 1)
    valid = lane < n_valid
    live = _row_live(y, valid)                                   # [1, BK, 1]

    def mm_iter(alpha):
        digam = digamma_pos(alpha + 1.0)
        curv = jnp.where(
            alpha > alpha_floor,
            jnp.abs(2.0 * (digam * alpha - lgamma_pos(alpha + 1.0))
                    / (alpha * alpha)),
            _TRIGAMMA_1,
        )
        s = jnp.sum(jnp.where(valid, alpha, 0.0), axis=-1, keepdims=True)
        b = digam - digamma_pos(s) - curv * alpha - y
        new = (-b + jnp.sqrt(b * b + 4.0 * curv)) / (2.0 * curv)
        return jnp.where(live & valid, new, jnp.where(valid, alpha, 0.0))

    first = min(check_every, iter_mm)

    def block(carry):
        alpha, it, _ = carry
        # checked step: single-step delta at the checkpoint, as the
        # reference's l % 50 == 0 test (em_dirichlet.py:169-175)
        new = mm_iter(alpha)
        d = jnp.where(valid, new - alpha, 0.0)
        num = jnp.sum(d * d)
        den = jnp.maximum(jnp.sum(jnp.where(live & valid, alpha, 0.0) ** 2),
                          1e-30)
        crit = num / den
        # clamp to the remaining budget so exactly iter_mm updates run when
        # the convergence test never fires (reference: range(iter_mm))
        rem = jnp.minimum(check_every - 1, iter_mm - it - 1)
        new = jax.lax.cond(
            crit < tol,
            lambda a: a,
            lambda a: jax.lax.fori_loop(
                0, rem, lambda _, x: mm_iter(x), a
            ),
            new,
        )
        return new, it + 1 + rem, crit

    def cond(carry):
        _, it, crit = carry
        return jnp.logical_and(it < iter_mm, crit >= tol)

    init = (
        jax.lax.fori_loop(
            0, first, lambda _, a: mm_iter(a), jnp.where(valid, alpha0, 0.0)
        ),
        jnp.full((), first, jnp.int32),
        jnp.full((), jnp.inf, jnp.float32),
    )
    alpha, _, _ = jax.lax.while_loop(cond, block, init)
    out_ref[:] = alpha


@partial(jax.jit, static_argnames=("iter_mm", "tol", "check_every",
                                   "block_rows", "interpret"))
def pallas_mm_solve(alpha0, y_cst, iter_mm: int = 1000, tol: float = 1e-11,
                    check_every: int = 50, block_rows: int = 128,
                    interpret: bool = False):
    """MM solve with VMEM-resident blocks (see _mm_kernel for the stopping
    granularity caveat vs ``mm_update_alpha``; same equations + tolerance).

    The XLA path streams the [N, R, K] state through HBM every iteration
    (~13 ms per iteration at ImageNet scale); this kernel keeps each block
    on-chip for its whole solve.
    """
    n_task, n_rows, k = alpha0.shape
    kp = _round_up(k, 128)
    bk = min(block_rows, _round_up(n_rows, 8))
    rp = _round_up(n_rows, bk)
    alpha_p = jnp.pad(alpha0, ((0, 0), (0, rp - n_rows), (0, kp - k)),
                      constant_values=1.0)
    y_p = jnp.pad(y_cst, ((0, 0), (0, rp - n_rows), (0, kp - k)),
                  constant_values=ROW_FREEZE)
    kernel = partial(
        _mm_kernel, n_valid=k, iter_mm=iter_mm, tol=tol,
        check_every=check_every,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_task, rp, kp), jnp.float32),
        grid=(n_task, rp // bk),
        in_specs=[
            pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(alpha_p, y_p)
    return out[:, :n_rows, :k]


@partial(jax.jit, static_argnames=("max_iters", "tol", "newton_iters",
                                   "block_rows", "interpret"))
def pallas_dirichlet_solve(alpha0, y_cst, max_iters: int = 60,
                           tol: float = 1e-11, newton_iters: int = 3,
                           block_rows: int = 128, interpret: bool = False):
    """Solve psi(a_d) - psi(sum a) = y_d for each cluster row.

    alpha0, y_cst: [N, R, K] (R cluster rows, K feature dims). Returns alpha
    of the same shape. Rows are independent given their own row-sum, so the
    grid is (N, R/block_rows) and each block iterates locally in VMEM.
    """
    n_task, n_rows, k = alpha0.shape
    kp = _round_up(k, 128)
    bk = min(block_rows, _round_up(n_rows, 8))
    rp = _round_up(n_rows, bk)

    # pad: feature axis masked inside the kernel; padded rows carry the
    # freeze sentinel (kept at alpha=1, excluded from the stop criterion)
    alpha_p = jnp.pad(alpha0, ((0, 0), (0, rp - n_rows), (0, kp - k)),
                      constant_values=1.0)
    y_p = jnp.pad(y_cst, ((0, 0), (0, rp - n_rows), (0, kp - k)),
                  constant_values=ROW_FREEZE)

    kernel = partial(
        _solver_kernel, n_valid=k, max_iters=max_iters, tol=tol,
        newton_iters=newton_iters,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_task, rp, kp), jnp.float32),
        grid=(n_task, rp // bk),
        in_specs=[
            pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, kp), lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(alpha_p, y_p)
    return out[:, :n_rows, :k]
