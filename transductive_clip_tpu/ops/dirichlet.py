"""Dirichlet density and the MM (minorize-maximize) solver for its
concentration parameters.

This is the computational heart of EM-Dirichlet / Hard EM-Dirichlet
(reference: src/methods/zero_shot/em_dirichlet.py:28-40 and :153-177).

TPU-native design notes
-----------------------
* ``polygamma(1, 1)`` in the reference is only ever evaluated at 1, i.e. the
  constant pi^2/6 (``TRIGAMMA_1``); no trigamma kernel is needed.
* The reference's inner loop syncs to the host every 50 iterations to test
  convergence. Here the whole solver is a ``lax.while_loop`` over blocks of
  ``check_every`` fused iterations with a device-side convergence predicate,
  so the hot loop never leaves the chip.
* All element-wise math (lgamma/digamma/quadratic root) is fused by XLA into
  a single VPU pass per iteration; a Pallas kernel that keeps alpha
  VMEM-resident across iterations is available in ``ops.pallas_dirichlet``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln
from .precision import f32_einsum

# polygamma(1, 1) = pi^2 / 6; the reference uses this as the curvature at the
# alpha -> 0 limit (reference: em_dirichlet.py:153-155,195-196).
TRIGAMMA_1 = math.pi ** 2 / 6.0


def dirichlet_log_pdf(log_samples, alpha):
    """Batched Dirichlet log-density.

    log_samples: [..., n, d]   (log of simplex-valued features, eps-smoothed)
    alpha:       [..., K, d]   (per-cluster concentration parameters)
    returns:     [..., n, K]

    log p = lgamma(sum a) - sum lgamma(a) + sum (a - 1) log x.
    The (a-1).logx contraction is a batched matmul (MXU) rather than the
    reference's rank-4 broadcast (reference: em_dirichlet.py:35-40).
    """
    l1 = gammaln(jnp.sum(alpha, axis=-1))[..., None, :]         # [..., 1, K]
    l2 = -jnp.sum(gammaln(alpha), axis=-1)[..., None, :]        # [..., 1, K]
    l3 = f32_einsum("...nd,...kd->...nk", log_samples, alpha - 1.0)
    return l1 + l2 + l3


def _mm_iteration(alpha, y_cst, alpha_floor=1e-11):
    """One quadratic-surrogate update of alpha (all element-wise + a row sum).

    Solves a * x^2 + b * x - 1 = 0 for the new alpha via the positive root
    (reference: em_dirichlet.py:157-167).
    """
    digam = digamma(alpha + 1.0)
    # curvature of the surrogate; lgamma(1) == 0
    curv = jnp.where(
        alpha > alpha_floor,
        jnp.abs(2.0 * (digam * alpha - gammaln(alpha + 1.0)) / (alpha * alpha)),
        TRIGAMMA_1,
    )
    b = digam - digamma(jnp.sum(alpha, axis=-1, keepdims=True)) - curv * alpha - y_cst
    delta = b * b + 4.0 * curv
    return (-b + jnp.sqrt(delta)) / (2.0 * curv)


@partial(jax.jit, static_argnames=("iter_mm", "check_every"))
def mm_update_alpha(alpha0, y_cst, iter_mm: int = 1000, tol: float = 1e-11,
                    check_every: int = 50, row_mask=None):
    """Run the MM inner loop to (near) convergence, fully on device.

    alpha0, y_cst: [..., K, d]. Returns the converged alpha.

    Stop semantics match the reference loop exactly: at iteration indices
    l = 50, 100, ... the SINGLE-STEP relative change
    ||a_{l+1} - a_l||^2 / ||a_l||^2 is tested against ``tol`` and the loop
    breaks keeping a_{l+1}; exactly ``iter_mm`` updates run when the test
    never fires — the trailing block is clamped to the remaining budget,
    matching the reference's ``range(iter_mm)`` bound for any iter_mm
    (reference: em_dirichlet.py:160-177 — the criterion is the one-step
    delta at the checkpoint, not the change across the 50-iteration block).

    ``row_mask`` ([..., K] bool, optional): rows where the mask is False are
    FROZEN at ``alpha0`` and excluded from the convergence criterion. The
    compact EM steps pass the populated-cluster mask so that the criterion
    (and hence the executed iteration count) depends only on the populated
    rows — this is what makes the two-tier solve width an execution-plan
    choice with bit-identical results. ``row_mask=None`` keeps the
    reference-exact all-rows criterion.
    """
    step = _mm_iteration
    if row_mask is not None:
        mask = row_mask[..., None]

        def step(a, y):
            return jnp.where(mask, _mm_iteration(a, y), a)

    first = min(check_every, iter_mm)
    alpha = jax.lax.fori_loop(
        0, first, lambda _, a: step(a, y_cst), alpha0
    )

    def block(carry):
        alpha, it, _ = carry
        # checked step: one update, criterion on its single-step delta
        alpha_new = step(alpha, y_cst)
        if row_mask is None:
            num = jnp.sum((alpha_new - alpha) ** 2)
            den = jnp.sum(alpha * alpha)
        else:
            num = jnp.sum((alpha_new - alpha) ** 2)   # frozen rows: exact 0
            den = jnp.sum(jnp.where(mask, alpha, 0.0) ** 2)
        crit = num / jnp.maximum(den, 1e-30)
        # remaining block only runs when not converged (reference breaks
        # immediately at the checkpoint), clamped so total updates never
        # exceed iter_mm (dynamic fori bound -> while_loop under the hood)
        rem = jnp.minimum(check_every - 1, iter_mm - it - 1)
        alpha_out = jax.lax.cond(
            crit < tol,
            lambda a: a,
            lambda a: jax.lax.fori_loop(
                0, rem, lambda _, x: step(x, y_cst), a
            ),
            alpha_new,
        )
        return alpha_out, it + 1 + rem, crit

    def cond(carry):
        _, it, crit = carry
        return jnp.logical_and(it < iter_mm, crit >= tol)

    init = (alpha, jnp.array(first, jnp.int32), jnp.array(jnp.inf, jnp.float32))
    alpha, _, _ = jax.lax.while_loop(cond, block, init)
    return alpha


@partial(jax.jit, static_argnames=("max_iters", "check_every", "newton_iters"))
def minka_update_alpha(alpha0, y_cst, max_iters: int = 60, tol: float = 1e-11,
                       check_every: int = 4, newton_iters: int = 3,
                       row_mask=None):
    """Fast fixed-point solve of the same MLE stationarity equation as
    ``mm_update_alpha``: psi(a_d) - psi(sum a) = y_d per cluster row.

    Uses Minka's inverse-digamma iteration
        a_d <- psi^{-1}(psi(sum_d a_d) + y_d),
    which reaches the fixed point in ~10x fewer transcendental evaluations
    than the reference's quadratic-surrogate MM loop — same solution, chosen
    by the ``dirichlet_solver: 'minka'`` config (default; 'mm' gives the
    reference-exact iteration path).

    ``row_mask``: see ``mm_update_alpha`` — False rows are frozen at
    ``alpha0`` and excluded from the convergence criterion.
    """
    from .special import digamma_pos, inv_digamma

    def one_iter(alpha):
        psi_sum = digamma_pos(jnp.sum(alpha, axis=-1, keepdims=True))
        new = inv_digamma(psi_sum + y_cst, newton_iters=newton_iters)
        if row_mask is not None:
            new = jnp.where(row_mask[..., None], new, alpha)
        return new

    def block(carry):
        alpha, it, _ = carry
        prev = alpha
        alpha = jax.lax.fori_loop(
            0, check_every, lambda _, a: one_iter(a), alpha
        )
        num = jnp.sum((alpha - prev) ** 2)
        if row_mask is None:
            den = jnp.sum(prev * prev)
        else:
            den = jnp.sum(jnp.where(row_mask[..., None], prev, 0.0) ** 2)
        crit = num / jnp.maximum(den, 1e-30)
        return alpha, it + check_every, crit

    def cond(carry):
        _, it, crit = carry
        return jnp.logical_and(it < max_iters, crit >= tol)

    init = (alpha0, jnp.array(0, jnp.int32), jnp.array(jnp.inf, jnp.float32))
    alpha, _, _ = jax.lax.while_loop(cond, block, init)
    return alpha


@partial(jax.jit, static_argnames=("max_iters", "newton_iters"))
def minka_newton_update_alpha(alpha0, y_cst, max_iters: int = 30,
                              tol: float = 1e-11, newton_iters: int = 3,
                              row_mask=None):
    """Newton-on-row-sum solve of the same MLE stationarity equation:
    psi(a_d) - psi(sum a) = y_d per cluster row.

    Given the row-sum s, the stationarity system determines every
    coordinate in closed form: a_d(s) = psi^{-1}(psi(s) + y_d). The whole
    solve is therefore a SCALAR root-find per row,

        F(s) = sum_d psi^{-1}(psi(s) + y_d) - s = 0,

    with analytic derivative F'(s) = psi'(s) * sum_d 1/psi'(a_d) - 1
    (d/dz psi^{-1}(z) = 1/psi'(psi^{-1}(z)), reusing the trigamma the
    inner inverse-digamma Newton already evaluates). Newton on F converges
    quadratically where the plain fixed point a <- psi^{-1}(psi(sum a)+y)
    (Minka 2000; ``minka_update_alpha``) is linear — measured at the
    few-shot ImageNet first iteration, the fixed point capped its 60-
    iteration budget without reaching tol while Newton meets it in a
    handful of steps, at the same ~2 ms/iteration elementwise cost
    ([25, 1000, 1000], tunneled v5e). Same stationary point, so this is a
    solver choice like 'minka' vs 'mm' (reference-exact iteration:
    em_dirichlet.py:157-177); equivalence-tested against both.

    A guard falls back to the plain fixed-point step A(s) (globally
    convergent) wherever the Newton step is non-finite, non-positive, or
    F' degenerate. ``row_mask``: False rows are frozen at ``alpha0`` and
    excluded from the convergence criterion.
    """
    from .special import digamma_pos, inv_digamma, inv_digamma_and_deriv, \
        trigamma_pos

    s0 = jnp.sum(alpha0, axis=-1)                          # [..., R]
    live = None if row_mask is None else row_mask

    def newton_step(s):
        z = digamma_pos(s)[..., None] + y_cst
        alpha, dinv = inv_digamma_and_deriv(z, newton_iters=newton_iters)
        a_sum = jnp.sum(alpha, axis=-1)                    # A(s)
        fprime = trigamma_pos(s) * jnp.sum(dinv, axis=-1) - 1.0
        s_newton = s - (a_sum - s) / fprime
        ok = (jnp.isfinite(s_newton) & (s_newton > 0.0)
              & (jnp.abs(fprime) > 1e-12))
        return jnp.where(ok, s_newton, a_sum)

    def body(carry):
        s, it, _ = carry
        s_new = newton_step(s)
        if live is not None:
            s_new = jnp.where(live, s_new, s)
        num = jnp.sum((s_new - s) ** 2)
        den = jnp.sum((s if live is None else jnp.where(live, s, 0.0)) ** 2)
        return s_new, it + 1, num / jnp.maximum(den, 1e-30)

    def cond(carry):
        _, it, crit = carry
        return jnp.logical_and(it < max_iters, crit >= tol)

    init = (s0, jnp.array(0, jnp.int32), jnp.array(jnp.inf, jnp.float32))
    s, _, _ = jax.lax.while_loop(cond, body, init)
    # one final elementwise pass at the converged row-sum
    alpha = inv_digamma(digamma_pos(s)[..., None] + y_cst,
                        newton_iters=newton_iters)
    if row_mask is not None:
        alpha = jnp.where(row_mask[..., None], alpha, alpha0)
    return alpha


def _shard_map_rows(fn, alpha0, y_cst, mesh):
    """Run a per-cluster-row solver under a (dp, tp) mesh with ``shard_map``.

    The solver's rows (axis 1) are independent given their own full lane
    axis, while the kernel's row-sum (``jnp.sum(alpha, axis=-1)``) needs
    every lane. So instead of partitioning the lanes (which would demand a
    psum inside the Pallas while_loop), rows are resharded over tp: each
    device solves its local [N/dp, R/tp, K] block with full rows and zero
    collectives inside the kernel. GSPMD inserts the (cheap, ICI) all-to-all
    between the (dp, None, tp)-sharded EM state and the (dp, tp, None)
    solver layout at entry/exit. Rows are padded to a tp multiple with the
    ``ROW_FREEZE`` sentinel (frozen, criterion-excluded inside the kernel).
    """
    from jax.sharding import PartitionSpec as P

    from .pallas_dirichlet import ROW_FREEZE

    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    n_task, n_rows, _ = alpha0.shape
    if n_task % dp != 0:
        return None  # caller falls back to an XLA solver GSPMD can split
    rp = -(-n_rows // tp) * tp
    if rp != n_rows:
        pad = ((0, 0), (0, rp - n_rows), (0, 0))
        alpha0 = jnp.pad(alpha0, pad, constant_values=1.0)
        y_cst = jnp.pad(y_cst, pad, constant_values=ROW_FREEZE)
    spec = P("dp", "tp", None)
    out = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False
    )(alpha0, y_cst)
    return out[:, :n_rows]


# 'pallas' solves wider than this route to the XLA Minka path (same fixed
# point): VMEM residency + per-block early exit pay off at compact widths,
# while full-width [N, K, K] solves stream through HBM regardless and
# measure faster under XLA (see update_alpha)
_PALLAS_SOLVER_MAX_ROWS = 256


def resolve_solver_for_width(solver: str, n_rows: int) -> str:
    """The solver family ``update_alpha`` actually runs at this row count.

    'pallas' solves wider than ``_PALLAS_SOLVER_MAX_ROWS`` reroute to the XLA
    Newton-Minka path — the same stationary point the Pallas kernel iterates
    toward. At [N, ~1000, 1000] the blocks stream through HBM either way, the
    per-block early exit has nothing to cut, and XLA measures FASTER (6.4 vs
    7.9 ms/task on the few-shot first full-width solve, tunneled v5e — before
    the Newton acceleration on top). It also sidesteps a worker-process crash
    observed when the full-width kernel is embedded in the EM program at some
    task counts (N=20 reproducibly crashed the tunneled worker; N=24/100 and
    the standalone kernel at N=20 ran fine — an opaque lowering fault the
    compact widths have never exhibited).

    The two-tier compact EM steps resolve ONCE at their widest (n_compact)
    width and pass the resolved name to both tiers, so the ``lax.cond``
    between tiers can never mix solver families — without this, a config with
    solver='pallas' and n_compact > ``_PALLAS_SOLVER_MAX_ROWS`` would run the
    Pallas kernel in the fast branch but the XLA solver in the wide branch,
    making results a data-dependent mix of two iterations that agree only to
    tolerance, violating the documented gate invariant (cost only, not
    results).
    """
    if solver == "pallas" and n_rows > _PALLAS_SOLVER_MAX_ROWS:
        return "minka"
    return solver


def update_alpha(alpha0, y_cst, iter_mm: int = 1000, solver: str = "mm",
                 mesh=None, row_mask=None):
    """Dispatch between the reference-exact MM solver (XLA or VMEM-resident
    Pallas), the fast Minka fixed point, and the fused Pallas Minka kernel
    (identical stationary equation).

    ``mesh``: optional (dp, tp) mesh. The XLA solvers need no special
    handling (GSPMD partitions their elementwise/reduce ops under the
    caller's sharding constraints); the Pallas kernels are explicitly
    shard_map-partitioned by rows (see ``_shard_map_rows``) — a bare
    ``pallas_call`` has no GSPMD partitioning rule and would otherwise be
    all-gathered onto every device.

    ``row_mask`` ([..., K] bool, optional): False rows are frozen at
    ``alpha0`` and excluded from every solver's convergence criterion (the
    Pallas kernels receive it folded into y as the ``ROW_FREEZE`` sentinel —
    genuine y entries are weighted means of log-simplex values, always
    <= ~1e-15, so a positive value cannot occur naturally).
    """
    # full-width 'pallas' solves reroute to the XLA Newton-Minka path
    # (rationale on the helper)
    solver = resolve_solver_for_width(solver, alpha0.shape[-2])
    if solver in ("pallas", "mm_pallas"):
        from functools import partial as _partial

        from .pallas_dirichlet import (
            ROW_FREEZE,
            pallas_dirichlet_solve,
            pallas_mm_solve,
        )

        if row_mask is not None:
            y_cst = jnp.where(row_mask[..., None], y_cst, ROW_FREEZE)
        # Pallas TPU kernels only lower on TPU; tests and the multichip
        # dryrun exercise the identical kernel code in interpret mode
        interpret = jax.default_backend() != "tpu"
        if solver == "pallas":
            fn = _partial(pallas_dirichlet_solve, interpret=interpret)
        else:
            fn = _partial(pallas_mm_solve, iter_mm=iter_mm,
                          interpret=interpret)
        if mesh is not None:
            out = _shard_map_rows(fn, alpha0, y_cst, mesh)
            if out is not None:
                return out
            # task axis cannot split across dp: fall back to the XLA solver
            # of the SAME family — mm_pallas is the reference-exact
            # iteration, so its fallback must be the exact MM loop, not
            # Minka (different iteration, ignores iter_mm)
            if solver == "mm_pallas":
                return mm_update_alpha(alpha0, y_cst, iter_mm=iter_mm,
                                       row_mask=row_mask)
            return minka_newton_update_alpha(alpha0, y_cst,
                                             row_mask=row_mask)
        return fn(alpha0, y_cst)
    if solver == "minka":
        return minka_newton_update_alpha(alpha0, y_cst, row_mask=row_mask)
    if solver == "minka_fp":
        # the plain Minka fixed point (linear convergence), kept for A/B
        # and as the Pallas kernel's XLA twin
        return minka_update_alpha(alpha0, y_cst, row_mask=row_mask)
    if solver != "mm":
        # a typo must not silently select the (reference-exact but ~100x
        # slower) MM loop
        raise ValueError(
            f"unknown dirichlet_solver {solver!r}; expected one of "
            "'minka', 'minka_fp', 'pallas', 'mm', 'mm_pallas'"
        )
    return mm_update_alpha(alpha0, y_cst, iter_mm=iter_mm, row_mask=row_mask)


def dirichlet_logits_cache(log_samples, alpha):
    """The Dirichlet log-density split into cacheable terms:
    log_pdf = l12[..., None, :] + l3 with l12 = lgamma(sum a) - sum lgamma(a)
    per cluster row and l3 the (a-1).log-x contraction. Compact EM
    iterations update only the changed rows (``update_logits_cache_rows``)
    instead of recomputing ``dirichlet_log_pdf`` full-width."""
    l12 = gammaln(jnp.sum(alpha, axis=-1)) - jnp.sum(gammaln(alpha), axis=-1)
    l3 = f32_einsum("...nd,...kd->...nk", log_samples, alpha - 1.0)
    return l12, l3


def update_logits_cache_rows(l12, l3, idx, alpha_c, log_samples,
                             row_mask=None):
    """Incremental ``dirichlet_logits_cache`` update at cluster rows ``idx``
    ([..., C]) whose parameters changed to ``alpha_c`` ([..., C, d]) —
    numerically the same values the full recomputation would produce, with
    C/K of the work.

    The lane replacement is a one-hot contraction + mask, not a scatter:
    TPU scatters serialize per index (put_along_axis on the [N, n, K] cache
    measured 5 ms vs ~0 for the matmul form at the ImageNet protocol), and
    with distinct indices the 0/1 contraction reproduces the scattered
    values bit-exactly (every non-matching term is an exact 0.0).

    ``row_mask`` ([..., C] bool, optional): False rows are NOT written —
    their cached entries stay byte-for-byte as previously stored. The
    compact EM steps pass the populated mask: a frozen alpha row's cache
    entries are still valid, and skipping the write avoids replacing them
    with a recomputation whose contraction width (C vs K) could differ in
    the last bit — required for the two-tier solve gate to be bit-exact."""
    k = l12.shape[-1]
    onehot = (idx[..., None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    if row_mask is not None:
        onehot = onehot * row_mask[..., None].astype(jnp.float32)
    keep = 1.0 - jnp.max(onehot, axis=-2)                     # [..., K]

    l12_c = (gammaln(jnp.sum(alpha_c, axis=-1))
             - jnp.sum(gammaln(alpha_c), axis=-1))
    l12 = l12 * keep + f32_einsum("...c,...ck->...k", l12_c, onehot)
    l3_c = f32_einsum("...nd,...cd->...nc", log_samples, alpha_c - 1.0)
    l3 = (l3 * keep[..., None, :]
          + f32_einsum("...nc,...ck->...nk", l3_c, onehot))
    return l12, l3


def clamped_cluster_means(num, mass, eps: float = 1e-15,
                          empty_fill: float = -10.0):
    """``num / max(mass, eps)`` with empty-cluster rows set to
    ``empty_fill`` (reference: em_dirichlet.py:217-222). Returns
    (y [..., K, d], nonzero mask [..., K, 1]). Shared by the full-width
    and compact EM steps so the reference-parity constants live once."""
    y = num / jnp.maximum(mass, eps)[..., :, None]
    nonzero = (mass > eps)[..., :, None]
    return jnp.where(nonzero, y, empty_fill), nonzero


def weighted_log_means(u, log_query, eps: float = 1e-15, empty_fill: float = -10.0):
    """Per-cluster weighted means of log-features, the MM constant ``y_cst``.

    u: [..., n, K] soft assignments; log_query: [..., n, d].
    Returns [..., K, d] with rows of empty clusters set to ``empty_fill``
    (reference: em_dirichlet.py:217-222), plus the nonzero-cluster mask.
    """
    u_sum = jnp.sum(u, axis=-2)                                   # [..., K]
    num = f32_einsum("...nk,...nd->...kd", u, log_query)
    return clamped_cluster_means(num, u_sum, eps=eps, empty_fill=empty_fill)
