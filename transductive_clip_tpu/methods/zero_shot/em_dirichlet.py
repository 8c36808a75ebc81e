"""EM-Dirichlet zero-shot clustering (soft and hard assignment variants).

Clusters softmax features with per-class Dirichlet densities via block
coordinate updates (alpha via MM solver, dual v = log class proportions,
soft/hard assignments u). Functional port of the reference algorithm
(reference: src/methods/zero_shot/em_dirichlet.py:124-246 and
hard_em_dirichlet.py:124-271) re-designed for TPU:

* the whole outer EM loop is one ``lax.scan`` under jit,
* the MM inner loop is a device-side ``lax.while_loop``
  (see ops/dirichlet.py), with no host synchronization anywhere,
* the per-cluster statistics and Dirichlet log-density are batched matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS, get_one_hot
from ...ops.dirichlet import dirichlet_log_pdf, update_alpha, weighted_log_means
from ..base import TransductiveMethod, init_soft_assignments


@partial(jax.jit, static_argnames=("n_iter", "iter_mm", "hard", "solver"))
def em_dirichlet_infer(query, lambd, n_iter: int, iter_mm: int, hard: bool,
                       solver: str = "mm"):
    """Run EM-Dirichlet on a batch of tasks.

    query: [N, n, K] softmax features. Returns (u [N, n, K], criterions [n_iter]).
    """
    n_task, n_query, n_class = query.shape
    log_query = jnp.log(query + EPS)
    u0 = query
    v0 = jnp.zeros((n_task, n_class), jnp.float32)
    alpha0 = jnp.ones((n_task, n_class, n_class), jnp.float32)

    def step(carry, _):
        u, v, alpha_old = carry
        # ---- alpha: MM solve of the weighted-log-mean moment equations ----
        y_cst, nonzero = weighted_log_means(u, log_query, eps=EPS)
        alpha = update_alpha(alpha_old, y_cst, iter_mm=iter_mm, solver=solver)
        # keep previous alpha rows for empty clusters
        # (reference: em_dirichlet.py:224-226)
        alpha = jnp.where(nonzero, alpha, alpha_old)
        # ---- dual variable: log class proportions + 1 ----
        v = jnp.log(jnp.mean(u, axis=1) + EPS) + 1.0
        # ---- assignments ----
        logits = dirichlet_log_pdf(log_query, alpha)
        u = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
        if hard:
            u = get_one_hot(jnp.argmax(u, axis=-1), n_class)
        # ---- convergence telemetry (collected, not synced) ----
        diff = jnp.linalg.norm((alpha_old - alpha).reshape(n_task, -1), axis=-1)
        denom = jnp.linalg.norm(alpha_old.reshape(n_task, -1), axis=-1)
        crit = jnp.mean(diff / denom)
        return (u, v, alpha), crit

    (u, _, _), criterions = jax.lax.scan(
        step, (u0, v0, alpha0), None, length=n_iter
    )
    return u, criterions


class EM_DIRICHLET(TransductiveMethod):
    acc_mode = "clustering"
    hard = False

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        # lambda = int(K / 5) * n_query (reference: em_dirichlet.py:14)
        self.lambd = float(int(args.num_classes_test / 5) * args.n_query)
        self.n_iter = int(args.iter)
        self.iter_mm = int(args.iter_mm)
        # 'minka' (fast inverse-digamma fixed point, default) or 'mm'
        # (reference-exact surrogate loop); same stationary equation
        self.solver = str(args.get("dirichlet_solver", "minka"))

    def _infer(self, task):
        if not self.args.use_softmax_feature:
            raise ValueError(
                "EM-Dirichlet requires features on the unit simplex "
                "(softmax features)."
            )
        self._log(
            f" ==> Executing {'HARD ' if self.hard else ''}EM-DIRICHLET "
            f"with LAMBDA = {self.lambd} and T = {self.args.T}"
        )
        return em_dirichlet_infer(
            task["x_q"],
            jnp.float32(self.lambd),
            n_iter=self.n_iter,
            iter_mm=self.iter_mm,
            hard=self.hard,
            solver=self.solver,
        )
