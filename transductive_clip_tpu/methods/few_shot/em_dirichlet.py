"""Few-shot EM-Dirichlet (soft and hard variants).

Same Dirichlet EM as the zero-shot method, but the support one-hot labels
contribute fixed statistics to the alpha update and accuracy is a direct
argmax (reference: src/methods/few_shot/em_dirichlet.py and
hard_em_dirichlet.py). lambda = int(K / k_eff) * n_query
(reference: few_shot/em_dirichlet.py:14).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS, get_one_hot
from ...ops.dirichlet import dirichlet_log_pdf, update_alpha
from ..base import FewShotMethod
from ...ops.precision import f32_einsum


@partial(jax.jit, static_argnames=("n_iter", "iter_mm", "n_class", "hard", "solver"))
def em_dirichlet_fs_infer(support, query, y_s, lambd,
                          n_iter: int, iter_mm: int, n_class: int, hard: bool,
                          solver: str = "mm"):
    """support/query: [N, s, K] / [N, n, K] softmax features; y_s: [N, s]."""
    n_task, n_query, _ = query.shape
    log_s = jnp.log(support + EPS)
    log_q = jnp.log(query + EPS)
    y_s_one_hot = get_one_hot(y_s, n_class)                       # [N, s, K]
    y_s_sum = jnp.sum(y_s_one_hot, axis=1)                        # [N, K]
    # support statistics are constant across iterations
    supp_stat = f32_einsum("tsk,tsd->tkd", y_s_one_hot, log_s)

    u0 = query
    v0 = jnp.zeros((n_task, n_class), jnp.float32)
    alpha0 = jnp.ones((n_task, n_class, n_class), jnp.float32)

    def step(carry, _):
        u, v, alpha_old = carry
        u_sum = jnp.sum(u, axis=1)
        query_stat = f32_einsum("tnk,tnd->tkd", u, log_q)
        y_cst = (supp_stat + query_stat) / (y_s_sum + u_sum)[..., None]
        alpha = update_alpha(alpha_old, y_cst, iter_mm=iter_mm, solver=solver)
        v = jnp.log(jnp.mean(u, axis=1) + EPS) + 1.0
        logits = dirichlet_log_pdf(log_q, alpha)
        u = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
        if hard:
            u = get_one_hot(jnp.argmax(u, axis=-1), n_class)
        diff = jnp.linalg.norm((alpha_old - alpha).reshape(n_task, -1), axis=-1)
        denom = jnp.linalg.norm(alpha_old.reshape(n_task, -1), axis=-1)
        return (u, v, alpha), jnp.mean(diff / denom)

    (u, _, _), criterions = jax.lax.scan(step, (u0, v0, alpha0), None, length=n_iter)
    return u, criterions


class EM_DIRICHLET(FewShotMethod):
    hard = False

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        self.lambd = float(
            int(args.num_classes_test / args.k_eff) * args.n_query
        )
        self.n_iter = int(args.iter)
        self.iter_mm = int(args.iter_mm)
        solver = str(args.get("dirichlet_solver", "auto"))
        if solver == "auto":
            # fused Pallas kernel on TPU; XLA Minka elsewhere
            import jax

            solver = "pallas" if jax.default_backend() == "tpu" else "minka"
        self.solver = solver

    def _infer(self, task):
        if not self.args.use_softmax_feature:
            raise ValueError(
                "EM-Dirichlet requires features on the unit simplex "
                "(softmax features)."
            )
        self._log(
            f" ==> Executing few-shot {'HARD ' if self.hard else ''}EM-DIRICHLET "
            f"with LAMBDA = {self.lambd}"
        )
        return em_dirichlet_fs_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            jnp.float32(self.lambd),
            n_iter=self.n_iter,
            iter_mm=self.iter_mm,
            n_class=int(self.args.num_classes_test),
            hard=self.hard,
            solver=self.solver,
        )
