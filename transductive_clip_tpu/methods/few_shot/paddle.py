"""PADDLE: MDL-regularized prototype EM for few-shot transduction
(reference: src/methods/few_shot/paddle.py; NeurIPS'22 "Towards practical
few-shot query sets"). Prototypes initialize from support class means; block
updates of (u, v, w) with tunable lambda.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS, get_one_hot
from ...ops.distances import sq_euclidean
from ..base import FewShotMethod, init_soft_assignments
from ...ops.precision import f32_einsum


def support_class_means(support, y_s, n_class):
    """Per-class mean of support features [N, K, d] (reference: paddle.py:126-140)."""
    one_hot = get_one_hot(y_s, n_class)                           # [N, s, K]
    counts = jnp.sum(one_hot, axis=1)[..., None]                  # [N, K, 1]
    sums = f32_einsum("tsk,tsd->tkd", one_hot, support)
    return sums / counts


@partial(jax.jit, static_argnames=("n_iter", "n_class", "dist_impl"))
def paddle_infer(support, query, y_s, u0, lambd, n_iter: int, n_class: int,
                 dist_impl: str = "matmul"):
    n_task, n_query, _ = query.shape
    y_s_one_hot = get_one_hot(y_s, n_class)
    y_s_counts = jnp.sum(y_s_one_hot, axis=1)                     # [N, K]
    supp_sums = f32_einsum("tsk,tsd->tkd", y_s_one_hot, support)
    w0 = supp_sums / y_s_counts[..., None]
    v0 = jnp.zeros((n_task, n_class), jnp.float32)

    def step(carry, _):
        u, v, w = carry
        logits = -0.5 * sq_euclidean(query, w, impl=dist_impl)
        u_new = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
        v = jnp.log(jnp.mean(u_new, axis=1) + EPS) + 1.0
        num = (
            f32_einsum("tnk,tnd->tkd", u_new, query)
            + supp_sums
        )
        den = jnp.sum(u_new, axis=1) + y_s_counts
        w = num / den[..., None]
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(n_task, -1), axis=-1)
        )
        return (u_new, v, w), crit

    (u, _, _), criterions = jax.lax.scan(step, (u0, v0, w0), None, length=n_iter)
    return u, criterions


class PADDLE(FewShotMethod):
    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        self.lambd = float(args.lambd)

    def _infer(self, task):
        self._log(f" ==> Executing PADDLE with LAMBDA = {self.lambd}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return paddle_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            u0,
            jnp.float32(self.lambd),
            n_iter=int(self.args.iter),
            n_class=int(self.args.num_classes_test),
            dist_impl=str(self.args.get("distance_impl", "matmul")),
        )
