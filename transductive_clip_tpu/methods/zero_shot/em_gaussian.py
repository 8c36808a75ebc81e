"""EM-Gaussian (identity covariance) zero-shot clustering.

GMM-style EM with temperature-scaled euclidean log-likelihoods and the
class-proportion dual term (reference: src/methods/zero_shot/em_gaussian.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS
from ...ops.distances import sq_euclidean
from ..base import TransductiveMethod, init_soft_assignments
from .soft_kmeans import weighted_centroids


@partial(jax.jit, static_argnames=("n_iter", "impl"))
def em_gaussian_infer(query, u0, T, lambd, n_iter: int, impl: str = "matmul"):
    n_task, n_query, n_class = u0.shape
    w0 = weighted_centroids(u0, query)
    v0 = jnp.zeros((n_task, n_class), jnp.float32)

    def step(carry, _):
        u, v, w = carry
        w = weighted_centroids(u, query, w_prev=w)
        logits = -0.5 * sq_euclidean(query, w, impl=impl)
        u_new = jax.nn.softmax(
            T * logits + lambd * v[:, None, :] / n_query, axis=2
        )
        v = jnp.log(jnp.mean(u_new, axis=1) + EPS) + 1.0
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(n_task, -1), axis=-1)
        )
        return (u_new, v, w), crit

    (u, _, _), criterions = jax.lax.scan(step, (u0, v0, w0), None, length=n_iter)
    return u, criterions


class EM_GAUSSIAN(TransductiveMethod):
    acc_mode = "clustering"

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        # lambda = int(K / 5) * n_query (reference: em_gaussian.py:20)
        self.lambd = float(int(args.num_classes_test / 5) * args.n_query)

    def _infer(self, task):
        self._log(f" ==> Executing EM-GAUSSIAN with T = {self.args.T}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return em_gaussian_infer(
            task["x_q"],
            u0,
            jnp.float32(self.args.T),
            jnp.float32(self.lambd),
            n_iter=int(self.args.iter),
            impl=str(self.args.get("distance_impl", "matmul")),
        )
