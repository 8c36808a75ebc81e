"""Soft K-means zero-shot clustering.

Euclidean clustering with temperature-scaled soft assignments
(reference: src/methods/zero_shot/soft_kmeans.py:97-220). Distances use the
matmul expansion on the MXU instead of the reference's [N, n, K, C]
broadcast-subtract temporary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS
from ...ops.distances import sq_euclidean
from ..base import TransductiveMethod, init_soft_assignments
from ...ops.precision import f32_einsum


def weighted_centroids(u, x, w_prev=None, eps: float = EPS):
    """w_k = sum_n u_nk x_n / sum_n u_nk, keeping w_prev rows (or zeros) for
    empty clusters (reference: soft_kmeans.py:149-166)."""
    counts = jnp.sum(u, axis=1)                                     # [N, K]
    num = f32_einsum("tnk,tnd->tkd", u, x)
    w = num / jnp.maximum(counts, eps)[..., None]
    nonzero = (counts > eps)[..., None]
    if w_prev is None:
        return jnp.where(nonzero, w, 0.0)
    return jnp.where(nonzero, w, w_prev)


@partial(jax.jit, static_argnames=("n_iter", "impl"))
def soft_kmeans_infer(query, u0, T, n_iter: int, impl: str = "matmul"):
    """Returns (u [N, n, K], criterions [n_iter])."""

    w0 = weighted_centroids(u0, query)

    def step(carry, _):
        u, w = carry
        w = weighted_centroids(u, query, w_prev=w)
        logits = -0.5 * sq_euclidean(query, w, impl=impl)
        u_new = jax.nn.softmax(T * logits, axis=2)
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(u.shape[0], -1), axis=-1)
        )
        return (u_new, w), crit

    (u, _), criterions = jax.lax.scan(step, (u0, w0), None, length=n_iter)
    return u, criterions


class SOFT_KMEANS(TransductiveMethod):
    acc_mode = "clustering"

    def _infer(self, task):
        self._log(f" ==> Executing SOFT K-MEANS with T = {self.args.T}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return soft_kmeans_infer(
            task["x_q"], u0, jnp.float32(self.args.T),
            n_iter=int(self.args.iter),
            impl=str(self.args.get("distance_impl", "matmul")),
        )
