"""Hard K-means zero-shot clustering.

Nearest-centroid hard assignments; empty clusters are zeroed in the centroid
update (reference: src/methods/zero_shot/hard_kmeans.py:138-199; the
reference's softmax-of-distances before argmin is order-preserving and is
dropped here).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS, get_one_hot
from ...ops.distances import sq_euclidean
from ..base import TransductiveMethod, init_soft_assignments
from ...ops.precision import f32_einsum


@partial(jax.jit, static_argnames=("n_iter", "impl"))
def hard_kmeans_infer(query, u0, n_iter: int, impl: str = "matmul"):
    n_class = u0.shape[-1]

    def step(carry, _):
        u, = carry
        counts = jnp.sum(u, axis=1)
        num = f32_einsum("tnk,tnd->tkd", u, query)
        w = num / jnp.maximum(counts, EPS)[..., None]
        w = jnp.where((counts > EPS)[..., None], w, 0.0)
        d2 = sq_euclidean(query, w, impl=impl)
        u_new = get_one_hot(jnp.argmin(d2, axis=-1), n_class)
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(u.shape[0], -1), axis=-1)
        )
        return (u_new,), crit

    (u,), criterions = jax.lax.scan(step, (u0,), None, length=n_iter)
    return u, criterions


class HARD_KMEANS(TransductiveMethod):
    acc_mode = "clustering"

    def _infer(self, task):
        self._log(f" ==> Executing HARD K-MEANS with T = {self.args.T}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return hard_kmeans_infer(
            task["x_q"], u0, n_iter=int(self.args.iter),
            impl=str(self.args.get("distance_impl", "matmul")),
        )
