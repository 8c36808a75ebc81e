"""Hard KL K-means: k-means under KL divergence on the probability simplex
(reference: src/methods/zero_shot/kl_kmeans.py:115-189; from the sBeta paper).
Centroids are means of assigned probability vectors; assignment minimizes
KL(x || w), computed with a single batched matmul against log centroids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import get_one_hot
from ...ops.distances import kl_divergence_to_centroids
from ..base import TransductiveMethod, init_soft_assignments
from ...ops.precision import f32_einsum


@partial(jax.jit, static_argnames=("n_iter",))
def kl_kmeans_infer(query, u0, n_iter: int):
    n_class = u0.shape[-1]

    def step(carry, _):
        u, = carry
        counts = jnp.sum(u, axis=1)                              # [N, K]
        num = f32_einsum("tnk,tnd->tkd", u, query)
        # reference clamps the denominator at 1 (kl_kmeans.py:169-171)
        w = num / jnp.maximum(counts, 1.0)[..., None]
        w = jnp.where((counts > 0)[..., None], w, 0.0)
        divs = kl_divergence_to_centroids(query, w)
        u_new = get_one_hot(jnp.argmin(divs, axis=-1), n_class)
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(u.shape[0], -1), axis=-1)
        )
        return (u_new,), crit

    (u,), criterions = jax.lax.scan(step, (u0,), None, length=n_iter)
    return u, criterions


class KL_KMEANS(TransductiveMethod):
    acc_mode = "clustering"

    def _infer(self, task):
        self._log(f" ==> Executing KL K-MEANS with T = {self.args.T}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return kl_kmeans_infer(task["x_q"], u0, n_iter=int(self.args.iter))
