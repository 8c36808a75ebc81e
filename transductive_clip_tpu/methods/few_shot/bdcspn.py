"""BD-CSPN: one-shot prototype rectification + cosine nearest-prototype
prediction (reference: src/methods/few_shot/bdcspn.py; ECCV 2020).

The reference loops over tasks in Python (bdcspn.py:122-139); here the whole
rectification is a batched computation over the task axis under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import l2_normalize as _l2_normalize
from ...ops.distances import sq_euclidean
from ..base import FewShotMethod
from .paddle import support_class_means
from ...ops.precision import f32_einsum


def _cosine_logits(w, samples, dist_impl: str = "matmul"):
    """-1/2 || w_hat - x_hat ||^2 (reference: bdcspn.py:42-57)."""
    return -0.5 * sq_euclidean(
        _l2_normalize(samples), _l2_normalize(w), impl=dist_impl
    )


@partial(jax.jit, static_argnames=("n_class", "norm_type", "dist_impl"))
def bdcspn_infer(support, query, y_s, temp, n_class: int,
                 norm_type: str = "L2N", dist_impl: str = "matmul"):
    # normalization with train_mean = mean of support (reference: bdcspn.py:161-163)
    train_mean = jnp.mean(support, axis=1, keepdims=True)
    if norm_type == "CL2N":
        support = _l2_normalize(support - train_mean)
        query = _l2_normalize(query - train_mean)
    elif norm_type == "L2N":
        support = _l2_normalize(support)
        query = _l2_normalize(query)

    init_prototypes = support_class_means(support, y_s, n_class)

    # shift query towards the support distribution, per task
    eta = jnp.mean(support, axis=1, keepdims=True) - jnp.mean(query, axis=1, keepdims=True)
    query_aug = jnp.concatenate([support, query + eta], axis=1)   # [N, s+n, d]

    cos_sim = _cosine_logits(init_prototypes, query_aug, dist_impl)  # [N, s+n, K]
    u = jax.nn.softmax(temp * cos_sim, axis=-1)

    qa_hat = _l2_normalize(query_aug)
    counts = jnp.sum(u, axis=1)[..., None]                        # [N, K, 1]
    prototypes = (
        f32_einsum("tnk,tnd->tkd", u, qa_hat)
        / counts
    )

    logits_q = _cosine_logits(prototypes, query, dist_impl)
    u_q = jax.nn.softmax(temp * logits_q, axis=-1)
    return u_q


class BDCSPN(FewShotMethod):
    def _infer(self, task):
        self._log(" ==> Executing BD-CSPN")
        u = bdcspn_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            jnp.float32(self.args.temp),
            n_class=int(self.args.num_classes_test),
            norm_type=str(self.args.norm_type),
            dist_impl=str(self.args.get("distance_impl", "matmul")),
        )
        return u, jnp.zeros((1,), jnp.float32)
