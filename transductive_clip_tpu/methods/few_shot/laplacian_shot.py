"""LaplacianShot: Laplacian-regularized bound optimization
(reference: src/methods/few_shot/laplacian_shot.py; ICML 2020).

The reference runs a per-task CPU loop with sklearn KNN and scipy sparse
affinities. On TPU the KNN graph is a dense top-k over a batched pairwise
distance matmul (n_query = 75 -> a 75x75 tile is ideal MXU work), the bound
updates are batched over all tasks at once, and per-task early stopping is a
freeze mask inside the jitted scan, reproducing the reference's
"converge-then-hold" accuracy trace.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.common import device_sync, l2_normalize as _l2_normalize
from ...ops.distances import sq_euclidean
from ..base import FewShotMethod
from .paddle import support_class_means
from ...ops.precision import f32_einsum


def knn_affinity(query, knn: int):
    """Dense binary KNN affinity W[i, j] = 1 iff j is one of the (knn-1)
    nearest neighbors of i, self excluded (reference: laplacian_shot.py:88-98
    builds the same graph with sklearn + scipy.sparse)."""
    n = query.shape[-2]
    d2 = sq_euclidean(query, query)
    # exclude self: a masked where, NOT eye * inf (0 * inf = NaN would poison
    # every off-diagonal distance)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    _, idx = jax.lax.top_k(-d2, knn - 1)                          # [..., n, knn-1]
    w = jax.nn.one_hot(idx, n, dtype=jnp.float32).sum(axis=-2)    # [..., n, n]
    return w


@partial(jax.jit, static_argnames=("n_iter", "knn", "n_class", "norm_type"))
def laplacian_shot_infer(support, query, y_s, y_q, lmd,
                         n_iter: int, knn: int, n_class: int,
                         norm_type: str = "L2N"):
    """Returns (acc_trace [N, n_iter], Y [N, n, K])."""
    if norm_type == "CL2N":
        # centered L2: subtract the support mean before normalizing (the
        # reference's CL2N branch needs a train mean it never passes and
        # crashes; implemented here with the support mean, like BDCSPN)
        mean = jnp.mean(support, axis=1, keepdims=True)
        support = _l2_normalize(support - mean)
        query = _l2_normalize(query - mean)
    elif norm_type == "L2N":
        support = _l2_normalize(support)
        query = _l2_normalize(query)

    prototypes = support_class_means(support, y_s, n_class)       # [N, K, d]
    unary = sq_euclidean(query, prototypes)                       # [N, n, K]
    W = knn_affinity(query, knn)                                  # [N, n, n]

    def normalize_rows(z):
        return jax.nn.softmax(z, axis=-1)

    def energy(Y):
        pairwise = f32_einsum("tij,tjk->tik", W, Y)
        e = (
            Y * jnp.log(jnp.maximum(Y, 1e-20))
            + unary * Y
            - lmd * pairwise * Y
        )
        return jnp.sum(e, axis=(1, 2))                            # [N]

    Y0 = normalize_rows(-unary)
    n_task = query.shape[0]
    oldE0 = jnp.full((n_task,), jnp.inf, jnp.float32)
    done0 = jnp.zeros((n_task,), bool)

    def step(carry, i):
        Y, oldE, done = carry
        WY = f32_einsum("tij,tjk->tik", W, Y)
        Y_new = normalize_rows(-unary + lmd * WY)
        E = energy(Y_new)
        converged = jnp.logical_and(
            i > 1, jnp.abs(E - oldE) <= 1e-6 * jnp.abs(oldE)
        )
        # freeze tasks that converged on a previous iteration
        Y = jnp.where(done[:, None, None], Y, Y_new)
        oldE = jnp.where(done, oldE, E)
        done = jnp.logical_or(done, converged)
        preds = jnp.argmax(Y, axis=-1)
        acc = jnp.mean((preds == y_q).astype(jnp.float32), axis=1)
        return (Y, oldE, done), acc

    (Y, _, _), acc_trace = jax.lax.scan(
        step, (Y0, oldE0, done0), jnp.arange(n_iter)
    )
    return jnp.transpose(acc_trace), Y                            # [N, iter]


class LAPLACIAN_SHOT(FewShotMethod):
    def run_task(self, task_dic, shot=None):
        support, query, y_s, y_q, _ = self._prepare_few_shot(task_dic)
        self._log(f" ==> Executing LAPLACIAN SHOT with lmd = {self.args.lmd}")
        t0 = time.perf_counter()
        acc_trace, Y = laplacian_shot_infer(
            support,
            query,
            jnp.asarray(y_s, jnp.int32),
            jnp.asarray(y_q, jnp.int32),
            jnp.float32(self.args.lmd),
            n_iter=int(self.args.iter),
            knn=int(self.args.knn),
            n_class=int(self.args.num_classes_test),
            norm_type=str(self.args.norm_type),
        )
        acc_trace = np.asarray(device_sync(acc_trace))
        elapsed = time.perf_counter() - t0
        preds = np.asarray(jnp.argmax(Y, axis=-1))
        return {
            "acc": acc_trace,                                     # [N, iter]
            "preds": preds,
            "criterions": np.zeros((int(self.args.iter),), np.float32),
            "timestamps": elapsed / query.shape[0],
        }
