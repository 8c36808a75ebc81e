"""EM-Gaussian with per-class diagonal precision.

Adds a per-cluster diagonal precision `s` estimated in closed form each
iteration (reference: src/methods/zero_shot/em_gaussian_cov.py:98-257).

TPU note: both the precision-weighted distance and the weighted second
moment are expanded into batched matmuls so no [N, n, K, C] temporary is
materialized:
  sum_d s_kd (x_nd - w_kd)^2 = (x^2) @ s^T - 2 x @ (s*w)^T + sum_d s*w^2
  sum_n u_nk (x_nd - w_kd)^2 = u^T (x^2) - 2 w * (u^T x) + counts * w^2
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS
from ..base import TransductiveMethod, init_soft_assignments
from .soft_kmeans import weighted_centroids
from ...ops.precision import f32_einsum


def _weighted_sq_dev(u, query, query_sq, w):
    """d_q[t, k, d] = sum_n u[t,n,k] * (w[t,k,d] - x[t,n,d])^2."""
    counts = jnp.sum(u, axis=1)                                   # [N, K]
    ux = f32_einsum("tnk,tnd->tkd", u, query)
    ux2 = f32_einsum("tnk,tnd->tkd", u, query_sq)
    return ux2 - 2.0 * w * ux + counts[..., None] * w * w


def _precision_logits(query, query_sq, w, s):
    """-1/2 sum_d s_kd (x_nd - w_kd)^2 as matmuls -> [N, n, K]."""
    xs = f32_einsum("tnd,tkd->tnk", query_sq, s)
    xsw = f32_einsum("tnd,tkd->tnk", query, s * w)
    sw2 = jnp.sum(s * w * w, axis=-1)[:, None, :]
    return -0.5 * (xs - 2.0 * xsw + sw2)


@partial(jax.jit, static_argnames=("n_iter",))
def em_gaussian_cov_infer(query, u0, lambd, n_iter: int):
    n_task, n_query, n_class = u0.shape
    query_sq = query * query
    w0 = weighted_centroids(u0, query)
    d0 = jnp.maximum(_weighted_sq_dev(u0, query, query_sq, w0), EPS)
    s0 = jnp.sum(u0, axis=1)[..., None] / d0
    v0 = jnp.zeros((n_task, n_class), jnp.float32)

    def step(carry, _):
        u, v, w, s = carry
        w = weighted_centroids(u, query, w_prev=w)
        # precision update, keeping previous values for empty clusters
        counts = jnp.sum(u, axis=1)
        d_q = jnp.maximum(_weighted_sq_dev(u, query, query_sq, w), EPS)
        s_new = counts[..., None] / d_q
        s = jnp.where((counts > EPS)[..., None], s_new, s)
        # assignments with the log-determinant term
        logits = _precision_logits(query, query_sq, w, s)
        det = 0.5 * jnp.sum(jnp.log(s + EPS), axis=-1)[:, None, :]
        u_new = jax.nn.softmax(
            logits + det + lambd * v[:, None, :] / n_query, axis=2
        )
        v = jnp.log(jnp.mean(u_new, axis=1) + EPS) + 1.0
        crit = jnp.mean(
            jnp.linalg.norm((u_new - u).reshape(n_task, -1), axis=-1)
        )
        return (u_new, v, w, s), crit

    (u, _, _, _), criterions = jax.lax.scan(
        step, (u0, v0, w0, s0), None, length=n_iter
    )
    return u, criterions


class EM_GAUSSIAN_COV(TransductiveMethod):
    acc_mode = "clustering"

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        self.lambd = float(int(args.num_classes_test / 5) * args.n_query)

    def _infer(self, task):
        self._log(f" ==> Executing EM-GAUSSIAN-COV with T = {self.args.T}")
        u0 = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return em_gaussian_cov_infer(
            task["x_q"], u0, jnp.float32(self.lambd), n_iter=int(self.args.iter)
        )
