"""EM-Gaussian with per-class diagonal precision.

Adds a per-cluster diagonal precision `s` estimated in closed form each
iteration (reference: src/methods/zero_shot/em_gaussian_cov.py:98-257).

Two implementations of the precision-weighted distances
(``gaussian_cov_dist_impl`` config):

* ``direct`` (default) — the reference's (x - w)^2 form, evaluated in
  class chunks so the [N, n, K, C] temporary never fully materializes.
  Numerically faithful: near-empty clusters drive s toward 1/EPS, where
  the direct form multiplies the huge precision by an exactly-zero
  squared deviation.
* ``matmul`` — MXU expansion
    sum_d s_kd (x_nd - w_kd)^2 = (x^2) @ s^T - 2 x @ (s*w)^T + sum_d s*w^2
  (and similarly for the weighted second moment). Faster, but the three
  terms are each ~s-magnitude and cancel: with degenerate clusters
  (s ~ 1/EPS) the cancellation is catastrophic and assignments can flip
  vs the reference. Equivalence with ``direct`` is tested in the
  well-conditioned regime.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS
from ..base import TransductiveMethod, init_soft_assignments
from .soft_kmeans import weighted_centroids
from ...ops.precision import f32_einsum

_CHUNK = 128
# bound on the [N, n, c, d] fp32 temporary the 'direct' (reference-shaped)
# path materializes per class chunk; the chunk width shrinks with the batch
# so peak memory stays flat regardless of task-batch shape (at the ImageNet
# protocol with 100-task batches: c=35 -> ~1 GB, vs ~3.8 GB at a fixed 128)
_CHUNK_BYTES = 1 << 30


def _chunk_width(n_task, n_query, d):
    c = _CHUNK_BYTES // max(1, 4 * n_task * n_query * d)
    return int(min(_CHUNK, max(8, c)))


def _weighted_sq_dev(u, query, query_sq, w):
    """d_q[t, k, d] = sum_n u[t,n,k] * (w[t,k,d] - x[t,n,d])^2 (matmuls)."""
    counts = jnp.sum(u, axis=1)                                   # [N, K]
    ux = f32_einsum("tnk,tnd->tkd", u, query)
    ux2 = f32_einsum("tnk,tnd->tkd", u, query_sq)
    return ux2 - 2.0 * w * ux + counts[..., None] * w * w


def _weighted_sq_dev_direct(u, query, w):
    """Reference-shaped (x - w)^2 form, chunked over classes
    (reference: em_gaussian_cov.py:172-181)."""
    outs = []
    chunk = _chunk_width(*query.shape)
    for c0 in range(0, w.shape[1], chunk):
        wc = w[:, c0:c0 + chunk]                                  # [N, c, d]
        diff = wc[:, None, :, :] - query[:, :, None, :]           # [N, n, c, d]
        outs.append(
            f32_einsum("tnk,tnkd->tkd", u[:, :, c0:c0 + chunk], diff * diff)
        )
    return jnp.concatenate(outs, axis=1)


def _precision_logits(query, query_sq, w, s):
    """-1/2 sum_d s_kd (x_nd - w_kd)^2 as matmuls -> [N, n, K]."""
    xs = f32_einsum("tnd,tkd->tnk", query_sq, s)
    xsw = f32_einsum("tnd,tkd->tnk", query, s * w)
    sw2 = jnp.sum(s * w * w, axis=-1)[:, None, :]
    return -0.5 * (xs - 2.0 * xsw + sw2)


def _precision_logits_direct(query, w, s):
    """Reference-shaped -1/2 sum_d s_kd (x_nd - w_kd)^2, chunked over
    classes (reference: em_gaussian_cov.py:106-115)."""
    outs = []
    chunk = _chunk_width(*query.shape)
    for c0 in range(0, w.shape[1], chunk):
        wc = w[:, c0:c0 + chunk]
        sc = s[:, c0:c0 + chunk]
        diff = query[:, :, None, :] - wc[:, None, :, :]           # [N, n, c, d]
        outs.append(jnp.sum(diff * diff * sc[:, None, :, :], axis=-1))
    return -0.5 * jnp.concatenate(outs, axis=2)


@partial(jax.jit, static_argnames=("n_iter", "dist_impl"))
def em_gaussian_cov_infer(query, u0, lambd, n_iter: int,
                          dist_impl: str = "direct"):
    n_task, n_query, n_class = u0.shape
    query_sq = query * query
    direct = dist_impl == "direct"

    def sq_dev(u, w):
        if direct:
            return _weighted_sq_dev_direct(u, query, w)
        return _weighted_sq_dev(u, query, query_sq, w)

    w0 = weighted_centroids(u0, query)
    d0 = jnp.maximum(sq_dev(u0, w0), EPS)
    s0 = jnp.sum(u0, axis=1)[..., None] / d0
    v0 = jnp.zeros((n_task, n_class), jnp.float32)

    def step(carry, _):
        u, v, w, s = carry
        w = weighted_centroids(u, query, w_prev=w)
        # precision update, keeping previous values for empty clusters
        counts = jnp.sum(u, axis=1)
        d_q = jnp.maximum(sq_dev(u, w), EPS)
        s_new = counts[..., None] / d_q
        s = jnp.where((counts > EPS)[..., None], s_new, s)
        # assignments with the log-determinant term
        if direct:
            logits = _precision_logits_direct(query, w, s)
        else:
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
            task["x_q"], u0, jnp.float32(self.lambd),
            n_iter=int(self.args.iter),
            dist_impl=str(self.args.get("gaussian_cov_dist_impl", "direct")),
        )
