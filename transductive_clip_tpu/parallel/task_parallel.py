"""Multi-chip execution of the transductive methods.

Strategy: GSPMD. Inputs are placed with named shardings (tasks over ``dp``,
the class/feature axis over ``tp``) and the jitted EM loop carries
``with_sharding_constraint`` annotations on its state so XLA keeps alpha
distributed and inserts the psum/all-gather collectives (row-sum digammas,
logit contractions) over ICI. No NCCL-style code: the collectives are
compiled into the same program as the math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.common import EPS, get_one_hot
from ..ops.dirichlet import dirichlet_log_pdf, mm_update_alpha, weighted_log_means


def shard_task_batch(tree, mesh: Mesh):
    """Place [n_task, ...] arrays with the task axis sharded over dp."""

    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def distributed_em_dirichlet(query, lambd, mesh: Mesh, n_iter: int = 20,
                             iter_mm: int = 1000, hard: bool = False):
    """EM-Dirichlet over a (dp, tp) mesh.

    query: [N, n, K] softmax features. N shards over dp; the trailing class/
    feature axis of alpha ([N, K, K]) shards over tp, so per-device state is
    N/dp * K * K/tp. Returns (u [N, n, K], criterions [n_iter]).
    """
    q_sharding = NamedSharding(mesh, P("dp", None, "tp"))
    alpha_spec = P("dp", None, "tp")
    u_spec = P("dp", None, None)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    @partial(jax.jit, static_argnames=("n_iter", "iter_mm", "hard"))
    def run(query, lambd, n_iter, iter_mm, hard):
        n_task, n_query, n_class = query.shape
        log_query = jnp.log(query + EPS)
        u0 = constrain(query, u_spec)
        v0 = jnp.zeros((n_task, n_class), jnp.float32)
        alpha0 = constrain(
            jnp.ones((n_task, n_class, n_class), jnp.float32), alpha_spec
        )

        def step(carry, _):
            u, v, alpha_old = carry
            y_cst, nonzero = weighted_log_means(u, log_query, eps=EPS)
            y_cst = constrain(y_cst, alpha_spec)
            alpha = mm_update_alpha(alpha_old, y_cst, iter_mm=iter_mm)
            alpha = constrain(jnp.where(nonzero, alpha, alpha_old), alpha_spec)
            v = jnp.log(jnp.mean(u, axis=1) + EPS) + 1.0
            logits = dirichlet_log_pdf(log_query, alpha)
            u = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
            if hard:
                u = get_one_hot(jnp.argmax(u, axis=-1), n_class)
            u = constrain(u, u_spec)
            diff = jnp.linalg.norm((alpha_old - alpha).reshape(n_task, -1), axis=-1)
            denom = jnp.linalg.norm(alpha_old.reshape(n_task, -1), axis=-1)
            return (u, v, alpha), jnp.mean(diff / denom)

        (u, _, _), criterions = jax.lax.scan(
            step, (u0, v0, alpha0), None, length=n_iter
        )
        return u, criterions

    query = jax.device_put(jnp.asarray(query, jnp.float32), q_sharding)
    return run(query, jnp.float32(lambd), n_iter, iter_mm, hard)
