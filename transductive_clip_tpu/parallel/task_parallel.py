"""Multi-chip execution of the transductive methods.

Strategy: GSPMD. Inputs are placed with named shardings (tasks over ``dp``,
the class/feature axis over ``tp``) and the jitted EM loop carries
``with_sharding_constraint`` annotations on its state so XLA keeps alpha
distributed and inserts the psum/all-gather collectives (row-sum digammas,
logit contractions) over ICI. No NCCL-style code: the collectives are
compiled into the same program as the math.

The multi-chip path IS the production path: ``distributed_em_dirichlet``
delegates to ``em_dirichlet_infer`` (methods/zero_shot/em_dirichlet.py) with
a mesh, so the Pallas/Minka solvers, cluster compaction, and early stopping
all compose with (dp, tp) sharding. Evaluators reach it through
``EvaluatorZeroShot``/``EvaluatorFewShot`` with ``data_parallel: True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_task_batch(tree, mesh: Mesh):
    """Place [n_task, ...] arrays with the task axis sharded over dp."""

    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def distributed_em_dirichlet(query, lambd, mesh: Mesh, n_iter: int = 20,
                             iter_mm: int = 1000, hard: bool = False,
                             solver: str = "mm", compact: bool = False,
                             early_stop: bool = False):
    """EM-Dirichlet over a (dp, tp) mesh.

    query: [N, n, K] softmax features. N shards over dp; the trailing
    feature axis of alpha ([N, K, K]) shards over tp, so per-device state is
    N/dp * K * K/tp. Returns (u [N, n, K], criterions [n_iter]).
    """
    from ..methods.zero_shot.em_dirichlet import em_dirichlet_infer

    query = jax.device_put(
        jnp.asarray(query, jnp.float32), NamedSharding(mesh, P("dp", None, None))
    )
    return em_dirichlet_infer(
        query, jnp.float32(lambd), n_iter=n_iter, iter_mm=iter_mm, hard=hard,
        solver=solver, compact=compact, early_stop=early_stop, mesh=mesh,
    )
