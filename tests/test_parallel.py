"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transductive_clip_tpu.methods.zero_shot.em_dirichlet import em_dirichlet_infer
from transductive_clip_tpu.parallel import (
    choose_layout,
    distributed_em_dirichlet,
    make_mesh,
    shard_task_batch,
)

from conftest import make_simplex_tasks


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_choose_layout():
    assert choose_layout(8, 10) == (8, 1)          # small K: pure task-DP
    dp, tp = choose_layout(8, 1000)                # ImageNet K: class TP
    assert dp * tp == 8 and 1000 % tp == 0 and tp > 1


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_distributed_em_dirichlet_matches_single_device(dp, tp):
    rng = np.random.default_rng(0)
    x, y = make_simplex_tasks(rng, n_task=8, n_query=24, n_class=8, k_eff=4)
    lambd = float(int(8 / 5) * 24)

    mesh = make_mesh(n_devices=dp * tp, tp=tp)
    u_dist, crit_dist = distributed_em_dirichlet(
        x, lambd, mesh, n_iter=4, iter_mm=100
    )
    u_ref, crit_ref = em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), n_iter=4, iter_mm=100, hard=False
    )
    np.testing.assert_allclose(
        np.asarray(u_dist), np.asarray(u_ref), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(crit_dist), np.asarray(crit_ref), rtol=2e-3, atol=1e-5
    )


def test_shard_task_batch_places_on_dp():
    mesh = make_mesh(n_devices=8, tp=1)
    x = np.zeros((16, 4, 4), np.float32)
    out = shard_task_batch({"x": x}, mesh)["x"]
    assert out.sharding.spec == jax.sharding.PartitionSpec("dp", None, None)
