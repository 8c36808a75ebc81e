"""Small shared tensor ops."""

from __future__ import annotations

import jax.numpy as jnp

# Matches the epsilon used throughout the reference methods
# (reference: src/methods/zero_shot/em_dirichlet.py:20).
EPS = 1e-15
# the TIM loss epsilon (reference: src/methods/few_shot/tim.py log/power guards);
# shared by the autodiff loss, the closed-form gradient, and the Pallas kernel,
# whose equivalence depends on using one value
TIM_EPS = 1e-12


def get_one_hot(y, n_class, dtype=jnp.float32):
    """One-hot encode integer labels [..., n] -> [..., n, n_class]."""
    return (y[..., None] == jnp.arange(n_class, dtype=y.dtype)).astype(dtype)


def l2_normalize(x, axis=-1, eps=1e-12):
    """Row-normalize to unit L2 norm (zero rows stay finite)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def device_sync(x):
    """Block until ``x`` is computed.

    ``block_until_ready`` returns immediately on some remote/tunneled
    backends (observed on the axon TPU plugin), so timing and completion
    barriers instead force a scalar reduction + host transfer, which cannot
    complete before the producing computation does.
    """
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))
    return x


def constrainer(mesh):
    """Build a sharding-constraint function for ``mesh``.

    Returns ``con(x, *axis_names)`` placing ``x`` with
    ``PartitionSpec(*axis_names)`` on ``mesh`` — or the identity when mesh is
    None, so single-chip and multi-chip code paths share one implementation
    (the jitted math is annotated once; GSPMD inserts the collectives when a
    mesh is live).
    """
    if mesh is None:
        return lambda x, *spec: x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def con(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    return con
