"""Batched auction algorithm for the cluster->class assignment, fully on
device.

The host path (ops/matching.py) solves the rectangular LAP with the C++ JV
solver once per task batch. This jittable Jacobi auction (Bertsekas 1988)
lets the whole zero-shot accuracy path stay on device: all unassigned
persons bid simultaneously for their best object (top-2 margin + eps),
objects take the highest bid, and at termination the assignment satisfies
eps-complementary slackness, i.e. total value >= optimum - R*eps.

Termination: the auction starts from zero prices (required for the
rectangular C > R guarantee — carrying prices across epsilon-scaling phases
is provably wrong here because unassigned objects keep inflated prices) and
runs one phase. Near-exact ties on square instances degenerate into price
wars advancing eps per round; measured worst case (5x5, values quantized to
a 0.25 grid) is ~4e4 rounds of tiny [R, C] element-wise work, so the
default iteration budget absorbs it. Rectangular tie-heavy instances
terminate in a handful of rounds (spare objects break wars). Exercised
adversarially in tests/test_auction.py's randomized quantized sweep.

Shapes are static: R persons (cluster rows), C >= R objects (classes),
vmapped over tasks. Select with ``matching_backend: 'device'`` (the default
resolves to this on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _auction_single(values, eps: float, max_iters: int):
    """values: [R, C] (maximize). Returns col4row [R] int32."""
    R, C = values.shape

    def person_assigned(owner):
        # owner: [C] person index or -1
        hit = jnp.zeros((R + 1,), jnp.int32).at[
            jnp.where(owner >= 0, owner, R)
        ].max(1)
        return hit[:R] > 0

    def body(state):
        price, owner, it = state
        assigned = person_assigned(owner)                       # [R]
        net = values - price[None, :]                           # [R, C]
        best_j = jnp.argmax(net, axis=1)                        # [R]
        b1 = jnp.max(net, axis=1)
        masked = net.at[jnp.arange(R), best_j].set(-jnp.inf)
        b2 = jnp.max(masked, axis=1)
        b2 = jnp.where(jnp.isfinite(b2), b2, b1)                # C == 1 case
        bids = price[best_j] + (b1 - b2) + eps                  # [R]
        bids = jnp.where(assigned, -jnp.inf, bids)

        # per-object max bid via scatter-max
        best_bid = jnp.full((C,), -jnp.inf).at[best_j].max(bids)
        has_bid = jnp.isfinite(best_bid)
        # winner: lowest-index person whose bid equals the object's best
        is_winner = (
            (bids[:, None] == best_bid[None, :])
            & (best_j[:, None] == jnp.arange(C)[None, :])
            & jnp.isfinite(bids)[:, None]
        )                                                       # [R, C]
        winner = jnp.argmax(is_winner, axis=0)                  # [C]

        price = jnp.where(has_bid, best_bid, price)
        owner = jnp.where(has_bid, winner.astype(jnp.int32), owner)
        return price, owner, it + 1

    def cond(state):
        _, owner, it = state
        return jnp.logical_and(
            jnp.logical_not(jnp.all(person_assigned(owner))), it < max_iters
        )

    price0 = jnp.zeros((C,), values.dtype)
    owner0 = jnp.full((C,), -1, jnp.int32)
    _, owner, _ = jax.lax.while_loop(cond, body, (price0, owner0, 0))

    # invert: col4row[i] = object owned by person i
    col4row = jnp.full((R + 1,), -1, jnp.int32).at[
        jnp.where(owner >= 0, owner, R)
    ].max(jnp.arange(C, dtype=jnp.int32))
    return col4row[:R]


@partial(jax.jit, static_argnames=("eps", "max_iters"))
def auction_assign(values, eps: float = 1e-5, max_iters: int = 200_000):
    """Batched max-value assignment. values: [N, R, C] -> col4row [N, R].

    Optimality gap <= R*eps at termination. ``max_iters`` bounds the
    tie-driven worst case (see module docstring); typical continuous-valued
    instances terminate in tens of rounds.
    """
    return jax.vmap(lambda v: _auction_single(v, eps, max_iters))(values)
