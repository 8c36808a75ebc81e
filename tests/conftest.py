"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(task-DP x class-TP meshes) can be exercised without TPU hardware — the
TPU-native analog of a fake distributed backend.

Environment quirk: this machine's sitecustomize (axon TPU plugin) imports
jax at interpreter startup, before pytest loads conftest — too late to set
XLA_FLAGS or the platform. If the flags were not present at startup, we
re-exec the interpreter once with the right environment.
"""

import os
import sys

_WANT_FLAGS = "--xla_force_host_platform_device_count=8"


def _needs_reexec():
    if os.environ.get("_TCLIP_TESTS_REEXECED") == "1":
        return False
    flags = os.environ.get("XLA_FLAGS", "")
    return (
        _WANT_FLAGS not in flags
        or os.environ.get("JAX_PLATFORM_NAME") != "cpu"
        # the TPU plugin must not even REGISTER in the test interpreter:
        # when the tunneled TPU is unreachable, plugin/backend init hangs
        # indefinitely and wedges the whole (CPU-only) suite. sitecustomize
        # only registers it when PALLAS_AXON_POOL_IPS is set, so the re-exec
        # drops that variable.
        or os.environ.get("PALLAS_AXON_POOL_IPS") is not None
    )


if _needs_reexec():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _WANT_FLAGS).strip()
    env["JAX_PLATFORM_NAME"] = "cpu"  # the axon plugin ignores JAX_PLATFORMS
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU plugin in the suite
    env.pop("JAX_PLATFORMS", None)          # may be pinned to 'axon'
    env["_TCLIP_TESTS_REEXECED"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import jax

# persistent compilation cache: the suite is compile-bound on the single-core
# CPU backend; repeated runs hit the cache instead of recompiling.
# Keyed by hostname + CPU-feature fingerprint: the workspace moves between
# machines (sometimes sharing a hostname), and XLA:CPU AOT artifacts compiled
# for another host's CPU features would be rejected with noisy errors (or
# worse, SIGILL).
from transductive_clip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(jax)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_simplex_tasks(rng, n_task=4, n_query=40, n_class=8, k_eff=4,
                       concentration=60.0):
    """Synthetic separable zero-shot tasks (shared generator)."""
    from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

    return make_zero_shot_tasks(
        rng, n_task, n_query, n_class, k_eff=k_eff,
        concentration=concentration,
    )


@pytest.fixture
def simplex_tasks(rng):
    return make_simplex_tasks(rng)
