"""Device mesh construction.

The workload's parallel axes (SURVEY.md §2.2):

* ``dp`` — task data parallelism: the [n_task, ...] leading axis shards
  across chips; the only cross-chip communication is the final accuracy
  reduction.
* ``tp`` — class/feature tensor parallelism: for ImageNet-scale state
  (alpha: [n_task, 1000, 1000]) the trailing feature axis shards across
  chips; row-sum digammas and Dirichlet-logit contractions psum over ICI.

There is no model training, hence no pp/ep; sequence parallelism has no
counterpart (CLIP runs at fixed short lengths).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def choose_layout(n_devices: int, n_class: int, max_tp: int = 8):
    """Pick (dp, tp) with dp * tp == n_devices and tp dividing n_class.

    Prefers pure task-DP (tp=1) — zero communication — and grows tp only as
    needed to keep per-device alpha state reasonable for large n_class.
    """
    if n_class >= 512:
        # large-K regime: give the class axis as many chips as divide evenly
        for tp in range(min(max_tp, n_devices), 0, -1):
            if n_devices % tp == 0 and n_class % tp == 0:
                return n_devices // tp, tp
    return n_devices, 1


def make_mesh(n_devices=None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % tp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by tp={tp}")
    grid = np.asarray(devices[:n_devices]).reshape(n_devices // tp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))
