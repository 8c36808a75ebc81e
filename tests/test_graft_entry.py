"""The driver-run artifacts must keep working: entry() compiles, and
dryrun_multichip executes the sharded full step on the virtual device mesh."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def test_dryrun_multichip_on_virtual_mesh():
    import __graft_entry__ as g

    # asserts internally; reaching the end means the sharded step executed
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_load_gating(tmp_path, monkeypatch):
    from transductive_clip_tpu.models import clip as clip_jax

    monkeypatch.setenv("CLIP_WEIGHTS_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="RN50"):
        clip_jax.load("RN50")
    with pytest.raises(ValueError, match="backbone"):
        clip_jax.load("RN101")
