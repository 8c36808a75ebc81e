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


def test_dryrun_multichip_self_provisions_driver_convention():
    """The driver calls dryrun_multichip in a plain environment with a
    single-device backend — no conftest re-exec, no XLA_FLAGS. It must
    provision the 8-device virtual CPU mesh itself (subprocess re-exec)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("_TCLIP_TESTS_REEXECED", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    # 1 CPU device, like the driver's 1 TPU device (without claiming the TPU)
    env["JAX_PLATFORM_NAME"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout
    # artifact-tail contract (the driver records the output tail): the ok
    # line must be the LAST stdout line — AOT-rejection spam is quarantined
    # by utils/compile_cache.py and re-emitted to stderr before it
    last = proc.stdout.strip().splitlines()[-1]
    assert last.startswith("dryrun_multichip ok"), proc.stdout[-500:]
    # the artifact attests mesh/single-device parity, not just liveness
    assert "parity=exact" in last, last
    assert "cpu_aot_loader" not in proc.stdout
    assert "cpu_aot_loader" not in proc.stderr


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
        clip_jax.load("RN34")
