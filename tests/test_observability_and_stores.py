import os

import numpy as np
import pytest

from transductive_clip_tpu.core.config import load_full_config
from transductive_clip_tpu.core.profiling import PhaseTimer, trace_if_requested
from transductive_clip_tpu.eval import EvaluatorZeroShot
from transductive_clip_tpu.features.cache import save_feature_cache
from transductive_clip_tpu.features.store import open_store

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_ROOT = os.path.join(REPO, "config")


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.summary() and "b:" in t.summary()


def test_trace_if_requested_noop():
    with trace_if_requested(None):
        x = 1
    assert x == 1


@pytest.mark.parametrize("kind", ["plk", "npz", "orbax"])
def test_feature_stores_roundtrip(tmp_path, kind, rng):
    store = open_store(kind)
    feats = rng.normal(size=(10, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 10)
    path = str(tmp_path / f"feats{store.suffix}")
    store.save(path, feats, labels)
    f2, l2 = store.load(path)
    np.testing.assert_allclose(f2, feats, rtol=1e-6)
    np.testing.assert_array_equal(l2, labels)


@pytest.mark.slow  # method-level dp-vs-single parity is covered in test_parallel
def test_data_parallel_evaluation_matches_single_device(tmp_path, monkeypatch, rng):
    """Evaluator with data_parallel=True on the 8-device CPU mesh must give
    the same accuracies as single-device execution."""
    monkeypatch.chdir(tmp_path)
    feats, labels = [], []
    for c in range(10):
        a = np.ones(10)
        a[c] += 60
        feats.append(rng.dirichlet(a, size=40).astype(np.float32))
        labels.append(np.full(40, c, np.int64))
    feats, labels = np.concatenate(feats), np.concatenate(labels)

    accs = {}
    for dp in (False, True):
        cfg = load_full_config(
            opts=["dataset", "eurosat", "method", "hard_em_dirichlet",
                  "shots", "0", "number_tasks", "8", "batch_size", "8",
                  "n_query", "30", "seed", "3", "iter", "5",
                  "iter_mm", "100", "save_results", "False"],
            config_root=CONFIG_ROOT,
        )
        cfg.data_parallel = dp
        ev = EvaluatorZeroShot(args=cfg)
        accs[dp], _ = ev.evaluate_tasks(feats, labels)
    assert accs[True] == pytest.approx(accs[False], abs=1e-6)
    assert accs[True] > 0.9


@pytest.mark.slow  # the profiler takes minutes on this tunneled platform
def test_profile_dir_writes_trace(tmp_path, monkeypatch, rng):
    import jax
    import jax.numpy as jnp

    prof = tmp_path / "prof"
    with trace_if_requested(str(prof)):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert any(prof.rglob("*")), "profiler produced no files"


def test_reference_torch_cache_loads(tmp_path, rng):
    """Caches written by the torch reference (torch tensors in the pickle)
    must load transparently."""
    torch = pytest.importorskip("torch")
    import pickle

    from transductive_clip_tpu.features.cache import load_feature_cache

    feats = torch.rand(10, 4)
    labels = torch.arange(10)
    path = str(tmp_path / "test_softmax_RN50_T30.plk")
    with open(path, "wb") as f:
        pickle.dump({"concat_features": feats, "concat_labels": labels}, f)
    f2, l2 = load_feature_cache(path)
    assert f2.dtype == np.float32 and l2.dtype == np.int64
    np.testing.assert_allclose(f2, feats.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(l2, labels.numpy())


class _TorchImportBlocker:
    """meta_path finder that makes ``import torch*`` raise
    ModuleNotFoundError, simulating a core-deps-only install."""

    def find_spec(self, name, path=None, target=None):
        if name == "torch" or name.startswith("torch."):
            raise ModuleNotFoundError(f"No module named {name!r} (blocked)")
        return None


def test_reference_torch_cache_loads_without_torch(tmp_path, monkeypatch):
    """A production install has no torch (test-only extra in pyproject), yet
    reference-written ``.plk`` caches must still load byte-for-byte: the
    torch-free unpickler reroutes ``torch._utils._rebuild_tensor_v2`` /
    ``torch.storage._load_from_bytes`` to numpy reconstruction
    (core/io.py; reference cache writer: src/utils.py:299-306)."""
    torch = pytest.importorskip("torch")
    import pickle
    import sys

    from transductive_clip_tpu.features.cache import load_feature_cache

    g = torch.Generator().manual_seed(0)
    feats = torch.rand(10, 4, generator=g)
    labels = torch.arange(10)
    # exercise the non-trivial reconstruction paths too: non-contiguous
    # (transpose), storage-offset (slice view), and non-float dtypes
    extras = {
        "t_t": feats.t(),
        "sliced": feats[3:7],
        "half": feats.half(),
        "bf16": feats.bfloat16(),
        "bool": labels % 2 == 0,
        "scalar": torch.tensor(3.5),
    }
    expected = {k: v.float().numpy() if v.dtype == torch.bfloat16
                else v.numpy() for k, v in extras.items()}
    path = str(tmp_path / "test_softmax_RN50_T30.plk")
    with open(path, "wb") as f:
        pickle.dump({"concat_features": feats, "concat_labels": labels,
                     **extras}, f)

    # hide torch: purge every cached torch module and block re-import
    for name in [m for m in sys.modules if m == "torch" or m.startswith("torch.")]:
        monkeypatch.delitem(sys.modules, name, raising=False)
    monkeypatch.setattr(sys, "meta_path", [_TorchImportBlocker()] + sys.meta_path)
    with pytest.raises(ModuleNotFoundError):
        import torch  # noqa: F811 -- proves the block is effective

    f2, l2 = load_feature_cache(path)
    assert f2.dtype == np.float32 and l2.dtype == np.int64
    np.testing.assert_array_equal(f2, feats.numpy())
    np.testing.assert_array_equal(l2, labels.numpy())

    from transductive_clip_tpu.core.io import load_pickle

    loaded = load_pickle(path)
    for k, exp in expected.items():
        got = loaded[k]
        assert got.dtype == exp.dtype, (k, got.dtype, exp.dtype)
        np.testing.assert_array_equal(got, exp, err_msg=k)


def test_cache_conversion_script(tmp_path, rng):
    import subprocess
    import sys

    from transductive_clip_tpu.features.store import open_store

    feats = rng.normal(size=(6, 3)).astype(np.float32)
    labels = rng.integers(0, 2, 6)
    src = str(tmp_path / "a.plk")
    dst = str(tmp_path / "a.npz")
    open_store("plk").save(src, feats, labels)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convert_feature_cache.py"),
         src, dst],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    f2, l2 = open_store("npz").load(dst)
    np.testing.assert_allclose(f2, feats, rtol=1e-6)
    np.testing.assert_array_equal(l2, labels)
