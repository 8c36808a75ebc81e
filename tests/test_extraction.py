"""Feature-extraction pipeline test with a stub encoder (no CLIP weights
are available offline; the extraction logic is what's under test)."""

import json
import os

import numpy as np
import pytest

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.eval.extraction import ensure_features, get_text_features
from transductive_clip_tpu.features.cache import load_feature_cache


class StubModel:
    """Deterministic fake towers: image embedding = f(image mean), text
    prototypes = unit basis directions."""

    def __init__(self, dim=8):
        self.dim = dim

    def encode_image_batch(self, images):
        b = images.shape[0]
        seeds = images.reshape(b, -1)[:, : self.dim]
        return seeds + 0.1

    def encode_text_prompts(self, prompts):
        out = np.zeros((len(prompts), self.dim), np.float32)
        for i in range(len(prompts)):
            out[i, i % self.dim] = 1.0
        return out


@pytest.fixture
def image_dataset(tmp_path, monkeypatch):
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    root = "data/eurosat"
    img_dir = os.path.join(root, "images", "classA")
    os.makedirs(img_dir)
    split = {"train": [], "val": [], "test": []}
    for split_name in split:
        for c in range(3):
            for i in range(4):
                name = f"classA/{split_name}_{c}_{i}.jpg"
                Image.fromarray(
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                ).save(os.path.join(root, "images", name))
                split[split_name].append([name, c, f"class {c}"])
    with open(os.path.join(root, "split_zhou_EuroSAT.json"), "w") as f:
        json.dump(split, f)
    return root


def test_ensure_features_softmax(image_dataset):
    cfg = CfgNode(
        dict(dataset="eurosat", dataset_path=image_dataset, backbone="RN50",
             T=30, use_softmax_feature=True, root="data",
             extract_batch_size=5)
    )
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    ensure_features(cfg, StubModel(), make_preprocess(16), splits=("test",))
    path = "data/eurosat/saved_features/test_softmax_RN50_T30.plk"
    feats, labels = load_feature_cache(path)
    assert feats.shape == (12, 3)                 # K=3 classes -> 3-dim simplex
    np.testing.assert_allclose(feats.sum(-1), 1.0, rtol=1e-5)
    assert labels.shape == (12,)
    # idempotent: second call must not re-extract (cache hit)
    mtime = os.path.getmtime(path)
    ensure_features(cfg, None, None, splits=("test",))
    assert os.path.getmtime(path) == mtime


def test_ensure_features_visual(image_dataset):
    cfg = CfgNode(
        dict(dataset="eurosat", dataset_path=image_dataset, backbone="RN50",
             T=30, use_softmax_feature=False, root="data",
             extract_batch_size=4)
    )
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    ensure_features(cfg, StubModel(), make_preprocess(16), splits=("val",))
    feats, labels = load_feature_cache(
        "data/eurosat/saved_features/val_visual_RN50.plk"
    )
    assert feats.shape == (12, 8)                 # embedding dim
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-5)


def test_get_text_features_cached(image_dataset):
    cfg = CfgNode(
        dict(dataset="eurosat", dataset_path=image_dataset, backbone="RN50",
             T=30, use_softmax_feature=True, root="data")
    )
    tf = get_text_features(cfg, StubModel())
    assert tf.shape == (3, 8)
    # second call comes from cache, no model needed
    tf2 = get_text_features(cfg, None)
    np.testing.assert_array_equal(tf, tf2)


def test_missing_model_raises(image_dataset):
    cfg = CfgNode(
        dict(dataset="eurosat", dataset_path=image_dataset, backbone="RN50",
             T=30, use_softmax_feature=True, root="data")
    )
    with pytest.raises(ValueError, match="CLIP model"):
        ensure_features(cfg, None, None, splits=("test",))


def test_disk_to_evaluator_end_to_end(image_dataset):
    """Images on disk -> build_dataset -> threaded decode -> stub towers ->
    feature cache -> zero-shot evaluator, in one flow (the reference's
    run_full_evaluation path, src/eval_zero_shot.py:44-111)."""
    from transductive_clip_tpu.core.config import load_full_config
    from transductive_clip_tpu.eval.zero_shot import EvaluatorZeroShot
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    args = load_full_config(
        opts=["dataset", "eurosat", "method", "hard_kmeans", "shots", "0",
              "number_tasks", "4", "batch_size", "2", "n_query", "6",
              "backbone", "RN50", "T", "30", "num_classes_test", "3",
              "k_eff_min", "2", "k_eff_max", "3", "iter", "3",
              "save_results", "False"],
        config_root=os.path.join(os.path.dirname(__file__), "..", "config"),
    )
    args.dataset_path = image_dataset
    args.root = "data"

    ev = EvaluatorZeroShot(args=args)
    acc, ci = ev.run_full_evaluation(
        model=StubModel(), preprocess=make_preprocess(16, dtype="uint8")
    )
    assert 0.0 <= acc <= 1.0 and np.isfinite(ci)
    assert os.path.exists("data/eurosat/saved_features/test_softmax_RN50_T30.plk")


def test_feature_store_backend_end_to_end(image_dataset):
    """feature_store='npz' routes extraction AND the evaluator through the
    npz backend (suffix-dispatched; no pickle involved)."""
    from transductive_clip_tpu.core.config import load_full_config
    from transductive_clip_tpu.eval.zero_shot import EvaluatorZeroShot
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    args = load_full_config(
        opts=["dataset", "eurosat", "method", "hard_kmeans", "shots", "0",
              "number_tasks", "2", "batch_size", "2", "n_query", "6",
              "backbone", "RN50", "T", "30", "num_classes_test", "3",
              "k_eff_min", "2", "k_eff_max", "3", "iter", "3",
              "save_results", "False", "feature_store", "npz"],
        config_root=os.path.join(os.path.dirname(__file__), "..", "config"),
    )
    args.dataset_path = image_dataset
    args.root = "data"

    ev = EvaluatorZeroShot(args=args)
    acc, ci = ev.run_full_evaluation(
        model=StubModel(), preprocess=make_preprocess(16)
    )
    assert 0.0 <= acc <= 1.0
    assert os.path.exists("data/eurosat/saved_features/test_softmax_RN50_T30.npz")
    assert not os.path.exists("data/eurosat/saved_features/test_softmax_RN50_T30.plk")


def test_multi_temperature_extraction(image_dataset):
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    cfg = CfgNode(
        dict(dataset="eurosat", dataset_path=image_dataset, backbone="RN50",
             T=30, use_softmax_feature=True, root="data",
             extract_batch_size=6)
    )
    ensure_features(cfg, StubModel(), make_preprocess(16), splits=("test",),
                    list_T=[10, 30, 50])
    for T in (10, 30, 50):
        feats, labels = load_feature_cache(
            f"data/eurosat/saved_features/test_softmax_RN50_T{T}.plk"
        )
        assert feats.shape == (12, 3)
    # sharper temperature -> more peaked distributions
    f10, _ = load_feature_cache("data/eurosat/saved_features/test_softmax_RN50_T10.plk")
    f50, _ = load_feature_cache("data/eurosat/saved_features/test_softmax_RN50_T50.plk")
    assert f50.max(-1).mean() > f10.max(-1).mean()
