import numpy as np

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.tasks import (
    CategoriesSamplerFewShot,
    CategoriesSamplerZeroShot,
    SamplerQueryFewShot,
    SamplerQueryZeroShot,
    SamplerSupportFewShot,
    TasksGeneratorFewShot,
    TasksGeneratorZeroShot,
)


def make_labels(rng, n_class=10, per_class=30):
    return rng.permutation(np.repeat(np.arange(n_class), per_class))


def test_zero_shot_sampler_protocol(rng):
    labels = make_labels(rng)
    sampler = CategoriesSamplerZeroShot(
        n_batch=50, k_eff=5, n_class=10, n_query=75,
        force_query_size=True, rng=rng,
    )
    sampler.create_list_classes(labels)
    k_counts = []
    for idx in SamplerQueryZeroShot(sampler):
        assert len(idx) == 75                       # force_query_size honored
        classes = np.unique(labels[idx])
        k_counts.append(len(classes))
        assert 1 <= len(classes) <= 10
    # per-task k_eff redrawn in 3..10 regardless of the configured k_eff=5
    assert min(k_counts) >= 1 and max(k_counts) >= 6
    assert len(set(k_counts)) > 2


def test_zero_shot_sampler_determinism():
    labels = make_labels(np.random.default_rng(7))
    out = []
    for _ in range(2):
        rng = np.random.default_rng(123)
        sampler = CategoriesSamplerZeroShot(5, 5, 10, 20, True, rng=rng)
        sampler.create_list_classes(labels)
        out.append(np.concatenate(list(SamplerQueryZeroShot(sampler))))
    np.testing.assert_array_equal(out[0], out[1])


def test_few_shot_support_covers_all_classes(rng):
    labels_s = make_labels(rng)
    labels_q = make_labels(rng)
    sampler = CategoriesSamplerFewShot(
        n_batch=3, k_eff=4, n_class=10, s_shot=2, n_query=30,
        force_query_size=True, rng=rng,
    )
    sampler.create_list_classes(labels_s, labels_q)
    for idx in SamplerSupportFewShot(sampler):
        assert len(idx) == 20                       # n_class * shots
        counts = np.bincount(labels_s[idx], minlength=10)
        assert (counts == 2).all()                  # every class, `shots` each
    for idx in SamplerQueryFewShot(sampler):
        assert len(idx) == 30
        assert len(np.unique(labels_q[idx])) <= 4


def test_zero_shot_generator_shapes(rng):
    loader = [
        (rng.normal(size=(75, 10)).astype(np.float32), rng.integers(0, 10, 75))
        for _ in range(4)
    ]
    tasks = TasksGeneratorZeroShot(
        k_eff=5, n_query=75, n_class=10, loader_query=loader
    ).generate_tasks()
    assert tasks["x_q"].shape == (4, 75, 10)
    assert tasks["y_q"].shape == (4, 75, 1)


def test_few_shot_generator_label_remap_and_column_permutation(rng):
    """Labels are relabeled by descending class id and softmax feature columns
    permuted to match, so class j's probability mass sits in column j."""
    n_class, shots, n_query = 6, 2, 12
    args = CfgNode({"use_softmax_feature": True})
    y_s = np.repeat(np.arange(n_class), shots)
    x_s = np.eye(n_class, dtype=np.float32)[y_s]    # one-hot softmax features
    y_q = rng.integers(0, n_class, n_query)
    x_q = np.eye(n_class, dtype=np.float32)[y_q]
    gen = TasksGeneratorFewShot(
        k_eff=3, shot=shots, n_query=n_query, n_class=n_class,
        loader_support=[(x_s, y_s)], loader_query=[(x_q, y_q)], args=args,
    )
    tasks = gen.generate_tasks()
    # support has all classes -> remap is the descending relabeling
    np.testing.assert_array_equal(
        tasks["y_s"][0, :, 0], n_class - 1 - y_s
    )
    np.testing.assert_array_equal(
        tasks["y_q"][0, :, 0], n_class - 1 - y_q
    )
    # after the column permutation the argmax column equals the new label
    np.testing.assert_array_equal(
        tasks["x_q"][0].argmax(-1), tasks["y_q"][0, :, 0]
    )
    np.testing.assert_array_equal(
        tasks["x_s"][0].argmax(-1), tasks["y_s"][0, :, 0]
    )


def test_zero_shot_unfillable_pool_raises_not_hangs():
    import pytest

    # 4 samples per class, 10 classes: max pool 10*4=40 < n_query=75
    labels = np.repeat(np.arange(10), 4)
    rng = np.random.default_rng(0)
    sampler = CategoriesSamplerZeroShot(
        n_batch=1, k_eff=5, n_class=10, n_query=75,
        force_query_size=True, rng=rng,
    )
    sampler.create_list_classes(labels)
    with pytest.raises(RuntimeError, match="force_query_size"):
        list(SamplerQueryZeroShot(sampler))


def test_few_shot_unfillable_pool_raises_not_hangs():
    import pytest

    labels = np.repeat(np.arange(10), 3)
    rng = np.random.default_rng(0)
    sampler = CategoriesSamplerFewShot(
        n_batch=1, k_eff=4, n_class=10, s_shot=1, n_query=75,
        force_query_size=True, rng=rng,
    )
    sampler.create_list_classes(labels, labels)
    with pytest.raises(RuntimeError, match="force_query_size"):
        list(SamplerQueryFewShot(sampler))
