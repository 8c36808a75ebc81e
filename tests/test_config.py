import os

import pytest

from transductive_clip_tpu.core.config import (
    CfgNode,
    load_cfg_from_cfg_file,
    merge_cfg_from_list,
    load_full_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_ROOT = os.path.join(REPO, "config")


def test_yaml_sections_are_flattened(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("A:\n  x: 1\nB:\n  y: 'hello'\n  z: [1, 2]\n")
    cfg = load_cfg_from_cfg_file(str(f))
    assert cfg.x == 1 and cfg.y == "hello" and cfg.z == [1, 2]


def test_merge_literal_eval_and_coercion():
    cfg = CfgNode({"iter": 20, "T": 30, "flag": True, "name": "a"})
    out = merge_cfg_from_list(cfg, ["iter", "5", "flag", "False", "new_key", "1e-4"])
    assert out.iter == 5
    assert out.flag is False
    assert out.new_key == pytest.approx(1e-4)
    # unknown keys silently added, original untouched
    assert "new_key" not in cfg


def test_merge_type_mismatch_raises():
    cfg = CfgNode({"iter": 20})
    with pytest.raises(ValueError):
        merge_cfg_from_list(cfg, ["iter", "'not_an_int'"])


def test_full_config_load():
    cfg = load_full_config(
        opts=["dataset", "eurosat", "method", "em_dirichlet", "shots", "0"],
        config_root=CONFIG_ROOT,
    )
    assert cfg.dataset == "eurosat"
    assert cfg.name_method == "EM_DIRICHLET"
    assert cfg.n_class == cfg.num_classes_test == 10
    assert cfg.iter_mm == 1000
    # CLI opts win over method/dataset files
    cfg2 = load_full_config(
        opts=["dataset", "eurosat", "method", "em_dirichlet", "iter", "3"],
        config_root=CONFIG_ROOT,
    )
    assert cfg2.iter == 3


def test_get_log_file_versioning(tmp_path):
    from transductive_clip_tpu.core.logger import get_log_file

    f0 = get_log_file(str(tmp_path), "eurosat", "EM_DIRICHLET")
    assert f0.endswith("EM_DIRICHLET_run_0.log")
    open(f0, "w").close()
    f1 = get_log_file(str(tmp_path), "eurosat", "EM_DIRICHLET")
    assert f1.endswith("EM_DIRICHLET_run_1.log")


def test_cfgnode_clone_independent():
    cfg = CfgNode({"a": 1, "nested": {"b": 2}})
    c2 = cfg.clone()
    c2.a = 9
    c2.nested.b = 7
    assert cfg.a == 1 and cfg.nested.b == 2


def test_int_to_float_coercion():
    cfg = CfgNode({"temp": 30.0})
    out = merge_cfg_from_list(cfg, ["temp", "15"])
    assert out.temp == 15.0 and isinstance(out.temp, float)


def test_reproduce_tables_parses_baseline():
    """reproduce_tables.py must recover every mapped Table 1/2 row and the
    11 dataset columns from BASELINE.md (guards the regex against doc
    edits)."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import reproduce_tables as rt

    tables = rt.parse_baseline_tables(os.path.join(repo, "BASELINE.md"))
    assert set(tables) == {1, 2}
    t1 = tables[1]
    mapped1 = [k for k in t1 if k in rt.TABLE1_ROWS]
    assert len(mapped1) == len(rt.TABLE1_ROWS)
    assert all(len(t1[k]) == 11 for k in mapped1), "11 dataset columns"
    # spot-check two published numbers
    assert t1["Hard EM-Dirichlet (prob.)"]["imagenet"] == 77.6
    assert t1["Zero-shot CLIP (inductive)"]["food101"] == 77.1
    t2 = tables[2]
    mapped2 = [k for k in t2 if k in rt.TABLE2_ROWS]
    assert len(mapped2) >= 6


def test_reproduce_tables_run_branch(tmp_path):
    """reproduce_tables.run_cell must drive the real evaluator end-to-end
    against a feature-cache root and return an accuracy (validated with a
    separable synthetic cache; published-number comparison then happens in
    main())."""
    import os
    import pickle
    import sys

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import reproduce_tables as rt

    root = tmp_path / "data"
    (root / "eurosat" / "saved_features").mkdir(parents=True)
    rng = np.random.default_rng(0)
    K, N = 10, 2000
    labels = rng.integers(0, K, N)
    g = rng.gamma(1.0, size=(N, K)).astype(np.float32)
    g[np.arange(N), labels] += 40
    with open(root / "eurosat" / "saved_features"
              / "test_softmax_RN50_T30.plk", "wb") as f:
        pickle.dump({"concat_features": g / g.sum(-1, keepdims=True),
                     "concat_labels": labels}, f)

    cwd = os.getcwd()
    os.chdir(tmp_path)  # keep any relative paths inside the sandbox
    try:
        acc = rt.run_cell("em_dirichlet", "eurosat", True, shots=0,
                          number_tasks=20, batch_size=10, seed=0,
                          root=str(root))
    finally:
        os.chdir(cwd)
    assert acc > 95.0  # separable synthetic features
