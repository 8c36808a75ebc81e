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
