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


def test_synthetic_protocol_check_gate():
    """run_synthetic_protocol --check threshold logic: full pass, accuracy
    drop, TPU-only latency ceiling, and missing-method detection."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import run_synthetic_protocol as sp

    ok_rows = [(name, 1.0, 5.0) for name in sp.QUICK_CHECK_BOUNDS]
    assert sp.check_results(ok_rows, "tpu") == []
    assert sp.check_results(ok_rows, "cpu") == []

    # an accuracy drop on any backend fails
    bad = [("EM_DIRICHLET", 0.62, 5.0)] + [
        r for r in ok_rows if r[0] != "EM_DIRICHLET"]
    fails = sp.check_results(bad, "cpu")
    assert len(fails) == 1 and "EM_DIRICHLET" in fails[0]
    assert "0.620" in fails[0]

    # latency ceiling applies on TPU only
    slow = [("FS/PADDLE", 1.0, 99_000.0)] + [
        r for r in ok_rows if r[0] != "FS/PADDLE"]
    assert sp.check_results(slow, "cpu") == []
    fails = sp.check_results(slow, "tpu")
    assert len(fails) == 1 and "ceiling" in fails[0]

    # a method silently dropped from the sweep fails too
    missing = [r for r in ok_rows if r[0] != "CLIP"]
    fails = sp.check_results(missing, "cpu")
    assert fails == ["CLIP: missing from results"]

    # every registered method has a vendored bound
    from transductive_clip_tpu.methods import (
        FEW_SHOT_METHODS,
        ZERO_SHOT_METHODS,
    )

    expected = set(ZERO_SHOT_METHODS) | {f"FS/{m}" for m in FEW_SHOT_METHODS}
    assert expected == set(sp.QUICK_CHECK_BOUNDS)


def test_gen_bench_table_roundtrip_and_drift_gate(tmp_path):
    """gen_bench_table: renders the table from the store, --check passes on
    a fresh render and fails once the store moves (the drift gate that
    keeps README numbers single-sourced)."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import gen_bench_table as gbt

    store = {
        "headline_soft_production": {
            "value": 1934.9, "unit": "tasks/sec",
            "seconds_per_task": 0.00052, "vs_baseline": 2012.3,
            "measured_on": "2026-08-19",
        },
        "few_shot_paddle_imagenet_protocol": {
            "value": 2.9, "unit": "ms/task", "vs_baseline": 139.0,
            "measured_on": "2026-08-19",
        },
        "extraction_device_only_ViT-L14": {
            "value": 1200.0, "unit": "imgs/sec", "tflops_per_sec": 130.0,
            "mfu_pct_bf16_peak": 66.0, "measured_on": "2026-08-19",
        },
    }
    store_p = tmp_path / "measured.json"
    store_p.write_text(json.dumps(store))
    readme_p = tmp_path / "README.md"
    readme_p.write_text(f"# head\n\n{gbt.BEGIN}\nstale\n{gbt.END}\n\ntail\n")

    assert gbt.main(["--store", str(store_p), "--readme", str(readme_p)]) == 0
    text = readme_p.read_text()
    assert "1,935 tasks/s (0.52 ms/task)" in text
    assert "**2,012x**" in text
    assert "**66.0% of bf16 peak**" in text
    assert "stale" not in text
    assert text.startswith("# head") and text.endswith("tail\n")

    # idempotent + --check green
    assert gbt.main(["--check", "--store", str(store_p),
                     "--readme", str(readme_p)]) == 0

    # the store moves -> --check goes red until regenerated
    store["headline_soft_production"]["value"] = 2100.0
    store_p.write_text(json.dumps(store))
    assert gbt.main(["--check", "--store", str(store_p),
                     "--readme", str(readme_p)]) == 1
