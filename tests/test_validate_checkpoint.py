"""scripts/validate_checkpoint.py — the real-checkpoint preflight.

Runs the script's full check chain on synthetic OpenAI-layout checkpoints
(tests/torch_clip.synth_state_dict), so the one code path a user's first
real ``.pt`` takes is itself tested: backbone inference, structure check,
probe forward, BN-fold equivalence, both torch oracles, and the text tower
through the committed BPE excerpt.
"""

import gzip
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import validate_checkpoint as vc  # noqa: E402
from test_convert import TINY_RN, TINY_VIT  # noqa: E402
from torch_clip import synth_state_dict  # noqa: E402

from transductive_clip_tpu.models.clip import CLIP_CONFIGS  # noqa: E402


@pytest.fixture
def tiny_registered():
    """Expose the tiny configs under CLIP_CONFIGS for --backbone lookup."""
    CLIP_CONFIGS["tiny-rn"] = TINY_RN
    CLIP_CONFIGS["tiny-vit"] = TINY_VIT
    yield
    CLIP_CONFIGS.pop("tiny-rn")
    CLIP_CONFIGS.pop("tiny-vit")


def _write_ckpt(tmp_path, cfg, seed=0):
    sd = synth_state_dict(cfg, seed=seed)
    path = tmp_path / f"{cfg.name}.pt"
    torch.save(sd, str(path))
    return path, sd


def _run(argv):
    # the suite runs with -p no:capture (pytest.ini), so capture manually
    import contextlib
    import io

    sys.argv = ["validate_checkpoint.py"] + argv
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), pytest.raises(SystemExit) as e:
        vc.main()
    return e.value.code, buf.getvalue()


@pytest.mark.parametrize("cfg", [TINY_RN, TINY_VIT], ids=["rn", "vit"])
def test_valid_checkpoint_passes(tmp_path, tiny_registered, cfg):
    path, _ = _write_ckpt(tmp_path, cfg)
    code, out = _run([str(path), "--backbone", cfg.name])
    assert code == 0, out
    assert "RESULT: OK" in out
    assert "[PASS] structure" in out
    assert "[PASS] forward" in out
    assert "[PASS] torch-reimpl" in out
    if cfg.vision.is_resnet:
        assert "[PASS] fold" in out
    # plain state dict: the TorchScript oracle is skipped, not failed
    assert "[skip] torchscript" in out


def test_text_check_runs_with_bpe(tmp_path, tiny_registered):
    path, _ = _write_ckpt(tmp_path, TINY_RN)
    src = os.path.join(os.path.dirname(__file__), "fixtures",
                       "bpe_excerpt.txt")
    bpe = tmp_path / "bpe.txt.gz"
    with open(src, "rb") as f, gzip.open(bpe, "wb") as g:
        g.write(f.read())
    code, out = _run([str(path), "--backbone", "tiny-rn",
                      "--bpe", str(bpe)])
    assert code == 0, out
    assert "[PASS] text" in out


def test_structure_mismatch_fails(tmp_path, tiny_registered):
    sd = synth_state_dict(TINY_RN)
    # transposed conv kernel: the classic wrong-layout checkpoint bug
    sd["visual.conv1.weight"] = sd["visual.conv1.weight"].permute(2, 3, 1, 0)
    path = tmp_path / "bad.pt"
    torch.save(sd, str(path))
    code, out = _run([str(path), "--backbone", "tiny-rn"])
    assert code == 1
    assert "[FAIL] structure" in out and "RESULT: FAIL" in out


def test_converter_bug_caught_by_oracle(tmp_path, tiny_registered,
                                        monkeypatch):
    """A silent converter numerics bug (kernel scaled 1.2x) must be caught
    by the independent torch oracle even though every shape is right."""
    from transductive_clip_tpu.models.clip import convert

    path, _ = _write_ckpt(tmp_path, TINY_RN)
    real = convert.convert_openai_checkpoint

    def buggy(p, cfg):
        tree = real(p, cfg)
        k = tree["params"]["visual"]["layer2_0"]["conv2"]["kernel"]
        tree["params"]["visual"]["layer2_0"]["conv2"]["kernel"] = k * 1.2
        return tree

    monkeypatch.setattr(vc, "convert_openai_checkpoint", buggy)
    code, out = _run([str(path), "--backbone", "tiny-rn"])
    assert code == 1
    assert "[FAIL] torch-reimpl" in out


def test_infer_backbone_rn50_signature():
    """Architecture inference from state-dict shapes alone (no weights)."""
    sd = {"text_projection": np.zeros((512, 1024)),
          "visual.conv1.weight": np.zeros((32, 3, 3, 3)),
          "visual.attnpool.positional_embedding": np.zeros((50, 2048))}
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(blocks):
            sd[f"visual.layer{stage}.{b}.conv1.weight"] = np.zeros(())
    assert vc.infer_backbone(sd) == "RN50"


def test_infer_backbone_vit_signature():
    sd = {"text_projection": np.zeros((512, 512)),
          "visual.conv1.weight": np.zeros((768, 3, 16, 16)),
          "visual.positional_embedding": np.zeros((197, 768))}
    for i in range(12):
        sd[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"] = (
            np.zeros(())
        )
    assert vc.infer_backbone(sd) == "ViT-B/16"


def test_infer_backbone_unknown_raises():
    sd = {"text_projection": np.zeros((512, 77)),
          "visual.conv1.weight": np.zeros((5, 3, 3, 3)),
          "visual.attnpool.positional_embedding": np.zeros((2, 10)),
          "visual.layer1.0.conv1.weight": np.zeros(())}
    with pytest.raises(SystemExit, match="matches no known backbone"):
        vc.infer_backbone(sd)
