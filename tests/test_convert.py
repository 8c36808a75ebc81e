"""Checkpoint converter round-trip: build a synthetic torch state dict with
the OpenAI CLIP key layout, convert to Flax params, and check the tree
structure matches what CLIPModule.init produces (so real checkpoints load
without key errors)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from transductive_clip_tpu.models.clip import CLIPModule, init_random_params
from transductive_clip_tpu.models.clip.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from transductive_clip_tpu.models.clip.convert import convert_openai_checkpoint

TINY_VIT = CLIPConfig(
    name="tiny-vit", embed_dim=16,
    vision=CLIPVisionConfig(image_size=32, patch_size=16, width=24, layers=2, heads=4),
    text=CLIPTextConfig(vocab_size=64, context_length=8, width=16, layers=2, heads=4),
)
TINY_RN = CLIPConfig(
    name="tiny-rn", embed_dim=16,
    vision=CLIPVisionConfig(image_size=32, width=8, heads=4, is_resnet=True,
                            resnet_layers=(1, 1, 1, 1)),
    text=CLIPTextConfig(vocab_size=64, context_length=8, width=16, layers=2, heads=4),
)


# synthetic OpenAI-layout checkpoints + independent torch forward oracle
from torch_clip import synth_state_dict


def tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= tree_paths(v, prefix + (k,))
        else:
            out.add((prefix + (k,), tuple(np.shape(v))))
    return out


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_convert_structure_matches_init(tmp_path, cfg):
    sd = synth_state_dict(cfg)
    path = str(tmp_path / "ckpt.pt")
    torch.save(sd, path)

    params = convert_openai_checkpoint(path, cfg)
    want = init_random_params(cfg, seed=0)
    got_paths = tree_paths(params["params"])
    want_paths = tree_paths(want["params"])
    assert got_paths == want_paths, (
        f"missing: {sorted(want_paths - got_paths)[:4]} "
        f"extra: {sorted(got_paths - want_paths)[:4]}"
    )

    # the converted params must run through the module
    module = CLIPModule(cfg)
    import jax.numpy as jnp

    img = module.apply(params, jnp.zeros(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32),
        method=CLIPModule.encode_image)
    assert img.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(img)).all()


def _jit_archive_from_state_dict(sd, path):
    """Pack a state dict into a TorchScript archive (nested module tree),
    the format the released OpenAI checkpoints actually use — exercises the
    converter's ``torch.jit.load`` branch (models/clip/convert.py:13-21),
    which no plain ``torch.save`` fixture reaches."""
    class Holder(torch.nn.Module):
        def forward(self) -> int:
            return 0

    root = Holder()
    for key, t in sd.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p) or not isinstance(getattr(mod, p),
                                                     torch.nn.Module):
                setattr(mod, p, Holder())
            mod = getattr(mod, p)
        if t.dtype.is_floating_point:
            mod.register_parameter(parts[-1], torch.nn.Parameter(t))
        else:
            mod.register_buffer(parts[-1], t)
    torch.jit.script(root).save(path)


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_convert_torchscript_archive_matches_plain(tmp_path, cfg):
    """The released OpenAI ``.pt`` files are TorchScript archives, not plain
    pickled state dicts; converting one must produce bit-identical params to
    the plain path (the offline stand-in for real-checkpoint loading)."""
    sd = synth_state_dict(cfg)
    plain, jit = str(tmp_path / "plain.pt"), str(tmp_path / "jit.pt")
    torch.save(sd, plain)
    _jit_archive_from_state_dict(sd, jit)
    p1 = convert_openai_checkpoint(plain, cfg)
    p2 = convert_openai_checkpoint(jit, cfg)
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), p1, p2)
    assert jax.tree_util.tree_all(same)
