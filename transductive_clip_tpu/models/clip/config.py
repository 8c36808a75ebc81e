"""CLIP architecture configurations.

The three backbones used by the evaluation protocol (reference:
config/main_config.yaml backbone choices RN50 / ViT-B/16 / ViT-L/14, loaded
via clip.load at reference main.py:50).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    # ViT fields
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    # ResNet fields (used when is_resnet)
    is_resnet: bool = False
    resnet_layers: Tuple[int, ...] = (3, 4, 6, 3)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8


@dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    vision: CLIPVisionConfig
    text: CLIPTextConfig


CLIP_CONFIGS = {
    "RN50": CLIPConfig(
        name="RN50",
        embed_dim=1024,
        vision=CLIPVisionConfig(
            image_size=224, width=64, is_resnet=True,
            resnet_layers=(3, 4, 6, 3), heads=32,
        ),
        text=CLIPTextConfig(width=512, layers=12, heads=8),
    ),
    "ViT-B/16": CLIPConfig(
        name="ViT-B/16",
        embed_dim=512,
        vision=CLIPVisionConfig(patch_size=16, width=768, layers=12, heads=12),
        text=CLIPTextConfig(width=512, layers=12, heads=8),
    ),
    "ViT-B/32": CLIPConfig(
        name="ViT-B/32",
        embed_dim=512,
        vision=CLIPVisionConfig(patch_size=32, width=768, layers=12, heads=12),
        text=CLIPTextConfig(width=512, layers=12, heads=8),
    ),
    "ViT-L/14": CLIPConfig(
        name="ViT-L/14",
        embed_dim=768,
        vision=CLIPVisionConfig(patch_size=14, width=1024, layers=24, heads=16),
        text=CLIPTextConfig(width=768, layers=12, heads=12),
    ),
}
