from .config import CLIP_CONFIGS, CLIPConfig
from .model import CLIPModule, JaxCLIP, init_random_params, load

__all__ = [
    "CLIP_CONFIGS",
    "CLIPConfig",
    "CLIPModule",
    "JaxCLIP",
    "init_random_params",
    "load",
]
