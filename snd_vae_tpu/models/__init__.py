from ..config import Config
from .disentangled import DisentangledSNDVAE
from .joint import JointSNDVAE
from .outputs import DecodedGraph, Latents, LatentStats, ModelOutput


def build_model(cfg: Config):
    """Model dispatch mirroring the reference's import switch
    (main.py:105-108): 'base' -> joint model, everything else -> the
    disentangled model family."""
    if cfg.model_type == "base":
        return JointSNDVAE(cfg)
    return DisentangledSNDVAE(cfg)


__all__ = [
    "DisentangledSNDVAE",
    "JointSNDVAE",
    "build_model",
    "ModelOutput",
    "LatentStats",
    "Latents",
    "DecodedGraph",
]
