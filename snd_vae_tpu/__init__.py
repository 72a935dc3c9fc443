"""snd_vae_tpu — a TPU-native framework for deep generative modeling of
spatial networks, with the capabilities of the KDD'21 SND-VAE reference
implementation (xguo7/SND-VAE) re-designed for JAX/XLA/Pallas/pjit.

See SURVEY.md at the repo root for the structural map of the reference and
how each subsystem here corresponds to it.
"""

__version__ = "0.1.0"

from . import config
from .config import Config, preset

__all__ = ["Config", "preset", "config", "__version__"]
