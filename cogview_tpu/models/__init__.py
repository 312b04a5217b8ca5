from . import vqvae
from .vqvae import VQVAEConfig

__all__ = ["vqvae", "VQVAEConfig"]
