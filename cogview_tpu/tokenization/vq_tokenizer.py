"""JAX-backed image tokenizer implementing the UnifiedTokenizer protocol.

Counterpart of the reference VQVAETokenizer (data_utils/vqvae_tokenizer.py)
with the model living as a cogview_tpu VQ-VAE params pytree.  Encode/decode
are jitted once and reused across queries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vqvae


class JaxVQTokenizer:
    def __init__(self, params, cfg: vqvae.VQVAEConfig = vqvae.VQVAEConfig()):
        self.params = params
        self.cfg = cfg
        self.num_tokens = cfg.n_embed
        self._encode = jax.jit(vqvae.img2code)
        self._decode = jax.jit(vqvae.code2img)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: vqvae.VQVAEConfig = vqvae.VQVAEConfig()):
        from ..models.convert import load_vqvae_checkpoint

        params = jax.tree.map(jnp.asarray, load_vqvae_checkpoint(path))
        return cls(params, cfg)

    @classmethod
    def random_init(cls, seed: int = 0, cfg: vqvae.VQVAEConfig = vqvae.VQVAEConfig()):
        return cls(vqvae.init_params(jax.random.PRNGKey(seed), cfg), cfg)

    def __len__(self) -> int:
        return self.num_tokens

    def read_img(self, path: str, img_size: int = 256) -> np.ndarray:
        return vqvae.read_img(path, img_size)

    def EncodeAsIds(self, img) -> np.ndarray:
        """img [b,h,w,3] normalized -> [b, (h/8)*(w/8)] int codes."""
        img = np.asarray(img)
        if img.ndim == 3:
            img = img[None]
        return np.asarray(self._encode(self.params, jnp.asarray(img)))

    def DecodeIds(self, code, shape=None) -> np.ndarray:
        """codes (list | [n] | [b, n]) -> de-normalized image [b, 8s, 8s, 3]."""
        code = np.asarray(code)
        if code.ndim == 1:
            code = code[None]
        if shape is not None:
            code = code.reshape(shape)
        return np.asarray(self._decode(self.params, jnp.asarray(code)))
