"""VQ encode->decode eyeball check — the reference's
``show_recover_results`` (preprocess/utils.py:23-31) as a standalone
helper: originals on the top row, their VQ roundtrips on the bottom row,
saved as one PNG grid.

The numeric VQ parity tests (tests/test_vqvae.py) prove correctness; this
tool exists because the reference ships the visual check and it is the
fastest way to spot a mis-converted checkpoint or a normalization bug.
"""

from __future__ import annotations

import numpy as np


def denormalize(img: np.ndarray) -> np.ndarray:
    """Model-input normalized [h,w,3] -> displayable float32 in [0,1]."""
    from ..models.vqvae import IMG_MEAN, IMG_STD

    out = np.asarray(img, np.float32) * np.asarray(IMG_STD, np.float32)
    out = out + np.asarray(IMG_MEAN, np.float32)
    return np.clip(out, 0.0, 1.0)


def write_recover_grid(vq, images, path: str) -> np.ndarray:
    """Encode->decode ``images`` ([b,h,w,3] normalized model inputs) with
    tokenizer ``vq`` and write a 2-row grid PNG (top: originals, bottom:
    roundtrips) to ``path``.  Returns the grid array [2h, b*w, 3]."""
    from PIL import Image

    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[None]
    codes = vq.EncodeAsIds(images)
    recovered = np.clip(vq.DecodeIds(codes), 0.0, 1.0)
    top = np.concatenate([denormalize(im) for im in images], axis=1)
    bottom = np.concatenate(list(np.asarray(recovered, np.float32)), axis=1)
    grid = np.concatenate([top, bottom], axis=0)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
    return grid
