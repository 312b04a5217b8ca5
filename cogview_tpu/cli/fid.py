"""FID CLI (reference eval_utils/fid_score.py:54-67 surface).

  python -m cogview_tpu.cli.fid --path1 real_imgs/ --path2 gen_imgs/ \
      [--img-tokenizer-path vqvae.pt]

Without a ported InceptionV3 this uses the VQ-encoder proxy extractor —
valid for relative comparisons, not for quoting against published FID.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_image_dir(path: str, img_size: int = 256, limit: int = 0) -> np.ndarray:
    from PIL import Image

    names = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
    )
    if limit:
        names = names[:limit]
    out = []
    for n in names:
        img = Image.open(os.path.join(path, n)).convert("RGB").resize(
            (img_size, img_size)
        )
        out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cogview-tpu fid")
    p.add_argument("--path1", required=True)
    p.add_argument("--path2", required=True)
    p.add_argument("--img-tokenizer-path", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..eval_utils.fid import VQEncoderFeatures, fid_from_images
    from ..models import vqvae
    from ..models.convert import load_vqvae_checkpoint

    if args.img_tokenizer_path:
        params = load_vqvae_checkpoint(args.img_tokenizer_path)
    else:
        print("[warn] random VQ-VAE extractor (relative comparisons only)",
              file=sys.stderr)
        params = vqvae.init_params(jax.random.PRNGKey(0))
    extractor = VQEncoderFeatures(params)

    imgs1 = load_image_dir(args.path1, limit=args.limit)
    imgs2 = load_image_dir(args.path2, limit=args.limit)
    fid = fid_from_images(imgs1, imgs2, extractor, args.batch_size)
    print(f"FID(proxy): {fid:.4f}  (n1={len(imgs1)}, n2={len(imgs2)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
