#!/usr/bin/env python
"""Corpus-scale VQ code-parity harness (SURVEY §7.3: "validate on a
corpus, not one image").

Streams N images through BOTH the reference torch VQ-VAE
(/root/reference/vqvae, imported read-only as a numerical oracle) and the
JAX rebuild loaded from the SAME checkpoint, and reports the token-level
mismatch rate.  Run it the moment real released weights
(vqvae_hard_biggerset_011.pt) are present:

  python scripts/vq_parity_check.py --checkpoint vqvae_hard_biggerset_011.pt \
      --images /path/to/images_dir_or.zip --limit 1000

Without --checkpoint it self-checks on a random-weight oracle and
synthetic images (the same construction the unit tests bit-match on a
single image — this script scales it to a corpus):

  python scripts/vq_parity_check.py --self-check --limit 64
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = os.environ.get("COGVIEW_REFERENCE", "/root/reference")


def iter_images(path: str, img_size: int, limit: int):
    """Yield normalized [1,3,H,W] float32 arrays (torch layout)."""
    from PIL import Image

    from cogview_tpu.models.vqvae import IMG_MEAN, IMG_STD

    def prep(img: "Image.Image"):
        img = img.convert("RGB")
        w, h = img.size
        if w < h:
            nw, nh = img_size, max(1, round(h * img_size / w))
        else:
            nw, nh = max(1, round(w * img_size / h)), img_size
        img = img.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - img_size) // 2, (nh - img_size) // 2
        img = img.crop((left, top, left + img_size, top + img_size))
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - np.asarray(IMG_MEAN, np.float32)) / np.asarray(IMG_STD, np.float32)
        return arr.transpose(2, 0, 1)[None]

    n = 0
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            for name in z.namelist():
                if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                    continue
                with z.open(name) as f:
                    yield prep(Image.open(io.BytesIO(f.read())))
                n += 1
                if limit and n >= limit:
                    return
    else:
        for name in sorted(os.listdir(path)):
            if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                continue
            yield prep(Image.open(os.path.join(path, name)))
            n += 1
            if limit and n >= limit:
                return


def synthetic_images(limit: int, img_size: int):
    rng = np.random.RandomState(0)
    for _ in range(limit):
        yield rng.randn(1, 3, img_size, img_size).astype(np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vq_parity_check")
    p.add_argument("--checkpoint", default=None,
                   help="vqvae .pt (e.g. vqvae_hard_biggerset_011.pt)")
    p.add_argument("--images", default=None, help="image dir or .zip")
    p.add_argument("--self-check", action="store_true",
                   help="random-weight oracle + synthetic images")
    p.add_argument("--limit", type=int, default=256)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-report", type=int, default=32)
    args = p.parse_args(argv)

    import torch

    torch.set_num_threads(1)  # torch+XLA threadpools fight on this box
    import jax
    import jax.numpy as jnp

    from cogview_tpu.models import vqvae as jvq
    from cogview_tpu.models.convert import vqvae_from_state_dict

    sys.path.insert(0, REFERENCE)
    from vqvae.vqvae_zc import VQVAE  # noqa: E402 (read-only oracle)

    oracle = VQVAE(channel=512, n_res_block=0, n_res_channel=32,
                   embed_dim=256, n_embed=8192, stride=6)
    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        oracle.load_state_dict(sd)
        images = iter_images(args.images, args.img_size, args.limit)
        source = args.images
    else:
        if not args.self_check:
            print("no --checkpoint given: running --self-check "
                  "(random weights, synthetic images)", file=sys.stderr)
        torch.manual_seed(0)
        images = synthetic_images(args.limit, min(args.img_size, 64))
        source = "synthetic"
    oracle.eval()
    params = jax.tree.map(jnp.asarray, vqvae_from_state_dict(oracle.state_dict()))

    total = mismatched = imgs = imgs_any_mismatch = 0
    for x in images:
        with torch.no_grad():
            _, _, id_t = oracle.encode(torch.from_numpy(x))
        ref = id_t.reshape(-1).numpy()
        got = np.asarray(
            jvq.img2code(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        ).reshape(-1)
        bad = int((ref != got).sum())
        total += ref.size
        mismatched += bad
        imgs += 1
        imgs_any_mismatch += bad > 0
        if imgs % args.batch_report == 0:
            print(f"  {imgs} images: token mismatch "
                  f"{mismatched}/{total} ({mismatched/total:.2e})", flush=True)

    result = {
        "source": source,
        "images": imgs,
        "tokens": total,
        "token_mismatch_rate": (mismatched / total) if total else None,
        "images_with_any_mismatch": imgs_any_mismatch,
    }
    print(json.dumps(result))
    return 0 if mismatched == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
