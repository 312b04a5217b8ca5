"""FID / Inception-Score CLI (reference eval_utils/fid_score.py:54-67 and
inception_score.py surfaces).

  python -m cogview_tpu.cli.fid --path1 real_imgs/ --path2 gen_imgs/ \
      [--inception-weights inception_v3.pth] [--extractor inception|vq]

``--path1``/``--path2`` accept either an image directory or a base64-image
``.tsv`` corpus (the reference's ``TsvDataset``, eval_utils/dataset.py:9-33:
``id \\t _ \\t caption \\t image_base64`` rows).  TSV sources are STREAMED
through :class:`..eval_utils.fid.StreamingStats` — (mu, sigma) accumulate
batch by batch, so corpus size is unbounded by host memory.

The extractor is the JAX InceptionV3 port (pool3 2048-d, exactly the
reference's block-3 features).  Pass --inception-weights with a
torchvision ``inception_v3`` state-dict file for published-comparable
numbers; without it, the net is random-init (relative comparisons only —
loudly flagged).  --extractor vq selects the VQ-encoder proxy instead.
--inception-score additionally reports IS of --path2 (needs the fc head,
i.e. pretrained weights, for meaningful numbers).
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


def is_tsv(path: str) -> bool:
    return os.path.isfile(path) and path.lower().endswith((".tsv", ".txt"))


def source_statistics(path, extractor, batch_size, img_size=256, limit=0):
    """(mu, sigma, n) of a source: image dir (in-memory) or base64 TSV
    (streamed — never holds more than one batch of pixels)."""
    from ..eval_utils.fid import StreamingStats
    from ..eval_utils.dataset import iter_tsv_image_batches

    stats = StreamingStats()
    if is_tsv(path):
        batches = iter_tsv_image_batches(path, batch_size, img_size, limit)
    else:
        imgs = load_image_dir(path, img_size, limit)
        batches = (imgs[i:i + batch_size] for i in range(0, len(imgs), batch_size))
    for batch in batches:
        stats.update(np.asarray(extractor(batch)))
    mu, sigma = stats.finalize()
    return mu, sigma, stats.n


def load_source_images(path, img_size=256, limit=0) -> np.ndarray:
    """Materialize a source (dir or TSV) as [n,s,s,3] float32 in [0,1]."""
    if not is_tsv(path):
        return load_image_dir(path, img_size, limit)
    from ..eval_utils.dataset import TsvImageStream

    return np.stack([img for img, _i, _c in
                     TsvImageStream(path, img_size=img_size, limit=limit)])


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cogview-tpu fid")
    p.add_argument("--path1", required=True)
    p.add_argument("--path2", required=True)
    p.add_argument("--extractor", default="inception", choices=["inception", "vq"])
    p.add_argument("--inception-weights", default=None,
                   help="torchvision inception_v3 state-dict (.pth/.pt)")
    p.add_argument("--img-tokenizer-path", default=None,
                   help="VQ-VAE .pt for --extractor vq")
    p.add_argument("--inception-score", action="store_true",
                   help="also report IS of --path2")
    p.add_argument("--is-splits", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..eval_utils.fid import InceptionFeatures, VQEncoderFeatures

    if args.extractor == "inception":
        extractor = InceptionFeatures(weights_path=args.inception_weights)
        label = "FID" if extractor.pretrained else "FID(random-init inception)"
        if not extractor.pretrained:
            print("[warn] no --inception-weights: random-init InceptionV3 — "
                  "NOT comparable to published FID", file=sys.stderr)
    else:
        from ..models import vqvae
        from ..models.convert import load_vqvae_checkpoint

        if args.img_tokenizer_path:
            params = load_vqvae_checkpoint(args.img_tokenizer_path)
        else:
            print("[warn] random VQ-VAE extractor (relative comparisons only)",
                  file=sys.stderr)
            params = vqvae.init_params(jax.random.PRNGKey(0))
        extractor = VQEncoderFeatures(params)
        label = "FID(vq-proxy)"

    from ..eval_utils.fid import frechet_distance

    mu1, s1, n1 = source_statistics(args.path1, extractor, args.batch_size,
                                    limit=args.limit)
    mu2, s2, n2 = source_statistics(args.path2, extractor, args.batch_size,
                                    limit=args.limit)
    fid = frechet_distance(mu1, s1, mu2, s2)
    print(f"{label}: {fid:.4f}  (n1={n1}, n2={n2})")

    if args.inception_score:
        import jax.numpy as jnp

        from ..eval_utils import inception
        from ..eval_utils.inception_score import inception_score

        if args.inception_weights:
            inc_params = inception.load_params(args.inception_weights)
        else:
            print("[warn] random-init classifier for IS — numbers meaningless",
                  file=sys.stderr)
            inc_params = inception.init_params(jax.random.PRNGKey(0))
        clf = jax.jit(lambda x: jax.nn.softmax(
            inception.logits(inc_params, x, resize_input=True), axis=-1))

        def classifier(batch):
            # IS feeds (-1,1) images (inception_score.py:12)
            return np.asarray(clf(jnp.asarray(batch * 2.0 - 1.0, jnp.float32)))

        imgs2 = load_source_images(args.path2, limit=args.limit)
        mean, std = inception_score(imgs2, classifier, args.batch_size,
                                    args.is_splits)
        print(f"IS: {mean:.4f} +/- {std:.4f}  (n={len(imgs2)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
