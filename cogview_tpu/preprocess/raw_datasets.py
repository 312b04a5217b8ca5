"""Archive/image sources for offline preprocessing.

Rebuild of preprocess/raw_datasets.py: directory, zip, tar(-stream), RAR
(via the system libarchive — rar_reader.py; the reference's
RarDataset/StreamingRarDataset, raw_datasets.py:38-60,147-224) and HDF5
image sources, all yielding (sample_id, normalized [h,w,3] float32)
pairs ready for VQ encoding, plus TSV/JSON text lookup.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import zipfile
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..models.vqvae import IMG_MEAN, IMG_STD

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def to_model_input(pil_img, img_size: int = 256) -> np.ndarray:
    """resize-short-side -> center-crop -> normalize (vqvae read_img rules)."""
    from PIL import Image

    img = pil_img.convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = img_size, max(1, round(h * img_size / w))
    else:
        nw, nh = max(1, round(w * img_size / h)), img_size
    img = img.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - img_size) // 2, (nh - img_size) // 2
    img = img.crop((left, top, left + img_size, top + img_size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - np.asarray(IMG_MEAN, np.float32)) / np.asarray(IMG_STD, np.float32)


def _decode(name: str, data: bytes, img_size: int):
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data))
        return to_model_input(img, img_size)
    except Exception:
        return None


class ImageFolderDataset:
    def __init__(self, root: str, img_size: int = 256):
        self.root = root
        self.img_size = img_size
        self.names = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.lower().endswith(IMG_EXTS)
        )

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        for p in self.names:
            with open(p, "rb") as f:
                arr = _decode(p, f.read(), self.img_size)
            if arr is not None:
                yield os.path.relpath(p, self.root), arr


class ZipDataset:
    def __init__(self, path: str, img_size: int = 256):
        self.path = path
        self.img_size = img_size

    def __iter__(self):
        with zipfile.ZipFile(self.path) as z:
            for info in z.infolist():
                if info.is_dir() or not info.filename.lower().endswith(IMG_EXTS):
                    continue
                arr = _decode(info.filename, z.read(info), self.img_size)
                if arr is not None:
                    yield info.filename, arr


class TarDataset:
    """Streaming tar reader (the StreamingRarDataset analog — sequential
    decompression, constant memory)."""

    def __init__(self, path: str, img_size: int = 256):
        self.path = path
        self.img_size = img_size

    def __iter__(self):
        with tarfile.open(self.path, "r|*") as t:
            for member in t:
                if not member.isfile() or not member.name.lower().endswith(IMG_EXTS):
                    continue
                f = t.extractfile(member)
                if f is None:
                    continue
                arr = _decode(member.name, f.read(), self.img_size)
                if arr is not None:
                    yield member.name, arr


class RarDataset:
    """RAR4/RAR5 image source (reference RarDataset + the streaming
    variant: libarchive decodes sequentially in constant memory, so the
    single class covers both).  Accepts a path or a binary stream."""

    def __init__(self, path_or_stream, img_size: int = 256):
        self.source = path_or_stream
        self.img_size = img_size

    def __iter__(self):
        from .rar_reader import iter_rar_entries

        for name, data in iter_rar_entries(self.source):
            if not name.lower().endswith(IMG_EXTS):
                continue
            arr = _decode(name, data, self.img_size)
            if arr is not None:
                yield name, arr


class H5Dataset:
    """HDF5 image arrays: dataset of [n, h, w, 3] uint8 plus optional
    'names' (preprocess/raw_datasets.py:88 analog)."""

    def __init__(self, path: str, dataset: str = "images", img_size: int = 256):
        self.path = path
        self.dataset = dataset
        self.img_size = img_size

    def __iter__(self):
        import h5py
        from PIL import Image

        with h5py.File(self.path, "r") as f:
            data = f[self.dataset]
            names = f.get("names")
            for i in range(len(data)):
                img = Image.fromarray(np.asarray(data[i]))
                name = (
                    names[i].decode() if names is not None else f"{i}"
                )
                yield name, to_model_input(img, self.img_size)


def open_image_source(path: str, img_size: int = 256):
    if os.path.isdir(path):
        return ImageFolderDataset(path, img_size)
    if path.endswith(".zip"):
        return ZipDataset(path, img_size)
    if path.endswith((".tar", ".tar.gz", ".tgz")):
        return TarDataset(path, img_size)
    if path.endswith(".rar"):
        return RarDataset(path, img_size)
    if path.endswith((".h5", ".hdf5")):
        return H5Dataset(path, img_size=img_size)
    raise ValueError(f"unsupported image source: {path}")


class TsvTextSource:
    """'<image name>\\t<text>' lines (or JSON {name: text} files)."""

    def __init__(self, path: str):
        self.by_name: Dict[str, str] = {}
        if path.endswith(".json"):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
            if isinstance(data, dict):
                self.by_name = {str(k): str(v) for k, v in data.items()}
            else:  # list of {"uniqueKey"/"name": ..., "cnShortText"/"text": ...}
                for row in data:
                    key = row.get("uniqueKey") or row.get("name") or row.get("id")
                    txt = row.get("cnShortText") or row.get("text") or row.get("caption")
                    if key and txt:
                        self.by_name[str(key)] = str(txt)
        else:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 2:
                        self.by_name[parts[0]] = parts[1]

    def lookup(self, name: str) -> Optional[str]:
        if name in self.by_name:
            return self.by_name[name]
        stem = os.path.splitext(os.path.basename(name))[0]
        if stem in self.by_name:
            return self.by_name[stem]
        if not hasattr(self, "_by_stem"):
            self._by_stem = {
                os.path.splitext(os.path.basename(k))[0]: v
                for k, v in self.by_name.items()
            }
        return self._by_stem.get(stem)
