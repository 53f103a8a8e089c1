"""Experiment logger — TPU analog of ``EPSM/utils/logger.py``.

Persists per-iteration artifacts (images as .npy/.png, parameter dumps,
scalar metrics as JSONL) without cv2/tensorboard dependencies; video
writing degrades to frame dumps.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


class Logger:
    def __init__(self, path: str, exp_name: str = ""):
        self.dir = os.path.join(path, exp_name) if exp_name else path
        os.makedirs(self.dir, exist_ok=True)
        os.makedirs(os.path.join(self.dir, "params"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "images"), exist_ok=True)
        self._metrics = open(os.path.join(self.dir, "metrics.jsonl"), "a")

    def save_img(self, name: str, img) -> str:
        """PNG via the sRGB encoder (logger.py save_img analog)."""
        from ..core.spectrum import to_bitmap_u8
        arr = np.asarray(to_bitmap_u8(np.asarray(img, np.float32)))
        out = os.path.join(self.dir, "images", name)
        _write_png(out, arr)
        return out

    def save_npy(self, name: str, arr) -> str:
        out = os.path.join(self.dir, "images", name)
        np.save(out, np.asarray(arr))
        return out

    def add_params(self, it: int, params: Dict[str, np.ndarray]):
        np.save(os.path.join(self.dir, "params", f"param{it}.npy"),
                np.asarray(params, dtype=object), allow_pickle=True)

    def add_metric(self, it: int, **kwargs):
        rec = {"it": it}
        rec.update({k: float(v) for k, v in kwargs.items()})
        self._metrics.write(json.dumps(rec) + "\n")
        self._metrics.flush()

    def close(self):
        self._metrics.close()


def _write_png(path: str, arr: np.ndarray):
    """Minimal RGB8 PNG writer (zlib + struct, no imageio dependency)."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    h, w = arr.shape[:2]
    arr = arr[..., :3].astype(np.uint8)
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    if not path.endswith(".png"):
        path += ".png"
    with open(path, "wb") as f:
        f.write(png)
