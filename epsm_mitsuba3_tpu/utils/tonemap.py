"""Tonemapping utilities (src/python/python/tonemap.py analog)."""
from __future__ import annotations

import numpy as np


def tonemap(img, method: str = "gamma", exposure: float = 0.0,
            gamma: float = 2.2):
    """HDR -> LDR tonemap: 'gamma' | 'reinhard' | 'filmic' (ACES fit)."""
    x = np.asarray(img, np.float32) * (2.0 ** exposure)
    if method == "gamma":
        return np.clip(x, 0, 1) ** (1.0 / gamma)
    if method == "reinhard":
        return (x / (1.0 + x)) ** (1.0 / gamma)
    if method == "filmic":
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        y = np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0, 1)
        return y ** (1.0 / gamma)
    raise ValueError(f"unknown tonemap '{method}'")
