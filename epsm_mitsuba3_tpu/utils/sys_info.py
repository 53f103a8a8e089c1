"""System info (src/python/python/sys_info.py analog)."""
from __future__ import annotations

import platform


def info() -> dict:
    import jax

    devs = jax.devices()
    return {
        "framework": "epsm_mitsuba3_tpu",
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "device_count": len(devs),
        "python": platform.python_version(),
        "platform": platform.platform(),
    }


def print_info():
    for k, v in info().items():
        print(f"{k:>14}: {v}")
