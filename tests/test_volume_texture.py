"""3D volume texture (src/textures/volume.cpp — VERDICT r1 Missing #8):
trilinear lookup at the world hit position instead of a mean-color
constant."""
import struct

import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render


def _write_vol(path, grid):
    """Minimal .vol writer (volumegrid.cpp format): grid (Z, Y, X, C)."""
    z, y, x, c = grid.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(bytes([3]))                     # version
        f.write(struct.pack("<i", 1))           # dtype float32
        f.write(struct.pack("<iiii", x, y, z, c))
        f.write(struct.pack("<6f", 0, 0, 0, 1, 1, 1))
        f.write(np.asarray(grid, "<f4").tobytes())


def test_volume_texture_varies_spatially(tmp_path):
    # grid: red at low x, blue at high x (8 cells along x)
    grid = np.zeros((2, 2, 8, 3), np.float32)
    for i in range(8):
        t = i / 7.0
        grid[:, :, i] = [0.9 * (1 - t), 0.05, 0.9 * t]
    vol_file = str(tmp_path / "tex.vol")
    _write_vol(vol_file, grid)

    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 35.0,
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 64},
        },
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1, 1, 1]}},
        "plate": {
            "type": "rectangle",        # spans [-1,1]^2 at z=0
            "bsdf": {"type": "diffuse",
                     "reflectance": {
                         "type": "volume",
                         # map the plate's [-1,1]^2 onto the unit cube
                         "to_world": T.translate([-1, -1, -0.5])
                         .scale([2, 2, 1]),
                         "volume": {"type": "gridvolume",
                                    "filename": vol_file}}},
        },
    }
    img = np.asarray(render(mi.load_dict(d), seed=5, spp=64))
    left = img[12:20, 2:8].mean((0, 1))
    right = img[12:20, -8:-2].mean((0, 1))
    # world +x maps to image right; red must fade into blue across the plate
    assert left[0] > 2.0 * left[2], left
    assert right[2] > 2.0 * right[0], right
