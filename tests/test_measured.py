"""Measured-BSDF loading (src/bsdfs/measured.cpp / tensor.cpp — VERDICT r1
Missing #5): synthesize an RGL tensor file for an analytic Beckmann
microfacet material, then check the parse → bake → runtime-eval pipeline
against the analytic values and render with it."""
import struct

import numpy as np
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models import measured as M


# --- tensor_file writer (inverse of tensor.cpp's parser) -------------------

def _write_tensor_file(path, fields):
    names = list(fields)
    header = b"tensor_file\x00" + bytes([1, 0]) + struct.pack("<I", len(names))
    # first pass: header size
    entry_sizes = [2 + len(n) + 2 + 1 + 8 + 8 * fields[n].ndim for n in names]
    data_off = len(header) + sum(entry_sizes)
    blob = b""
    entries = b""
    for n in names:
        a = fields[n]
        dtype = 1 if a.dtype == np.uint8 else 10
        a = a.astype(np.uint8 if dtype == 1 else "<f4")
        entries += struct.pack("<H", len(n)) + n.encode()
        entries += struct.pack("<H", a.ndim) + bytes([dtype])
        entries += struct.pack("<Q", data_off + len(blob))
        entries += struct.pack("<" + "Q" * a.ndim, *a.shape)
        blob += a.tobytes()
    with open(path, "wb") as f:
        f.write(header + entries + blob)


# --- analytic Beckmann reference --------------------------------------------

ALPHA = 0.3


def _D(theta_m):
    c2 = np.cos(theta_m) ** 2
    t2 = np.tan(theta_m) ** 2
    return np.exp(-t2 / ALPHA ** 2) / (np.pi * ALPHA ** 2 * c2 ** 2)


def _sigma(theta_i):
    """Projected area ∫ D(m) max(0, wi·m) dm by numeric quadrature."""
    tm = np.linspace(0, np.pi / 2 - 1e-3, 256)
    pm = np.linspace(0, 2 * np.pi, 128, endpoint=False)
    TM, PM = np.meshgrid(tm, pm, indexing="ij")
    m_ = np.stack([np.sin(TM) * np.cos(PM), np.sin(TM) * np.sin(PM),
                   np.cos(TM)], -1)
    dA = (tm[1] - tm[0]) * (pm[1] - pm[0])
    out = []
    for ti in np.atleast_1d(theta_i):
        wi = np.array([np.sin(ti), 0, np.cos(ti)])
        w = np.clip(m_ @ wi, 0, None)
        out.append(np.sum(_D(TM) * w * np.sin(TM)) * dA)
    return np.asarray(out)


def _synth_bsdf(path):
    res_t, res_p = 64, 16
    u_t = np.linspace(0, 1, res_t)
    theta_m = (u_t ** 2) * (np.pi / 2)
    theta_i = np.asarray([0.0, 0.35, 0.7, 1.0, 1.3], np.float32)

    ndf = np.tile(_D(theta_m)[None, :], (res_p, 1)).astype(np.float32)
    u_sig = np.linspace(0, 1, res_t)
    sig = _sigma((u_sig ** 2) * (np.pi / 2))
    sigma = np.tile(sig[None, :], (res_p, 1)).astype(np.float32)

    # vndf density in the warped unit square: D(m) max(0, wi·m) with the
    # (θ,φ)->(u,v) Jacobian sinθ dθ/du_x; only used through invert()
    vndf = np.zeros((1, len(theta_i), res_p, res_t), np.float32)
    phis = np.linspace(-np.pi, np.pi, res_p)
    for k, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0, np.cos(ti)])
        TM, PM = np.meshgrid(theta_m, phis, indexing="xy")
        m_ = np.stack([np.sin(TM) * np.cos(PM), np.sin(TM) * np.sin(PM),
                       np.cos(TM)], -1)
        proj = np.clip(m_ @ wi, 0, None)
        jac = np.sin(TM) * (np.pi * np.maximum(u_t[None, :], 1e-3))
        vndf[0, k] = (_D(TM) * proj * jac).reshape(res_p, res_t)

    wavelengths = np.linspace(400, 700, 4).astype(np.float32)
    spectra = np.full((1, len(theta_i), 4, res_p, res_t), 0.8, np.float32)

    _write_tensor_file(path, {
        "theta_i": theta_i,
        "phi_i": np.asarray([0.0], np.float32),
        "ndf": ndf,
        "sigma": sigma,
        "vndf": vndf,
        "spectra": spectra,
        "luminance": np.ones((1, len(theta_i), res_p, res_t), np.float32),
        "wavelengths": wavelengths,
        "jacobian": np.asarray([1], np.uint8),
    })


def test_tensor_roundtrip(tmp_path):
    p = str(tmp_path / "synth.bsdf")
    _synth_bsdf(p)
    f = M.read_tensor_file(p)
    assert f["theta_i"].shape == (5,)
    assert f["vndf"].shape == (1, 5, 16, 64)
    assert f["spectra"].shape == (1, 5, 4, 16, 64)
    assert f["jacobian"][0] == 1


def test_bake_matches_analytic(tmp_path):
    """With constant spectra c, eval = c·ndf(u_m)/(4σ(u_wi)); the baked
    table must match the analytic D/(4σ) within interpolation error."""
    p = str(tmp_path / "synth.bsdf")
    _synth_bsdf(p)
    table, ti_nodes, alpha = M.bake(p, n_theta_o=48, n_phi_d=16)
    # GGX fitted to a Beckmann lobe lands below the Beckmann α (heavier
    # GGX tails); only a sampling proxy, so bound loosely
    assert 0.1 < alpha < 0.6, alpha

    it = 2                               # θ_i = 0.7
    ti = float(ti_nodes[it])
    wi = np.array([np.sin(ti), 0, np.cos(ti)])
    sigma_i = _sigma(ti)[0]
    u_to = (np.arange(48) + 0.5) / 48
    theta_o = (u_to ** 2) * (np.pi / 2)
    checked = 0
    for j in (8, 16, 24, 32):
        for kpd in (0, 4, 8, 12):
            to = theta_o[j]
            pd = (kpd + 0.5) / 16 * np.pi
            wo = np.array([np.sin(to) * np.cos(pd),
                           np.sin(to) * np.sin(pd), np.cos(to)])
            h = wi + wo
            h = h / np.linalg.norm(h)
            expect = 0.8 * _D(np.arccos(h[2])) / (4 * sigma_i)
            got = table[it, j, kpd].mean()
            if expect < 1e-3:
                continue
            assert abs(got - expect) / expect < 0.12, (j, kpd, got, expect)
            checked += 1
    assert checked >= 8


def test_measured_render(tmp_path):
    """A measured-BSDF plate renders finite and behaves like its analytic
    roughconductor counterpart within a loose factor."""
    p = str(tmp_path / "synth.bsdf")
    _synth_bsdf(p)
    T = mi.ScalarTransform4f

    def scene(bsdf):
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {
                "type": "perspective", "fov": 30.0,
                "to_world": T.look_at(origin=[0, 1.5, 2.5], target=[0, 0, 0],
                                      up=[0, 1, 0]),
                "film": {"type": "hdrfilm", "width": 24, "height": 24,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 64},
            },
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": [1, 1, 1]}},
            "plate": {"type": "rectangle",
                      "to_world": T.rotate([1, 0, 0], -90),
                      "bsdf": bsdf},
        })

    from epsm_mitsuba3_tpu.ad.render import render
    img_m = np.asarray(render(scene({"type": "measured", "filename": p}),
                              seed=1, spp=64))
    img_g = np.asarray(render(scene({
        "type": "roughconductor", "alpha": ALPHA, "distribution": "beckmann",
        "eta": [0.01, 0.01, 0.01], "k": [10.0, 10.0, 10.0]}),
        seed=1, spp=64))
    assert np.all(np.isfinite(img_m)) and img_m.mean() > 0.01
    # same NDF; spectra=0.8 vs near-unit Fresnel => within a loose band
    ratio = img_m.mean() / img_g.mean()
    assert 0.3 < ratio < 1.6, ratio
