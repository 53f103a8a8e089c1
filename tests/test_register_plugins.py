"""Plugin-manager completeness: register_shape / register_sensor /
register_texture / register_sampler (PluginManager::register_python_plugin,
src/core/plugin.cpp:168 — the remaining plugin kinds after
register_integrator/bsdf/emitter)."""
import numpy as np
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box


def _ensure_registered():
    """Register once per process (registries are global)."""
    from epsm_mitsuba3_tpu.models.scene import _CUSTOM_SHAPE_FNS
    if "pyramid" not in _CUSTOM_SHAPE_FNS:
        def pyramid(props):
            s = float(props.get("size", 1.0))
            v = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s],
                          [0, 1.5 * s, 0]], np.float32)
            f = np.array([[0, 2, 1], [0, 3, 2],
                          [0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]],
                         np.int32)
            return {"vertices": v, "faces": f}
        mi.register_shape("pyramid", pyramid)

    from epsm_mitsuba3_tpu.models.sensors import _CUSTOM_SENSOR_FNS
    if "flipped_perspective" not in _CUSTOM_SENSOR_FNS:
        def flipped(sensor, pos01):
            # a perspective camera with the film mirrored horizontally
            aspect = sensor.width / sensor.height
            th = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
            u, v = 1.0 - pos01[..., 0], pos01[..., 1]
            d_cam = jnp.stack([(1 - 2 * u) * th, (1 - 2 * v) * th / aspect,
                               jnp.ones_like(u)], -1)
            R = sensor.to_world[:3, :3]
            d = jnp.einsum("ij,...j->...i", R, d_cam)
            o = jnp.broadcast_to(sensor.to_world[:3, 3], d.shape)
            return o, d, None
        mi.register_sensor("flipped_perspective", flipped)

    from epsm_mitsuba3_tpu.models.textures import _CUSTOM_TEXTURE_FNS
    if "uv_gradient" not in _CUSTOM_TEXTURE_FNS:
        def uv_gradient(tex, uv, pos):
            t = jnp.clip(uv[..., 0:1], 0.0, 1.0)
            return tex.color1 * t + tex.color0 * (1.0 - t)
        mi.register_texture("uv_gradient", uv_gradient)

    from epsm_mitsuba3_tpu.models.samplers import _CUSTOM_SAMPLER_FNS
    if "halfshift" not in _CUSTOM_SAMPLER_FNS:
        from epsm_mitsuba3_tpu.models import samplers as smp

        def next1(sampler):
            s, x = smp._next_1d_f32(sampler)
            # Cranley-Patterson rotation by 0.5 — still uniform
            return s, jnp.mod(x + 0.5, 1.0)
        mi.register_sampler("halfshift", next1)


def test_register_shape_renders():
    _ensure_registered()
    d = cornell_box(res=24, spp=8, max_depth=3)
    base = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=0))
    d["pyr"] = {"type": "pyramid", "size": 0.6,
                "to_world": mi.ScalarTransform4f.translate([0, 0.0, 0]),
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb", "value": 0.6}}}
    img = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=0))
    assert np.isfinite(img).all()
    # the pyramid visibly changes the image
    assert np.abs(img - base).mean() > 1e-3


def test_register_shape_rejects_builtin_name():
    with pytest.raises(ValueError):
        mi.register_shape("sphere", lambda p: None)


def test_register_sensor_flips_image():
    _ensure_registered()
    d = cornell_box(res=24, spp=8, max_depth=2)
    img = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=0))
    for k, v in d.items():
        if isinstance(v, dict) and v.get("type") == "perspective":
            d[k] = {**v, "type": "flipped_perspective"}
    flip = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=0))

    # mirrored horizontally: the red wall (left) and green wall (right)
    # swap sides — the red-minus-green column asymmetry changes sign
    def asym(im):
        w = im.shape[1]
        left = im[:, : w // 3]
        right = im[:, -w // 3:]
        return float((left[..., 0] - left[..., 1]).mean()
                     - (right[..., 0] - right[..., 1]).mean())

    a_fwd, a_flip = asym(img), asym(flip)
    assert a_fwd * a_flip < 0, (a_fwd, a_flip)
    assert abs(a_flip) > 0.3 * abs(a_fwd)


def test_register_texture_drives_reflectance():
    _ensure_registered()
    d = cornell_box(res=24, spp=8, max_depth=2)
    # put the gradient on the floor: black at u=0, white at u=1
    for k, v in d.items():
        if isinstance(v, dict) and k == "floor":
            v["bsdf"] = {"type": "diffuse",
                         "reflectance": {"type": "uv_gradient",
                                         "color0": [0.0, 0.0, 0.0],
                                         "color1": [0.9, 0.9, 0.9]}}
    scene = mi.load_dict(d)
    assert any(getattr(t, "kind", "") == "uv_gradient"
               for t in scene.textures)
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    assert np.isfinite(img).all()
    # bottom rows (floor) must show a horizontal brightness ramp
    floor = img[-6:, :, :].mean(axis=(0, 2))
    lo, hi = floor[:6].mean(), floor[-6:].mean()
    assert abs(hi - lo) > 0.02, (lo, hi)


def test_register_sampler_unbiased():
    _ensure_registered()
    d = cornell_box(res=16, spp=8, max_depth=3)
    ref = np.stack([np.asarray(mi.render(mi.load_dict(d), spp=32, seed=s))
                    for s in range(4)]).mean(0)
    d["sampler_override"] = None  # marker only
    del d["sampler_override"]
    for k, v in d.items():
        if isinstance(v, dict) and v.get("type") == "perspective":
            v["sampler"] = {"type": "halfshift", "sample_count": 8}
    img = np.stack([np.asarray(mi.render(mi.load_dict(d), spp=32, seed=s))
                    for s in range(6)]).mean(0)
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.08, (img.mean(), ref.mean())
