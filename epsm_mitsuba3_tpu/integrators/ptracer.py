"""Adjoint particle tracer (src/integrators/ptracer.cpp +
AdjointIntegrator::render, integrator.cpp:499).

Traces light paths from the emitters and connects every vertex to the
sensor, splatting through the reconstruction filter — the transpose of the
camera path tracer.  The splat is the general scatter-add film (no
atomics: XLA sorted scatter; per-shard partial films + psum under DP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..models import bsdf as B
from ..models import emitters as E
from ..models import films, samplers as smp
from ..models.records import Ray
from ..models.sensors import Sensor


def sensor_connect(sensor: Sensor, p: jnp.ndarray):
    """Project world point onto the film (perspective.cpp
    ``sample_direction`` inverse).  Returns (uv01, d_to_cam, dist,
    importance, valid)."""
    R = sensor.to_world[:3, :3]
    o = sensor.to_world[:3, 3]
    rel = p - o
    p_cam = jnp.einsum("ji,...j->...i", R, rel)   # R^T (p - o)
    z = p_cam[..., 2]
    valid = z > sensor.near
    tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
    aspect = sensor.width / sensor.height
    u = 0.5 * (1.0 - p_cam[..., 0] / (z * tan_half))
    v = 0.5 * (1.0 - p_cam[..., 1] * aspect / (z * tan_half))
    valid = valid & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    dist = m.norm(rel)
    d = -rel / jnp.maximum(dist, 1e-12)[..., None]  # vertex -> camera
    # importance of the pinhole camera: We = 1/(A_plane cos^3 theta)
    cam_fwd = R[:, 2]
    cos_t = jnp.maximum(m.dot(-d, cam_fwd), 1e-6)
    a_plane = 4.0 * tan_half * tan_half / aspect
    we = 1.0 / (a_plane * cos_t ** 3)
    uv = jnp.stack([u, v], -1)
    return uv, d, dist, we, valid


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp",
                                             "max_depth"))
def render_ptracer(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                   max_depth: int = 6):
    scene = jax.lax.stop_gradient(scene)
    sensor = scene.sensors[sensor_idx]
    w_, h_ = sensor.width, sensor.height
    n = w_ * h_ * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n)

    # --- sample emitter rays (area emitters; endpoint.h sample_ray) ---
    sampler, s_pick = smp.next_2d(sampler)
    sampler, s_dir = smp.next_2d(sampler)
    n_em = scene.emitters["kind"].shape[0]
    em_idx = jnp.clip((s_pick[:, 0] * n_em).astype(jnp.int32), 0, n_em - 1)
    cdf, total_area = E.area_emitter_data(scene.vertices, scene.faces,
                                          scene.em_faces)
    ds, _spec = E._area_sample(
        {k: v[em_idx] for k, v in scene.emitters.items()},
        jnp.zeros((n, 3)), s_pick, em_idx, scene.vertices, scene.faces,
        scene.em_faces, cdf, total_area)
    # cosine-hemisphere emission direction about the emitter normal
    local = warp.square_to_cosine_hemisphere(s_dir)
    s_f, t_f = m.coordinate_system(ds.n)
    d0 = m.to_world(ds.n, s_f, t_f, local)
    pdf_pos = 1.0 / jnp.maximum(total_area[em_idx] * n_em, 1e-12)
    pdf_dir = warp.square_to_cosine_hemisphere_pdf(local)
    radiance = scene.emitters["radiance"][em_idx]
    # power-based weight: Le cos / (pdf_pos pdf_dir) ; cos cancels with pdf
    beta = radiance / jnp.maximum(pdf_pos, 1e-12)[..., None] * jnp.pi

    img_flat = jnp.zeros((h_ * w_, 3))

    def splat(img_flat, contrib, p_src, active):
        """contrib must already include the sensor importance factors."""
        uv, d, dist, we, ok = sensor_connect(sensor, p_src)
        sh = Ray.make(p_src + d * 1e-4, d, maxt=dist * (1 - 1e-3))
        occ = scene.ray_test(sh)
        ok = ok & active & ~occ
        px = jnp.clip((uv[:, 0] * w_).astype(jnp.int32), 0, w_ - 1)
        py = jnp.clip((uv[:, 1] * h_).astype(jnp.int32), 0, h_ - 1)
        idx = py * w_ + px
        return img_flat.at[idx].add(jnp.where(ok[:, None], contrib, 0.0))

    # direct splat of emitter vertices (visible emitters)
    we_uv, d_cam, dist_cam, we, ok0 = sensor_connect(sensor, ds.p)
    facing = m.dot(-d_cam * -1.0, ds.n) > 0  # emitter front side to camera
    img_flat = splat(
        img_flat,
        radiance * we[..., None] / jnp.maximum(dist_cam, 1e-6)[..., None] ** 2
        * jnp.maximum(m.dot(d_cam, ds.n), 0.0)[..., None]
        / jnp.maximum(pdf_pos, 1e-12)[..., None],
        ds.p, ok0 & facing)

    # --- bounce light particles ---
    ray_o = ds.p + d0 * 1e-4
    ray_d = d0
    active = jnp.ones((n,), jnp.bool_)

    for _ in range(max_depth - 1):
        ray = Ray.make(ray_o, ray_d)
        si = scene.ray_intersect(ray)
        active = active & si.valid
        # connect vertex to sensor
        uv, d_c, dist_c, we_c, okc = sensor_connect(sensor, si.p)
        wo_local = si.to_local(d_c)
        f_val, _ = B.eval_pdf(scene.bsdfs, scene.static.bsdf_kinds,
                              si.bsdf_index, si.wi, wo_local, active,
                              uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
        # geometry term vertex->camera (cos at vertex inside f_val)
        contrib = beta * f_val * (
            we_c / jnp.maximum(dist_c, 1e-6) ** 2)[..., None]
        img_flat = splat(img_flat, contrib, si.p, active & okc)

        # continue the particle
        sampler, s1 = smp.next_1d(sampler)
        sampler, s2 = smp.next_2d(sampler)
        bs, bsdf_w, ok = B.sample(scene.bsdfs, scene.static.bsdf_kinds,
                                  si.bsdf_index, si.wi, s1, s2, active,
                                  uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
        beta = beta * jnp.where(ok[..., None], bsdf_w, 0.0)
        nray = si.spawn_ray(si.to_world(bs.wo))
        ray_o, ray_d = nray.o, nray.d
        active = active & ok & (jnp.max(beta, -1) > 0)

    img = img_flat.reshape(h_, w_, 3) / spp
    return img
