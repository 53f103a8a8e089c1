"""Emitters (TPU analog of src/emitters/* + Scene NEE, scene.cpp:226-331).

Emitter parameters live in one SoA table; next-event estimation picks an
emitter uniformly (pmf 1/E, scene.cpp:87) and then samples a direction on
the chosen emitter.  Area emitters sample mesh triangles proportionally to
area; because vertex positions are differentiable optimization parameters,
triangle areas and CDFs are recomputed *inside jit* from the current
vertices every call (the analog of params.update() re-building the area
distribution in mesh.cpp parameters_changed).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from .records import DirectionSample

KIND_AREA = 0
KIND_POINT = 1
KIND_CONSTANT = 2
KIND_ENVMAP = 3
KIND_DIRECTIONAL = 4
KIND_SPOT = 5
KIND_PROJECTOR = 6
KIND_DIRECTIONALAREA = 7

KIND_NAMES = {
    "area": KIND_AREA,
    "point": KIND_POINT,
    "constant": KIND_CONSTANT,
    "envmap": KIND_ENVMAP,
    "directional": KIND_DIRECTIONAL,
    "spot": KIND_SPOT,
    "projector": KIND_PROJECTOR,
    "directionalarea": KIND_DIRECTIONALAREA,
}

_DELTA_KINDS = (KIND_POINT, KIND_DIRECTIONAL, KIND_SPOT, KIND_PROJECTOR)

_WORLD_RADIUS = 1.0e5  # pseudo-infinite distance for constant/envmap/directional


def empty_table(n: int) -> Dict[str, jnp.ndarray]:
    f = jnp.float32
    return {
        "kind": jnp.zeros((n,), jnp.int32),
        "radiance": jnp.ones((n, 3), f),      # area/constant/envmap scale
        "intensity": jnp.ones((n, 3), f),     # point/spot
        "irradiance": jnp.ones((n, 3), f),    # directional
        "position": jnp.zeros((n, 3), f),     # point/spot
        "direction": jnp.tile(jnp.array([[0.0, 0.0, 1.0]], f), (n, 1)),
        "cutoff_cos": jnp.full((n,), jnp.cos(jnp.deg2rad(20.0)), f),  # spot
        "beam_cos": jnp.full((n,), jnp.cos(jnp.deg2rad(15.0)), f),
        "shape_index": jnp.full((n,), -1, jnp.int32),
        "texture_index": jnp.full((n,), -1, jnp.int32),  # envmap bitmap
        # --- projector frame + field of view (src/emitters/projector.cpp) ---
        "frame_x": jnp.tile(jnp.array([[1.0, 0.0, 0.0]], f), (n, 1)),
        "frame_y": jnp.tile(jnp.array([[0.0, 1.0, 0.0]], f), (n, 1)),
        "tan_fov": jnp.full((n, 2), jnp.tan(jnp.deg2rad(45.0) / 2), f),
    }


def _dir_to_latlong_uv(d):
    """World direction -> lat-long uv (envmap.cpp convention, y-up)."""
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) * (1.0 / jnp.pi)
    return jnp.stack([u, v], -1)


def triangle_areas(vertices, faces):
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    # grad-safe sqrt: a DEGENERATE face anywhere in the mesh (pole fans,
    # padding) has zero cross product, and d(sqrt)/d(0) = inf — the inf then
    # turns a perfectly valid zero cotangent into NaN (0 * inf) and poisons
    # every vertex gradient in the scene through the emitter-CDF chain
    sn = m.squared_norm(jnp.cross(p1 - p0, p2 - p0))
    return 0.5 * jnp.sqrt(jnp.maximum(sn, 1e-30))


def area_emitter_data(vertices, faces, em_faces):
    """Per-emitter padded triangle CDFs from current (traced) vertices.

    ``em_faces``: (E, Tmax) int32 global face ids, -1 padded.  Returns
    (cdf (E,Tmax) normalized, total_area (E,)).
    """
    valid = em_faces >= 0
    safe = jnp.maximum(em_faces, 0)
    areas = triangle_areas(vertices, faces)[safe] * valid
    cdf = jnp.cumsum(areas, axis=-1)
    total = cdf[:, -1]
    cdf = m.safe_div(cdf, total[:, None])
    return cdf, total


def sample_direction(
    table: Dict[str, jnp.ndarray],
    kinds_present: Tuple[int, ...],
    ref_p: jnp.ndarray,            # (N,3) reference points
    sample2: jnp.ndarray,          # (N,2)
    vertices, faces, em_faces,     # geometry for area emitters
    textures=(), env_texture: int = -1,
) -> Tuple[DirectionSample, jnp.ndarray]:
    """Scene::sample_emitter_direction (scene.cpp:226-284) without occlusion.

    Returns (DirectionSample with solid-angle pdf including the 1/E emitter
    pick probability, emitter radiance `spec` so that weight = spec/pdf).
    """
    n_em = table["kind"].shape[0]
    # uniform emitter pick with sample reuse (scene.cpp:87-107)
    u0 = sample2[..., 0]
    scaled = u0 * n_em
    em_idx = jnp.clip(scaled.astype(jnp.int32), 0, n_em - 1)
    u0r = jnp.clip(scaled - em_idx, 0.0, 1.0 - 1e-7)
    s2 = jnp.stack([u0r, sample2[..., 1]], axis=-1)
    pick_pdf = 1.0 / n_em

    from ..ops.gather import take_rows, take_rows_int
    p_em = {
        k: (take_rows(v, em_idx) if jnp.issubdtype(v.dtype, jnp.floating)
            else take_rows_int(v.astype(jnp.int32), em_idx).astype(v.dtype))
        for k, v in table.items()
    }

    ds_out = None
    spec_out = None
    cdf, total_area = (None, None)
    if KIND_AREA in kinds_present or KIND_DIRECTIONALAREA in kinds_present:
        cdf, total_area = area_emitter_data(vertices, faces, em_faces)

    env_tex = (textures[env_texture]
               if (env_texture >= 0 and env_texture < len(textures)) else None)
    for kind in kinds_present:
        if kind == KIND_ENVMAP:
            ds, spec = _envmap_sample(
                p_em, ref_p, s2, em_idx, vertices, faces, em_faces, cdf,
                total_area, env_tex)
        elif kind == KIND_PROJECTOR:
            ds, spec = _projector_sample(p_em, ref_p, s2, em_idx, textures)
        else:
            ds, spec = _SAMPLE_FNS[kind](
                p_em, ref_p, s2, em_idx, vertices, faces, em_faces, cdf,
                total_area)
        is_k = p_em["kind"] == kind
        if ds_out is None:
            ds_out, spec_out = ds, spec
        else:
            ds_out = _select_ds(is_k, ds, ds_out)
            spec_out = jnp.where(is_k[..., None], spec, spec_out)

    ds_out = ds_out.replace(
        pdf=ds_out.pdf * pick_pdf, emitter_index=em_idx.astype(jnp.int32)
    )
    # weight = radiance / pdf (scene.cpp:265-270); double-where so the
    # zero-pdf branch contributes no (possibly NaN/inf) cotangent
    ok = (ds_out.pdf > 0.0)[..., None]
    pdf_safe = jnp.where(ok, ds_out.pdf[..., None], 1.0)
    w = jnp.where(ok, spec_out / pdf_safe, 0.0)
    return ds_out, w


def _select_ds(mask, a: DirectionSample, b: DirectionSample) -> DirectionSample:
    mm = mask[..., None]
    return DirectionSample(
        p=jnp.where(mm, a.p, b.p),
        n=jnp.where(mm, a.n, b.n),
        uv=jnp.where(mm, a.uv, b.uv),
        d=jnp.where(mm, a.d, b.d),
        dist=jnp.where(mask, a.dist, b.dist),
        pdf=jnp.where(mask, a.pdf, b.pdf),
        delta=jnp.where(mask, a.delta, b.delta),
        emitter_index=jnp.where(mask, a.emitter_index, b.emitter_index),
    )


def _area_sample(p_em, ref_p, s2, em_idx, vertices, faces, em_faces, cdf,
                 total_area):
    """Area emitter sample_direction via uniform-area mesh sampling
    (area.cpp:94-117 -> mesh.cpp:530-560)."""
    from ..ops.gather import take_rows
    my_cdf = take_rows(cdf, em_idx)           # (N, Tmax)
    u = s2[..., 0]
    # branchless right-bisect: #{i: cdf[i] <= u} — a vmapped searchsorted
    # lowers to a per-lane loop on TPU, this is one vectorized compare+sum
    tri_slot = jnp.sum((my_cdf <= u[..., None]).astype(jnp.int32), axis=-1)
    tmax = em_faces.shape[1]
    tri_slot = jnp.clip(tri_slot, 0, tmax - 1)
    from ..ops.gather import take_rows, take_rows_int
    flat_slot = em_idx * tmax + tri_slot
    face_id = take_rows_int(em_faces.reshape(-1), flat_slot)
    face_id_safe = jnp.maximum(face_id, 0)
    nf = faces.shape[0]
    tri = vertices[faces]                       # (F,3,3) differentiable
    tri_n = take_rows(tri.reshape(nf, 9), face_id_safe).reshape(-1, 3, 3)
    p0 = tri_n[:, 0]
    p1 = tri_n[:, 1]
    p2 = tri_n[:, 2]
    # sample uniform barycentrics; reuse second dim + rescaled first
    from ..ops.gather import take_along2
    lo = jnp.where(tri_slot > 0,
                   take_along2(my_cdf, jnp.maximum(tri_slot - 1, 0)), 0.0)
    hi = take_along2(my_cdf, tri_slot)
    u_r = jnp.clip(m.safe_div(u - lo, hi - lo), 0.0, 1.0 - 1e-7)
    b = warp.square_to_uniform_triangle(jnp.stack([u_r, s2[..., 1]], -1))
    pos = p0 * (1.0 - b[..., 0:1] - b[..., 1:2]) + p1 * b[..., 0:1] + p2 * b[..., 1:2]
    nrm = m.normalize(jnp.cross(p1 - p0, p2 - p0))

    dvec = pos - ref_p
    dist2 = m.squared_norm(dvec)
    # grad-safe sqrt: sampling the emitter from its OWN surface (emitter-on-
    # black scenes) can make dist2 ~ 0, and d(sqrt)/d(dist2) -> inf there;
    # the NaN then leaks through every downstream jnp.where (the masked
    # branch's cotangent is still evaluated)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    d = m.safe_div(dvec, dist[..., None])
    cos_em = m.dot(-d, nrm)
    # solid-angle pdf = dist^2 / (cos * area_total)
    from ..ops.gather import take_rows
    area = take_rows(total_area[:, None], em_idx)[..., 0]
    # double-where guard: the untaken branch of a single where is still
    # differentiated, and for grazing lanes (cos_em ~ 1e-19) the vjp of
    # dist2/denom squares denom below the f32 subnormal range -> inf/NaN
    # that then poisons every downstream jnp.where (this is the reference's
    # non-issue: its NEE sampling is fully detached, scene.cpp:226)
    grazing_ok = cos_em > 1e-6
    denom_safe = jnp.where(grazing_ok, cos_em * area, 1.0)
    pdf = jnp.where(grazing_ok, dist2 / denom_safe, 0.0)
    spec = jnp.where((cos_em > 0.0)[..., None], p_em["radiance"], 0.0)
    ds = DirectionSample(
        p=pos, n=nrm, uv=b, d=d, dist=dist, pdf=pdf,
        delta=jnp.zeros(pdf.shape, jnp.bool_), emitter_index=em_idx,
    )
    return ds, spec


def _point_sample(p_em, ref_p, s2, em_idx, *_):
    dvec = p_em["position"] - ref_p
    dist2 = m.squared_norm(dvec)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    d = m.safe_div(dvec, dist[..., None])
    spec = m.safe_div(p_em["intensity"], dist2[..., None])
    ds = DirectionSample(
        p=p_em["position"], n=-d, uv=jnp.zeros(s2.shape), d=d, dist=dist,
        pdf=jnp.ones(dist.shape), delta=jnp.ones(dist.shape, jnp.bool_),
        emitter_index=em_idx,
    )
    return ds, spec


def _spot_sample(p_em, ref_p, s2, em_idx, *_):
    ds, spec = _point_sample(p_em, ref_p, s2, em_idx)
    # falloff between beam and cutoff angles (spot.cpp ``falloff_curve``)
    cos_a = m.dot(-ds.d, m.normalize(p_em["direction"]))
    t = (cos_a - p_em["cutoff_cos"]) / jnp.maximum(
        p_em["beam_cos"] - p_em["cutoff_cos"], 1e-6
    )
    fall = jnp.clip(t, 0.0, 1.0)
    return ds, spec * fall[..., None]


def _projector_sample(p_em, ref_p, s2, em_idx, textures=()):
    """Perspective texture projection (projector.cpp): a delta emitter at
    ``position`` whose per-direction intensity is the irradiance texture
    sampled through a pinhole-camera mapping of the outgoing direction."""
    ds, spec = _point_sample(p_em, ref_p, s2, em_idx)
    w = -ds.d                                  # projector -> receiver
    z = m.normalize(p_em["direction"])
    wz = m.dot(w, z)
    wx = m.dot(w, p_em["frame_x"])
    wy = m.dot(w, p_em["frame_y"])
    ndc_x = wx / jnp.maximum(wz, 1e-6) / p_em["tan_fov"][..., 0]
    ndc_y = wy / jnp.maximum(wz, 1e-6) / p_em["tan_fov"][..., 1]
    inside = (wz > 0.0) & (jnp.abs(ndc_x) <= 1.0) & (jnp.abs(ndc_y) <= 1.0)
    uv = jnp.stack([0.5 * (ndc_x + 1.0), 0.5 * (ndc_y + 1.0)], -1)
    if textures:
        from . import textures as tex_mod
        rgb = tex_mod.eval_select(textures, p_em["texture_index"], uv,
                                  jnp.ones(uv.shape[:-1] + (3,)))
    else:
        rgb = jnp.ones(uv.shape[:-1] + (3,))
    ds = ds.replace(uv=uv)
    return ds, jnp.where(inside[..., None], spec * rgb, 0.0)


def _constant_sample(p_em, ref_p, s2, em_idx, *_):
    d = warp.square_to_uniform_sphere(s2)
    pdf = warp.square_to_uniform_sphere_pdf(d)
    dist = jnp.full(pdf.shape, _WORLD_RADIUS)
    ds = DirectionSample(
        p=ref_p + d * _WORLD_RADIUS, n=-d, uv=s2, d=d, dist=dist, pdf=pdf,
        delta=jnp.zeros(pdf.shape, jnp.bool_), emitter_index=em_idx,
    )
    return ds, p_em["radiance"]


def envmap_weights(tex):
    """Luminance * sin(theta) sampling weights of a lat-long envmap
    (envmap.cpp builds the same table into a Hierarchical2D warp)."""
    h, w = tex.data.shape[:2]
    lum = (tex.data[..., 0] * 0.2126 + tex.data[..., 1] * 0.7152
           + tex.data[..., 2] * 0.0722)
    theta = (jnp.arange(h) + 0.5) / h * jnp.pi
    return lum * jnp.sin(theta)[:, None] + 1e-12


def _envmap_sample(p_em, ref_p, s2, em_idx, vertices, faces, em_faces, cdf,
                   total_area, env_tex=None):
    if env_tex is None:
        return _constant_sample(p_em, ref_p, s2, em_idx)
    # 2D inverse-CDF sampling over the lat-long grid (Marginal2D analog,
    # include/mitsuba/core/distr_2d.h)
    wgt = envmap_weights(env_tex)                       # (H, W)
    h, w = wgt.shape
    row_w = jnp.sum(wgt, axis=1)
    row_cdf = jnp.cumsum(row_w)
    total = row_cdf[-1]
    row_cdf = row_cdf / total
    col_cdf = jnp.cumsum(wgt, axis=1)
    col_cdf = col_cdf / col_cdf[:, -1:]

    # shared-array searchsorted (vectorized binary search) for the rows;
    # flattened joint cdf for the column pick would also work — the row
    # conditional is gathered per lane, so use the branchless count there
    y = jnp.clip(jnp.searchsorted(row_cdf, s2[..., 1], side="right"), 0, h - 1)
    ccdf_y = col_cdf[y]                                  # (N, W)
    x = jnp.clip(
        jnp.sum((ccdf_y <= s2[..., 0][..., None]).astype(jnp.int32), -1),
        0, w - 1)
    # continuous offset inside the texel
    u = (x.astype(jnp.float32) + 0.5) / w
    v = (y.astype(jnp.float32) + 0.5) / h
    phi = (u - 0.5) * (2.0 * jnp.pi)
    theta = v * jnp.pi
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta),
                   -sin_t * jnp.cos(phi)], -1)
    # pdf: p(texel)/texel_solid_angle ; texel sa = 2pi^2 sin(theta)/(H W)
    p_texel = wgt[y, x] / total
    pdf = p_texel * (h * w) / jnp.maximum(
        2.0 * jnp.pi * jnp.pi * sin_t, 1e-12)
    spec = p_em["radiance"] * env_tex.data[y, x]
    dist = jnp.full(pdf.shape, _WORLD_RADIUS)
    ds = DirectionSample(
        p=ref_p + d * _WORLD_RADIUS, n=-d, uv=jnp.stack([u, v], -1), d=d,
        dist=dist, pdf=pdf, delta=jnp.zeros(pdf.shape, jnp.bool_),
        emitter_index=em_idx,
    )
    return ds, spec


def envmap_pdf_direction(env_tex, d):
    """Solid-angle pdf of the envmap importance sampler for direction d."""
    wgt = envmap_weights(env_tex)
    h, w = wgt.shape
    total = jnp.sum(wgt)
    uv = _dir_to_latlong_uv(d)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 1e-12))
    return (wgt[y, x] / total) * (h * w) / jnp.maximum(
        2.0 * jnp.pi * jnp.pi * sin_t, 1e-12)


def _directional_sample(p_em, ref_p, s2, em_idx, *_):
    d = -m.normalize(p_em["direction"])
    dist = jnp.full(ref_p.shape[:-1], _WORLD_RADIUS)
    ds = DirectionSample(
        p=ref_p + d * _WORLD_RADIUS, n=-d, uv=s2, d=d, dist=dist,
        pdf=jnp.ones(dist.shape), delta=jnp.ones(dist.shape, jnp.bool_),
        emitter_index=em_idx,
    )
    return ds, p_em["irradiance"]


_SAMPLE_FNS = {
    KIND_AREA: _area_sample,
    KIND_DIRECTIONALAREA: _area_sample,
    KIND_POINT: _point_sample,
    KIND_SPOT: _spot_sample,
    KIND_CONSTANT: _constant_sample,
    KIND_ENVMAP: _envmap_sample,
    KIND_DIRECTIONAL: _directional_sample,
    KIND_PROJECTOR: _spot_sample,  # overridden in sample_direction (textures)
}

_CUSTOM_KIND_BASE = 1000
_CUSTOM_PDF_FNS: Dict[int, object] = {}
_CUSTOM_EVAL_FNS: Dict[int, object] = {}


def register_emitter(name: str, *, sample_fn, pdf_fn=None,
                     eval_hit_fn=None) -> int:
    """Third-party emitter plugin path — the emitter leg of the reference's
    ``PluginManager::register_python_plugin`` (src/core/plugin.cpp:168),
    completing the plugin-manager story alongside ``register_integrator``
    and ``register_bsdf``.

    ``sample_fn(row, ref_p, s2) -> (DirectionSample, spec (N,3))`` samples a
    NEE direction toward the emitter from reference points ``ref_p`` (N,3)
    with 2-D uniforms ``s2``; ``row`` is the gathered per-lane emitter-table
    row (keys: 'position', 'direction', 'intensity', 'radiance',
    'cutoff_cos', ... — generic fields the dict loader parses for every
    emitter).  The returned ``DirectionSample.pdf`` must be the solid-angle
    pdf WITHOUT the 1/E emitter-pick factor (applied by the dispatcher,
    scene.cpp:265), and ``.delta`` marks Dirac emitters (skipped by MIS).

    ``pdf_fn(row, ref_p, d, hit_p, hit_n) -> pdf (N,)`` is the
    ``pdf_emitter_direction`` leg for MIS against BSDF sampling; omit it
    for delta emitters (pdf identically 0, like point/spot).

    ``eval_hit_fn(row, wi_local_z, uv) -> (N,3)`` is ``Emitter::eval`` for
    custom emitters attached to scene shapes (BSDF-sampled direct hits);
    omit it for shapeless emitters.  ``uv`` is the hit's surface uv when the
    caller has a SurfaceInteraction and ``None`` otherwise (NEE-side
    re-evaluation) — textured custom emitters must handle ``uv=None``.

    MIS-consistency contract (enforced): a shape-attached custom emitter
    (``eval_hit_fn`` supplied) MUST also supply ``pdf_fn`` — NEE weights its
    samples by ``mis_weight(ds.pdf, bsdf_pdf)`` while the BSDF-hit leg would
    get full weight if ``pdf_direction`` returned 0 for this kind, so the two
    strategies would sum to >1 and the image would be biased bright.
    Conversely a SHAPELESS custom emitter (no ``eval_hit_fn``) must mark its
    samples ``delta=True``: BSDF rays can never hit it (escaped rays are
    evaluated only through the builtin constant/envmap ``eval_env`` path), so
    NEE must take full weight — ``delta=True`` makes NEE-only unbiased, while
    ``delta=False`` would MIS-downweight energy the BSDF leg can never
    recover.

    Differentiation note: under PRB the attached NEE radiance is recomputed
    via ``eval_hit``, so differentiating a custom emitter's intensity
    parameters requires an ``eval_hit_fn`` (mirroring the builtin point-light
    limitation) — without one the primal is correct but the intensity
    cotangent from the NEE term is zero.

    Registration is static (before tracing): the scene's static kind-set
    dispatch simply gains one more branch, so scenes can then use
    ``{"type": "<name>", ...}`` like any built-in.  Returns the kind id."""
    if name in KIND_NAMES:
        raise ValueError(f"emitter type '{name}' already registered")
    if eval_hit_fn is not None and pdf_fn is None:
        raise ValueError(
            f"emitter type '{name}': eval_hit_fn without pdf_fn would "
            "double-count — NEE MIS-downweights its samples against a "
            "BSDF-hit leg whose pdf_direction would be 0 (full weight). "
            "Shape-attached custom emitters require both hooks.")
    kind = _CUSTOM_KIND_BASE + sum(
        1 for k in _SAMPLE_FNS if k >= _CUSTOM_KIND_BASE)
    KIND_NAMES[name] = kind

    def _wrapped(p_em, ref_p, s2, em_idx, *_geom):
        ds, spec = sample_fn(p_em, ref_p, s2)
        return ds.replace(emitter_index=em_idx), spec

    _SAMPLE_FNS[kind] = _wrapped
    if pdf_fn is not None:
        _CUSTOM_PDF_FNS[kind] = pdf_fn
    if eval_hit_fn is not None:
        _CUSTOM_EVAL_FNS[kind] = eval_hit_fn
    return kind


def pdf_direction(
    table, kinds_present, ref_p, d, hit_emitter_idx, hit_p, hit_n,
    vertices, faces, em_faces, active, textures=(), env_texture: int = -1,
):
    """Scene::pdf_emitter_direction (scene.cpp:286-331) for MIS: the
    solid-angle NEE pdf of having sampled direction ``d`` that hit emitter
    ``hit_emitter_idx`` at ``hit_p``/``hit_n``."""
    from ..ops.gather import take_rows
    n_em = table["kind"].shape[0]
    safe_idx = jnp.maximum(hit_emitter_idx, 0)
    kind = take_rows(table["kind"][:, None], safe_idx)[..., 0]
    pdf = jnp.zeros(ref_p.shape[:-1], ref_p.dtype)
    if KIND_AREA in kinds_present or KIND_DIRECTIONALAREA in kinds_present:
        _, total_area = area_emitter_data(vertices, faces, em_faces)
        area = take_rows(total_area[:, None], safe_idx)[..., 0]
        dvec = hit_p - ref_p
        dist2 = m.squared_norm(dvec)
        cos_em = m.dot(-d, hit_n)
        pdf_area = jnp.where(
            cos_em > 1e-7, m.safe_div(dist2, cos_em * area), 0.0
        )
        is_area = (kind == KIND_AREA) | (kind == KIND_DIRECTIONALAREA)
        pdf = jnp.where(is_area, pdf_area, pdf)
    if KIND_CONSTANT in kinds_present or KIND_ENVMAP in kinds_present:
        is_inf = (kind == KIND_CONSTANT) | (kind == KIND_ENVMAP)
        env_tex = (textures[env_texture]
                   if (env_texture >= 0 and env_texture < len(textures))
                   else None)
        if env_tex is not None:
            inf_pdf = jnp.where(kind == KIND_ENVMAP,
                                envmap_pdf_direction(env_tex, d),
                                warp.square_to_uniform_sphere_pdf(d))
        else:
            inf_pdf = warp.square_to_uniform_sphere_pdf(d)
        pdf = jnp.where(is_inf, inf_pdf, pdf)
    custom_present = [k for k in kinds_present if k in _CUSTOM_PDF_FNS]
    if custom_present:
        row = {k: take_rows(v, safe_idx) for k, v in table.items()}
        for ck in custom_present:
            cpdf = _CUSTOM_PDF_FNS[ck](row, ref_p, d, hit_p, hit_n)
            pdf = jnp.where(kind == ck, cpdf, pdf)
    pdf = pdf / n_em
    return jnp.where(active & (hit_emitter_idx >= 0), pdf, 0.0)


def eval_hit(table, si_emitter_idx, wi_local_z, uv=None, kinds_present=None):
    """Area emitter L on direct hit (area.cpp ``eval``): radiance if the
    hit is on the emissive (front) side.

    ``kinds_present`` (the scene's static emitter-kind set) gates which
    custom eval branches are traced: only custom kinds actually present in
    the scene emit a branch, matching ``pdf_direction`` — foreign-kind
    registrations cost nothing and cannot poison gradients through
    ``jnp.where`` on default table rows."""
    from ..ops.gather import take_rows
    safe = jnp.maximum(si_emitter_idx, 0)
    rad = take_rows(table["radiance"], safe)
    kind = take_rows(table["kind"][:, None], safe)[..., 0]
    is_area = (kind == KIND_AREA) | (kind == KIND_DIRECTIONALAREA)
    vis = (si_emitter_idx >= 0) & is_area & (wi_local_z > 0.0)
    out = jnp.where(vis[..., None], rad, 0.0)
    if _CUSTOM_EVAL_FNS:
        custom = [k for k in _CUSTOM_EVAL_FNS
                  if kinds_present is None or k in kinds_present]
        if custom:
            row = {k: take_rows(v, safe) for k, v in table.items()}
            for ck in custom:
                val = _CUSTOM_EVAL_FNS[ck](row, wi_local_z, uv)
                out = jnp.where(
                    ((si_emitter_idx >= 0) & (kind == ck))[..., None],
                    val, out)
    return out


def eval_env(table, kinds_present, d, active, textures=(),
             env_texture: int = -1):
    """Environment contribution for escaped rays (constant.cpp / envmap.cpp):
    constant emitters contribute their radiance; envmaps modulate by the
    lat-long bitmap lookup."""
    out = jnp.zeros(d.shape, d.dtype)
    if KIND_CONSTANT not in kinds_present and KIND_ENVMAP not in kinds_present:
        return out
    kind = table["kind"]
    is_const = kind == KIND_CONSTANT
    rad = jnp.sum(jnp.where(is_const[:, None], table["radiance"], 0.0), axis=0)
    out = jnp.broadcast_to(rad[None, :], d.shape)
    if KIND_ENVMAP in kinds_present:
        env_tex = (textures[env_texture]
                   if (env_texture >= 0 and env_texture < len(textures))
                   else None)
        is_env = kind == KIND_ENVMAP
        scale = jnp.sum(jnp.where(is_env[:, None], table["radiance"], 0.0),
                        axis=0)
        if env_tex is not None:
            uv = _dir_to_latlong_uv(d)
            from . import textures as tex_mod
            val = tex_mod.eval_one(env_tex, uv)
            out = out + scale[None, :] * val
        else:
            out = out + jnp.broadcast_to(scale[None, :], d.shape)
    return jnp.where(active[..., None], out, 0.0)
