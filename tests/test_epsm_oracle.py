"""Reference-free EPSM oracle (VERDICT r3 Next #7).

The only fully independent check of the manifold integrator's
constraint-solve gradients: a from-scratch NUMPY specular tracer and a
from-scratch NUMPY debiased-Sinkhorn divergence compute the EPSM
objective S(render(theta), target) by finite differences, and the
framework's `manifold` integrator + `Matcher` pipeline (exactly the
app/optim.py gradient: grad of sum(img5 * g5)) must reproduce it.

Shares NO code with the framework on either leg:
 * tracer: camera -> mirror quad (perfect specular) -> area light —
   the minimal specular chain the EPSM constraint system exists for
   (EPSM/epsm.py logs the mirror vertex; the solve ties it to the
   endpoints; translating the light moves the reflected spot).
 * Sinkhorn: plain numpy entropic OT with geomloss semantics
   (C = |x-y|^2/2, eps-annealing, debiased S = OT(a,b) - OT(a,a)/2
   - OT(b,b)/2) — same *definition* as ops/sinkhorn.py, different code.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.core.transform import ScalarTransform4f as T

RES = 24
FOV = 45.0
CAM_O = (0.0, 0.0, 4.0)
CAM_T = (0.0, 0.0, 0.0)

# quad = (origin, edge_u, edge_v, kind) with kind in {mirror, light}
# mirror: 2x2 quad at z=0 facing +z (towards the camera)
MIRROR = (np.array([-1.0, -1.0, 0.0]), np.array([2.0, 0.0, 0.0]),
          np.array([0.0, 2.0, 0.0]))
# light: 1.2x1.2 quad near the camera plane, above the frustum, facing
# the mirror (normal -z = cross(eu, ev)); its reflection is what the
# camera sees in the mirror
LIGHT0 = (np.array([-0.6, 0.4, 3.2]), np.array([0.0, 1.2, 0.0]),
          np.array([1.2, 0.0, 0.0]))
LE = 0.9   # <= 1 so the matcher's rgb clip stays inactive


def _np_camera_rays(spp, rng):
    n = RES * RES * spp
    pix = np.arange(RES * RES).repeat(spp)
    px = pix % RES + rng.random(n)
    py = pix // RES + rng.random(n)
    tanf = np.tan(np.deg2rad(FOV) / 2)
    d = np.stack([(1 - 2 * px / RES) * tanf, (1 - 2 * py / RES) * tanf,
                  np.ones(n)], -1)
    Tm = np.asarray(mi.Transform4f.look_at(
        origin=list(CAM_O), target=list(CAM_T), up=[0, 1, 0]).matrix)
    d = d @ Tm[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.broadcast_to(np.asarray(CAM_O), (n, 3)).astype(np.float64), d


def _np_quad_hit(o, d, q):
    qo, eu, ev = q
    qn = np.cross(eu, ev)
    qn = qn / np.linalg.norm(qn)
    denom = d @ qn
    t = ((qo - o) @ qn) / np.where(np.abs(denom) < 1e-12, np.inf, denom)
    p = o + t[:, None] * d
    rel = p - qo
    u = (rel @ eu) / (eu @ eu)
    v = (rel @ ev) / (ev @ ev)
    ok = (t > 1e-4) & np.isfinite(t) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    return ok, t, p, qn


def _np_render(theta, spp, rng):
    """Mirror-spot image: camera ray -> mirror -> reflected ray -> light."""
    light = (LIGHT0[0] + np.array([theta, 0.0, 0.0]), LIGHT0[1], LIGHT0[2])
    o, d = _np_camera_rays(spp, rng)
    n = o.shape[0]
    L = np.zeros((n, 3))
    hit_m, t_m, p_m, n_m = _np_quad_hit(o, d, MIRROR)
    # light directly visible? (it is behind the camera here, but keep the
    # check so the scene stays general)
    hit_l0, t_l0, _, n_l = _np_quad_hit(o, d, light)
    front0 = (d @ n_l) < 0
    direct = hit_l0 & front0 & (~hit_m | (t_l0 < t_m))
    L[direct] = LE
    # specular reflection off the mirror (n_m is the constant +z normal)
    d_r = d - 2.0 * np.outer(d @ n_m, n_m)
    hit_l, t_l, _, _ = _np_quad_hit(p_m + 1e-5 * d_r, d_r, light)
    front = (d_r @ n_l) < 0
    refl = hit_m & ~direct & hit_l & front
    L[refl] = LE
    return L.reshape(RES * RES, spp, 3).mean(1)


def _np_softmin(eps, x, y, g, log_w):
    c = 0.5 * np.sum((x[:, None, :] - y[None, :, :]) ** 2, -1)
    z = (g[None, :] + log_w) / eps - c / eps
    zmax = z.max(1, keepdims=True)
    return -eps * (np.log(np.exp(z - zmax).sum(1)) + zmax[:, 0])


def _np_sinkhorn_loss(xr, xt, blur=0.01, scaling=0.9):
    """Debiased Sinkhorn divergence, uniform weights (numpy)."""
    import math
    n, ddim = xr.shape
    m = xt.shape[0]
    la, lb = -math.log(n), -math.log(m)
    eps0, eps1 = float(ddim), blur ** 2
    iters = max(2, int(math.ceil(math.log(eps1 / eps0)
                                 / math.log(scaling ** 2))) + 1)
    eps_list = [max(eps1, eps0 * (scaling ** 2) ** i) for i in range(iters)]
    eps_list[-1] = eps1
    f = np.zeros(n)
    g = np.zeros(m)
    a = np.zeros(n)
    b = np.zeros(m)
    for eps in eps_list:
        f_new = _np_softmin(eps, xr, xt, g, lb)
        g_new = _np_softmin(eps, xt, xr, f, la)
        a_new = _np_softmin(eps, xr, xr, a, la)
        b_new = _np_softmin(eps, xt, xt, b, lb)
        f = 0.5 * (f + f_new)
        g = 0.5 * (g + g_new)
        a = 0.5 * (a + a_new)
        b = 0.5 * (b + b_new)
    eps = eps1
    f = _np_softmin(eps, xr, xt, g, lb)
    a = _np_softmin(eps, xr, xr, a, la)
    return float(f.mean() + g.mean() - a.mean() - b.mean())


def _pos_grid():
    xs = np.linspace(0.0, 1.0, RES)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    return np.stack([gy, gx], -1).reshape(-1, 2)


def _np_loss(theta, target5, spp, seed):
    rgb = np.clip(_np_render(theta, spp, np.random.default_rng(seed)), 0, 1)
    x5 = np.concatenate([rgb, _pos_grid()], -1)
    return _np_sinkhorn_loss(x5, target5)


def _framework_scene():
    return mi.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": FOV,
                   "to_world": T.look_at(origin=list(CAM_O),
                                         target=list(CAM_T), up=(0, 1, 0)),
                   "film": {"type": "hdrfilm", "width": RES, "height": RES,
                            "rfilter": {"type": "box"}}},
        "mirror": {"type": "rectangle",
                   "bsdf": {"type": "conductor"}},
        "light": {"type": "rectangle",
                  "to_world": T.translate([0.0, 1.0, 3.2])
                  .rotate([1, 0, 0], 180).scale(0.6),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": LE}}},
    })


@pytest.mark.slow
def test_manifold_gradient_vs_independent_fd():
    """d/dtheta of the Sinkhorn objective for a light translated behind a
    mirror: numpy-tracer finite differences vs the manifold integrator's
    constraint-solve gradient through the Matcher adjoint (the exact
    app/optim.py estimator, EPSM/optim.py:110-157)."""
    from epsm_mitsuba3_tpu.ops.sinkhorn import Matcher

    # framework scene's light: rectangle at center (0,1,3.2) facing -z
    # spanning 1.2x1.2 — the SAME quad as LIGHT0 (origin-corner form)
    scene0 = _framework_scene()
    li = list(scene0.static.shape_names).index("light")
    s, c = scene0.static.vertex_ranges[li]

    # sanity: framework primal and numpy tracer must see the same spot
    img_fw = np.asarray(mi.render(
        scene0, spp=64, seed=3,
        integrator={"type": "path", "max_depth": 3}))[..., :3]
    img_np = _np_render(0.0, 64, np.random.default_rng(3)).reshape(
        RES, RES, 3)
    assert abs(img_fw.mean() - img_np.mean()) < 0.02, \
        (img_fw.mean(), img_np.mean())

    theta0, eps = 0.25, 0.05
    target5 = np.concatenate(
        [np.clip(_np_render(0.0, 256, np.random.default_rng(0)), 0, 1),
         _pos_grid()], -1)

    fds = []
    for sd in range(4):
        lp = _np_loss(theta0 + eps, target5, 128, 100 + sd)
        lm = _np_loss(theta0 - eps, target5, 128, 100 + sd)
        fds.append((lp - lm) / (2 * eps))
    fd = float(np.mean(fds))
    fd_se = float(np.std(fds) / np.sqrt(len(fds)))

    matcher = Matcher(RES)
    gt_low = jnp.asarray(target5[:, :3], jnp.float32)

    def loss(theta, seed):
        shift = jnp.concatenate([theta[None], jnp.zeros(2, jnp.float32)])
        # scene_with_vertices (not .replace) so the BVH/derived state stays
        # consistent if this scene ever grows past the brute-force
        # threshold (ADVICE r4)
        sc = mi.scene_with_vertices(
            scene0, scene0.vertices.at[s:s + c].add(shift[None, :]))
        img = mi.render(sc, spp=16, seed=seed,
                        integrator={"type": "manifold", "max_depth": 3})
        img_low = jax.lax.stop_gradient(img[..., :3]).reshape(-1, 3)
        g5 = matcher.match_Sinkhorn(img_low, gt_low)
        g5 = jax.lax.stop_gradient(g5.reshape(RES, RES, 5))
        # matcher returns grad * n (matcher.py:60); the numpy loss is the
        # raw divergence, so undo the scale for comparability
        return jnp.sum(img * g5) / (RES * RES)

    gs = [float(jax.grad(loss)(jnp.float32(theta0), jnp.uint32(sd)))
          for sd in range(4)]
    ad = float(np.mean(gs))
    ad_se = float(np.std(gs) / np.sqrt(len(gs)))

    assert np.isfinite(ad) and np.isfinite(fd)
    assert np.sign(ad) == np.sign(fd), (ad, fd)
    # EPSM's estimator is itself first-order (OT envelope + constraint
    # solve); demand the right sign and the right scale
    tol = 0.5 * abs(fd) + 2.0 * (fd_se + ad_se)
    assert abs(ad - fd) < tol, (ad, fd, fd_se, ad_se)
