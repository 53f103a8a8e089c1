"""AD-vs-finite-difference gradient tests — the reference's correctness bar
(src/integrators/tests/test_ad_integrators.py: mean rel err <= 0.05)."""
import numpy as np
import jax
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box


def _loss(scene, spp=16, seed=3):
    img = mi.render(scene, spp=spp, seed=seed)
    return jnp.sum(img)


def test_prb_albedo_grad_vs_fd():
    scene = mi.load_dict(cornell_box(res=16, spp=16, max_depth=3))
    g = jax.grad(_loss, allow_int=True)(scene)
    gr = np.asarray(g.bsdfs["reflectance"])

    params = mi.traverse(scene)
    key = "left.bsdf.reflectance.value"
    base = np.asarray(params[key]).copy()
    eps = 1e-2
    params[key] = base + np.array([eps, 0, 0])
    lp = float(_loss(params.update()))
    params[key] = base - np.array([eps, 0, 0])
    lm = float(_loss(params.update()))
    fd = (lp - lm) / (2 * eps)

    bidx = int(scene.shape_bsdf[list(scene.static.shape_names).index("left")])
    ad = gr[bidx, 0]
    assert abs(ad - fd) / max(abs(fd), 1e-6) < 0.05, (ad, fd)


def test_prb_emitter_radiance_grad_vs_fd():
    scene = mi.load_dict(cornell_box(res=16, spp=16, max_depth=3))
    g = jax.grad(_loss, allow_int=True)(scene)
    ge = np.asarray(g.emitters["radiance"])[0]

    params = mi.traverse(scene)
    key = "light.emitter.radiance.value"
    base = np.asarray(params[key]).copy()
    eps = 0.1
    params[key] = base + np.array([eps, 0, 0])
    lp = float(_loss(params.update()))
    params[key] = base - np.array([eps, 0, 0])
    lm = float(_loss(params.update()))
    fd = (lp - lm) / (2 * eps)
    assert abs(ge[0] - fd) / max(abs(fd), 1e-6) < 0.05, (ge[0], fd)


def test_prb_grad_is_finite_for_vertices():
    """Detached PRB drops geometry (visibility/position) terms by design —
    vertex grads must be finite; with constant vertex normals they are ~0
    (the gap the EPSM manifold integrator fills)."""
    scene = mi.load_dict(cornell_box(res=12, spp=8, max_depth=3))
    g = jax.grad(_loss, allow_int=True)(scene)
    gv = np.asarray(g.vertices)
    assert np.isfinite(gv).all()


def test_prb_vertex_grad_through_geometric_normal():
    """With face normals (shading frame = f(vertices)), PRB's attached BSDF
    re-evaluation does produce vertex-position gradients."""
    d = cornell_box(res=12, spp=8, max_depth=3)
    for k in ("floor", "back", "left", "right", "ceiling"):
        d[k]["face_normals"] = True
    scene = mi.load_dict(d)
    g = jax.grad(_loss, allow_int=True)(scene)
    gv = np.asarray(g.vertices)
    assert np.isfinite(gv).all()
    assert np.abs(gv).max() > 0


def test_inverse_rendering_albedo_recovers():
    """Config-1 bring-up (BASELINE.md): cornell-box diffuse-albedo inverse
    rendering converges toward the target albedo."""
    from epsm_mitsuba3_tpu.ad.optimizers import Adam

    scene_gt = mi.load_dict(cornell_box(res=16, spp=8, max_depth=3))
    img_ref = mi.render(scene_gt, spp=32, seed=0)

    params = mi.traverse(scene_gt)
    key = "back.bsdf.reflectance.value"
    target = np.asarray(params[key]).copy()
    params[key] = jnp.asarray([0.2, 0.2, 0.2])
    scene = params.update()

    opt = Adam(lr=0.05)
    opt["albedo"] = jnp.asarray([0.2, 0.2, 0.2])

    bidx = int(scene.shape_bsdf[list(scene.static.shape_names).index("back")])

    @jax.jit
    def step(scene, albedo, it):
        def loss_fn(albedo):
            tab = dict(scene.bsdfs)
            tab["reflectance"] = tab["reflectance"].at[bidx].set(albedo)
            sc = scene.replace(bsdfs=tab)
            img = mi.render(sc, spp=16, seed=it)
            return jnp.mean((img - img_ref) ** 2)

        return jax.grad(loss_fn)(albedo)

    start_err = float(np.abs(0.2 - target).max())
    for it in range(24):
        g = step(scene, opt["albedo"], jnp.uint32(it + 1))
        opt.step({"albedo": g})

    err = np.abs(np.asarray(opt["albedo"]) - target).max()
    # converged much closer than the start (low-spp MC correlation bias
    # bounds the final accuracy; the reference has the same property)
    assert err < 0.4 * start_err, (np.asarray(opt["albedo"]), target)
