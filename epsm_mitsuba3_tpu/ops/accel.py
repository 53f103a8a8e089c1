"""Acceleration-structure dispatch (scene_embree.inl / scene_optix.inl analog).

Chooses between brute-force intersection (small scenes: pure vectorized VPU
work, zero divergence — faster than any tree below a few thousand
triangles) and BVH traversal (ops/bvh.py builder + ops/traverse.py
while-loop kernel) for large scenes.  The switch is static per scene size,
so each compiled render picks exactly one path.
"""
from __future__ import annotations

from . import intersect as I

#: scenes with at most this many triangles use brute force
BRUTE_FORCE_MAX_TRIS = 4096


def use_brute_force(scene) -> bool:
    return scene.faces.shape[0] <= BRUTE_FORCE_MAX_TRIS or getattr(
        scene, "bvh", None
    ) is None


def _on_tpu() -> bool:
    import jax
    return jax.default_backend() == "tpu"


def _use_pallas_bvh(scene, ray) -> bool:
    """Large-scene TPU path: packet traversal with VMEM-resident tree
    (ops/pallas_traverse.py) — the OptiX-megakernel analog."""
    from .pallas_traverse import BLOCK_RAYS, PALLAS_BVH_MAX_TRIS
    return (_on_tpu()
            and scene.faces.shape[0] <= PALLAS_BVH_MAX_TRIS
            and ray.o.shape[0] >= BLOCK_RAYS)


def ray_intersect(scene, ray, coherent: bool = False):
    if use_brute_force(scene):
        if _on_tpu() and ray.o.shape[0] >= 4096:
            from . import pallas_intersect as PI
            return PI.ray_intersect_pallas(ray, scene.vertices, scene.faces)
        return I.ray_intersect_brute(ray, scene.vertices, scene.faces)
    if _use_pallas_bvh(scene, ray):
        from . import pallas_traverse as PT
        return PT.bvh_ray_intersect_pallas(scene, ray, coherent=coherent)
    from . import traverse as T
    return T.bvh_ray_intersect(scene, ray)


def ray_test(scene, ray, coherent: bool = True):
    # NEE shadow wavefronts converge on emitters: direction-coherent, so
    # they keep the large packet geometry by default
    if use_brute_force(scene):
        if _on_tpu() and ray.o.shape[0] >= 4096:
            from . import pallas_intersect as PI
            return PI.ray_test_pallas(ray, scene.vertices, scene.faces)
        return I.ray_test_brute(ray, scene.vertices, scene.faces)
    if _use_pallas_bvh(scene, ray):
        from . import pallas_traverse as PT
        return PT.bvh_ray_test_pallas(scene, ray, coherent=coherent)
    from . import traverse as T
    return T.bvh_ray_test(scene, ray)
