"""epsm_mitsuba3_tpu — a TPU-native differentiable path tracer implementing
EPSM (Extended Path Space Manifolds, SIGGRAPH Asia 2023).

Brand-new JAX/XLA/Pallas framework with the capabilities of
jkxing/EPSM_Mitsuba3 (Mitsuba 3.2 + EPSM research layer), re-designed
TPU-first: one SoA wavefront megakernel per render, shard_map data
parallelism over rays, and the manifold constraint solve as vmapped batched
linear algebra instead of per-row autograd loops.

Public API mirrors ``import mitsuba as mi`` where it makes sense:

    import epsm_mitsuba3_tpu as mi
    scene  = mi.load_dict({...})          # Mitsuba dict schema
    params = mi.traverse(scene)
    img    = mi.render(scene, spp=64)
"""

from .config import set_variant, variant, config  # noqa: F401
from .core.transform import ScalarTransform4f, Transform4f  # noqa: F401
from .core.xmlparse import load_file, load_string  # noqa: F401
from .core.bitmap import Bitmap, read_image, write_image  # noqa: F401
from .models.scene import Scene, load_dict, traverse, SceneParameters  # noqa: F401
from .models.bsdf import BSDFFlags, has_flag  # noqa: F401
from .models.records import (Ray, RayFlags, SurfaceInteraction,  # noqa: F401
                             BSDFSample, DirectionSample)
from .ad.render import render, render_forward, register_integrator  # noqa: F401
from .ops.normals import (scene_with_vertices,  # noqa: F401
                          compute_vertex_normals)  # noqa: F401
from .models.bsdf import register_bsdf  # noqa: F401
from .models.emitters import register_emitter  # noqa: F401
from .models.scene import register_shape  # noqa: F401
from .models.sensors import register_sensor  # noqa: F401
from .models.textures import register_texture  # noqa: F401
from .models.samplers import register_sampler  # noqa: F401

__version__ = "0.1.0"
