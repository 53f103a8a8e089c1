"""Command-line renderer — the ``mitsuba`` CLI analog
(src/mitsuba/mitsuba.cpp:162-177).

  python -m epsm_mitsuba3_tpu.cli scene.xml -o out.exr -s 0 -D key=value \
      --spp 64 --integrator path --depth 6

Accepts XML scenes (core/xmlparse.py) with -D parameter substitution, any
sensor index, spp/integrator overrides, and writes EXR/PNG/PFM output.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="epsm-mitsuba3-tpu",
        description="TPU-native differentiable path tracer (EPSM)")
    ap.add_argument("scene", help="scene .xml file")
    ap.add_argument("-o", "--output", default="output.exr")
    ap.add_argument("-s", "--sensor", type=int, default=0)
    ap.add_argument("-D", "--define", action="append", default=[],
                    metavar="key=value", help="scene parameter substitution")
    ap.add_argument("--spp", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--integrator", default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("-m", "--mode", default="tpu_ad_rgb",
                    help="variant name (accepted for parity; dtype only)")
    args = ap.parse_args(argv)

    import epsm_mitsuba3_tpu as mi
    mi.set_variant(args.mode)

    params = dict(d.split("=", 1) for d in args.define)
    t0 = time.time()
    scene = mi.load_file(args.scene, parameters=params or None)
    print(f"[epsm-mi3-tpu] loaded '{args.scene}' "
          f"({len(scene.static.shape_names)} shapes, "
          f"{scene.faces.shape[0]} triangles) in {time.time()-t0:.2f}s")

    integrator = None
    if args.integrator or args.depth:
        integrator = {}
        if args.integrator:
            integrator["type"] = args.integrator
        if args.depth:
            integrator["max_depth"] = args.depth

    t0 = time.time()
    img = mi.render(scene, spp=args.spp, seed=args.seed, sensor=args.sensor,
                    integrator=integrator)
    import numpy as np
    img = np.asarray(img)
    dt = time.time() - t0
    h, w = img.shape[:2]
    print(f"[epsm-mi3-tpu] rendered {w}x{h} in {dt:.2f}s")

    from epsm_mitsuba3_tpu.core.bitmap import write_image
    write_image(args.output, img[..., :3])
    print(f"[epsm-mi3-tpu] wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
