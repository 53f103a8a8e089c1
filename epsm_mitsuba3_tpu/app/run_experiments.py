"""Experiment launcher (EPSM/all.sh + test.sh analog).

  python -m epsm_mitsuba3_tpu.app.run_experiments METHOD EXP [--small]

METHOD in {manifold, manifold_caustic, manifold_hybrid,
manifold_caustic_hybrid, prb, prb_reparam, path}; EXP in the exp/ module
list.  ``--small`` shrinks resolutions/iterations for smoke runs.
NOTE: the reference's all.sh also lists ``manifold_shadow``, which is never
registered in the reference either (SURVEY.md §2.5) — it is rejected here.
"""
from __future__ import annotations

import importlib
import sys

EXPERIMENTS = ("bathroom", "bedroom", "bunny", "cornellbox", "egg",
               "glassslab", "glossyball", "highlight", "shadow", "human")
METHODS = ("manifold", "manifold_caustic", "manifold_hybrid",
           "manifold_caustic_hybrid", "prb", "prb_reparam", "path")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    method, exp_name = argv[0], argv[1]
    small = "--small" in argv
    if method not in METHODS:
        raise SystemExit(f"unknown METHOD '{method}' (choose {METHODS})")
    if exp_name not in EXPERIMENTS:
        raise SystemExit(f"unknown EXP '{exp_name}' (choose {EXPERIMENTS})")

    mod = importlib.import_module(f"epsm_mitsuba3_tpu.app.exp.{exp_name}")
    kwargs = {}
    if small:
        kwargs = dict(resolution=64, spp=8, it=20, match_res=64)
        if exp_name in ("shadow",):
            kwargs["n_objects"] = 16
    exp = mod.make(**kwargs)
    from . import optim
    opt, history = optim.run(method, exp,
                             log_dir=f"results/{exp_name}/{method}")
    print("final:", exp["output"](dict(opt.items())))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
