"""Human pose optimization driver (EPSM/optim_human.py analog).

The reference bridges Dr.Jit vertex gradients into torch SMPL pose
gradients (optim_human.py:123-131); here the LBS model is JAX so the whole
chain renderer -> vertices -> LBS -> pose is one differentiable program and
the generic driver applies (optim.py machinery with the human config)."""
from __future__ import annotations


def run(method: str = "manifold", iters: int = None, **kwargs):
    from . import optim
    from .exp import human
    exp = human.make(**kwargs)
    return optim.run(method, exp, iters=iters)


if __name__ == "__main__":
    import sys
    run(sys.argv[1] if len(sys.argv) > 1 else "manifold")
