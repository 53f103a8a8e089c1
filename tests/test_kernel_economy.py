"""Kernel-economy guard (test_megakernel.py:36-186 analog).

The reference asserts exact JIT kernel-launch counts via
``dr.kernel_history`` so a change that silently breaks megakernel fusion
or re-records kernels per iteration fails CI.  The XLA analog of a kernel
re-record is a *recompilation*: everything under ``jit`` traces once, and
an optimization loop must hit the jit cache on every subsequent
iteration.  These tests capture the ``jax_log_compiles`` stream and
assert zero cache misses after warmup — across new seeds AND across
parameter updates (vertex moves / albedo edits re-use the same compiled
executable because shapes and the static scene signature are unchanged).
"""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenes import cornell_box

import epsm_mitsuba3_tpu as mi


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.records = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            self.records.append(msg)


@pytest.fixture()
def compile_counter():
    handler = _CompileCounter()
    logger = logging.getLogger("jax._src.dispatch")
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(handler)
    try:
        yield handler
    finally:
        logger.removeHandler(handler)
        jax.config.update("jax_log_compiles", False)


def test_no_recompile_across_seeds(compile_counter):
    scene = mi.load_dict(cornell_box(res=16, spp=2))
    img0 = mi.render(scene, spp=2, seed=0)
    img0.block_until_ready()
    # guard against a vacuous pass: if the warmup itself came from a warm
    # in-process jit cache, force one known compile to prove capture works
    if not compile_counter.records:
        jax.jit(lambda x: x * 3 + 1)(jnp.ones(7)).block_until_ready()
        assert compile_counter.records, "compile-log capture is broken"
    compile_counter.records.clear()
    for s in range(1, 4):
        img = mi.render(scene, spp=2, seed=s)
        img.block_until_ready()
    assert compile_counter.records == []
    assert not np.allclose(np.asarray(img0), np.asarray(img))


def test_no_recompile_across_param_updates(compile_counter):
    scene = mi.load_dict(cornell_box(res=16, spp=2))
    params = mi.traverse(scene)
    key = [k for k in params.keys() if k.endswith("vertex_positions")][0]

    def step(delta):
        params[key] = params[key] + jnp.asarray([delta, 0.0, 0.0])
        params.update()
        img = mi.render(params.scene, spp=2, seed=0)
        img.block_until_ready()
        return img

    step(0.0)                      # warmup compile
    compile_counter.records.clear()
    imgs = [step(0.01 * i) for i in range(1, 4)]
    assert compile_counter.records == []
    # the moved geometry must actually change the image
    assert not np.allclose(np.asarray(imgs[0]), np.asarray(imgs[-1]))


def test_no_recompile_value_and_grad_loop(compile_counter):
    """The optimization-iteration shape: value_and_grad of an image loss
    through the PRB custom_vjp must compile once (integrator-launch-count
    analog of test_megakernel.py:96-186)."""
    scene = mi.load_dict(cornell_box(res=16, spp=2))

    @jax.jit
    def loss_and_grad(scene, seed):
        def loss(s):
            img = mi.render(s, spp=2, seed=seed,
                            integrator={"type": "prb", "max_depth": 3})
            return jnp.mean(img ** 2)
        return jax.value_and_grad(loss, allow_int=True)(scene)

    l, g = loss_and_grad(scene, jnp.uint32(0))
    l.block_until_ready()
    compile_counter.records.clear()
    for s in range(1, 4):
        l, g = loss_and_grad(scene, jnp.uint32(s))
        l.block_until_ready()
    assert compile_counter.records == []
