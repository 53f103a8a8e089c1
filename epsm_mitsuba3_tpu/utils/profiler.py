"""Profiling scopes (TPU analog of include/mitsuba/core/profiler.h).

The reference annotates 26 phases with ITT/NVTX ranges (`ScopedPhase`);
here phases map to ``jax.profiler`` trace annotations + named scopes so
they appear in TensorBoard/XProf traces, and a jit-cache tracker plays the
role of ``dr.kernel_history`` (test_megakernel.py analog: assert no
recompilation across optimization iterations).
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict

import jax


class ProfilerPhase:
    """The reference's phase list (profiler.h:20-48)."""
    InitScene = "InitScene"
    LoadGeometry = "LoadGeometry"
    InitAccel = "InitAccel"
    Render = "Render"
    SamplingIntegratorSample = "SamplingIntegrator::sample"
    RayIntersect = "RayIntersect"
    RayTest = "RayTest"
    CreateSurfaceInteraction = "CreateSurfaceInteraction"
    BSDFEvaluate = "BSDFEvaluate"
    BSDFSample = "BSDFSample"
    EndpointEvaluate = "EndpointEvaluate"
    EndpointSampleDirection = "EndpointSampleDirection"
    SampleEmitterDirection = "SampleEmitterDirection"
    TextureEvaluate = "TextureEvaluate"
    MediumEvaluate = "MediumEvaluate"
    MediumSample = "MediumSample"
    PhaseFunctionEvaluate = "PhaseFunctionEvaluate"
    PhaseFunctionSample = "PhaseFunctionSample"


@contextlib.contextmanager
def scoped_phase(name: str):
    """ScopedPhase analog: a profiler trace annotation + named scope."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


def annotate(name: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with scoped_phase(name):
                return fn(*args, **kwargs)
        return wrapper
    return deco


class KernelHistory:
    """dr.kernel_history analog: track jit compilations (cache misses).

    Usage:
        kh = KernelHistory()
        with kh:
            ... run jitted code ...
        kh.compilations  # number of XLA compilations during the block
    """

    def __init__(self):
        self.compilations = 0
        self._events = []

    def __enter__(self):
        from jax._src import monitoring
        self._seen = {}

        def on_event(event: str, **kw):
            if "compile" in event and "backend_compile" in event:
                self.compilations += 1
                self._events.append(event)

        def on_event_dur(event: str, duration: float, **kw):
            if "backend_compile" in event:
                self.compilations += 1
                self._events.append(event)

        self._cb = on_event
        self._cb_dur = on_event_dur
        monitoring.register_event_listener(on_event)
        monitoring.register_event_duration_secs_listener(on_event_dur)
        return self

    def __exit__(self, *exc):
        from jax._src import monitoring
        # jax lacks an unregister API pre-0.5; clear via internal lists
        try:
            monitoring._unregister_event_listener_by_callback(self._cb)
            monitoring._unregister_event_duration_listener_by_callback(
                self._cb_dur)
        except AttributeError:
            pass
        return False


@contextlib.contextmanager
def timed(label: str, results: Dict[str, float] = None):
    """Wall-clock Timer analog (integrator.cpp m_render_timer)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
