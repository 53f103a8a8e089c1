"""Path tracer with NEE + MIS (the reference's PRB loop, prb.py:60-253 /
epsm.py:308-501, re-expressed as one jitted ``lax.scan`` "megakernel").

Dr.Jit records the ``mi.Loop`` symbolically and fuses it into one CUDA
kernel; the TPU analog is a ``lax.scan`` over the (static) maximum depth
with masked lanes — XLA fuses each bounce into a handful of kernels and
the whole loop compiles once.  Divergence is handled by masking (all lanes
execute every bounce; Russian roulette masks lanes off).

Gradient strategy (mirrors ``_RenderOp``/PRB, util.py:352-517):
 * the primal loop is fully detached;
 * ``render`` is a ``jax.custom_vjp`` whose backward replays the loop with
   an identical sampler stream and, at every bounce, evaluates the local
   differentiable contribution  Lo = Le + Lr_dir + L_ind * replace_grad(1,
   inv_det * bsdf_val)  (epsm.py:688-715) and accumulates its vjp w.r.t.
   the scene's differentiable leaves with cotangent δL.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..models import bsdf as B
from ..models import emitters as E
from ..models import samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I
from .common import mis_weight


class LoopState(NamedTuple):
    sampler: Any
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    depth: jnp.ndarray
    L: jnp.ndarray
    beta: jnp.ndarray
    eta: jnp.ndarray
    active: jnp.ndarray
    prev_p: jnp.ndarray
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray


def _emitter_hit_le(scene, si, ray_d, prev_p, prev_bsdf_pdf, prev_bsdf_delta,
                    active):
    """Direct emission at the current vertex with MIS vs NEE
    (epsm.py:566-577)."""
    ek = scene.static.emitter_kinds
    # pdf of having NEE-sampled this emitter hit from the previous vertex
    ds_pdf = E.pdf_direction(
        scene.emitters, ek, prev_p, ray_d, si.emitter_index, si.p, si.n,
        scene.vertices, scene.faces, scene.em_faces,
        active & ~prev_bsdf_delta, scene.textures,
        scene.static.env_texture,
    )
    mis = mis_weight(prev_bsdf_pdf, ds_pdf)
    le_surf = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                         uv=si.uv, kinds_present=ek)
    le_surf = jnp.where((active & si.valid)[..., None], le_surf, 0.0)
    # escaped rays: environment emitters
    env_pdf = E.pdf_direction(
        scene.emitters, ek, prev_p, ray_d,
        jnp.zeros_like(si.emitter_index), si.p, si.n,
        scene.vertices, scene.faces, scene.em_faces,
        active & ~prev_bsdf_delta, scene.textures,
        scene.static.env_texture,
    ) if (E.KIND_CONSTANT in ek or E.KIND_ENVMAP in ek) else None
    le_env = E.eval_env(scene.emitters, ek, ray_d, active & ~si.valid,
                        scene.textures, scene.static.env_texture)
    if env_pdf is not None:
        mis_env = mis_weight(prev_bsdf_pdf, jnp.where(~si.valid, env_pdf, 0.0))
        le = mis[..., None] * le_surf + mis_env[..., None] * le_env
    else:
        le = mis[..., None] * le_surf + le_env
    return le


def _nee(scene, si, sampler, active_em, occl_cached=None):
    """Emitter sampling incl. visibility (epsm.py:585-605).

    ``occl_cached``: recorded occlusion from a prior identical-RNG pass —
    skips the shadow-ray traversal entirely (backward replay)."""
    sampler, s2 = smp.next_2d(sampler)
    ds, em_weight = E.sample_direction(
        scene.emitters, scene.static.emitter_kinds, si.p, s2,
        scene.vertices, scene.faces, scene.em_faces,
        scene.textures, scene.static.env_texture,
    )
    active_em = active_em & (ds.pdf != 0.0)
    if occl_cached is not None:
        occluded = occl_cached
    else:
        # visibility; lanes with no NEE work carry zero-extent rays so the
        # any-hit kernel skips them
        shadow_ray = si.spawn_ray(ds.d)
        shadow_ray = shadow_ray.replace(
            maxt=jnp.where(active_em, ds.dist * (1.0 - 1e-3), 0.0))
        occluded = scene.ray_test(shadow_ray)
    em_weight = jnp.where((active_em & ~occluded)[..., None], em_weight, 0.0)

    wo = si.to_local(ds.d)
    bsdf_val_em, bsdf_pdf_em = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, wo,
        active_em, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p,
    )
    mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf_em))
    lr_dir = mis_em[..., None] * bsdf_val_em * em_weight
    return sampler, ds, lr_dir, active_em, occluded


def bounce(scene, st: LoopState, it: int, max_depth: int, rr_depth: int,
           attached: bool = False, cached: dict = None):
    """One path-tracing bounce. Returns (new_state, per-bounce record dict).

    With ``attached=False`` everything is detached (primal).  The record
    dict carries what PRB/EPSM backward passes need.

    ``cached``: per-bounce trace records from a prior identical-RNG pass
    ({'pi': PreliminaryIntersection, 'occl': (N,) bool}) — the bounce then
    performs NO scene traversal at all (the backward-replay fast path;
    traversal dominates large-scene wall time, so the fwd+bwd pipeline
    traces the scene exactly once).
    """
    # dead lanes get zero-extent rays: the traversal kernels cull them per
    # lane (t_best starts at maxt), and a fully-dead sorted packet exits
    # after the root pop (pallas_traverse.py stale-entry cull)
    ray = Ray.make(st.ray_o, st.ray_d,
                   maxt=jnp.where(st.active, jnp.inf, 0.0))
    if cached is not None:
        pi = cached["pi"]
    else:
        # bounce 0 = camera rays: coherent packet geometry (the analog of
        # the reference passing coherent=True there, prb.py:386)
        pi = scene.ray_intersect_preliminary(ray, coherent=(it == 0))
        pi = pi.replace(valid=pi.valid & st.active)
    si = I.compute_surface_interaction(scene, ray, pi, RayFlags.All)

    le = _emitter_hit_le(
        scene, si, st.ray_d, st.prev_p, st.prev_bsdf_pdf,
        st.prev_bsdf_delta, st.active,
    )
    le = st.beta * le

    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    active_next = (st.depth + 1 < max_depth) & si.valid & st.active
    active_em = active_next & B.has_flag(bsdf_flags, B.BSDFFlags.Smooth)

    sampler, ds, lr_dir, active_em, occl = _nee(
        scene, si, st.sampler, active_em,
        occl_cached=None if cached is None else cached["occl"])
    lr_dir = st.beta * lr_dir

    sampler, s1 = smp.next_1d(sampler)
    sampler, s2 = smp.next_2d(sampler)
    bs, bsdf_weight, ok = B.sample(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, s1, s2,
        active_next, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p,
    )

    L = st.L + jnp.where(st.active[..., None], le + lr_dir, 0.0)
    wo_world = si.to_world(bs.wo)
    new_ray = si.spawn_ray(wo_world)
    eta = st.eta * jnp.where(ok, bs.eta, 1.0)
    beta = st.beta * jnp.where(ok[..., None], bsdf_weight, 0.0)

    beta_max = jnp.max(beta, axis=-1)
    active_next = active_next & (beta_max != 0.0)
    rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
    rr_active = st.depth >= rr_depth
    beta = jnp.where(
        rr_active[..., None], beta / jnp.maximum(rr_prob, 1e-8)[..., None], beta
    )
    sampler, rr_u = smp.next_1d(sampler)
    rr_continue = rr_u < rr_prob
    active_next = active_next & (~rr_active | rr_continue)

    depth = st.depth + si.valid.astype(st.depth.dtype)

    # NOTE on null lobes: a null/mask crossing sets prev_bsdf_delta=True
    # (Null is in the Delta lattice), so an emitter hit behind it gets full
    # weight — consistent here because ray_test treats null shapes as
    # OCCLUDERS for NEE (scene.py:105, the reference path.cpp limitation):
    # the two strategies still partition unity.  volpath, whose shadow rays
    # march THROUGH null boundaries, must instead preserve the real-vertex
    # MIS state across null crossings (see integrators/volpath.py).
    new_state = LoopState(
        sampler=sampler,
        ray_o=new_ray.o,
        ray_d=new_ray.d,
        depth=depth,
        L=L,
        beta=beta,
        eta=eta,
        active=active_next,
        prev_p=jax.lax.stop_gradient(si.p),
        prev_bsdf_pdf=bs.pdf,
        prev_bsdf_delta=B.has_flag(bs.sampled_type, B.BSDFFlags.Delta),
    )
    record = {
        "si": si,
        "ds": ds,
        "bs": bs,
        "le": le,
        "lr_dir": lr_dir,
        "active": st.active,
        "active_em": active_em,
        "bsdf_flags": bsdf_flags,
        "beta": st.beta,
        "bsdf_weight": bsdf_weight,
        "wo_world": wo_world,
        "pi": pi,
        "occl": occl,
    }
    return new_state, record


def init_state(sampler, ray: Ray, n: int, dtype=None) -> LoopState:
    # inherit the scene dtype policy from the camera rays (f64 under the
    # *_double variants — the rays come from the cast sensor transforms)
    dtype = ray.o.dtype if dtype is None else dtype
    return LoopState(
        sampler=sampler,
        ray_o=ray.o,
        ray_d=ray.d,
        depth=jnp.zeros((n,), jnp.int32),
        L=jnp.zeros((n, 3), dtype),
        beta=jnp.ones((n, 3), dtype),
        eta=jnp.ones((n,), dtype),
        active=jnp.ones((n,), jnp.bool_),
        prev_p=ray.o,
        prev_bsdf_pdf=jnp.ones((n,), dtype),
        prev_bsdf_delta=jnp.ones((n,), jnp.bool_),
    )


def sample_primal(scene, sampler, ray: Ray, max_depth: int, rr_depth: int = 5):
    """Primal radiance estimate: (L (N,3), valid (N,)). Fully detached."""
    n = ray.o.shape[0]
    st = init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    scene_d = jax.lax.stop_gradient(scene)

    # bounce 0 runs OUTSIDE the scan so the camera wave keeps its static
    # coherent packet geometry; the remaining bounces ride a fully
    # unrolled lax.scan.  NOT a python loop: r4 replaced the scan with an
    # "equivalent" python unroll and lost 36% of toy fwd+bwd throughput
    # (122 -> 80 Mrays/s, bisected r5) — XLA schedules the scan-emitted
    # unrolled body better than the hand-inlined one.
    st, _rec = bounce(scene_d, st, 0, max_depth, rr_depth)

    def body(st, _):
        st2, _rec = bounce(scene_d, st, 1, max_depth, rr_depth)
        return st2, None

    if max_depth > 1:
        st, _ = jax.lax.scan(body, st, None, length=max_depth - 1,
                             unroll=True)
    return st.L, st.depth > 0


def sample_primal_recorded(scene, sampler, ray: Ray, max_depth: int,
                           rr_depth: int = 5):
    """Primal estimate that also records the per-bounce trace results.

    Returns (L, valid, trace) where ``trace`` stacks {'pi', 'occl'} along
    a leading depth axis.  Replaying the path with this trace (``bounce``
    ``cached=``) needs NO scene traversal — the fwd+bwd render pipeline
    then intersects the scene exactly once (the reference instead
    re-traces in its backward pass, common.py:574-974; on TPU the
    traversal is the large-scene bottleneck so caching it is the winning
    trade: ~18 B/lane/bounce of HBM).
    """
    n = ray.o.shape[0]
    st = init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    scene_d = jax.lax.stop_gradient(scene)

    # same split as sample_primal: coherent camera bounce outside, the
    # rest in an unrolled scan (see the perf note there); the bounce-0
    # trace slice is prepended to the scan's stacked output
    st, rec0 = bounce(scene_d, st, 0, max_depth, rr_depth)
    first = {"pi": rec0["pi"], "occl": rec0["occl"]}

    def body(st, _):
        st2, rec = bounce(scene_d, st, 1, max_depth, rr_depth)
        return st2, {"pi": rec["pi"], "occl": rec["occl"]}

    if max_depth > 1:
        st, rest = jax.lax.scan(body, st, None, length=max_depth - 1,
                                unroll=True)
        trace = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest)
    else:
        trace = jax.tree.map(lambda a: a[None], first)
    return st.L, st.depth > 0, trace


def _permute_lanes(tree, perm, n):
    """Permute every per-lane leaf (leading dim == n); leave scalars
    (e.g. the sampler's dimension counter) untouched."""
    return jax.tree.map(
        lambda x: x[perm]
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n) else x,
        tree)


def _permute_lanes_packed(tree, perm, n):
    """Permute per-lane leaves through ONE packed row gather.

    TPU per-lane gathers are latency-bound: ~12 ns/lane per gather
    INSTRUCTION at 2M lanes regardless of row width
    (results/profile_r05.md), so permuting the ~15 LoopState leaves
    individually costs more than a whole bounce.  Bitcast every
    f32/i32/u32/bool leaf into f32 columns, concatenate to (n, K),
    gather rows once, split back.  Leaves with other dtypes (f64
    variants) fall back to a direct gather."""
    packed, meta, treedef = _pack_lanes(tree, n)
    if packed is not None:
        packed = packed[perm]
    return _unpack_lanes(packed, meta, treedef,
                         raw_permute=lambda x: x[perm])


def _pack_lanes(tree, n):
    """Pack per-lane f32/i32/u32/bool leaves into one (n, K) f32 matrix
    (+ a meta list to unpack).  Leaves that can't ride f32 columns are
    returned unpacked."""
    leaves, treedef = jax.tree.flatten(tree)
    cols, meta = [], []
    for x in leaves:
        if not (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n):
            meta.append((None, x))
            continue
        x2 = x[:, None] if x.ndim == 1 else x
        if x2.ndim != 2:
            meta.append(("raw", x))
            continue
        dt = x2.dtype
        if dt == jnp.bool_:
            cols.append(jax.lax.bitcast_convert_type(
                x2.astype(jnp.uint32), jnp.float32))
            meta.append(("bool", x2.shape[1], x.ndim))
        elif dt == jnp.float32:
            cols.append(x2)
            meta.append(("f32", x2.shape[1], x.ndim))
        elif dt in (jnp.int32, jnp.uint32):
            cols.append(jax.lax.bitcast_convert_type(x2, jnp.float32))
            meta.append((str(dt), x2.shape[1], x.ndim))
        else:
            meta.append(("raw", x))
    packed = jnp.concatenate(cols, axis=1) if cols else None
    return packed, meta, treedef


def _unpack_lanes(packed, meta, treedef, raw_permute=None):
    out, off = [], 0
    for mm in meta:
        if mm[0] is None:
            out.append(mm[1])
            continue
        if mm[0] == "raw":
            x = mm[1]
            out.append(x if raw_permute is None else raw_permute(x))
            continue
        kind, ncol, nd = mm
        sl = packed[:, off:off + ncol]
        off += ncol
        if kind == "bool":
            sl = jax.lax.bitcast_convert_type(sl, jnp.uint32) != 0
        elif kind != "f32":
            sl = jax.lax.bitcast_convert_type(sl, jnp.dtype(kind))
        out.append(sl[:, 0] if nd == 1 else sl)
    return jax.tree.unflatten(treedef, out)


def _partition_active_first(tree, active, n):
    """Stable partition (active lanes first) of every per-lane leaf.

    A full ``argsort`` of 2M keys costs ~60 ms on a v5e; a stable
    partition only needs two prefix sums for the destination positions
    and ONE packed row scatter (results/compact_probe2.py)."""
    act32 = active.astype(jnp.int32)
    na = jnp.cumsum(act32)
    total = na[-1]
    pos = jnp.where(active, na - 1, total + jnp.cumsum(1 - act32) - 1)
    packed, meta, treedef = _pack_lanes(tree, n)
    if packed is not None:
        packed = jnp.zeros_like(packed).at[pos].set(packed)
    return _unpack_lanes(packed, meta, treedef,
                         raw_permute=lambda x: jnp.zeros_like(x)
                         .at[pos].set(x))


def _chunked(x, chunks, n):
    """(n, ...) -> (chunks, n/chunks, ...); scalars broadcast to (chunks,)."""
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
        return x.reshape((chunks, n // chunks) + x.shape[1:])
    return jnp.broadcast_to(jnp.asarray(x), (chunks,) + jnp.shape(x))


def _unchunked(x, chunks, n):
    if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[:1] == (chunks,) \
            and x.shape[1] == n // chunks:
        return x.reshape((n,) + x.shape[2:])
    # scalar leaf broadcast over chunks: a skipped chunk keeps a stale
    # sampler dim counter, a run chunk the advanced one — take the max
    # (every run chunk consumes the identical static dim count)
    return jnp.max(x, axis=0)


def _dummy_pi(m_, dtype=jnp.float32):
    from ..models.records import PreliminaryIntersection
    return PreliminaryIntersection(
        t=jnp.full((m_,), jnp.inf, dtype),
        prim_uv=jnp.zeros((m_, 2), dtype),
        prim_index=jnp.full((m_,), -1, jnp.int32),
        valid=jnp.zeros((m_,), jnp.bool_),
    )


def bounce_compacted(scene_d, st: LoopState, extra, n: int, chunks: int,
                     max_depth: int, rr_depth: int, cached=None,
                     chunk_fn=None, chunk_carry=None, post_fn=None):
    """One bounce with dead-lane compaction (VERDICT r4 Next #4).

    Lanes are stably sorted active-first (one packed gather over the
    whole (state, extra) tree), the wavefront is split into ``chunks``
    equal chunks, and each chunk runs the full bounce under
    ``lax.cond(any-lane-active, bounce, identity)`` — static shapes
    throughout, but chunks past the live prefix skip the traversal +
    shading + NEE work entirely at runtime.  On the bench BVH scene the
    live fraction entering bounces 1..5 is [0.78, 0.49, 0.33, 0.22,
    0.16] (results/live_fraction.py), so tail bounces run at a fraction
    of full-width cost.

    Per-lane results are identical to ``bounce`` (every op is
    lane-local).  A replay recomputing the same active flags recovers
    the identical permutation (stable argsort of identical keys).

    ``extra``: pytree of per-lane arrays permuted along with the state
    (the primal threads the lane-id map; the replay threads δL).
    ``cached``: recorded {'pi','occl'} for this bounce, already in the
    POST-permutation frame (the trace is recorded that way).
    ``chunk_fn(carry, st_c, rec_c, extra_c) -> carry``: optional extra
    per-chunk work inside the same cond (the replay's gradient
    accumulation); ``carry`` rides across chunks and is returned.
    ``post_fn(s_pre, s_post, rec) -> s_post``: optional state fixup
    inside the run branch (the replay's L-remaining bookkeeping; a
    skipped chunk's state passes through unchanged, which must be the
    fixup's masked no-op).

    Returns (new_state, record, extra_permuted, carry) — state/record in
    the post-permutation frame.
    """
    m_ = n // chunks
    st, extra = _partition_active_first((st, extra), st.active, n)
    xs = [jax.tree.map(lambda x: _chunked(x, chunks, n), st),
          jax.tree.map(lambda x: _chunked(x, chunks, n), extra)]
    if cached is not None:
        xs.append(jax.tree.map(
            lambda x: x.reshape((chunks, m_) + x.shape[1:]), cached))

    def chunk_body(carry, xs_c):
        st_c, extra_c = xs_c[0], xs_c[1]
        cached_c = xs_c[2] if cached is not None else None

        def run(args):
            carry, s = args
            s2, rec = bounce(scene_d, s, 1, max_depth, rr_depth,
                             cached=cached_c)
            rec_small = {"pi": rec["pi"], "occl": rec["occl"]}
            if post_fn is not None:
                s2 = post_fn(s, s2, rec)
            if chunk_fn is not None:
                carry = chunk_fn(carry, s, rec, extra_c)
            return carry, s2, rec_small

        def skip(args):
            carry, s = args
            return carry, s, {"pi": _dummy_pi(m_, s.ray_o.dtype),
                              "occl": jnp.zeros((m_,), jnp.bool_)}

        carry, st2_c, rec_c = jax.lax.cond(
            jnp.any(st_c.active), run, skip, (carry, st_c))
        return carry, (st2_c, rec_c)

    carry, (st2c, recc) = jax.lax.scan(chunk_body, chunk_carry, tuple(xs))
    st2 = jax.tree.map(lambda x: _unchunked(x, chunks, n), st2c)
    rec = jax.tree.map(lambda x: _unchunked(x, chunks, n), recc)
    return st2, rec, extra, carry


def sample_primal_compact(scene, sampler, ray: Ray, max_depth: int,
                          rr_depth: int = 5, chunks: int = 8,
                          record: bool = False):
    """``sample_primal``/``sample_primal_recorded`` with dead-lane
    compaction: bounce 0 (coherent camera wave) runs full-width; bounces
    1+ run through ``bounce_compacted``.  Results are returned in the
    ORIGINAL lane order (the composed permutation is inverted at the
    end); a recorded trace stays in each bounce's permuted frame — the
    replay recomputes the identical permutations from its replayed
    active flags."""
    n = ray.o.shape[0]
    st = init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    scene_d = jax.lax.stop_gradient(scene)
    lane = jnp.arange(n, dtype=jnp.int32)

    st, rec0 = bounce(scene_d, st, 0, max_depth, rr_depth)
    first = {"pi": rec0["pi"], "occl": rec0["occl"]}

    def body(carry, _):
        st, lane = carry
        st2, rec, lane, _ = bounce_compacted(
            scene_d, st, lane, n, chunks, max_depth, rr_depth)
        return (st2, lane), rec

    if max_depth > 1:
        (st, lane), rest = jax.lax.scan(body, (st, lane), None,
                                        length=max_depth - 1, unroll=True)
        trace = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest) \
            if record else None
    else:
        trace = jax.tree.map(lambda a: a[None], first) if record else None
    # un-permute by scattering through the carried lane-id map (an
    # argsort-based inverse costs ~60 ms at 2M lanes; a scatter ~27 ms)
    L = jnp.zeros_like(st.L).at[lane].set(st.L)
    valid = jnp.zeros_like(st.depth).at[lane].set(st.depth) > 0
    if record:
        return L, valid, trace
    return L, valid


def sample_primal_wavefront(scene, sampler, ray: Ray, max_depth: int,
                            rr_depth: int = 5, sort_lanes: bool = True):
    """Wavefront execution of the same estimator.

    The reference tests both execution strategies: Dr.Jit ``LoopRecord=1``
    fuses the path loop into one megakernel, ``LoopRecord=0`` decomposes it
    into per-bounce kernels (test_renders.py:52-58, test_megakernel.py:36-186;
    SURVEY §2.6 asks to keep both and measure).  The TPU analog of the
    decomposed mode is an *unrolled* per-bounce dispatch — XLA schedules and
    specializes each bounce independently instead of compiling one rolled
    ``lax.scan`` body — plus optional ray sorting between bounces: lanes are
    reordered so active rays (grouped by direction octant) are contiguous,
    which makes the traversal/BSDF gathers coherent.  The permutation is
    carried in a lane-id array and inverted once at the end, so the result
    is **bitwise identical** to the megakernel path (every per-bounce op is
    per-lane; the sampler state is permuted along with the ray state).
    """
    n = ray.o.shape[0]
    st = init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    scene_d = jax.lax.stop_gradient(scene)
    lane = jnp.arange(n, dtype=jnp.int32)
    for it in range(max_depth):
        st, _rec = bounce(scene_d, st, it, max_depth, rr_depth)
        if sort_lanes and it + 1 < max_depth:
            octant = ((st.ray_d[..., 0] >= 0).astype(jnp.int32)
                      + ((st.ray_d[..., 1] >= 0).astype(jnp.int32) << 1)
                      + ((st.ray_d[..., 2] >= 0).astype(jnp.int32) << 2))
            key = jnp.where(st.active, octant, 8)  # inactive lanes last
            perm = jnp.argsort(key, stable=True)   # stable => deterministic
            st = _permute_lanes(st, perm, n)
            lane = lane[perm]
    inv = jnp.argsort(lane)
    return st.L[inv], (st.depth > 0)[inv]
