"""Sinkhorn optimal-transport matcher (EPSM/utils/matcher.py analog).

The reference calls ``geomloss.SamplesLoss("sinkhorn", blur=0.01,
scaling=0.9)`` over 5-D points (r, g, b, x, y) and feeds
∂loss/∂points back through the renderer's 5-channel image
(matcher.py:51-63, optim.py:130-136).

This is a from-scratch JAX implementation with geomloss semantics:

 * cost C(x, y) = |x-y|^2 / 2  (p = 2)
 * epsilon annealing ("scaling"): ε from diameter² down to blur²
   by the factor ``scaling²`` per iteration
 * debiased Sinkhorn divergence  S = OT(α,β) − ½OT(α,α) − ½OT(β,β)
 * gradients by the envelope theorem: iterate to convergence with
   detached potentials, then one attached symmetric update — the same
   trick geomloss uses, giving exact ∂S/∂x without unrolling the loop.

The inner soft-min is blocked over rows so the (N², 5) cost tensor is
never fully materialised (N = 128² ⇒ 2.7·10⁸ entries); a Pallas
flash-style kernel can swap in behind ``_softmin``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _softmin(eps, x, y, g, block: int = 4096, jblock: int = 4096):
    """f_i = -eps * LSE_j( g_j/eps - |x_i-y_j|^2/(2 eps) ).

    The cost expands as |x|²/2 + |y|²/2 - x·y: the cross term is a matmul
    (MXU).  Flash-style double blocking: rows by ``block`` (lax.map) and
    columns by ``jblock`` with an ONLINE logsumexp (running max + sum in
    the scan carry), so only a (block, jblock) logits tile is ever live —
    the full (N, M) tensor never exists and HBM sees each input once per
    row block instead of one 1-GB logits round-trip per softmin."""
    n = x.shape[0]
    mtot = y.shape[0]
    mb = -(-mtot // jblock)
    padm = mb * jblock - mtot
    yp = jnp.concatenate([y, jnp.zeros((padm, y.shape[1]), y.dtype)], 0) \
        if padm else y
    # padded columns carry g = -inf => their exp contribution is exactly 0
    gp = jnp.concatenate([g, jnp.full((padm,), -jnp.inf, g.dtype)], 0) \
        if padm else g
    yb = yp.reshape(mb, jblock, y.shape[1])
    y2b = 0.5 * jnp.sum(yb * yb, -1)
    gb = gp.reshape(mb, jblock)

    def row_block(xb):
        x2 = 0.5 * jnp.sum(xb * xb, -1)

        def col_step(carry, ys):
            mx, sm = carry
            ybk, y2k, gk = ys
            logits = (gk[None, :] - y2k[None, :] - x2[:, None]
                      + xb @ ybk.T) / eps
            bm = jnp.max(logits, 1)
            new_mx = jnp.maximum(mx, bm)
            # exp(-inf - -inf) can only arise if every logit so far is
            # -inf, which a finite g forbids on real columns
            sm = (sm * jnp.exp(mx - new_mx)
                  + jnp.sum(jnp.exp(logits - new_mx[:, None]), 1))
            return (new_mx, sm), None

        init = (jnp.full((xb.shape[0],), -jnp.inf, x.dtype),
                jnp.zeros((xb.shape[0],), x.dtype))
        (mx, sm), _ = jax.lax.scan(col_step, init, (yb, y2b, gb))
        return -eps * (mx + jnp.log(sm))

    if n <= block:
        return row_block(x)
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    out = jax.lax.map(row_block, xp.reshape(nb, block, x.shape[1]))
    return out.reshape(-1)[:n]


def sinkhorn_divergence_grad(x, y, blur: float = 0.01, scaling: float = 0.9,
                             last_extrapolation: bool = True):
    """Debiased Sinkhorn divergence S(x, y) and ∂S/∂x for uniform weights.

    x: (N, D) moving points (render); y: (M, D) target points (gt).
    Returns (loss, grad_x (N, D)).
    """
    n, d = x.shape
    m_, _ = y.shape
    log_a = -jnp.log(n)
    log_b = -jnp.log(m_)

    # epsilon schedule (geomloss ``scaling`` heuristic, p=2) — pure python,
    # the schedule is static
    import math
    eps_start = float(d)  # diameter² of the [0,1]^d box
    eps_target = blur ** 2
    n_iters = max(
        2, int(math.ceil(math.log(eps_target / eps_start)
                         / math.log(scaling ** 2))) + 1
    )
    eps_list = [max(eps_target, eps_start * (scaling ** 2) ** i)
                for i in range(n_iters)]
    eps_list[-1] = eps_target

    xd = jax.lax.stop_gradient(x)
    yd = jax.lax.stop_gradient(y)

    # potentials: f on x (vs y), g on y (vs x); b_x / b_y for the debias terms
    f_x = jnp.zeros((n,), x.dtype)
    g_y = jnp.zeros((m_,), x.dtype)
    a_x = jnp.zeros((n,), x.dtype)   # symmetric potential of OT(α,α)
    b_y = jnp.zeros((m_,), x.dtype)  # symmetric potential of OT(β,β)

    for eps in eps_list:
        # symmetric (averaged) Sinkhorn updates, all detached
        f_new = _softmin(eps, xd, yd, g_y + log_b)
        g_new = _softmin(eps, yd, xd, f_x + log_a)
        a_new = _softmin(eps, xd, xd, a_x + log_a)
        b_new = _softmin(eps, yd, yd, b_y + log_b)
        f_x = 0.5 * (f_x + f_new)
        g_y = 0.5 * (g_y + g_new)
        a_x = 0.5 * (a_x + a_new)
        b_y = 0.5 * (b_y + b_new)

    eps = eps_target

    def loss_of_x(x_att):
        # one attached extrapolation step (envelope theorem).  x must be
        # attached only through its *own* potential: S = ⟨α, f⟩ + ⟨β, g⟩
        # − ⟨α, a⟩ − ⟨β, b⟩ and ∇ₓ½OT(α,α) = ∇ₓ⟨α, a(x as 1st arg)⟩ by
        # symmetry — attaching x in both softmin roles would double count.
        f_att = _softmin(eps, x_att, yd, jax.lax.stop_gradient(g_y) + log_b)
        a_att = _softmin(eps, x_att, xd, jax.lax.stop_gradient(a_x) + log_a)
        const = jax.lax.stop_gradient(jnp.mean(g_y) - jnp.mean(b_y))
        return jnp.mean(f_att) - jnp.mean(a_att) + const

    loss, grad = jax.value_and_grad(loss_of_x)(x)
    return loss, grad


class Matcher:
    """API-compatible with EPSM/utils/matcher.py ``Matcher``."""

    def __init__(self, res: int, blur: float = 0.01, scaling: float = 0.9):
        self.resolution = res
        self.blur = blur
        self.scaling = scaling
        xs = jnp.linspace(0.0, 1.0, res)
        gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
        # matcher.py:15-18 uses (pos[1], pos[0]) = (col, row) ordering
        self.pos = jnp.stack([gy, gx], -1).reshape(-1, 2)
        # sliced-Wasserstein settings (matcher.py:21-24)
        self.num_vectors = 50
        self.num_principle_vectors = 3
        self.rgb_weight = 1.0
        self._grad_fn = jax.jit(functools.partial(
            _match_impl, blur=self.blur, scaling=self.scaling))
        self._sw_fn = jax.jit(functools.partial(
            _sliced_wasserstein_impl, num_vectors=self.num_vectors,
            n_pc=self.num_principle_vectors, rgb_weight=self.rgb_weight))

    def match_Sinkhorn(self, render_rgb, gt_rgb):
        """render_rgb/gt_rgb: (res², 3) -> grad (res², 5) — matcher.py:51-63
        (gradient scaled by res² as in :60)."""
        return self._grad_fn(render_rgb, gt_rgb, self.pos)

    def match_sliced_wasserstein(self, render_rgb, gt_rgb, seed: int = 0):
        """Sliced-Wasserstein alternative (matcher.py:76-180): project the
        5-D point clouds onto ``num_vectors`` random directions, sort both
        projections, L2 between the sorted sequences; the gradient routes
        through the sort permutation.  Target colors are optionally
        compressed to their top PCA directions first (matcher.py:91-95).
        Returns ∂loss/∂(r,g,b,x,y) with shape (res², 5)."""
        return self._sw_fn(render_rgb, gt_rgb, self.pos,
                           jax.random.PRNGKey(seed))


def _sliced_wasserstein_impl(render_rgb, gt_rgb, pos, key, num_vectors,
                             n_pc, rgb_weight):
    """matcher.py:76-121 re-expressed in JAX.

    loss = Σ_k Σ_i (sort(P_r V)_ik − sort(P_t V)_ik)²  over random unit
    directions V; ∂loss/∂render5 flows through the sort (a permutation —
    each sorted slot's gradient lands on its source point).  Sorting both
    clouds per direction is the 1-D optimal transport matching; with 50
    directions this is the cheap O(KN log N) OT surrogate the reference
    offers next to Sinkhorn."""
    target5 = jnp.concatenate(
        [jnp.clip(gt_rgb, 0.0, 1.0) * rgb_weight, pos], -1)
    render5 = jnp.concatenate(
        [jnp.clip(render_rgb, 0.0, 1.0) * rgb_weight, pos], -1)

    if n_pc > 0:
        # PCA of the *target* colors (torch.pca_lowrank analog): both
        # clouds are projected with the same basis, detached
        x = target5[:, :3]
        xc = x - jnp.mean(x, 0)
        _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
        V_pc = jax.lax.stop_gradient(vt[:n_pc].T)          # (3, n_pc)

        def to_feature(p5):
            return jnp.concatenate([p5[:, :3] @ V_pc, p5[:, 3:]], -1)
    else:
        def to_feature(p5):
            return p5

    d_feat = (n_pc if n_pc > 0 else 3) + 2
    dirs = jax.random.uniform(key, (d_feat, num_vectors)) * 2.0 - 1.0
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=0, keepdims=True), 1e-8)

    proj_t = jnp.sort(to_feature(target5) @ dirs, axis=0)

    def loss(r5):
        proj_r = jnp.sort(to_feature(r5) @ dirs, axis=0)
        return jnp.sum((proj_r - proj_t) ** 2)

    g = jax.grad(loss)(render5)
    return g.at[:, :3].divide(rgb_weight)


def _match_impl(render_rgb, gt_rgb, pos, blur, scaling):
    n = render_rgb.shape[0]
    render5 = jnp.concatenate(
        [jnp.clip(render_rgb, 0.0, 1.0), pos], -1)
    target5 = jnp.concatenate([jnp.clip(gt_rgb, 0.0, 1.0), pos], -1)
    _, g = sinkhorn_divergence_grad(render5, target5, blur, scaling)
    return g * n
