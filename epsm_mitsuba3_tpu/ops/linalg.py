"""Small batched linear algebra tuned for TPU wavefronts.

``inv_small`` inverts (N, n, n) systems for small static n with an
unrolled Gauss-Jordan elimination using *vectorized partial pivoting* —
pure (N,)-shaped VPU ops.  XLA's ``jnp.linalg.inv`` lowers batched
inversion through a generic LU path that is ~100x slower at wavefront
batch sizes on TPU (measured ~95 ms vs ~1 ms at N=131072, n=8).
"""
from __future__ import annotations

import jax.numpy as jnp


def inv_small(M: jnp.ndarray) -> jnp.ndarray:
    """Invert (N, n, n) with static n <= ~12 via unrolled Gauss-Jordan
    with partial pivoting (row selects, no per-lane control flow)."""
    n = M.shape[-1]
    N = M.shape[0]
    # augmented [M | I] as a list of row vectors (N, 2n)
    eye = jnp.eye(n, dtype=M.dtype)
    aug = jnp.concatenate([M, jnp.broadcast_to(eye, M.shape)], axis=-1)
    rows = [aug[:, i, :] for i in range(n)]

    for col in range(n):
        # partial pivot: pick the row (>= col) with max |pivot| per lane
        piv_val = jnp.abs(rows[col][:, col])
        piv_idx = jnp.full((N,), col, jnp.int32)
        for r in range(col + 1, n):
            better = jnp.abs(rows[r][:, col]) > piv_val
            piv_val = jnp.where(better, jnp.abs(rows[r][:, col]), piv_val)
            piv_idx = jnp.where(better, r, piv_idx)
        # swap rows[col] <-> rows[piv_idx] via selects
        pivot_row = rows[col]
        for r in range(col + 1, n):
            sel = (piv_idx == r)[:, None]
            pivot_row = jnp.where(sel, rows[r], pivot_row)
        for r in range(col + 1, n):
            sel = (piv_idx == r)[:, None]
            rows[r] = jnp.where(sel, rows[col], rows[r])
        # normalize pivot row
        p = pivot_row[:, col]
        inv_p = jnp.where(jnp.abs(p) > 1e-20, 1.0 / jnp.where(
            jnp.abs(p) > 1e-20, p, 1.0), 0.0)
        pivot_row = pivot_row * inv_p[:, None]
        rows[col] = pivot_row
        # eliminate the column from all other rows
        for r in range(n):
            if r == col:
                continue
            factor = rows[r][:, col:col + 1]
            rows[r] = rows[r] - factor * pivot_row

    out = jnp.stack([rows[i][:, n:] for i in range(n)], axis=1)
    return out
