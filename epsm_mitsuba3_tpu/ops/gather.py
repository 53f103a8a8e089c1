"""Fast wavefront gathers.

TPU per-lane dynamic-index gathers run on the scalar core (~5-8 ms per
gather at 1M lanes); vectorized elementwise ops are ~0.01 ms.  For small
tables the winning strategy is a branchless *select chain*: R broadcast
compares + selects, entirely on the VPU, no gathers at all.  Beyond the
threshold, native gathers win again (select cost grows linearly in R).
"""
from __future__ import annotations

import jax.numpy as jnp

#: tables up to this many rows use the select-chain path
SELECT_MAX_ROWS = 64


def take_rows(table: jnp.ndarray, idx: jnp.ndarray,
              max_rows: int = SELECT_MAX_ROWS) -> jnp.ndarray:
    """table (R, ...) gathered at idx (N,) -> (N, ...): select-chain for
    small R (VPU only), native gather otherwise."""
    r = table.shape[0]
    if r > max_rows:
        return table[idx]
    flat = table.reshape(r, -1)
    c = flat.shape[1]
    out = jnp.broadcast_to(flat[0], idx.shape + (c,))
    for k in range(1, r):
        out = jnp.where((idx == k)[..., None], flat[k], out)
    return out.reshape(idx.shape + table.shape[1:])


# integer tables work identically with selects (no float roundtrip needed)
take_rows_int = take_rows


def take_along2(table_n: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(table_n (N,K), slot (N,)) as a select chain."""
    k = table_n.shape[-1]
    out = table_n[..., 0]
    for j in range(1, k):
        out = jnp.where(slot == j, table_n[..., j], out)
    return out
