"""Checkpoint / resume (SURVEY.md §5: the reference has none — the EPSM
Logger only dumps per-iteration npy artifacts).  Persists (params,
optimizer state, RNG seed, iteration) with orbax when available, with a
numpy fallback.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

import jax


def save(path: str, it: int, theta: Dict[str, Any], opt_state: Any = None,
         seed: int = 0, extra: Optional[Dict] = None):
    """Save an optimization checkpoint (atomic directory write)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp_{it}")
    os.makedirs(tmp, exist_ok=True)
    flat = {}

    def put(prefix, tree):
        leaves, treedef = jax.tree.flatten(tree)
        for i, leaf in enumerate(leaves):
            flat[f"{prefix}_{i}"] = np.asarray(leaf)
        return str(treedef)

    meta = {
        "it": it,
        "seed": seed,
        "theta_keys": sorted(theta.keys()),
        "extra": extra or {},
    }
    for k in meta["theta_keys"]:
        flat[f"theta.{k}"] = np.asarray(theta[k])
    if opt_state is not None:
        meta["opt_treedef"] = put("opt", opt_state)
    np.savez(os.path.join(tmp, "arrays.npz"), **flat)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    final = os.path.join(path, f"ckpt_{it}")
    if os.path.exists(final):
        import shutil
        shutil.rmtree(final)
    os.rename(tmp, final)
    # update 'latest' pointer
    with open(os.path.join(path, "latest"), "w") as f:
        f.write(str(it))
    return final


def latest_step(path: str) -> Optional[int]:
    p = os.path.join(path, "latest")
    if not os.path.exists(p):
        return None
    return int(open(p).read().strip())


def load(path: str, it: Optional[int] = None):
    """Returns (it, theta dict, flat opt arrays, meta)."""
    if it is None:
        it = latest_step(path)
        if it is None:
            return None
    d = os.path.join(path, f"ckpt_{it}")
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    arrays = np.load(os.path.join(d, "arrays.npz"))
    theta = {k: arrays[f"theta.{k}"] for k in meta["theta_keys"]}
    opt = {k: arrays[k] for k in arrays.files if k.startswith("opt_")}
    return meta["it"], theta, opt, meta


def save_optimizer(path: str, it: int, opt, seed: int = 0):
    """Checkpoint an ad.optimizers.Optimizer (variables + state + t)."""
    state_flat = {}
    for k, st in opt.state.items():
        for j, arr in enumerate(st):
            state_flat[f"state.{k}.{j}"] = np.asarray(arr)
    extra = {"t": getattr(opt, "t", None) and dict(opt.t),
             "lr": opt.lr_default}
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, f"opt_{it}.npz"),
             **{f"var.{k}": np.asarray(v) for k, v in opt.variables.items()},
             **state_flat)
    with open(os.path.join(path, f"opt_{it}.json"), "w") as f:
        json.dump({"it": it, "seed": seed, "extra": extra}, f)
    with open(os.path.join(path, "latest"), "w") as f:
        f.write(str(it))


def load_optimizer(path: str, opt, it: Optional[int] = None) -> int:
    """Restore an Optimizer in place; returns the iteration to resume at."""
    import jax.numpy as jnp
    if it is None:
        it = latest_step(path)
        if it is None:
            return 0
    arrays = np.load(os.path.join(path, f"opt_{it}.npz"))
    with open(os.path.join(path, f"opt_{it}.json")) as f:
        meta = json.load(f)
    for k in list(opt.variables.keys()):
        if f"var.{k}" in arrays:
            opt.variables[k] = jnp.asarray(arrays[f"var.{k}"])
    for k in list(opt.state.keys()):
        parts = []
        j = 0
        while f"state.{k}.{j}" in arrays:
            parts.append(jnp.asarray(arrays[f"state.{k}.{j}"]))
            j += 1
        if parts:
            opt.state[k] = tuple(parts)
    t = meta.get("extra", {}).get("t")
    if t and hasattr(opt, "t"):
        opt.t.update({k: int(v) for k, v in t.items()})
    return meta["it"] + 1
