"""Checkpointing: params + BN state + optimizer state + epoch.

Replaces tf.train.Saver semantics (ref:train_noise_flow.py:322-328,411-419):
per-epoch checkpoints ``model.ckpt-<epoch>.npz`` plus ``model.ckpt.best.npz``
on test-NLL improvement, and latest-checkpoint resume
(ref:sidd_utils.py:1152-1162). Storage is a flat npz of tree leaves keyed by
path — dependency-free and host-portable.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: dict):
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        key = "/".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def save_checkpoint(ckpt_dir: str, tag, params, state, opt_state=None,
                    epoch: int = 0) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    out = {}
    for prefix, tree in (("params", params), ("state", state),
                         ("opt", opt_state if opt_state is not None else {})):
        for k, v in _flatten(tree).items():
            out[f"{prefix}|{k}"] = v
    out["__epoch__"] = np.asarray(epoch)
    path = os.path.join(ckpt_dir, f"model.ckpt-{tag}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **out)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template, state_template,
                    opt_template=None) -> Tuple[Any, Any, Any, int]:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    epoch = int(flat.pop("__epoch__"))
    groups = {"params": {}, "state": {}, "opt": {}}
    for k, v in flat.items():
        prefix, key = k.split("|", 1)
        groups[prefix][key] = v
    params = _unflatten_like(params_template, groups["params"])
    state = _unflatten_like(state_template, groups["state"])
    opt_state = None
    if opt_template is not None and groups["opt"]:
        try:
            opt_state = _unflatten_like(opt_template, groups["opt"])
        except (KeyError, ValueError):
            # optimizer layout changed (e.g. a checkpoint from before the
            # optax.flatten wrapper): resume params/state, restart slots
            import logging
            logging.getLogger(__name__).warning(
                "checkpoint %s: optimizer state layout does not match the "
                "current optimizer; resuming without it", path)
    return params, state, opt_state, epoch


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the highest-epoch checkpoint (ref:sidd_utils.py:1152-1162)."""
    best = None
    best_ep = -1
    for p in glob.glob(os.path.join(ckpt_dir, "model.ckpt-*.npz")):
        m = re.search(r"model\.ckpt-(\d+)\.npz$", p)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = p
    return best
