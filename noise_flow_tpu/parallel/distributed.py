"""Multi-host utilities: process init, per-host data sharding, global stats.

The reference is single-process (SURVEY.md §2.6); this module supplies the
TPU-pod story: `jax.distributed` process bootstrap, deterministic per-host
sharding of the file/sample lists, global (cross-host) batch assembly via
`jax.make_array_from_process_local_data`, and psum-reduced global metrics.

Collectives ride ICI within a slice and DCN across hosts — all inserted by
XLA from sharding annotations; nothing here opens sockets by hand.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op when single-process / already up)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single-process run
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List:
    """Deterministic round-robin shard of a work list for this host.

    Every host must pass the identical `items` ordering (e.g. the sorted SIDD
    filename tuples); the shard is then disjoint and exhaustive across hosts.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def global_batch(mesh: Mesh, local_batch: Dict, axis: str = "data") -> Dict:
    """Assemble a global batch from per-host local shards.

    Each host contributes `local_batch` (its shard along the leading dim);
    the returned jax.Arrays are globally sharded over the mesh without any
    host-side gather.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def global_batch_stacked(mesh: Mesh, local_stack: Dict,
                         axis: str = "data") -> Dict:
    """Assemble a [K, B_local, ...] per-host stack of K batches into global
    [K, B_global, ...] arrays: dim 0 is the lax.scan step axis (replicated),
    dim 1 sharded over the mesh. The multi-host twin of
    mesh.shard_batch_stacked — lets the multi-step scan dispatch
    (Trainer.train_epoch(steps_per_call=K)) run under data parallelism on a
    pod, where per-step dispatch overhead matters most.
    """
    sharding = NamedSharding(mesh, P(None, axis))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, local_stack)


def global_mean(x, axis_name: str = "data"):
    """psum-based mean over the mesh axis — call inside shard_map/pjit."""
    import jax.numpy as jnp
    return jax.lax.psum(jnp.mean(x), axis_name) / jax.lax.psum(1.0, axis_name)


def all_gather_samples(x, axis_name: str = "data"):
    """Gather per-device sample shards into the full batch on every device
    (for host-side KLD histogram sweeps). Call inside shard_map."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def global_scalar_stats(x: np.ndarray, y: np.ndarray) -> Dict[str, float]:
    """Cross-process twin of data.stats.calc_pat_stats: each host computes
    Welford pieces (n, mean, m2) over its local noise/clean patch shard, the
    pieces are allgathered over DCN, and merged pairwise-stably. Single
    process: identical to calc_pat_stats up to f32 gather rounding."""
    from noise_flow_tpu.data.stats import calc_pat_stats

    if jax.process_count() == 1:
        return calc_pat_stats(x, y)

    from jax.experimental import multihost_utils

    local = []
    for arr in (x, y):
        a = arr.astype(np.float64)
        local += [float(a.size), float(a.mean()), float(a.var() * a.size)]
    gathered = np.asarray(multihost_utils.process_allgather(
        np.asarray(local, np.float32)))  # [P, 6]
    out: Dict[str, float] = {}
    for qi, prefix in enumerate(("sc_in", "sc_gt")):
        shards = [{"n": row[3 * qi], "mean": row[3 * qi + 1],
                   "m2": row[3 * qi + 2]} for row in gathered]
        merged = merge_welford_shards(shards)
        mean = float(merged["mean"])
        vr = float(merged["m2"] / max(merged["n"], 1.0))
        out[f"{prefix}_mean"] = mean
        out[f"{prefix}_vr"] = vr
        out[f"{prefix}_sd"] = out[f"{prefix}_std"] = float(np.sqrt(vr))
    return out


def global_baselines(nll_gauss: float, nll_sdn: float) -> tuple:
    """Average the per-host baseline NLLs across processes (each host computed
    them over its own test shard; equal-weight mean matches the reference's
    per-minibatch averaging, ref:PatchStatsCalculator.py:117-120)."""
    if jax.process_count() == 1:
        return nll_gauss, nll_sdn
    from jax.experimental import multihost_utils

    g = np.asarray(multihost_utils.process_allgather(
        np.asarray([nll_gauss, nll_sdn], np.float32)))
    return float(g[:, 0].mean()), float(g[:, 1].mean())


def merge_welford_shards(shards: List[Dict]) -> Dict:
    """Merge per-host Welford stats {'n','mean','m2'} pairwise-stably
    (SURVEY.md §7 'stats bit-exactness')."""
    from noise_flow_tpu.data.stats import welford_merge

    while len(shards) > 1:
        nxt = []
        for i in range(0, len(shards) - 1, 2):
            a, b = shards[i], shards[i + 1]
            n, m, m2 = welford_merge(a["n"], a["mean"], a["m2"],
                                     b["n"], b["mean"], b["m2"])
            nxt.append({"n": n, "mean": m, "m2": m2})
        if len(shards) % 2:
            nxt.append(shards[-1])
        shards = nxt
    return shards[0]
