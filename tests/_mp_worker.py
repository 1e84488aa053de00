"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Runs a short deterministic training on its shard of a fixed global batch set
and prints the per-epoch NLLs as JSON. Process topology: 2 processes x 4
CPU devices = 8 global devices — the same global mesh the single-process
parent run uses, so trajectories must match.

The module is import-safe (the test imports ``global_minibatch``); all env
setup and jax initialization happen in main() only.
"""

import json
import os
import sys

import numpy as np


def global_minibatch(b, seed):
    rng = np.random.default_rng(seed)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.0005 * clean + 2e-6)).astype(np.float32)
    return {"_x": x, "_y": clean,
            "nlf0": np.full((b,), 0.0005, np.float32),
            "nlf1": np.full((b,), 2e-6, np.float32),
            "iso": np.full((b,), 100.0, np.float32),
            "cam": np.full((b,), 2.0, np.float32)}


def local_shard(mb, pid, n_proc):
    b = mb["_x"].shape[0]
    lo, hi = pid * b // n_proc, (pid + 1) * b // n_proc
    return {k: v[lo:hi] for k, v in mb.items()}


def main(pid: int, port: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", 2, pid)

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.distributed import (
        global_baselines, global_scalar_stats, host_shard)
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    assert jax.process_count() == 2
    assert jax.device_count() == 8

    cfg = default_config(arch="sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc",
                         patch_height=32, lr=1e-4)
    mesh = make_mesh()
    trainer = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=mesh)

    # cross-host stats merging (host_shard of a deterministic sample list)
    all_rows = global_minibatch(32, seed=99)
    mine = host_shard(list(range(32)))
    stats = global_scalar_stats(all_rows["_x"][mine], all_rows["_y"][mine])
    g, s = global_baselines(100.0 + pid, 200.0 + pid)

    batches = [local_shard(global_minibatch(16, sd), pid, 2)
               for sd in range(3)]
    nlls = []
    for _ in range(2):
        nll, sdz = trainer.train_epoch(iter(batches))
        nlls.append(nll)
    ev_nll, ev_sdz = trainer.eval_epoch(iter(batches[:1]))

    # multi-host lax.scan multi-step dispatch (global_batch_stacked) must
    # match step-per-call on the same global batches from the same init
    tr_scan = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=mesh)
    scan_nll, _ = tr_scan.train_epoch(iter(batches), steps_per_call=3)
    tr_step = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=mesh)
    step_nll, _ = tr_step.train_epoch(iter(batches), steps_per_call=1)

    print("RESULT" + json.dumps({
        "pid": pid, "nlls": nlls, "eval": ev_nll,
        "scan_nll": scan_nll, "step_nll": step_nll,
        "sc_in_vr": stats["sc_in_vr"], "baselines": [g, s]}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
