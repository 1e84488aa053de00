"""Measure train throughput with K steps per dispatch (round 3).

Compares Trainer.train_epoch at steps_per_call=1 vs K on the real chip,
for the XLA and fused paths, at the reference batch (138) and a large batch.

Usage: python experiments/train_scan_bench.py [--k 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from noise_flow_tpu.config import default_config  # noqa: E402
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: E402
from noise_flow_tpu.parallel.mesh import make_mesh  # noqa: E402
from noise_flow_tpu.training.trainer import Trainer  # noqa: E402


def batches(b, n, seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
    mb = {"_x": x, "_y": clean,
          "nlf0": np.full((b,), 0.000479, np.float32),
          "nlf1": np.full((b,), 2e-6, np.float32),
          "iso": np.full((b,), 100.0, np.float32),
          "cam": np.full((b,), 2.0, np.float32)}
    return [mb] * n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()

    import itertools

    fused_list = ([True] if os.environ.get("NF_FUSED_ONLY") else
                  [True, False])
    bs_list = [int(x) for x in
               os.environ.get("NF_BATCHES", "138,8192").split(",")]
    for fused, b in itertools.product(fused_list, bs_list):
        cfg = default_config(patch_height=32, use_pallas=fused)
        flow = NoiseFlow((32, 32, 4), cfg)
        trainer = Trainer(flow, cfg, mesh=make_mesh(1))
        for k in (1, args.k):
            t0 = time.perf_counter()
            bs = batches(b, args.n)
            trainer.train_epoch(iter(bs[: 2 * k]), steps_per_call=k)  # warm
            print(f"fused={fused} b={b} k={k}: warm+compile "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            trainer.train_epoch(iter(bs), steps_per_call=k)
            dt = time.perf_counter() - t0
            rate = b * args.n / dt
            print(f"fused={fused} b={b:5d} k={k:3d}: "
                  f"{rate:12,.0f} patches/s ({dt/args.n*1e3:.3f} ms/step)",
                  flush=True)


if __name__ == "__main__":
    main()
