#!/usr/bin/env python
"""Benchmark: noise-sampling throughput of the flagship model on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against a speed-of-light estimate for this chip. The sampling chain
runs as ONE fused Pallas kernel (ops/pallas_sample.py): the whole 10-layer
flow stays in VMEM, channel mixing rides the MXU as banded 128x128 matmuls.
The v2 fold packs the coupling NN's input H-taps and the zero-conv's
shift/log-scale outputs into single 128-lane tiles, cutting the chain to ~59
MFLOP/patch (8 couplings x 6 matmuls + 8 invertible-1x1), so
SoL = peak_matmul_flops / flops_per_patch. vs_baseline ~ 1.0 means the fused
chain saturates the MXU.
"""

import json
import time

import numpy as np


def main():
    from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.ops.pallas_sample import (
        build_sample_program, make_sampler)

    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    program = build_sample_program(flow, params, state)

    on_tpu = jax.default_backend() == "tpu"
    batch = 8192 if on_tpu else 512
    mm_dtype = jnp.bfloat16
    bt = 64

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
    cond = {
        "clean": clean,
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0),
    }

    # steady-state sampling path: fixed (iso, cam) conditioning -> scale
    # coefficients precomputed once; eps drawn in-kernel (TPU PRNG); the
    # per-call host work is one int32 seed; output in the kernel's native
    # [B, 32, 128] tile layout (free host-side reshape to [B, 32, 32, 4]).
    sampler = make_sampler(program, cond, temp=0.6, bt=bt, mm_dtype=mm_dtype)
    sampler(1).block_until_ready()  # compile
    for i in range(5):              # warm the dispatch path
        out = sampler(2 + i)
    out.block_until_ready()

    n_iter = 50 if on_tpu else 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = sampler(100 + i)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    samples_per_sec = batch * n_iter / dt

    # --- speed-of-light: MXU-compute-bound -----------------------------
    # v2 folded chain per patch: 8 couplings x 6 matmuls [*,128]x[128,128]
    # + 8 mix matmuls, each over 32 rows/patch at 2*128*128 flops/row
    per_row = (8 * 6 + 8) * (2 * 128 * 128)
    flops_per_patch = per_row * 32
    peak = 197e12 if (on_tpu and mm_dtype == jnp.bfloat16) else 45e12
    if not on_tpu:
        peak = 1e12  # CPU-ish; vs_baseline meaningless off-TPU
    sol = peak / flops_per_patch
    vs_baseline = samples_per_sec / sol

    print(json.dumps({
        "metric": "noiseflow_fused_sample_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
