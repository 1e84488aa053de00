#!/usr/bin/env python
"""What is the one-shot kernel's 390 us/call fixed cost made of?

In the same jitted-scan context as the real step, times:
  scan_floor    body = on-device gather + reduce (no pallas at all)
  noop_pallas   body = minimal pallas_call (copy one [46,32,128] tile)
  oneshot_b46   body = the real one-shot kernel, grid=1  (known ~489 us)

noop - scan_floor      = pure pallas launch/sync cost in a scan step
oneshot - noop         = the one-shot kernel's own entry cost + compute
                         (grid=1 block compute ~126 us from the scaling fit)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 46
K = 128


def time_scan(name, run, args):
    out = run(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:>12}: {best * 1e6:8.1f} us/step", flush=True)
    return best * 1e6


def main():
    assert jax.default_backend() == "tpu"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = B * K
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((n, 32, 128)), jnp.float32)
    idxs = jnp.asarray(np.arange(n, dtype=np.int32).reshape(K, B))
    results = {}

    @jax.jit
    def scan_floor(data, idxs):
        def body(c, idx):
            x = jnp.take(data, idx, axis=0)
            return c, jnp.sum(x)
        return jax.lax.scan(body, 0, idxs)

    results["scan_floor"] = time_scan("scan_floor", scan_floor, (data, idxs))

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    spec = pl.BlockSpec((B, 32, 128), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def noop_pallas(data, idxs):
        def body(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(
                copy_kernel,
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, 32, 128), jnp.float32),
            )(x)
            return c, jnp.sum(y)
        return jax.lax.scan(body, 0, idxs)

    results["noop_pallas"] = time_scan("noop_pallas", noop_pallas,
                                       (data, idxs))

    # same but grid=(3,) over a 138 batch to see grid-step marginal cost of
    # a trivial kernel
    n3 = 138 * K
    data3 = jnp.asarray(rng.standard_normal((n3, 32, 128)), jnp.float32)
    idxs3 = jnp.asarray(np.arange(n3, dtype=np.int32).reshape(K, 138))
    gspec = pl.BlockSpec((B, 32, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def noop_grid3(data, idxs):
        def body(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(
                copy_kernel, grid=(3,),
                in_specs=[gspec], out_specs=gspec,
                out_shape=jax.ShapeDtypeStruct((138, 32, 128), jnp.float32),
            )(x)
            return c, jnp.sum(y)
        return jax.lax.scan(body, 0, idxs)

    results["noop_grid3"] = time_scan("noop_grid3", noop_grid3,
                                      (data3, idxs3))

    # noop with the one-shot kernel's CONSTANT operand set staged in VMEM
    # (4 MB of band matrices) — measures per-call operand staging
    consts = [jnp.zeros((8, 128, 128)), jnp.zeros((8, 3, 128, 128)),
              jnp.zeros((8, 128)), jnp.zeros((8, 128, 128)),
              jnp.zeros((8, 128)), jnp.zeros((8, 3, 128, 128)),
              jnp.zeros((8, 32, 128))]

    def heavy_operand_kernel(x_ref, *refs):
        o_ref = refs[-1]
        o_ref[...] = x_ref[...] + refs[0][0, :1]  # touch one const

    cspecs = [pl.BlockSpec(c.shape, (lambda *_: tuple(0 for _ in c.shape))
                           if False else None,
                           memory_space=pltpu.VMEM) for c in consts]

    @jax.jit
    def noop_consts(data, idxs, *consts):
        def body(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(
                heavy_operand_kernel,
                in_specs=[spec] + [pl.BlockSpec(cc.shape,
                                                memory_space=pltpu.VMEM)
                                   for cc in consts],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, 32, 128), jnp.float32),
            )(x, *consts)
            return c, jnp.sum(y)
        return jax.lax.scan(body, 0, idxs)

    results["noop_consts"] = time_scan("noop_consts", noop_consts,
                                       (data, idxs) + tuple(consts))

    # noop with the one-shot kernel's OUTPUT set (7 accumulators, ~4 MB)
    acc_shapes = [(8, 4, 128), (8, 128), (8, 128, 128), (8, 3, 128, 128),
                  (8, 128, 128), (8, 3, 128, 128), (8, 32, 128)]

    def heavy_output_kernel(x_ref, o_ref, *orefs):
        o_ref[...] = x_ref[...] * 2.0
        for r in orefs:
            r[...] = jnp.zeros_like(r)

    @jax.jit
    def noop_outputs(data, idxs):
        def body(c, idx):
            x = jnp.take(data, idx, axis=0)
            outs = pl.pallas_call(
                heavy_output_kernel,
                in_specs=[spec],
                out_specs=[spec] + [pl.BlockSpec(s, memory_space=pltpu.VMEM)
                                    for s in acc_shapes],
                out_shape=[jax.ShapeDtypeStruct((B, 32, 128), jnp.float32)] +
                          [jax.ShapeDtypeStruct(s, jnp.float32)
                           for s in acc_shapes],
            )(x)
            return c, jnp.sum(outs[0])
        return jax.lax.scan(body, 0, idxs)

    results["noop_outputs"] = time_scan("noop_outputs", noop_outputs,
                                        (data, idxs))

    with open("/root/repo/experiments/b138_launch_probe.json", "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
