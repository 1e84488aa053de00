#!/usr/bin/env python
"""Which feature of the one-shot pallas_call causes the ~390 us/call floor?

A trivial copy kernel costs 0.5 us/call in the same scan context; the real
kernel has a flat 390 us floor. Adds the real call's features to the noop
one at a time:

  noop            copy kernel, 1 in 1 out                      (0.5 us ref)
  +smem           + two SMEM operands like rs/invb
  +params         + CompilerParams(arbitrary, vmem_limit=128MB)
  +bigbody        + ~200 serial VPU ops and 2 MXU matmuls in the body
  +hugebody       + ~8x that (approximates the real program size)
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
K = 64


def main():
    assert jax.default_backend() == "tpu"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = B * K
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((n, 32, 128)), jnp.float32)
    idxs = jnp.asarray(np.arange(n, dtype=np.int32).reshape(K, B))
    mat = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    spec = pl.BlockSpec((B, 32, 128), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((128, 128), lambda: (0, 0),
                         memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((8, 1), lambda: (0, 0), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM)
    rs = jnp.ones((8, 1), jnp.float32)
    invb = jnp.ones((1, 1), jnp.float32)
    results = {}

    def timeit(name, run, args):
        out = run(*args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / K)
        us = best * 1e6
        results[name] = us
        print(f"{name:>10}: {us:8.1f} us/call", flush=True)

    # --- noop ---
    def k_noop(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    @jax.jit
    def r_noop(data, idxs):
        def f(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(k_noop, in_specs=[spec], out_specs=spec,
                               out_shape=jax.ShapeDtypeStruct(
                                   (B, 32, 128), jnp.float32))(x)
            return c, jnp.sum(y)
        return jax.lax.scan(f, 0, idxs)

    timeit("noop", r_noop, (data, idxs))

    # --- +smem ---
    def k_smem(x_ref, rs_ref, ib_ref, o_ref):
        o_ref[...] = x_ref[...] * rs_ref[0, 0] + ib_ref[0, 0]

    @jax.jit
    def r_smem(data, idxs, rs, invb):
        def f(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(k_smem, in_specs=[spec, smem1, smem2],
                               out_specs=spec,
                               out_shape=jax.ShapeDtypeStruct(
                                   (B, 32, 128), jnp.float32))(x, rs, invb)
            return c, jnp.sum(y)
        return jax.lax.scan(f, 0, idxs)

    timeit("+smem", r_smem, (data, idxs, rs, invb))

    # --- +compiler params ---
    @jax.jit
    def r_params(data, idxs):
        def f(c, idx):
            x = jnp.take(data, idx, axis=0)
            y = pl.pallas_call(
                k_noop, grid=(1,),
                in_specs=[pl.BlockSpec((B, 32, 128), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, 32, 128), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 32, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(x)
            return c, jnp.sum(y)
        return jax.lax.scan(f, 0, idxs)

    timeit("+params", r_params, (data, idxs))

    # --- +big body (serial VPU chain + MXU) ---
    def mk_body(reps):
        def k_big(x_ref, m_ref, o_ref):
            h = x_ref[...]
            m = m_ref[...]
            for _ in range(reps):
                h2 = jax.lax.dot_general(
                    h.reshape(B * 32, 128), m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(B, 32, 128)
                h = h + 0.125 * jnp.tanh(h2)
            o_ref[...] = h
        return k_big

    for name, reps in (("+bigbody", 8), ("+hugebody", 64)):
        body = mk_body(reps)

        @jax.jit
        def r_big(data, idxs, mat, body=body):
            def f(c, idx):
                x = jnp.take(data, idx, axis=0)
                y = pl.pallas_call(body, in_specs=[spec, mspec],
                                   out_specs=spec,
                                   out_shape=jax.ShapeDtypeStruct(
                                       (B, 32, 128), jnp.float32))(x, mat)
                return c, jnp.sum(y)
            return jax.lax.scan(f, 0, idxs)

        timeit(name, r_big, (data, idxs, mat))

    with open("/root/repo/experiments/b138_floor_discriminate.json", "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=1)


if __name__ == "__main__":
    main()
