"""Sampler-kernel variant sweep (round 3 perf work).

Benchmarks experimental variants of the fused sampling kernel against the
shipped v2 kernel on the real chip:

- v2       : shipped packed fold (6 matmuls / coupling, K=128 each)
- v3       : concat-K fold — m1's two matmuls become one K=256 matmul and
             m3's three become one K=384 matmul (3 matmuls / coupling).
             Same padded FLOPs, fewer MXU boundaries.
- streams=2: split each block into two independent half-tiles and interleave
             their op streams, giving the scheduler ILP to hide the
             dependent-chain latency.

Usage: python experiments/kernel_sweep.py [--batch 8192] [--bt 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from noise_flow_tpu.config import default_config  # noqa: E402
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: E402
from noise_flow_tpu.ops import pallas_sample as ps  # noqa: E402

H, WC, C, W = ps.H, ps.WC, ps.C, ps.W


def _variant_weights(program, concat_k: bool, pre_cast):
    """Stack program weights for the variant kernel."""
    ws = {
        "mixes": np.asarray(program.mixes),
        "m1as": np.asarray(program.m1as),
        "m1bs": np.asarray(program.m1bs),
        "b1s": np.asarray(program.b1s),
        "m2s": np.asarray(program.m2s),
        "b2s": np.asarray(program.b2s),
        "m3s": np.asarray(program.m3s),
        "offs": np.asarray(program.offs),
    }
    if concat_k:
        ws["m1cat"] = np.concatenate([ws.pop("m1as"), ws.pop("m1bs")], axis=1)
        m3 = ws.pop("m3s")
        ws["m3cat"] = np.concatenate([m3[:, 1], m3[:, 0], m3[:, 2]], axis=1)
    out = {}
    for k, v in ws.items():
        dt = pre_cast if (pre_cast is not None and k not in ("b1s", "b2s", "offs")) else np.float32
        out[k] = jnp.asarray(v, dt)
    return out


def make_variant_kernel(ops, rescales, bt, mm_dtype, temp, concat_k: bool,
                        n_streams: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sbt = bt // n_streams
    precision = (jax.lax.Precision.HIGHEST
                 if mm_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    def mm(x2, m):
        return jnp.dot(x2.astype(mm_dtype), m.astype(mm_dtype),
                       preferred_element_type=jnp.float32,
                       precision=precision)

    def kernel(seed_ref, clean_ref, sa_ref, sb_ref, *rest):
        out_ref = rest[-1]
        if concat_k:
            (mixes_ref, m1cat_ref, b1s_ref, m2s_ref, b2s_ref,
             m3cat_ref, offs_ref) = rest[:-1]
        else:
            (mixes_ref, m1as_ref, m1bs_ref, b1s_ref, m2s_ref, b2s_ref,
             m3s_ref, offs_ref) = rest[:-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WC), 2)
        keep_mask = (lane % C) < (C // 2)

        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        bits1 = pltpu.bitcast(pltpu.prng_random_bits((bt, H // 2, WC)),
                              jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits((bt, H // 2, WC)),
                              jnp.uint32)
        x_all = ps._box_muller(bits1, bits2) * temp

        xs = [x_all[i * sbt:(i + 1) * sbt] for i in range(n_streams)]
        cleans = [clean_ref[i * sbt:(i + 1) * sbt] for i in range(n_streams)]
        sas = [sa_ref[i * sbt:(i + 1) * sbt] for i in range(n_streams)]
        sbs = [sb_ref[i * sbt:(i + 1) * sbt] for i in range(n_streams)]

        def apply_op(op, x, si):
            kind, idx = op[0], op[1]
            if kind == "mix":
                return mm(x.reshape(sbt * H, WC),
                          mixes_ref[idx]).reshape(sbt, H, WC)
            if kind == "scale":
                a = sas[si][:, idx].reshape(sbt, 1, 1)
                b = sbs[si][:, idx].reshape(sbt, 1, 1)
                return x * jnp.sqrt(a * cleans[si] + b)
            # coupling
            xu = ps._shift_h(x, -1)
            z = jnp.where(keep_mask, x, jnp.roll(xu, 2, axis=-1))
            if concat_k:
                zin = jnp.concatenate(
                    [z, ps._shift_h(x, 1)], axis=-1).reshape(sbt * H, 2 * WC)
                h = mm(zin, m1cat_ref[idx])
            else:
                h = mm(z.reshape(sbt * H, WC), m1as_ref[idx])
                h += mm(ps._shift_h(x, 1).reshape(sbt * H, WC), m1bs_ref[idx])
            h = jax.nn.relu(h + b1s_ref[idx].reshape(1, WC))
            h = jax.nn.relu(mm(h, m2s_ref[idx]) + b2s_ref[idx].reshape(1, WC))
            h3 = h.reshape(sbt, H, WC)
            if concat_k:
                hin = jnp.concatenate(
                    [h3, ps._shift_h(h3, -1), ps._shift_h(h3, 1)],
                    axis=-1).reshape(sbt * H, 3 * WC)
                t = mm(hin, m3cat_ref[idx])
            else:
                t = mm(h, m3s_ref[idx, 1])
                t += mm(ps._shift_h(h3, -1).reshape(sbt * H, WC),
                        m3s_ref[idx, 0])
                t += mm(ps._shift_h(h3, 1).reshape(sbt * H, WC),
                        m3s_ref[idx, 2])
            t = t.reshape(sbt, H, WC) + offs_ref[idx].reshape(1, H, WC)
            ls = rescales[idx] * jnp.tanh(jnp.roll(t, 2, axis=-1))
            return jnp.where(keep_mask, x, (x - t) * jnp.exp(-ls))

        for op in ops:
            for si in range(n_streams):
                xs[si] = apply_op(op, xs[si], si)
        out_ref[:] = jnp.concatenate(xs, axis=0) if n_streams > 1 else xs[0]

    return kernel


def _make_run(kernel, bt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(seed, clean, sa, sb, *weights):
        b = clean.shape[0]

        def batch_spec(cols=None):
            if cols is None:
                return pl.BlockSpec((bt, H, WC), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((bt, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def const_spec(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda i: (0,) * nd,
                                memory_space=pltpu.VMEM)

        seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        n_scale = sa.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=[seed_spec, batch_spec(), batch_spec(n_scale),
                      batch_spec(n_scale)] + [const_spec(w.shape)
                                              for w in weights],
            out_specs=batch_spec(),
            out_shape=jax.ShapeDtypeStruct((b, H, WC), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(seed, clean, sa, sb, *weights)

    return run


def bench_variant(name, program, cond, batch, bt, mm_dtype, concat_k,
                  n_streams, pre_cast=None, n_iter=50, temp=0.6):
    sa, sb = ps.precompute_scale_ab(program, cond)
    clean_t = jnp.asarray(cond["clean"], jnp.float32).reshape(batch, H, WC)
    ws = _variant_weights(program, concat_k, pre_cast)
    if concat_k:
        weights = (ws["mixes"], ws["m1cat"], ws["b1s"], ws["m2s"], ws["b2s"],
                   ws["m3cat"], ws["offs"])
    else:
        weights = (ws["mixes"], ws["m1as"], ws["m1bs"], ws["b1s"], ws["m2s"],
                   ws["b2s"], ws["m3s"], ws["offs"])
    kernel = make_variant_kernel(program.ops, tuple(program.rescales), bt,
                                 mm_dtype, temp, concat_k, n_streams)
    runner = _make_run(kernel, bt)

    def run(seed):
        s = jnp.full((1, 1), seed, jnp.int32)
        return runner(s, clean_t, sa, sb, *weights)

    out = run(0)
    out.block_until_ready()
    for i in range(5):
        out = run(1 + i)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = run(100 + i)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    rate = batch * n_iter / dt
    return rate, np.asarray(out[:2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--bt", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    program = ps.build_sample_program(flow, params, state)

    batch = args.batch
    rng = np.random.default_rng(0)
    cond = {
        "clean": jnp.asarray(rng.uniform(0.01, 0.9, (batch, 32, 32, 4)),
                             jnp.float32),
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0),
    }

    # shipped v2 baseline via make_sampler
    sampler = ps.make_sampler(program, cond, temp=0.6, bt=args.bt,
                              mm_dtype=jnp.bfloat16)
    sampler(1).block_until_ready()
    for i in range(5):
        out = sampler(2 + i)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = sampler(100 + i)
    out.block_until_ready()
    base = batch * args.iters / (time.perf_counter() - t0)
    print(f"v2 shipped         : {base:12.0f} patches/s")

    variants = [
        ("v2-rebuilt", False, 1, None),
        ("v3-concatK", True, 1, None),
        ("v2-streams2", False, 2, None),
        ("v3-streams2", True, 2, None),
        ("v3-precast-bf16", True, 1, jnp.bfloat16),
        ("v3-streams2-precast", True, 2, jnp.bfloat16),
    ]
    for name, ck, nstr, pc in variants:
        try:
            rate, _head = bench_variant(name, program, cond, batch, args.bt,
                                        jnp.bfloat16, ck, nstr, pre_cast=pc,
                                        n_iter=args.iters)
            print(f"{name:19s}: {rate:12.0f} patches/s  ({rate/base:.3f}x)")
        except Exception as e:
            print(f"{name:19s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
