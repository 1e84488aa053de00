"""Ablation probe for the fused sampler kernel: where does the time go?

Variants (each breaks numerics — diagnostics only):
  base      : current kernel
  notrans   : tanh/exp replaced by cheap polynomials (measures transcendental cost)
  noshift   : H-shifts dropped, middle band only (measures shift/copy cost)
  nocoupnn  : couplings reduced to mix-only (MXU floor)
  interleave: split the block into 2 independent half-tiles, ops interleaved
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops import pallas_sample as ps
from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, WC, C = ps.H, ps.WC, ps.C


def make_kernel(ops, rescales, bt, mm_dtype, temp, variant):
    notrans = variant == "notrans"
    noshift = variant == "noshift"
    nocoupnn = variant == "nocoupnn"
    n_split = 2 if variant == "interleave" else 1
    btc = bt // n_split

    def mm(x2, m):
        return jnp.dot(x2.astype(mm_dtype), m.astype(mm_dtype),
                       preferred_element_type=jnp.float32)

    def shift(x, dh):
        if noshift:
            return x
        return ps._shift_h(x, dh)

    def tanh(u):
        return u * 0.9 if notrans else jnp.tanh(u)

    def exp(u):
        return 1.0 + u if notrans else jnp.exp(u)

    def kernel(first_ref, clean_ref, sa_ref, sb_ref, mixes_ref, m1s_ref,
               b1s_ref, m2s_ref, b2s_ref, m3s_ref, offs_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WC), 2)
        keep_mask = (lane % C) < (C // 2)
        pltpu.prng_seed(first_ref[0, 0] + pl.program_id(0))
        xs = []
        for s in range(n_split):
            b1 = pltpu.bitcast(pltpu.prng_random_bits((btc, H // 2, WC)),
                               jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits((btc, H // 2, WC)),
                               jnp.uint32)
            xs.append(ps._box_muller(b1, b2) * temp)
        for op in ops:
            kind, idx = op[0], op[1]
            if kind == "mix":
                xs = [mm(x.reshape(btc * H, WC), mixes_ref[idx])
                      .reshape(btc, H, WC) for x in xs]
            elif kind == "scale":
                nxs = []
                for s, x in enumerate(xs):
                    a = sa_ref[s * btc:(s + 1) * btc, idx].reshape(btc, 1, 1)
                    b = sb_ref[s * btc:(s + 1) * btc, idx].reshape(btc, 1, 1)
                    cl = clean_ref[s * btc:(s + 1) * btc]
                    nxs.append(x * jnp.sqrt(a * cl + b))
                xs = nxs
            else:
                if nocoupnn:
                    continue
                hs = [mm(x.reshape(btc * H, WC), m1s_ref[idx, 1]) for x in xs]
                hs = [h + mm(shift(x, -1).reshape(btc * H, WC), m1s_ref[idx, 0])
                      for h, x in zip(hs, xs)]
                hs = [h + mm(shift(x, 1).reshape(btc * H, WC), m1s_ref[idx, 2])
                      for h, x in zip(hs, xs)]
                hs = [jax.nn.relu(h + b1s_ref[idx].reshape(1, WC)) for h in hs]
                hs = [jax.nn.relu(mm(h, m2s_ref[idx]) + b2s_ref[idx].reshape(1, WC))
                      for h in hs]
                h3s = [h.reshape(btc, H, WC) for h in hs]
                ts = [mm(h, m3s_ref[idx, 1]) for h in hs]
                ts = [t + mm(shift(h3, -1).reshape(btc * H, WC), m3s_ref[idx, 0])
                      for t, h3 in zip(ts, h3s)]
                ts = [t + mm(shift(h3, 1).reshape(btc * H, WC), m3s_ref[idx, 2])
                      for t, h3 in zip(ts, h3s)]
                ts = [t.reshape(btc, H, 2 * WC) + offs_ref[idx].reshape(1, H, 2 * WC)
                      for t in ts]
                nxs = []
                for x, t in zip(xs, ts):
                    sh = t[..., :WC]
                    ls = rescales[idx] * tanh(t[..., WC:])
                    nxs.append(jnp.where(keep_mask, x, (x - sh) * exp(-ls)))
                xs = nxs
        out_ref[:] = jnp.concatenate(xs, 0) if n_split > 1 else xs[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("program", "bt", "mm_dtype",
                                             "temp", "variant"))
def run(program, seed, clean, sa, sb, bt, mm_dtype, temp, variant):
    b = clean.shape[0]
    kernel = make_kernel(program.ops, tuple(program.rescales), bt, mm_dtype,
                         temp, variant)

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

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  batch_spec(), batch_spec(sa.shape[1]), batch_spec(sa.shape[1]),
                  const_spec(program.mixes.shape), const_spec(program.m1s.shape),
                  const_spec(program.b1s.shape), const_spec(program.m2s.shape),
                  const_spec(program.b2s.shape), const_spec(program.m3s.shape),
                  const_spec(program.offs.shape)],
        out_specs=batch_spec(),
        out_shape=jax.ShapeDtypeStruct((b, H, WC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed, clean, sa, sb, program.mixes, program.m1s, program.b1s,
      program.m2s, program.b2s, program.m3s, program.offs)


cfg = default_config(patch_height=32)
flow = NoiseFlow((32, 32, 4), cfg)
params, state = flow.init(jax.random.PRNGKey(0))
program = ps.build_sample_program(flow, params, state, version=1)

batch = 8192
rng0 = np.random.default_rng(0)
clean = jnp.asarray(rng0.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
cond = {"clean": clean, "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6), "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0)}
sa, sb = program.scale_ab(cond, batch)
clean_t = clean.reshape(batch, H, WC)
seed = jnp.zeros((1, 1), jnp.int32)

per_row = 8 * (4 * 128 * 128 + 3 * 128 * 256) * 2 + 8 * 128 * 128 * 2
sol = 197e12 / (per_row * 32)

for variant in ("base", "notrans", "noshift", "nocoupnn", "interleave"):
    for bt in (32, 64, 128):
        try:
            out = run(program, seed, clean_t, sa, sb, bt, jnp.bfloat16, 0.6,
                      variant).block_until_ready()
            n = 50
            t0 = time.perf_counter()
            for i in range(n):
                out = run(program, seed + i, clean_t, sa, sb, bt,
                          jnp.bfloat16, 0.6, variant)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            sps = batch * n / dt
            print(f"{variant:10s} bt={bt:4d}: {sps/1e6:7.3f} M/s  "
                  f"frac_sol={sps/sol:.3f}")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:120]
            print(f"{variant:10s} bt={bt:4d}: FAIL {type(e).__name__}: {msg}")
