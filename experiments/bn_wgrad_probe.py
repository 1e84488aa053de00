"""Micro-probe: ghost-BN moment reductions and wgrad transposes (round 3).

train_attrib.py shows the fused train kernels sit far above their matmul
roof, with the gap in (a) the ghost-BN channel-moment stats and (b) the
weight-grad matmuls. This probe times isolated kernel variants of both on
the real chip to pick replacements.

BN stats variants (per call: like one bn() on [R=bt*H, L]):
  base      : jnp.sum(axis=0) row-sum + [1,L]@csel[L,L] group matmul (current)
  nosum     : skip the row-sum (measures row-sum cost)
  nocsel    : skip the csel matmul (measures tiny-matmul cost)
  roll      : row-sum + log2(W) roll-adds for the group sum (no matmul)
  mxusum    : ones[8,R]@h2 MXU row-sum + roll-adds group sum

wgrad variants (per call: one [L,R]@[R,L] weight grad):
  base      : mm(x.reshape(R,L).T, g)  (explicit transpose)
  dotgen    : lax.dot_general contracting dim 0 (no materialized transpose)

Usage: python experiments/bn_wgrad_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from noise_flow_tpu.ops.nn import BN_EPS  # noqa: E402

H, L, C, W = 32, 128, 4, 32
BT = 64
R = BT * H
N_BN = 8  # chained bn() calls per kernel (mimics 4 couplings x 2 BNs)


def _csel():
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) % C
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) % C
    return (li == lj).astype(jnp.float32)


def _group_sum_roll(s):
    """[r, L] per-lane sums -> per-channel sums via log2(W) roll-adds."""
    for k in (C, 2 * C, 4 * C, 8 * C, 16 * C):
        s = s + jnp.roll(s, k, axis=-1)
    return s


def bn_kernel(variant, x_ref, o_ref):
    n_el = R * W
    csel = _csel()
    h = x_ref[:].reshape(R, L)
    for _ in range(N_BN):
        if variant == "base":
            s = jnp.sum(h, axis=0, keepdims=True)
            m = jnp.dot(s, csel, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * (1.0 / n_el)
            d = h - m
            v = jnp.dot(jnp.sum(d * d, axis=0, keepdims=True), csel,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * (1.0 / n_el)
        elif variant == "nosum":
            s = h[0:1]
            m = jnp.dot(s, csel, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * (1.0 / n_el)
            d = h - m
            v = jnp.dot(d[0:1] * d[0:1], csel,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * (1.0 / n_el)
        elif variant == "nocsel":
            m = jnp.sum(h, axis=0, keepdims=True) * (1.0 / n_el)
            d = h - m
            v = jnp.sum(d * d, axis=0, keepdims=True) * (1.0 / n_el)
        elif variant == "roll":
            m = _group_sum_roll(jnp.sum(h, axis=0, keepdims=True)) * (1.0 / n_el)
            d = h - m
            v = _group_sum_roll(
                jnp.sum(d * d, axis=0, keepdims=True)) * (1.0 / n_el)
        elif variant == "mxusum":
            ones8 = jnp.ones((8, R), jnp.bfloat16)
            s8 = jnp.dot(ones8, h.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            m = _group_sum_roll(s8[0:1]) * (1.0 / n_el)
            d = h - m
            v8 = jnp.dot(ones8, (d * d).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            v = _group_sum_roll(v8[0:1]) * (1.0 / n_el)
        else:
            raise ValueError(variant)
        h = d * jax.lax.rsqrt(v + BN_EPS)
    o_ref[:] = h.reshape(BT, H, L)


def wgrad_kernel(variant, x_ref, g_ref, o_ref):
    x = x_ref[:].reshape(R, L)
    g = g_ref[:].reshape(R, L)
    acc = jnp.zeros((L, L), jnp.float32)
    for _ in range(N_BN):
        if variant == "base":
            acc += jnp.dot(x.T.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        elif variant == "dotgen":
            acc += jax.lax.dot_general(
                x.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            raise ValueError(variant)
        g = g * 0.999  # keep iterations dependent
    o_ref[:] = acc


@functools.lru_cache(maxsize=None)
def make_bn(variant, b):
    f = pl.pallas_call(
        functools.partial(bn_kernel, variant),
        grid=(b // BT,),
        in_specs=[pl.BlockSpec((BT, H, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BT, H, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def make_wgrad(variant, b):
    f = pl.pallas_call(
        functools.partial(wgrad_kernel, variant),
        grid=(b // BT,),
        in_specs=[pl.BlockSpec((BT, H, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return jax.jit(f)


def timeit(fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    b = 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, H, L)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, H, L)), jnp.float32)

    print(f"batch={b} bt={BT} chained_calls={N_BN}")
    ref = None
    for v in ("base", "nosum", "nocsel", "roll", "mxusum"):
        try:
            f = make_bn(v, b)
            out = f(x)
            t = timeit(lambda f=f: f(x))
            note = ""
            if v == "base":
                ref = np.asarray(out)
            elif v in ("roll", "mxusum") and ref is not None:
                err = float(np.max(np.abs(np.asarray(out) - ref)))
                note = f"  max|diff vs base|={err:.2e}"
            print(f"bn/{v:8s} {t*1e6:9.1f} us{note}")
        except Exception as e:
            print(f"bn/{v:8s} FAILED: {type(e).__name__}: {e}")

    refw = None
    for v in ("base", "dotgen"):
        try:
            f = make_wgrad(v, b)
            out = f(x, g)
            t = timeit(lambda f=f: f(x, g))
            note = ""
            if v == "base":
                refw = np.asarray(out)
            elif refw is not None:
                err = float(np.max(np.abs(np.asarray(out) - refw)))
                note = f"  max|diff vs base|={err:.2e}"
            print(f"wg/{v:8s} {t*1e6:9.1f} us{note}")
        except Exception as e:
            print(f"wg/{v:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
