"""Attribute the fused TRAIN step's time below the MXU roof (round 3).

The bench puts the fused big-batch train step at ~0.33 MFU against the
padded-band FLOP count (4x the forward's 59 MFLOP/patch). This probe times
the segment kernels in isolation and ablated backward variants (numerics
intentionally broken — diagnostics only) to locate the other two thirds:

  fwd            : _seg_fwd_call alone (ghost BN), per published-arch segment
  bwd            : _seg_bwd_call alone (recompute + reverse + wgrads)
  bwd_nowgrad    : weight-grad matmuls and their accs stripped
  bwd_nobnbwd    : BN backward reduced to the diagonal term (no cmean stats)
  bwd_noelem     : reverse sweep's elementwise epilogues stripped (matmul
                   skeleton only)

Usage (real chip, nothing else running):  python experiments/train_attrib.py
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

from noise_flow_tpu.config import default_config  # noqa: E402
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: E402
from noise_flow_tpu.ops import pallas_train as pt  # noqa: E402
from noise_flow_tpu.ops.pallas_train import (  # noqa: E402
    H, L, _chan_sel, _conv3, _conv3_t, _conv3_wgrad, _mk_mm, _fold_segment,
    _seg_fwd_call, _seg_bwd_call, _shift_h, _vmem_specs)
from noise_flow_tpu.ops.nn import BN_EPS  # noqa: E402

C = 4
BT = 64


def _bwd_kernel_variant(ops, bt, mm_dtype, *, wgrad=True, bn_stats=True,
                        elem=True, stat_mxu=False, wgrad3=False):
    """_bwd_kernel_factory with ablation switches.

    stat_mxu: channel-moment reductions ride the MXU (ones8 @ v2 @ csel)
    instead of a VPU cross-sublane row-sum feeding a tiny matmul.
    wgrad3: the three conv-tap weight grads run as ONE [3L, R] @ [R, L]
    matmul over the stacked shifted inputs.
    """
    mm = _mk_mm(mm_dtype)
    n_el = bt * H * (L // C)

    def kernel(x_ref, rs_ref, mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref,
               m3s_ref, offs_ref, gz_ref, gldj_ref,
               gx_ref, grs_ref, gmixes_ref, gm1s_ref, gm2s_ref, gm3s_ref,
               goffs_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        keep = (lane % C) < (C // 2)
        csel = _chan_sel()
        ones8 = jnp.ones((8, bt * H), jnp.float32)

        def cmean(v2):
            if not bn_stats:
                return jnp.zeros((1, L), jnp.float32)
            if stat_mxu:
                s8 = jnp.dot(ones8, v2, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                return mm(s8[0:1], csel) * (1.0 / n_el)
            return mm(jnp.sum(v2, axis=0, keepdims=True), csel) * (1.0 / n_el)

        def wgrad_taps(x3, gt2):
            """[3, L, L] conv-tap weight grads for input x3 [bt, H, L]."""
            if not wgrad3:
                return _conv3_wgrad(mm, x3, gt2, bt)
            stacked = jnp.concatenate(
                [_shift_h(x3, -1).reshape(bt * H, L),
                 x3.reshape(bt * H, L),
                 _shift_h(x3, 1).reshape(bt * H, L)], axis=1)   # [R, 3L]
            w = mm(stacked.T, gt2)                              # [3L, L]
            return [w[:L], w[L:2 * L], w[2 * L:]]

        x = x_ref[:]
        res = []
        for kind, idx in ops:
            if kind == "mix":
                res.append((x,))
                x = mm(x.reshape(bt * H, L), mixes_ref[idx]).reshape(bt, H, L)
            else:
                x_in = x
                h1 = _conv3(mm, x, m1s_ref[idx], bt) + b1s_ref[idx].reshape(1, L)
                m1v = cmean(h1)
                d1 = h1 - m1v
                v1v = cmean(d1 * d1)
                is1 = jax.lax.rsqrt(v1v + BN_EPS)
                n1 = d1 * is1
                r1 = jax.nn.relu(n1)
                h2 = mm(r1, m2s_ref[idx]) + b2s_ref[idx].reshape(1, L)
                m2v = cmean(h2)
                d2 = h2 - m2v
                v2v = cmean(d2 * d2)
                is2 = jax.lax.rsqrt(v2v + BN_EPS)
                n2 = d2 * is2
                r2 = jax.nn.relu(n2)
                t = _conv3(mm, r2.reshape(bt, H, L), m3s_ref[idx], bt)
                t = t.reshape(bt, H, L) + offs_ref[idx].reshape(1, H, L)
                th = jnp.tanh(t)
                ls = rs_ref[idx, 0] * th
                els = jnp.exp(ls)
                res.append((x_in, n1, is1, r1, n2, is2, r2, th, els))
                x = jnp.where(keep, x, x * els + jnp.roll(t, 2, axis=-1))

        g = gz_ref[:]
        gl = gldj_ref[:][:, :, 0:1]
        first = pl.program_id(0) == 0
        grs_rows = []

        def acc(ref, idx, val):
            @pl.when(first)
            def _i():
                ref[idx] = val

            @pl.when(jnp.logical_not(first))
            def _a():
                ref[idx] += val

        def bn_bwd(gn, n, inv_s):
            if not bn_stats:
                return inv_s * gn
            return inv_s * (gn - cmean(gn) - n * cmean(gn * n))

        for kind, idx in reversed(list(ops)):
            r = res.pop()
            if kind == "mix":
                (x_in,) = r
                if wgrad:
                    acc(gmixes_ref, idx,
                        mm(x_in.reshape(bt * H, L).T, g.reshape(bt * H, L)))
                g = mm(g.reshape(bt * H, L),
                       mixes_ref[idx].T).reshape(bt, H, L)
            else:
                x_in, n1, is1, r1, n2, is2, r2, th, els = r
                if elem:
                    gcpl = jnp.where(keep, 0.0, g)
                    gls = gcpl * x_in * els + jnp.where(
                        keep, 0.0, jnp.broadcast_to(gl, g.shape))
                    sech2 = 1.0 - th * th
                    gt = (gls * rs_ref[idx, 0] * sech2
                          + jnp.roll(gcpl, -2, axis=-1))
                    grs_rows.insert(0, jnp.sum((gls * th).reshape(bt * H, L),
                                               axis=0, keepdims=True))
                    acc(goffs_ref, idx, jnp.sum(gt, axis=0))
                else:
                    gt = g
                    grs_rows.insert(0, jnp.zeros((1, L), jnp.float32))
                gt2 = gt.reshape(bt * H, L)
                if wgrad:
                    w3 = wgrad_taps(r2.reshape(bt, H, L), gt2)
                    acc(gm3s_ref, idx, jnp.stack(w3))
                gr2 = _conv3_t(mm, gt2, m3s_ref[idx], bt)
                gn2 = gr2 * (n2 > 0) if elem else gr2
                gh2 = bn_bwd(gn2, n2, is2)
                if wgrad:
                    acc(gm2s_ref, idx, mm(r1.T, gh2))
                gr1 = mm(gh2, m2s_ref[idx].T)
                gn1 = gr1 * (n1 > 0) if elem else gr1
                gh1 = bn_bwd(gn1, n1, is1)
                if wgrad:
                    w1 = wgrad_taps(x_in, gh1)
                    acc(gm1s_ref, idx, jnp.stack(w1))
                gx_nn = _conv3_t(mm, gh1, m1s_ref[idx], bt).reshape(bt, H, L)
                g = (jnp.where(keep, g, g * els) + gx_nn) if elem else \
                    (g + gx_nn)

        gx_ref[:] = g
        if grs_rows:
            acc(grs_ref, slice(None), jnp.concatenate(grs_rows, 0))
        else:
            grs_ref[:] = jnp.zeros_like(grs_ref)

    return kernel


def _fwd_kernel_variant(ops, bt, mm_dtype, *, bn_stats=True, elem=True,
                        ldj_on=True, stats_in=False):
    """_fwd_kernel_factory (ghost BN) with ablation switches.

    stats_in: take per-block BN moments from a precomputed input ref
    instead of computing them (models a stats-forwarding design)."""
    mm = _mk_mm(mm_dtype)
    n_el = bt * H * (L // C)

    def kernel(x_ref, rs_ref, mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref,
               m3s_ref, offs_ref, bnrun_ref, z_ref, ldj_ref, bnacc_ref):
        from jax.experimental import pallas as pl

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        keep = (lane % C) < (C // 2)
        csel = _chan_sel()
        x = x_ref[:]
        ldj = jnp.zeros((bt, L), jnp.float32)
        bn_rows = []

        def bn(h2, run_row):
            if stats_in:
                m = run_row[0].reshape(1, L)
                v = run_row[1].reshape(1, L)
                d = h2 - m
                return d * jax.lax.rsqrt(v + BN_EPS), m, v
            if bn_stats:
                s = jnp.sum(h2, axis=0, keepdims=True)
                m = mm(s, csel) * (1.0 / n_el)
                d = h2 - m
                v = mm(jnp.sum(d * d, axis=0, keepdims=True), csel) * (1.0 / n_el)
            else:
                m = jnp.zeros((1, L), jnp.float32)
                v = jnp.ones((1, L), jnp.float32)
                d = h2 - m
            return d * jax.lax.rsqrt(v + BN_EPS), m, v

        for kind, idx in ops:
            if kind == "mix":
                x = mm(x.reshape(bt * H, L), mixes_ref[idx]).reshape(bt, H, L)
            else:
                h = _conv3(mm, x, m1s_ref[idx], bt) + b1s_ref[idx].reshape(1, L)
                h, m1v, v1v = bn(h, bnrun_ref[idx, 0:2])
                h = jax.nn.relu(h)
                h = mm(h, m2s_ref[idx]) + b2s_ref[idx].reshape(1, L)
                h, m2v, v2v = bn(h, bnrun_ref[idx, 2:4])
                h = jax.nn.relu(h)
                t = _conv3(mm, h.reshape(bt, H, L), m3s_ref[idx], bt)
                t = t.reshape(bt, H, L) + offs_ref[idx].reshape(1, H, L)
                if elem:
                    ls = rs_ref[idx, 0] * jnp.tanh(t)
                    sh = jnp.roll(t, 2, axis=-1)
                    x = jnp.where(keep, x, x * jnp.exp(ls) + sh)
                    if ldj_on:
                        ldj += jnp.sum(jnp.where(keep, 0.0, ls), axis=1)
                else:
                    x = t
                if bn_stats and not stats_in:
                    bn_rows.append(jnp.concatenate([m1v, v1v, m2v, v2v], 0))

        z_ref[:] = x
        ldj_ref[:] = ldj.reshape(bt, 1, L)
        if bn_rows:
            stats = jnp.stack(bn_rows)

            @pl.when(pl.program_id(0) == 0)
            def _init():
                bnacc_ref[:] = stats

            @pl.when(pl.program_id(0) != 0)
            def _acc():
                bnacc_ref[:] += stats
        else:
            bnacc_ref[:] = jnp.zeros_like(bnacc_ref)

    return kernel


def fwd_call_variant(ops, bt, mm_dtype, x, rescales, mixes, m1s, b1s, m2s,
                     b2s, m3s, offs, bnrun, **flags):
    b = x.shape[0]
    nc = m1s.shape[0]
    kernel = _fwd_kernel_variant(ops, bt, mm_dtype, **flags)
    batch3 = pl.BlockSpec((bt, H, L), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = _vmem_specs([mixes.shape, m1s.shape, b1s.shape, m2s.shape,
                          b2s.shape, m3s.shape, offs.shape, bnrun.shape],
                         pl, pltpu)
    rs_spec = pl.BlockSpec(rescales.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[batch3, rs_spec] + consts,
        out_specs=[batch3,
                   pl.BlockSpec((bt, 1, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   _vmem_specs([(nc, 4, L)], pl, pltpu)[0]],
        out_shape=[jax.ShapeDtypeStruct((b, H, L), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nc, 4, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs, bnrun)


def bwd_call_variant(ops, bt, mm_dtype, x, rescales, mixes, m1s, b1s, m2s,
                     b2s, m3s, offs, gz, gldj, **flags):
    b = x.shape[0]
    nc, nm = m1s.shape[0], mixes.shape[0]
    kernel = _bwd_kernel_variant(ops, bt, mm_dtype, **flags)
    batch3 = pl.BlockSpec((bt, H, L), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = _vmem_specs([mixes.shape, m1s.shape, b1s.shape, m2s.shape,
                          b2s.shape, m3s.shape, offs.shape], pl, pltpu)
    rs_spec = pl.BlockSpec(rescales.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    gld_spec = pl.BlockSpec((bt, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[batch3, rs_spec] + consts + [batch3, gld_spec],
        out_specs=[batch3] + _vmem_specs(
            [(nc, L), (nm, L, L), (nc, 3, L, L), (nc, L, L), (nc, 3, L, L),
             (nc, H, L)], pl, pltpu),
        out_shape=[jax.ShapeDtypeStruct((b, H, L), jnp.float32)] + [
            jax.ShapeDtypeStruct(s, jnp.float32) for s in
            [(nc, L), (nm, L, L), (nc, 3, L, L), (nc, L, L), (nc, 3, L, L),
             (nc, H, L)]],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs, gz,
      jnp.broadcast_to(gldj.reshape(b, 1, 1), (b, 1, 128)))


def timeit(fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    for _ in range(3):
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
    b = int(os.environ.get("NF_ATTRIB_BATCH", "2048"))
    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))

    # one published-arch coupling segment: (mix, coup) x 4
    from noise_flow_tpu.ops.pallas_train import FusedFlow
    ff = FusedFlow(flow, bt=BT, mm_dtype=jnp.bfloat16, interpret=False)
    seg_items = [it for it in ff.plan if it[0] == "segment"]
    print(f"plan: {[(it[0]) for it in ff.plan]}, batch={b}")
    _, seg, lo, hi = seg_items[0]
    specs = flow.level_specs[0]
    mats, _ = _fold_segment(seg, specs[lo:hi], params["layers"][0][lo:hi],
                            state["layers"][0][lo:hi], cfg, cfg.width)
    mats = jax.tree.map(jnp.asarray, mats)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, H, L)), jnp.float32)
    gz = jnp.asarray(rng.standard_normal((b, H, L)), jnp.float32)
    gldj = jnp.full((b,), -1.0 / b, jnp.float32)

    args = (x, mats["rescales"], mats["mixes"], mats["m1s"], mats["b1s"],
            mats["m2s"], mats["b2s"], mats["m3s"], mats["offs"])

    fwd = jax.jit(lambda *a: _seg_fwd_call(
        seg.ops, BT, jnp.bfloat16, True, False, *a, mats["bnrun"]))
    t_fwd = timeit(lambda: fwd(*args))

    bwd_full = jax.jit(lambda *a: _seg_bwd_call(
        seg.ops, BT, jnp.bfloat16, False, *a, gz, gldj))
    t_bwd = timeit(lambda: bwd_full(*args))
    times = {"fwd": t_fwd, "bwd": t_bwd}

    fwd_variants = {
        "fwd_nostats": dict(bn_stats=False),
        "fwd_noelem": dict(elem=False),
        "fwd_noldj": dict(ldj_on=False),
        "fwd_statsin": dict(stats_in=True),
        "fwd_skeleton": dict(bn_stats=False, elem=False),
    }
    for name, flags in fwd_variants.items():
        f = jax.jit(functools.partial(
            fwd_call_variant, seg.ops, BT, jnp.bfloat16, **flags))
        times[name] = timeit(
            lambda f=f: f(*args, mats["bnrun"]))

    variants = {
        "bwd_nowgrad": dict(wgrad=False),
        "bwd_nobnbwd": dict(bn_stats=False),
        "bwd_noelem": dict(elem=False),
        "bwd_skeleton": dict(wgrad=False, bn_stats=False, elem=False),
        "bwd_statmxu": dict(stat_mxu=True),
        "bwd_wgrad3": dict(wgrad3=True),
        "bwd_sm_w3": dict(stat_mxu=True, wgrad3=True),
    }
    for name, flags in variants.items():
        f = jax.jit(functools.partial(
            bwd_call_variant, seg.ops, BT, jnp.bfloat16, **flags))
        times[name] = timeit(lambda f=f: f(*args, gz, gldj))

    # MXU roofs for this segment (padded-band FLOPs, bf16 peak)
    n_coup = seg.nc
    n_mix = seg.nm
    big = 2 * 128 * 128 * (b * H)
    fwd_mm = (7 * n_coup + n_mix) * big
    bwd_mm = fwd_mm + (14 * n_coup + 2 * n_mix) * big
    peak = 197e12
    print(f"segment nc={n_coup} nm={n_mix}")
    for k, v in times.items():
        roof = {"fwd": fwd_mm}.get(k, bwd_mm) / peak
        extra = "" if k.startswith("bwd_") else f"  roof={roof*1e6:.0f}us"
        print(f"{k:14s} {v*1e6:9.1f} us  ({b/v/1e6:.2f} Mpatch/s){extra}")
    print(f"roofs: fwd {fwd_mm/peak*1e6:.0f}us  bwd {bwd_mm/peak*1e6:.0f}us")


if __name__ == "__main__":
    main()
