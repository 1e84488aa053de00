"""Fused Pallas TPU kernel for the TRAINING direction (data -> latent + NLL).

ops/pallas_sample.py fuses the sampling chain; this module fuses the other
half of the workload: the per-step NLL pass and its backward. As an XLA
graph, every coupling boundary round-trips [B, H, 128] activations through
HBM (see ops/packed_flow.py), which caps training at HBM bandwidth. Here a
whole ``[1x1-mix, coupling] x k`` sub-chain runs inside one Pallas kernel —
activations stay in VMEM, channel mixing rides the MXU as banded 128x128
matmuls — and the backward pass is a second kernel that RECOMPUTES the
forward per block in VMEM (no residual traffic) before the reverse sweep.

Structure per train step (all inside one jit):

    params --fold (differentiable XLA: packed_flow.band_from_conv)--> mats
    x --[scale layers in XLA]--> segment kernel --> ... --> z, sum(ldj)
    nll = -(ldj + mix-logdets + scale-ldjs + prior logp)
    jax.grad --> custom_vjp kernel --> d mats --> (autodiff) --> d params

Semantics notes:
- Scale-only conditional layers (sdn*/gain*) and the invertible-1x1 log-dets
  are param-formula work with no spatial structure; they stay in plain
  differentiable JAX between segments, so every reference quirk (gain ldj
  modes, shared sdn_gain group) is reused from models/layers.py verbatim.
- BatchNorm inside coupling NNs uses PER-BLOCK (ghost) batch statistics in
  the fused path, not global-batch statistics: each grid block of ``bt``
  patches normalizes with its own moments (running stats are updated with
  the average of block moments). With B == bt this is exactly the reference
  semantics; for B > bt it is the well-known ghost-BN variant. Training-mode
  exact global BN remains available on the XLA path (Trainer fallback).
- Conv biases feeding a BatchNorm have mathematically zero gradient (BN
  subtracts the mean); the kernel returns exact zeros for them.

Supported envelope matches the Pallas sampler: single-level (32,32,4) flows,
conv coupling template, width <= 4, kinds in {coupling, conv1x1,
perm_reverse} + scale family.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.models.layers import get_layer_def
from noise_flow_tpu.ops.conv1x1 import matrix_param_build
from noise_flow_tpu.ops.gaussian import diag_gaussian_logp
from noise_flow_tpu.ops.nn import BN_DECAY, BN_EPS, LOGSCALE_FACTOR, conv_zeros_apply
from noise_flow_tpu.ops.packed_flow import (
    C,
    H,
    L,
    W,
    SUPPORTED_KINDS,
    _TAP_SEL,
    _lane,
    band_from_conv,
)
from noise_flow_tpu.ops.pallas_sample import SUPPORTED_SCALE_KINDS, _shift_h

_PERM_REV = np.kron(np.eye(W, dtype=np.float32),
                    np.eye(C, dtype=np.float32)[::-1])


# ---------------------------------------------------------------------------
# segment spec + differentiable fold
# ---------------------------------------------------------------------------

class Segment(NamedTuple):
    """A fused [mix?, coupling]* run. ops: (("mix", i) | ("coup", i), ...)."""
    ops: Tuple[Tuple[str, int], ...]
    nm: int
    nc: int


def _can_batch_fold(spec_slice, cfg) -> bool:
    """Batched fold envelope: homogeneous LU conv1x1 mixes + conv couplings
    (the published arch). perm_reverse / NONE / LU2 take the loop fold."""
    return (cfg.decomp == "LU"
            and all(s.kind in ("conv1x1", "coupling") for s in spec_slice))


@functools.lru_cache(maxsize=4)
def _ind_taps_np(h: int, w: int) -> np.ndarray:
    """[9, h, w] constant: contribution pattern of the edge-indicator input
    channel to each 3x3 VALID conv tap after _edge_pad_with_indicator."""
    ind = np.pad(np.zeros((h, w), np.float32), 1, constant_values=1.0)
    return np.stack([ind[di:di + h, dj:dj + w]
                     for di in range(3) for dj in range(3)])


def _fold_segment_batched(seg: Segment, spec_slice, params_slice,
                          state_slice, cfg, width: int):
    """Vectorized twin of the loop fold below: ONE stacked einsum per matrix
    type instead of per-layer ops. The loop fold is ~400 tiny XLA ops per
    step, which at the published batch 138 is pure serial launch latency
    (~700 us fwd+vjp measured in-situ, experiments/b138_attrib.py) — the
    batched form collapses it ~20x. Numerically identical (pinned by
    tests/test_fused_train.py::test_fold_batched_matches_loop); gradients
    flow through the same linear einsums. A_inv / triangular solves are NOT
    computed — the training direction only needs A and log|det|."""
    from noise_flow_tpu.ops.conv1x1 import _tri_indices

    eyeW = jnp.eye(W, dtype=jnp.float32)
    # --- mixes: LU rebuild, batched over the segment's conv1x1 layers ---
    mix_p = [p for s, p in zip(spec_slice, params_slice)
             if s.kind == "conv1x1"]
    mix_s = [st for s, st in zip(spec_slice, state_slice)
             if s.kind == "conv1x1"]
    nm = len(mix_p)
    if nm:
        c = mix_p[0]["mat"]["log_s"].shape[0]
        l_vec = jnp.stack([p["mat"]["l_vec"] for p in mix_p])
        u_vec = jnp.stack([p["mat"]["u_vec"] for p in mix_p])
        log_s = jnp.stack([p["mat"]["log_s"] for p in mix_p])
        sign_s = jnp.stack([st["frozen"]["sign_s"] for st in mix_s])
        perm = jnp.stack([st["frozen"]["p"] for st in mix_s])
        il, jl = _tri_indices(c, upper=False)
        iu, ju = _tri_indices(c, upper=True)
        eyec = jnp.eye(c, dtype=jnp.float32)
        l_m = jnp.zeros((nm, c, c)).at[:, il, jl].set(l_vec) + eyec
        u_m = (jnp.zeros((nm, c, c)).at[:, iu, ju].set(u_vec)
               + eyec * (sign_s * jnp.exp(log_s))[:, None, :])
        a = perm @ (l_m @ u_m)
        mixes = jnp.einsum("ab,nij->naibj", eyeW, a).reshape(nm, L, L)
        mix_logdet = jnp.sum(log_s) * (H * W)
    else:
        mixes = jnp.zeros((1, L, L), jnp.float32)
        mix_logdet = jnp.zeros(())
    # --- couplings: stacked band matrices -------------------------------
    cp = [p["nn"] for s, p in zip(spec_slice, params_slice)
          if s.kind == "coupling"]
    cs = [st["nn"] for s, st in zip(spec_slice, state_slice)
          if s.kind == "coupling"]
    nc = len(cp)
    if nc == 0:
        return {
            "rescales": jnp.zeros((1, 1), jnp.float32), "mixes": mixes,
            "m1s": jnp.zeros((1, 3, L, L)), "b1s": jnp.zeros((1, L)),
            "m2s": jnp.zeros((1, L, L)), "b2s": jnp.zeros((1, L)),
            "m3s": jnp.zeros((1, 3, L, L)), "offs": jnp.zeros((1, H, L)),
            "bnrun": jnp.zeros((1, 4, L)),
        }, mix_logdet

    def lane_stack(vs, pad_val=0.0):
        v = jnp.stack(vs).reshape(nc, -1)          # [nc, width]
        v = jnp.pad(v, ((0, 0), (0, C - width)), constant_values=pad_val)
        return jnp.tile(v, (1, W))                  # [nc, L]

    def band_stack(ws):
        """[nc, kh, kw, cin, cout] stacked conv weights -> [nc, kh, L, L]."""
        w = jnp.stack(ws)
        kh, kw, cin, cout = w.shape[1:]
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, C - cin),
                         (0, C - cout)))
        bands = jnp.einsum("kab,nhkio->nhaibo", _TAP_SEL[kw], wp)
        return bands.reshape(nc, kh, L, L)

    m1s = band_stack([p["l1_w"] for p in cp])
    b1s = lane_stack([p["l1_b"] for p in cp])
    m2s = band_stack([p["l2_w"] for p in cp])[:, 0]
    b2s = lane_stack([p["l2_b"] for p in cp])
    logs_scale = jnp.exp(jnp.stack([p["last"]["logs"] for p in cp])
                         .reshape(nc, 1, 1, 1, -1) * LOGSCALE_FACTOR)
    wz = jnp.stack([p["last"]["w"] for p in cp])       # [nc,3,3,width+1,co]
    m3s = band_stack(list(wz[:, :, :, :width, :] * logs_scale))
    # zero-conv offsets: on a zero input only the edge-indicator channel and
    # the bias contribute — one einsum against the constant tap pattern
    # replaces nc full convs (conv_zeros_apply on zeros, loop fold below)
    taps = jnp.asarray(_ind_taps_np(H, W))             # [9, H, W]
    w_ind = wz[:, :, :, width, :].reshape(nc, 9, -1)   # [nc, 9, cout]
    offs4 = jnp.einsum("thw,nto->nhwo", taps, w_ind)
    offs4 = (offs4 + jnp.stack([p["last"]["b"] for p in cp]).reshape(
        nc, 1, 1, -1)) * logs_scale.reshape(nc, 1, 1, -1)
    offs = offs4.reshape(nc, H, L)
    rescales = jnp.stack([p["rescale"].reshape(()) for s, p in
                          zip(spec_slice, params_slice)
                          if s.kind == "coupling"]).reshape(nc, 1)
    bnrun = jnp.stack([
        lane_stack([st["bn1"]["mean"] for st in cs]),
        lane_stack([st["bn1"]["var"] for st in cs], pad_val=1.0),
        lane_stack([st["bn2"]["mean"] for st in cs]),
        lane_stack([st["bn2"]["var"] for st in cs], pad_val=1.0),
    ], axis=1)                                         # [nc, 4, L]
    mats = {"rescales": rescales, "mixes": mixes, "m1s": m1s, "b1s": b1s,
            "m2s": m2s, "b2s": b2s, "m3s": m3s, "offs": offs,
            "bnrun": bnrun}
    return mats, mix_logdet


def _fold_segment(seg: Segment, spec_slice, params_slice, state_slice, cfg,
                  width: int):
    """Stack the segment's kernel inputs from raw params (differentiable).

    Returns (mats dict, mix_logdet_sum) where mats has keys
    rescales[nc], mixes[nm,L,L], m1s[nc,3,L,L], b1s[nc,L], m2s[nc,L,L],
    b2s[nc,L], m3s[nc,3,L,L], offs[nc,H,L], bnrun[nc,4,L].

    Dispatches to the vectorized fold above inside its envelope; this loop
    form is the general fallback (perm_reverse, NONE/LU2 decomps) and the
    ground truth the batched fold is pinned against.
    """
    if _can_batch_fold(spec_slice, cfg):
        return _fold_segment_batched(seg, spec_slice, params_slice,
                                     state_slice, cfg, width)
    mixes: List = []
    m1s, b1s, m2s, b2s, m3s, offs, rescales, bnrun = ([] for _ in range(8))
    mix_logdet = jnp.zeros(())
    for s, p, st in zip(spec_slice, params_slice, state_slice):
        if s.kind == "conv1x1":
            m = matrix_param_build(cfg.decomp, {"trainable": p["mat"],
                                                "frozen": st["frozen"]})
            mixes.append(jnp.kron(jnp.eye(W, dtype=jnp.float32), m["A"]))
            mix_logdet = mix_logdet + m["log_abs_det"] * (H * W)
        elif s.kind == "perm_reverse":
            mixes.append(jnp.asarray(_PERM_REV))
        elif s.kind == "coupling":
            nn_p, nn_s = p["nn"], st["nn"]
            m1s.append(band_from_conv(nn_p["l1_w"]))
            b1s.append(_lane(nn_p["l1_b"], width))
            m2s.append(band_from_conv(nn_p["l2_w"])[0])
            b2s.append(_lane(nn_p["l2_b"], width))
            wz = nn_p["last"]["w"][:, :, :width, :]
            logs_scale = jnp.exp(nn_p["last"]["logs"].reshape(-1)
                                 * LOGSCALE_FACTOR)
            m3s.append(band_from_conv(wz * logs_scale))
            off = conv_zeros_apply(nn_p["last"],
                                   jnp.zeros((1, H, W, width), jnp.float32))
            offs.append(off.reshape(H, L))
            rescales.append(p["rescale"].reshape(()))
            bnrun.append(jnp.stack([
                _lane(nn_s["bn1"]["mean"], width),
                jnp.tile(jnp.pad(nn_s["bn1"]["var"], (0, C - width),
                                 constant_values=1.0), W),
                _lane(nn_s["bn2"]["mean"], width),
                jnp.tile(jnp.pad(nn_s["bn2"]["var"], (0, C - width),
                                 constant_values=1.0), W),
            ]))
        else:  # pragma: no cover - guarded by FusedFlow
            raise ValueError(s.kind)

    def stk(lst, empty_shape):
        return (jnp.stack(lst) if lst
                else jnp.zeros(empty_shape, jnp.float32))

    mats = {
        "rescales": stk(rescales, (0,)).reshape(max(seg.nc, 1), 1)
        if rescales else jnp.zeros((1, 1), jnp.float32),
        "mixes": stk(mixes, (1, L, L)),
        "m1s": stk(m1s, (1, 3, L, L)),
        "b1s": stk(b1s, (1, L)),
        "m2s": stk(m2s, (1, L, L)),
        "b2s": stk(b2s, (1, L)),
        "m3s": stk(m3s, (1, 3, L, L)),
        "offs": stk(offs, (1, H, L)),
        "bnrun": stk(bnrun, (1, 4, L)),
    }
    return mats, mix_logdet


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------

def _mk_mm(mm_dtype):
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def mm(a, b):
        return jnp.dot(a.astype(mm_dtype), b.astype(mm_dtype),
                       preferred_element_type=jnp.float32,
                       precision=precision)
    return mm


def _chan_sel():
    """[L, L] constant: 1 where lanes share a channel (lane % C equal)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) % C
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) % C
    return (li == lj).astype(jnp.float32)


def _conv3(mm, x, bands, bt):
    """3-tap band conv; x [bt,H,L], bands ref row [3,L,L] -> [bt*H, L]."""
    h = mm(x.reshape(bt * H, L), bands[1])
    h += mm(_shift_h(x, -1).reshape(bt * H, L), bands[0])
    h += mm(_shift_h(x, 1).reshape(bt * H, L), bands[2])
    return h


def _conv3_t(mm, g2, bands, bt):
    """Transpose of _conv3 w.r.t. x: g [bt,H,L] -> dx [bt*H, L]."""
    g3 = g2.reshape(bt, H, L)
    dx = mm(g2.reshape(bt * H, L), bands[1].T)
    dx += mm(_shift_h(g3, 1).reshape(bt * H, L), bands[0].T)
    dx += mm(_shift_h(g3, -1).reshape(bt * H, L), bands[2].T)
    return dx


def _conv3_wgrad(mm, x, g2, bt):
    """d bands: returns [3, L, L] = shift(x,d)^T @ g for d in (-1, 0, 1)."""
    g = g2.reshape(bt * H, L)
    x3 = x.reshape(bt, H, L)
    return [mm(_shift_h(x3, -1).reshape(bt * H, L).T, g),
            mm(x.reshape(bt * H, L).T, g),
            mm(_shift_h(x3, 1).reshape(bt * H, L).T, g)]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel_factory(ops, bt, mm_dtype, ghost_bn: bool):
    mm = _mk_mm(mm_dtype)
    n_el = bt * H * W  # elements per channel per block

    def kernel(x_ref, rs_ref, mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref,
               m3s_ref, offs_ref, bnrun_ref, z_ref, ldj_ref, bnacc_ref):
        from jax.experimental import pallas as pl

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        keep = (lane % C) < (C // 2)
        csel = _chan_sel()
        x = x_ref[:]
        # per-lane partial log-dets, [bt, L]: Mosaic requires >=2-D vectors,
        # so the lane reduction happens OUTSIDE the kernel (_seg_fwd_call)
        ldj = jnp.zeros((bt, L), jnp.float32)
        bn_rows = []

        def bn(h2, run_row):
            """h2 [bt*H, L] -> normalized, (mean_lane, var_lane)."""
            if ghost_bn:
                s = jnp.sum(h2, axis=0, keepdims=True)          # [1, L]
                m = mm(s, csel) * (1.0 / n_el)                  # [1, L]
                d = h2 - m
                v = mm(jnp.sum(d * d, axis=0, keepdims=True), csel) * (1.0 / n_el)
            else:
                m = run_row[0].reshape(1, L)
                v = run_row[1].reshape(1, L)
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
                ls = rs_ref[idx, 0] * jnp.tanh(t)
                sh = jnp.roll(t, 2, axis=-1)
                x = jnp.where(keep, x, x * jnp.exp(ls) + sh)
                ldj += jnp.sum(jnp.where(keep, 0.0, ls), axis=1)  # [bt, L]
                if ghost_bn:
                    bn_rows.append(jnp.concatenate([m1v, v1v, m2v, v2v], 0))

        z_ref[:] = x
        # [bt, 1, L] layout: block dims (1, 128) satisfy Mosaic's block-shape
        # rule for any bt (unlike (bt, 128), which needs bt % 8 == 0)
        ldj_ref[:] = ldj.reshape(bt, 1, L)
        if ghost_bn and bn_rows:
            stats = jnp.stack(bn_rows)                          # [nc, 4, L]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                bnacc_ref[:] = stats

            @pl.when(pl.program_id(0) != 0)
            def _acc():
                bnacc_ref[:] += stats
        elif ghost_bn:
            bnacc_ref[:] = jnp.zeros_like(bnacc_ref)

    return kernel


# ---------------------------------------------------------------------------
# backward kernel (recompute forward in VMEM, then reverse sweep)
# ---------------------------------------------------------------------------

def _bwd_kernel_factory(ops, bt, mm_dtype):
    mm = _mk_mm(mm_dtype)
    n_el = bt * H * W

    def kernel(x_ref, rs_ref, mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref,
               m3s_ref, offs_ref, gz_ref, gldj_ref,
               gx_ref, grs_ref, gmixes_ref, gm1s_ref, gm2s_ref, gm3s_ref,
               goffs_ref):
        from jax.experimental import pallas as pl

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        keep = (lane % C) < (C // 2)
        keep2 = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) % C) < (C // 2)
        csel = _chan_sel()

        def cmean(v2):  # [R, L] -> [1, L] per-channel mean over rows+group
            return mm(jnp.sum(v2, axis=0, keepdims=True), csel) * (1.0 / n_el)

        # ---- recompute forward, stashing residuals per op -----------------
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

        # ---- reverse sweep -------------------------------------------------
        g = gz_ref[:]
        gl = gldj_ref[:][:, :, 0:1]  # [bt, 1, 1] per-sample ldj cotangent
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
            # d/dh of n = (h - m)/s with batch moments (biased var):
            # dh = inv_s * (gn - mean_c(gn) - n * mean_c(gn * n))
            return inv_s * (gn - cmean(gn) - n * cmean(gn * n))

        for kind, idx in reversed(list(zip([o[0] for o in ops],
                                           [o[1] for o in ops]))):
            r = res.pop()
            if kind == "mix":
                (x_in,) = r
                acc(gmixes_ref, idx,
                    mm(x_in.reshape(bt * H, L).T, g.reshape(bt * H, L)))
                g = mm(g.reshape(bt * H, L),
                       mixes_ref[idx].T).reshape(bt, H, L)
            else:
                x_in, n1, is1, r1, n2, is2, r2, th, els = r
                gcpl = jnp.where(keep, 0.0, g)
                gls = gcpl * x_in * els + jnp.where(keep, 0.0,
                                                    jnp.broadcast_to(
                                                        gl, g.shape))
                gsh = gcpl
                sech2 = 1.0 - th * th
                gt = gls * rs_ref[idx, 0] * sech2 + jnp.roll(gsh, -2, axis=-1)
                grs_rows.insert(0, jnp.sum((gls * th).reshape(bt * H, L),
                                           axis=0, keepdims=True))
                acc(goffs_ref, idx, jnp.sum(gt, axis=0))
                gt2 = gt.reshape(bt * H, L)
                w3 = _conv3_wgrad(mm, r2.reshape(bt, H, L), gt2, bt)
                acc(gm3s_ref, idx, jnp.stack(w3))
                gr2 = _conv3_t(mm, gt2, m3s_ref[idx], bt)
                gn2 = gr2 * (n2 > 0)
                gh2 = bn_bwd(gn2, n2, is2)
                acc(gm2s_ref, idx, mm(r1.T, gh2))
                gr1 = mm(gh2, m2s_ref[idx].T)
                gn1 = gr1 * (n1 > 0)
                gh1 = bn_bwd(gn1, n1, is1)
                w1 = _conv3_wgrad(mm, x_in, gh1, bt)
                acc(gm1s_ref, idx, jnp.stack(w1))
                gx_nn = _conv3_t(mm, gh1, m1s_ref[idx], bt).reshape(bt, H, L)
                g = jnp.where(keep, g, g * els) + gx_nn

        gx_ref[:] = g
        if grs_rows:
            acc(grs_ref, slice(None), jnp.concatenate(grs_rows, 0))
        else:
            grs_ref[:] = jnp.zeros_like(grs_ref)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

def _vmem_specs(shapes, pl, pltpu):
    out = []
    for shp in shapes:
        nd = len(shp)
        out.append(pl.BlockSpec(shp, (lambda n: (lambda i: (0,) * n))(nd),
                                memory_space=pltpu.VMEM))
    return out


def _seg_fwd_call(ops, bt, mm_dtype, ghost_bn, interpret, x, rescales, mixes,
                  m1s, b1s, m2s, b2s, m3s, offs, bnrun):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    nc = m1s.shape[0]
    kernel = _fwd_kernel_factory(ops, bt, mm_dtype, ghost_bn)
    batch3 = pl.BlockSpec((bt, H, L), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = _vmem_specs([mixes.shape, m1s.shape, b1s.shape, m2s.shape,
                          b2s.shape, m3s.shape, offs.shape, bnrun.shape],
                         pl, pltpu)
    rs_spec = pl.BlockSpec(rescales.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    z, ldj, bnacc = pl.pallas_call(
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
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs, bnrun)
    return z, jnp.sum(ldj[:, 0], axis=1), bnacc * (bt / b)


def _seg_bwd_call(ops, bt, mm_dtype, interpret, x, rescales, mixes, m1s, b1s,
                  m2s, b2s, m3s, offs, gz, gldj):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    nc, nm = m1s.shape[0], mixes.shape[0]
    kernel = _bwd_kernel_factory(ops, bt, mm_dtype)
    batch3 = pl.BlockSpec((bt, H, L), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = _vmem_specs([mixes.shape, m1s.shape, b1s.shape, m2s.shape,
                          b2s.shape, m3s.shape, offs.shape], pl, pltpu)
    rs_spec = pl.BlockSpec(rescales.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    gld_spec = pl.BlockSpec((bt, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
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
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs, gz,
      jnp.broadcast_to(gldj.reshape(b, 1, 1), (b, 1, 128)))
    gx, grs_l, gmixes, gm1s, gm2s, gm3s, goffs = outs
    return gx, jnp.sum(grs_l, axis=1).reshape(-1, 1), gmixes, gm1s, gm2s, \
        gm3s, goffs


@functools.lru_cache(maxsize=64)
def make_segment_fn(ops: Tuple, bt: int, dtype_name: str, interpret: bool):
    """custom_vjp fused segment: (x, mats...) -> (z, ldj[B], bn_stats)."""
    mm_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    @jax.custom_vjp
    def seg(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs):
        return _seg_fwd_call(ops, bt, mm_dtype, True, interpret, x, rescales,
                             mixes, m1s, b1s, m2s, b2s, m3s, offs,
                             jnp.zeros((max(m1s.shape[0], 1), 4, L)))

    def fwd(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs):
        out = seg(x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs)
        return out, (x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs)

    def bwd(resids, cts):
        x, rescales, mixes, m1s, b1s, m2s, b2s, m3s, offs = resids
        gz, gldj, _gbn = cts  # bn stats feed non-differentiated state
        gx, grs, gmixes, gm1s, gm2s, gm3s, goffs = _seg_bwd_call(
            ops, bt, mm_dtype, interpret, x, rescales, mixes, m1s, b1s, m2s,
            b2s, m3s, offs, gz, gldj)
        return (gx, grs, gmixes, gm1s, jnp.zeros_like(b1s), gm2s,
                jnp.zeros_like(b2s), gm3s, goffs)

    seg.defvjp(fwd, bwd)
    return seg


# ---------------------------------------------------------------------------
# FusedFlow: full loss assembly
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# one-shot train step: loss AND grads in a single kernel pass (round 3)
# ---------------------------------------------------------------------------
#
# The custom_vjp segment path above computes the forward twice per train step
# (the primal kernel, then the backward kernel's in-VMEM recompute). But the
# NLL loss's cotangents are known analytically — d(mean nll)/dz = z/B and
# d(mean nll)/d ldj_i = -1/B — so a single kernel can run the forward ONCE
# per block, keep the (pruned) activations in VMEM, and do the reverse sweep
# immediately: no recompute, BN ghost moments computed once, no z round-trip
# through HBM. Scale-only conditional layers run in-kernel as
# ``x * (a*clean + b)^-1/2`` with per-example (a, b) extracted through the
# layer's own forward (the Pallas sampler's trick), while their log-dets —
# x-independent — are computed OUTSIDE by calling the layer's `inverse` on a
# dummy input, so every reference quirk (gain scalar ldj, gain4 pixel
# factor, shared sdn_gain group) is reused verbatim, never re-derived.
# Parameter gradients come back through `jax.vjp` of the differentiable
# fold/extraction, exactly like the segment path.
#
# Measured (TPU v5e, batch 2048, bt 64, experiments/train_attrib.py): the
# segment path spends 1455 us (fwd kernel) + 3357 us (bwd kernel) per
# 4-coupling segment; the one-shot kernel replaces both with a single
# ~bwd-cost pass (the fwd kernel and the bwd recompute's stat reductions
# disappear).


def _step_kernel_factory(ops, bt: int, mm_dtype, ns_pad: int):
    """Kernel: forward chain + in-place backward for the mean-NLL loss.

    ops: (("mix", i) | ("coup", i) | ("scale", j), ...) in inverse order.
    1/batch arrives as an SMEM scalar operand (invb_ref) so the kernel body —
    and hence the Mosaic compile — is identical across batch sizes; only the
    grid length varies (a partial last batch of an epoch must not trigger a
    fresh kernel build).
    Outputs per block: per-sample partial rows (ldj, sum z, sum z^2 over H),
    per-sample scale-coefficient grads, averaged ghost-BN moments, and
    grid-accumulated weight grads.
    """
    from jax.experimental import pallas as pl

    mm = _mk_mm(mm_dtype)
    n_el = bt * H * W

    def kernel(x_ref, clean_ref, sa_ref, sb_ref, rs_ref, invb_ref,
               mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref, m3s_ref,
               offs_ref,
               ldjp_ref, zsp_ref, z2p_ref, gsa_ref, gsb_ref, bnacc_ref,
               grs_ref, gmixes_ref, gm1s_ref, gm2s_ref, gm3s_ref, goffs_ref):
        inv_b = invb_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        keep = (lane % C) < (C // 2)
        csel = _chan_sel()

        def cmean(v2):
            return mm(jnp.sum(v2, axis=0, keepdims=True), csel) * (1.0 / n_el)

        # ---- forward sweep, stashing pruned residuals ---------------------
        x = x_ref[:]
        ldj = jnp.zeros((bt, L), jnp.float32)
        res = []
        bn_rows = []
        for kind, idx in ops:
            if kind == "mix":
                res.append((x,))
                x = mm(x.reshape(bt * H, L), mixes_ref[idx]).reshape(bt, H, L)
            elif kind == "scale":
                a = sa_ref[:, 0, idx].reshape(bt, 1, 1)
                b = sb_ref[:, 0, idx].reshape(bt, 1, 1)
                irt = 1.0 / jnp.sqrt(a * clean_ref[:] + b)
                res.append((x, irt))
                x = x * irt
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
                res.append((x_in, n1, is1, n2, is2, th, els))
                x = jnp.where(keep, x, x * els + jnp.roll(t, 2, axis=-1))
                ldj += jnp.sum(jnp.where(keep, 0.0, ls), axis=1)
                bn_rows.append(jnp.concatenate([m1v, v1v, m2v, v2v], 0))

        z = x
        ldjp_ref[:] = ldj.reshape(bt, 1, L)
        zsp_ref[:] = jnp.sum(z, axis=1).reshape(bt, 1, L)
        z2p_ref[:] = jnp.sum(z * z, axis=1).reshape(bt, 1, L)
        if bn_rows:
            stats = jnp.stack(bn_rows)

            @pl.when(pl.program_id(0) == 0)
            def _init():
                bnacc_ref[:] = stats

            @pl.when(pl.program_id(0) != 0)
            def _acc_bn():
                bnacc_ref[:] += stats
        else:
            bnacc_ref[:] = jnp.zeros_like(bnacc_ref)

        # ---- backward sweep (analytic seeds) ------------------------------
        g = z * inv_b                   # d(mean nll)/dz
        gl_const = -inv_b               # d(mean nll)/d ldj_i
        first = pl.program_id(0) == 0
        grs_rows = []
        gsa_cols = {}
        gsb_cols = {}

        def acc(ref, idx, val):
            @pl.when(first)
            def _i():
                ref[idx] = val

            @pl.when(jnp.logical_not(first))
            def _a():
                ref[idx] += val

        def bn_bwd(gn, n, inv_s):
            return inv_s * (gn - cmean(gn) - n * cmean(gn * n))

        for kind, idx in reversed(list(ops)):
            r = res.pop()
            if kind == "mix":
                (x_in,) = r
                acc(gmixes_ref, idx,
                    mm(x_in.reshape(bt * H, L).T, g.reshape(bt * H, L)))
                g = mm(g.reshape(bt * H, L),
                       mixes_ref[idx].T).reshape(bt, H, L)
            elif kind == "scale":
                x_in, irt = r
                com = g * x_in * (-0.5) * (irt * irt * irt)
                gsa_cols[idx] = jnp.sum(
                    jnp.sum(com * clean_ref[:], axis=1), axis=-1,
                    keepdims=True)                               # [bt, 1]
                gsb_cols[idx] = jnp.sum(
                    jnp.sum(com, axis=1), axis=-1, keepdims=True)
                g = g * irt
            else:
                x_in, n1, is1, n2, is2, th, els = r
                gcpl = jnp.where(keep, 0.0, g)
                gls = gcpl * x_in * els + jnp.where(keep, 0.0, gl_const)
                sech2 = 1.0 - th * th
                gt = gls * rs_ref[idx, 0] * sech2 + jnp.roll(gcpl, -2, axis=-1)
                grs_rows.insert(0, jnp.sum((gls * th).reshape(bt * H, L),
                                           axis=0, keepdims=True))
                acc(goffs_ref, idx, jnp.sum(gt, axis=0))
                gt2 = gt.reshape(bt * H, L)
                r2 = jax.nn.relu(n2)
                w3 = _conv3_wgrad(mm, r2.reshape(bt, H, L), gt2, bt)
                acc(gm3s_ref, idx, jnp.stack(w3))
                gr2 = _conv3_t(mm, gt2, m3s_ref[idx], bt)
                gn2 = gr2 * (n2 > 0)
                gh2 = bn_bwd(gn2, n2, is2)
                r1 = jax.nn.relu(n1)
                acc(gm2s_ref, idx, mm(r1.T, gh2))
                gr1 = mm(gh2, m2s_ref[idx].T)
                gn1 = gr1 * (n1 > 0)
                gh1 = bn_bwd(gn1, n1, is1)
                w1 = _conv3_wgrad(mm, x_in, gh1, bt)
                acc(gm1s_ref, idx, jnp.stack(w1))
                gx_nn = _conv3_t(mm, gh1, m1s_ref[idx], bt).reshape(bt, H, L)
                g = jnp.where(keep, g, g * els) + gx_nn

        if grs_rows:
            acc(grs_ref, slice(None), jnp.concatenate(grs_rows, 0))
        else:
            grs_ref[:] = jnp.zeros_like(grs_ref)
        zero_col = jnp.zeros((bt, 1), jnp.float32)
        gsa_ref[:] = jnp.concatenate(
            [gsa_cols.get(j, zero_col) for j in range(ns_pad)],
            axis=1).reshape(bt, 1, ns_pad)
        gsb_ref[:] = jnp.concatenate(
            [gsb_cols.get(j, zero_col) for j in range(ns_pad)],
            axis=1).reshape(bt, 1, ns_pad)

    return kernel


def _step_call(ops, bt, mm_dtype, ns_pad, interpret,
               x, clean, sa, sb, rescales, invb, mixes, m1s, b1s, m2s, b2s,
               m3s, offs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    nc, nm = m1s.shape[0], mixes.shape[0]
    kernel = _step_kernel_factory(ops, bt, mm_dtype, ns_pad)
    batch3 = pl.BlockSpec((bt, H, L), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row3 = pl.BlockSpec((bt, 1, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    # [B, 1, ns] layout: block (bt, 1, ns) has its last two dims equal to
    # the array dims, which satisfies Mosaic's block-shape rule for ANY bt
    # (a (bt, ns) block needs bt % 8 == 0 — impossible at batch 138)
    col2 = pl.BlockSpec((bt, 1, ns_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    consts = _vmem_specs([mixes.shape, m1s.shape, b1s.shape, m2s.shape,
                          b2s.shape, m3s.shape, offs.shape], pl, pltpu)
    rs_spec = pl.BlockSpec(rescales.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    invb_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    acc_shapes = [(nc, 4, L), (nc, L), (nm, L, L), (nc, 3, L, L), (nc, L, L),
                  (nc, 3, L, L), (nc, H, L)]
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[batch3, batch3, col2, col2, rs_spec, invb_spec] + consts,
        out_specs=[row3, row3, row3, col2, col2] + _vmem_specs(
            acc_shapes, pl, pltpu),
        out_shape=[jax.ShapeDtypeStruct((b, 1, 128), jnp.float32)] * 3 + [
            jax.ShapeDtypeStruct((b, 1, ns_pad), jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct(s, jnp.float32) for s in acc_shapes],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x, clean, sa, sb, rescales, invb, mixes, m1s, b1s, m2s, b2s, m3s, offs)


class FusedTrainStep:
    """One-kernel loss+grad train path over a NoiseFlow (ghost BN).

    loss_and_grad(params, state, xp, cond) -> (nll, sd_z, new_state, grads)
    with semantics matching ``jax.value_and_grad`` of ``FusedFlow.loss`` in
    train mode (same ghost-BN variant, same reference ldj quirks — scale-layer
    ldjs and the mix log-dets are evaluated through the layers' own
    formulas). Envelope: same as FusedFlow, plus at most 4 scale layers.
    """

    MAX_SCALE = 4

    def __init__(self, flow, bt: int = 64, mm_dtype=jnp.float32,
                 interpret: bool = None):
        cfg = flow.cfg
        if flow.n_levels != 1 or cfg.squeeze_factor != 1:
            raise ValueError("fused path supports single-level unsqueezed flows")
        if tuple(flow.x_shape) != (H, W, C):
            raise ValueError(f"fused path requires x_shape {(H, W, C)}")
        if getattr(cfg, "coupling_nn", "conv") == "dense":
            raise ValueError("fused path supports only the conv coupling template")
        if cfg.width > C:
            raise ValueError(f"fused path supports coupling width <= {C}")
        kinds = {s.kind for s in flow.level_specs[0]}
        if not kinds <= SUPPORTED_KINDS:
            raise ValueError(f"unsupported layer kinds {kinds - SUPPORTED_KINDS}")
        self.flow = flow
        self.cfg = cfg
        self.bt = bt
        self.width = cfg.width
        self.mm_dtype = mm_dtype
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        specs = flow.level_specs[0]
        ops = []
        self.scale_idx = []     # spec indices of scale layers (op order)
        self.nonscale_idx = []
        nm = nc = 0
        for i, s in enumerate(specs):
            if s.kind in SUPPORTED_SCALE_KINDS:
                ops.append(("scale", len(self.scale_idx)))
                self.scale_idx.append(i)
            elif s.kind == "coupling":
                ops.append(("coup", nc))
                nc += 1
                self.nonscale_idx.append(i)
            else:
                ops.append(("mix", nm))
                nm += 1
                self.nonscale_idx.append(i)
        if len(self.scale_idx) > self.MAX_SCALE:
            raise ValueError(
                f"one-shot step supports <= {self.MAX_SCALE} scale layers")
        self.ops = tuple(ops)
        self.seg = Segment(tuple(o for o in ops if o[0] != "scale"), nm, nc)
        self.ns_pad = max(len(self.scale_idx), 1)

    # ------------------------------------------------------------- internal
    def _prep(self, params, state, cond, batch: int):
        """Differentiable fold of params -> kernel inputs + XLA ldj terms."""
        flow, cfg = self.flow, self.cfg
        specs = flow.level_specs[0]
        p_lvl, s_lvl = params["layers"][0], state["layers"][0]
        shared = flow._shared_view(params)
        mats, mix_logdet = _fold_segment(
            self.seg, [specs[i] for i in self.nonscale_idx],
            [p_lvl[i] for i in self.nonscale_idx],
            [s_lvl[i] for i in self.nonscale_idx], cfg, self.width)
        cond4 = dict(cond)
        if cond.get("clean") is not None:
            cond4["clean"] = cond["clean"][:, None]
        ones_probe = jnp.ones((batch, 1, 1, 1), jnp.float32)
        dummy = jnp.ones((batch, 1, H, L), jnp.float32)
        # the two (clean=0, clean=1) probes run as ONE stacked layer forward
        # of batch 2B: at the published batch each layer invocation is ~25
        # serial small-op launches, which dominate _prep (in-situ ~305 us,
        # experiments/b138_attrib_v2.json) — halve the probe invocations
        probe01 = jnp.concatenate(
            [jnp.zeros((batch, 1, 1, 1), jnp.float32),
             jnp.ones((batch, 1, 1, 1), jnp.float32)])
        cond01 = {k: jnp.tile(v, 2) for k, v in cond4.items()
                  if k != "clean"}
        cond01["clean"] = probe01
        ones2 = jnp.ones((2 * batch, 1, 1, 1), jnp.float32)
        sa_cols, sb_cols = [], []
        ildj_scale = jnp.zeros((batch,), jnp.float32)
        for i in self.scale_idx:
            ldef = get_layer_def(specs[i].kind, cfg)
            s01, _, _ = ldef.forward(p_lvl[i], shared, s_lvl[i], ones2,
                                     cond01, False)
            s01 = (s01 * s01).reshape(2 * batch, -1)[:, :1]
            b = s01[:batch]
            a = s01[batch:] - b
            sa_cols.append(a)
            sb_cols.append(b)
            # x-independent ldj through the layer's own inverse (all
            # reference quirks — gain scalar mode, gain4 pixel factor —
            # apply verbatim; scale-only layers never touch state)
            _, ildj_i, _ = ldef.inverse(p_lvl[i], shared, s_lvl[i], dummy,
                                        cond4, True)
            ildj_scale = ildj_scale + ildj_i
        pad = self.ns_pad - len(sa_cols)
        sa = jnp.concatenate(
            sa_cols + [jnp.zeros((batch, 1))] * pad, axis=1)
        sb = jnp.concatenate(
            sb_cols + [jnp.ones((batch, 1))] * pad, axis=1)
        return mats, sa, sb, ildj_scale, mix_logdet

    # --------------------------------------------------------------- public
    def loss_and_grad(self, params, state, xp, cond):
        """(nll, sd_z, new_state, grads) for the mean-NLL train objective."""
        batch = xp.shape[0]
        if batch % self.bt:
            raise ValueError(f"batch {batch} not a multiple of bt {self.bt}")
        clean = cond["clean"]

        prep = lambda p: self._prep(p, state, cond, batch)  # noqa: E731
        (mats, sa, sb, ildj_scale, mix_logdet), vjp_fn = jax.vjp(prep, params)

        dtype_name = ("bfloat16" if self.mm_dtype == jnp.bfloat16
                      else "float32")
        invb = jnp.full((1, 1), 1.0 / batch, jnp.float32)
        outs = _jitted_step(self.ops, self.bt, dtype_name,
                            self.ns_pad, self.interpret, xp, clean,
                            sa.reshape(batch, 1, self.ns_pad),
                            sb.reshape(batch, 1, self.ns_pad),
                            mats["rescales"], invb, mats["mixes"],
                            mats["m1s"], mats["b1s"], mats["m2s"],
                            mats["b2s"], mats["m3s"], mats["offs"])
        (ldjp, zsp, z2p, gsa, gsb, bnacc, grs_l, gmixes, gm1s, gm2s, gm3s,
         goffs) = outs

        ldj = jnp.sum(ldjp[:, 0], axis=1)
        zs = jnp.sum(zsp[:, 0], axis=1)
        z2 = jnp.sum(z2p[:, 0], axis=1)
        n_dims = H * L
        logp = -0.5 * (n_dims * float(np.log(2.0 * np.pi)) + z2)
        obj = ldj + mix_logdet + ildj_scale + logp
        nll = jnp.mean(-obj)
        var_z = z2 / n_dims - (zs / n_dims) ** 2
        sd_z = jnp.mean(jnp.sqrt(jnp.maximum(var_z, 0.0)))

        inv_b = 1.0 / batch
        cots_mats = {
            "rescales": jnp.sum(grs_l, axis=1).reshape(-1, 1),
            "mixes": gmixes, "m1s": gm1s, "b1s": jnp.zeros_like(mats["b1s"]),
            "m2s": gm2s, "b2s": jnp.zeros_like(mats["b2s"]), "m3s": gm3s,
            "offs": goffs, "bnrun": jnp.zeros_like(mats["bnrun"]),
        }
        cot_ildj = jnp.full((batch,), -inv_b, jnp.float32)
        grads = vjp_fn((cots_mats, gsa[:, 0], gsb[:, 0], cot_ildj,
                        jnp.asarray(-1.0, mix_logdet.dtype)))[0]

        # BN running-state update from averaged block moments
        bnacc = bnacc * (self.bt / batch)
        s_lvl = state["layers"][0]
        new_lvl = list(s_lvl)
        specs = self.flow.level_specs[0]
        ci = 0
        for i in self.nonscale_idx:
            if specs[i].kind != "coupling":
                continue
            rows = bnacc[ci]
            old = s_lvl[i]["nn"]
            wd = self.width
            new_lvl[i] = {"nn": {
                "bn1": {
                    "mean": old["bn1"]["mean"] - BN_DECAY * (
                        old["bn1"]["mean"] - rows[0, :wd]),
                    "var": old["bn1"]["var"] - BN_DECAY * (
                        old["bn1"]["var"] - rows[1, :wd]),
                },
                "bn2": {
                    "mean": old["bn2"]["mean"] - BN_DECAY * (
                        old["bn2"]["mean"] - rows[2, :wd]),
                    "var": old["bn2"]["var"] - BN_DECAY * (
                        old["bn2"]["var"] - rows[3, :wd]),
                },
            }}
            ci += 1
        return nll, sd_z, {"layers": [new_lvl]}, grads


@functools.lru_cache(maxsize=64)
def _step_fn_cached(ops: Tuple, bt: int, dtype_name: str,
                    ns_pad: int, interpret: bool):
    # keyed only on kernel-structure statics; 1/batch is a runtime SMEM
    # operand, so batch-size changes never rebuild the kernel closure
    mm_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    return functools.partial(_step_call, ops, bt, mm_dtype, ns_pad,
                             interpret)


def _jitted_step(ops, bt, dtype_name, ns_pad, interpret, *args):
    return _step_fn_cached(ops, bt, dtype_name, ns_pad, interpret)(*args)


class FusedFlow:
    """Fused-Pallas NLL/train path over a NoiseFlow.

    loss(params, state, xp, condp, train) mirrors PackedFlow.loss on packed
    [B, H, 128] tiles. train=True uses ghost-BN segment kernels (see module
    docstring); train=False uses running BN statistics (no grads needed).
    """

    def __init__(self, flow, bt: int = 64, mm_dtype=jnp.float32,
                 interpret: bool = None):
        cfg = flow.cfg
        if flow.n_levels != 1 or cfg.squeeze_factor != 1:
            raise ValueError("fused path supports single-level unsqueezed flows")
        if tuple(flow.x_shape) != (H, W, C):
            raise ValueError(f"fused path requires x_shape {(H, W, C)}")
        if getattr(cfg, "coupling_nn", "conv") == "dense":
            raise ValueError("fused path supports only the conv coupling template")
        if cfg.width > C:
            raise ValueError(f"fused path supports coupling width <= {C}")
        kinds = {s.kind for s in flow.level_specs[0]}
        if not kinds <= SUPPORTED_KINDS:
            raise ValueError(f"unsupported layer kinds {kinds - SUPPORTED_KINDS}")
        self.flow = flow
        self.cfg = cfg
        self.bt = bt
        self.width = cfg.width
        self.dtype_name = ("bfloat16" if mm_dtype == jnp.bfloat16
                           else "float32")
        self.mm_dtype = mm_dtype
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        # split the inverse-order spec list into kernel segments and
        # XLA-handled scale layers
        self.plan: List = []  # ("scale", spec_idx) | ("segment", Segment, lo, hi)
        specs = flow.level_specs[0]
        i = 0
        while i < len(specs):
            if specs[i].kind in SUPPORTED_SCALE_KINDS:
                self.plan.append(("scale", i))
                i += 1
                continue
            lo = i
            ops, nm, nc = [], 0, 0
            while i < len(specs) and specs[i].kind not in SUPPORTED_SCALE_KINDS:
                if specs[i].kind == "coupling":
                    ops.append(("coup", nc))
                    nc += 1
                else:
                    ops.append(("mix", nm))
                    nm += 1
                i += 1
            self.plan.append(("segment", Segment(tuple(ops), nm, nc), lo, i))

    # -------------------------------------------------------------- public
    def inverse(self, params, state, xp, cond, train: bool):
        flow, cfg = self.flow, self.cfg
        shared = flow._shared_view(params)
        specs = flow.level_specs[0]
        p_lvl, s_lvl = params["layers"][0], state["layers"][0]
        z = xp
        obj = jnp.zeros((xp.shape[0],), xp.dtype)
        new_lvl = list(s_lvl)
        cond4 = dict(cond)
        if cond.get("clean") is not None:
            cond4["clean"] = cond["clean"][:, None]

        for item in self.plan:
            if item[0] == "scale":
                i = item[1]
                ldef = get_layer_def(specs[i].kind, cfg)
                z4, ildj, nst = ldef.inverse(p_lvl[i], shared, s_lvl[i],
                                             z[:, None], cond4, train)
                z = z4[:, 0]
                obj = obj + ildj
                new_lvl[i] = nst
                continue
            _, seg, lo, hi = item
            mats, mix_logdet = _fold_segment(
                seg, specs[lo:hi], p_lvl[lo:hi], s_lvl[lo:hi], cfg, self.width)
            if train:
                fn = make_segment_fn(seg.ops, self.bt, self.dtype_name,
                                     self.interpret)
                z, ldj, bnacc = fn(z, mats["rescales"], mats["mixes"],
                                   mats["m1s"], mats["b1s"], mats["m2s"],
                                   mats["b2s"], mats["m3s"], mats["offs"])
                # running-stat update from averaged block moments
                ci = 0
                for j in range(lo, hi):
                    if specs[j].kind != "coupling":
                        continue
                    rows = bnacc[ci]
                    old = s_lvl[j]["nn"]
                    wd = self.width
                    new_lvl[j] = {"nn": {
                        "bn1": {
                            "mean": old["bn1"]["mean"] - BN_DECAY * (
                                old["bn1"]["mean"] - rows[0, :wd]),
                            "var": old["bn1"]["var"] - BN_DECAY * (
                                old["bn1"]["var"] - rows[1, :wd]),
                        },
                        "bn2": {
                            "mean": old["bn2"]["mean"] - BN_DECAY * (
                                old["bn2"]["mean"] - rows[2, :wd]),
                            "var": old["bn2"]["var"] - BN_DECAY * (
                                old["bn2"]["var"] - rows[3, :wd]),
                        },
                    }}
                    ci += 1
            else:
                z, ldj, _ = _seg_fwd_call(
                    seg.ops, self.bt, self.mm_dtype, False, self.interpret,
                    z, mats["rescales"], mats["mixes"], mats["m1s"],
                    mats["b1s"], mats["m2s"], mats["b2s"], mats["m3s"],
                    mats["offs"], mats["bnrun"])
            obj = obj + ldj + mix_logdet
        return z, obj, {"layers": [new_lvl]}

    def loss(self, params, state, xp, cond, train: bool):
        c = cond if self.flow._is_cond else {"clean": None}
        z, obj, new_state = self.inverse(params, state, xp, c, train)
        obj = obj + diag_gaussian_logp(z)
        nll = -obj
        var_z = jnp.var(z.reshape(z.shape[0], -1), axis=1)
        sd_z = jnp.mean(jnp.sqrt(var_z))
        return jnp.mean(nll), sd_z, new_state
