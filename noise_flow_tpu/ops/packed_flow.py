"""Packed (lane-major) training path: the flow's NLL pass as 128-lane matmuls.

Motivation. The natural NHWC layout for a 32x32x4 patch puts C=4 on the minor
(lane) dimension, far off the MXU's 128-lane sweet spot. The fused Pallas
sampler (ops/pallas_sample.py) solves this for inference by folding the whole
chain into banded 128x128 matmuls over a [B, H, W*C] tile. This module
expresses the SAME reformulation for the *training* direction (data -> latent
+ log-det) in pure differentiable JAX: the band matrices are built from the
raw conv weights inside the traced computation (via kron with constant shift
matrices), so `jax.grad` gives the backward pass for free and every matmul —
forward and backward — is a [B*H, 128] x [128, 128] MXU op.

Role. As a standalone XLA program this path is HBM-bound (every matmul
boundary round-trips [B, H, 128] activations through HBM), so it does NOT
beat the NHWC conv path on a real chip. It exists as (a) the exact-parity
reference semantics on the packed layout, and (b) the differentiable
weight->band fold that the fused Pallas training kernel (ops/pallas_train.py)
composes with: the fold runs in XLA, the chain runs in VMEM, and autodiff
flows through both.

Semantics are identical to the reference path in models/layers.py (coupling:
ref:borealisflows/layers.py:251-375; 1x1 conv: ref:layers.py:74-145; scale
family: ref:noise_flow_layers/*.py). Scale-only conditional layers are reused
verbatim from models.layers by viewing the packed tensor as [B, 1, H, W*C] —
rank-4 with a well-tiled minor pair — so none of the conditional formulas are
duplicated here.

Scope (mirrors the Pallas sampler): single-level, unsqueezed flows over
(32, 32, 4) patches with the conv coupling template, width <= 4, and layer
kinds in {coupling, conv1x1, perm_reverse} + the scale family. Anything else
falls back to the NHWC path.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.models.layers import get_layer_def
from noise_flow_tpu.ops.conv1x1 import matrix_param_build
from noise_flow_tpu.ops.gaussian import diag_gaussian_logp
from noise_flow_tpu.ops.nn import (
    BN_DECAY,
    BN_EPS,
    LOGSCALE_FACTOR,
    conv_zeros_apply,
)
from noise_flow_tpu.ops.pallas_sample import (
    SUPPORTED_SCALE_KINDS,
    _shift_h,
)

H = 32
C = 4
W = 32
L = W * C  # 128 lanes

SUPPORTED_KINDS = frozenset(
    {"coupling", "conv1x1", "perm_reverse"} | set(SUPPORTED_SCALE_KINDS))

# lane permutation of a channel reverse (tfb.Permute) in packed coords
_PERM_REV_IDX = np.arange(L).reshape(W, C)[:, ::-1].reshape(L)
_EYE_W = {k: jnp.asarray(np.eye(W, k=k), jnp.float32) for k in (-1, 0, 1)}
# W-tap selector for band_from_conv: S[dw, wi, wo] = 1 iff input col wi feeds
# output col wo under kernel tap dw (SAME padding), i.e. wi = wo + dw - 1.
_TAP_SEL = {
    kw: jnp.asarray(
        np.stack([np.eye(W, k=(kw - 1) // 2 - dw) for dw in range(kw)]),
        jnp.float32)
    for kw in (1, 3)
}


def pack(x: np.ndarray):
    """[B, H, W, C] -> [B, H, W*C] (pure reshape; lane = w*C + c)."""
    b = x.shape[0]
    return x.reshape(b, H, L)


def _lane(v, width: int):
    """Per-channel vector [width] -> lane vector [L] (zero-padded to C)."""
    return jnp.tile(jnp.pad(v.reshape(-1), (0, C - width)), W)


def band_from_conv(w) -> jnp.ndarray:
    """Differentiable version of pallas_sample._band_matrix.

    w: [kh, kw, cin, cout] (cin, cout <= C) -> [kh, L, L] band matrices such
    that ``sum_dh shift_h(x, dh-1) @ band[dh]`` equals the SAME conv in packed
    layout. Built as kron(shift-matrix_W, w-block), which is linear in w, so
    gradients flow straight back to the conv weights.
    """
    kh, kw, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, C - cin), (0, C - cout)))
    # one einsum against a constant tap selector (vs a kron per (dh, dw)):
    # out[dh, wi*C+ci, wo*C+co] = sum_dw S[dw, wi, wo] * w[dh, dw, ci, co].
    # Linear in w, so gradients flow; collapses the fold to O(1) XLA ops per
    # conv, which matters because it runs inside every fused train step.
    bands = jnp.einsum("kab,hkio->haibo", _TAP_SEL[kw], wp)
    return bands.reshape(kh, L, L)


def _bn_packed(h, st: Dict, train: bool, width: int):
    """BatchNorm over packed activations; channel stats match ops.nn
    (biased moments over (B, H, W); running update s -= decay*(s - m))."""
    if train:
        m_c = jnp.mean(h, axis=(0, 1)).reshape(W, C).mean(0)        # [C]
        m_lane = jnp.tile(m_c, W)
        v_c = jnp.mean((h - m_lane) ** 2, axis=(0, 1)).reshape(W, C).mean(0)
        new = {"mean": st["mean"] - BN_DECAY * (st["mean"] - m_c[:width]),
               "var": st["var"] - BN_DECAY * (st["var"] - v_c[:width])}
        v_lane = jnp.tile(v_c, W)
    else:
        new = st
        m_lane = _lane(st["mean"], width)
        # pad var with 1.0 so dead lanes normalize 0 -> 0
        v_lane = jnp.tile(jnp.pad(st["var"], (0, C - width),
                                  constant_values=1.0), W)
    x_hat = (h - m_lane) * jax.lax.rsqrt(v_lane + BN_EPS)
    return x_hat, new


class PackedFlow:
    """Packed NLL/eval path over a NoiseFlow (training direction).

    Raises ValueError when the flow's arch/shape is outside the supported
    envelope — callers fall back to the NHWC path.
    """

    def __init__(self, flow, precision: str = "highest"):
        cfg = flow.cfg
        if flow.n_levels != 1 or cfg.squeeze_factor != 1:
            raise ValueError("packed path supports single-level unsqueezed flows")
        if tuple(flow.x_shape) != (H, W, C):
            raise ValueError(f"packed path requires x_shape {(H, W, C)}")
        if getattr(cfg, "coupling_nn", "conv") == "dense":
            raise ValueError("packed path supports only the conv coupling template")
        if cfg.width > C:
            raise ValueError(f"packed path supports coupling width <= {C}")
        kinds = {s.kind for s in flow.level_specs[0]}
        if not kinds <= SUPPORTED_KINDS:
            raise ValueError(f"unsupported layer kinds {kinds - SUPPORTED_KINDS}")
        self.flow = flow
        self.cfg = cfg
        self.specs = flow.level_specs[0]
        self.width = cfg.width
        self.precision = (jax.lax.Precision.HIGHEST if precision == "highest"
                          else jax.lax.Precision.DEFAULT)
        lane = np.arange(L)
        self._keep = jnp.asarray((lane % C) < (C // 2))  # uncoupled {0,1}

    # ------------------------------------------------------------- helpers
    def _mm(self, a, b):
        return jnp.dot(a, b, precision=self.precision)

    def _conv3_packed(self, x, bands, bias_lane):
        """SAME 3x3 conv as 3 banded matmuls; x [B,H,L] -> [B,H,L]."""
        b = x.shape[0]
        x2 = x.reshape(b * H, L)
        h = self._mm(x2, bands[1])
        h += self._mm(_shift_h(x, -1).reshape(b * H, L), bands[0])
        h += self._mm(_shift_h(x, 1).reshape(b * H, L), bands[2])
        return h.reshape(b, H, L) + bias_lane

    def _coupling_inverse(self, p, st, y, train: bool):
        """data -> latent on packed tiles; matches layers._coupling_inverse:
        x1 = y1*exp(ls) + shift, ildj = +sum(ls over coupled lanes)."""
        width = self.width
        nn_p, nn_s = p["nn"], st["nn"]
        h = self._conv3_packed(y, band_from_conv(nn_p["l1_w"]),
                               _lane(nn_p["l1_b"], width))
        h, bn1 = _bn_packed(h, nn_s["bn1"], train, width)
        h = jax.nn.relu(h)
        b = y.shape[0]
        band2 = band_from_conv(nn_p["l2_w"])[0]
        h = (self._mm(h.reshape(b * H, L), band2).reshape(b, H, L)
             + _lane(nn_p["l2_b"], width))
        h, bn2 = _bn_packed(h, nn_s["bn2"], train, width)
        h = jax.nn.relu(h)
        # zero-conv: x-dependent band (logs-scaled) + input-independent
        # edge/bias offset map (= conv_zeros on zeros, incl. the indicator ch)
        wz = nn_p["last"]["w"][:, :, :width, :]
        logs_scale = jnp.exp(nn_p["last"]["logs"].reshape(-1) * LOGSCALE_FACTOR)
        t = self._conv3_packed(h, band_from_conv(wz * logs_scale), 0.0)
        off = conv_zeros_apply(
            nn_p["last"], jnp.zeros((1, H, W, width), y.dtype))
        t = t + off.reshape(1, H, L)
        # packed channel layout of t: lanes {0,1}=shift for ch {2,3};
        # lanes {2,3}=log_scale for ch {2,3} (n_out = [shift(2), ls(2)])
        ls = p["rescale"] * jnp.tanh(t)
        shift_vec = jnp.roll(t, 2, axis=-1)  # shift now at coupled lanes
        x = jnp.where(self._keep, y, y * jnp.exp(ls) + shift_vec)
        ildj = jnp.sum(jnp.where(self._keep, 0.0, ls), axis=(1, 2))
        return x, ildj, {"nn": {"bn1": bn1, "bn2": bn2}}

    def _conv1x1_inverse(self, p, st, y):
        m = matrix_param_build(self.cfg.decomp,
                               {"trainable": p["mat"], "frozen": st["frozen"]})
        big = jnp.kron(_EYE_W[0], m["A"])
        b = y.shape[0]
        x = self._mm(y.reshape(b * H, L), big).reshape(b, H, L)
        ildj = jnp.broadcast_to(m["log_abs_det"] * (H * W), (b,))
        return x, ildj

    # -------------------------------------------------------------- public
    def inverse(self, params, state, xp, cond, train: bool):
        """xp: packed [B, H, 128]. cond['clean'] packed likewise.
        Returns (z, objective[B], new_state) == flow.inverse on NHWC."""
        shared = self.flow._shared_view(params)
        z = xp
        obj = jnp.zeros((xp.shape[0],), xp.dtype)
        new_lvl: List = []
        clean = cond.get("clean")
        cond4 = dict(cond)
        if clean is not None:
            cond4["clean"] = clean[:, None]  # [B,1,H,L]: rank-4 for layer defs
        for s, p, st in zip(self.specs, params["layers"][0],
                            state["layers"][0]):
            if s.kind == "coupling":
                z, ildj, nst = self._coupling_inverse(p, st, z, train)
            elif s.kind == "conv1x1":
                z, ildj = self._conv1x1_inverse(p, st, z)
                nst = st
            elif s.kind == "perm_reverse":
                z, ildj, nst = z[..., _PERM_REV_IDX], 0.0, st
            else:  # scale-only conditional layer: reuse the NHWC LayerDef on
                # a [B,1,H,L] view (same element set, same reductions)
                ldef = get_layer_def(s.kind, self.cfg)
                z4, ildj, nst = ldef.inverse(p, shared, st, z[:, None],
                                             cond4, train)
                z = z4[:, 0]
            obj = obj + ildj
            new_lvl.append(nst)
        return z, obj, {"layers": [new_lvl]}

    def loss(self, params, state, xp, cond, train: bool):
        """(mean NLL [nats/patch], sd_z, new_state) — packed twin of
        NoiseFlow.loss (ref:borealisflows/noise_flow_model.py:458-484)."""
        c = cond if self.flow._is_cond else {"clean": None}
        z, obj, new_state = self.inverse(params, state, xp, c, train)
        obj = obj + diag_gaussian_logp(z)
        nll = -obj
        var_z = jnp.var(z.reshape(z.shape[0], -1), axis=1)
        sd_z = jnp.mean(jnp.sqrt(var_z))
        return jnp.mean(nll), sd_z, new_state

    def nll_per_sample(self, params, state, xp, cond, train: bool = False):
        c = cond if self.flow._is_cond else {"clean": None}
        z, obj, _ = self.inverse(params, state, xp, c, train)
        return -(obj + diag_gaussian_logp(z))
