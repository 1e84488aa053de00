"""Fused Pallas TPU kernel for the full sampling chain.

The published flow (ref arch ``sdn5|unc x4|gain4|unc x4``) is ten tiny
bijectors over 32x32x4 patches. Run as an XLA graph, every layer round-trips
activations through HBM; the whole chain is memory-bound. This kernel keeps
the entire chain in VMEM: one read of (eps, clean), one write of the noise.

Layout: a patch [32, 32, 4] becomes one (32, 128) f32 tile — H on sublanes
(32 = 4x8), W*C on lanes (32*4 = 128, exactly one lane row). A batch tile is
(Bt, 32, 128).

Every channel-mixing op folds into banded 128x128 matmuls on the MXU:

- 3x3 conv: out[r] = sum_dh shift_h(x, dh) @ M_dh, where
  M_dh[wi*4+ci, wo*4+co] = w[dh+1, wi-wo+1, ci, co] (zero outside the band).
  W-shifts and channel mixing live in the matrix; H-shifts are sublane
  shifts with zero fill (SAME padding falls out of the band structure).
- 1x1 conv / invertible 1x1 / channel permutation: one block-diagonal
  128x128 matmul.
- BatchNorm (inference stats) folds into the conv matrix + bias.
- The Glow zero-conv's edge-indicator channel (ref:borealisflows/
  layers.py:555-583) is input-independent: it folds into a precomputed
  additive (32, 256) offset map (= conv_zeros_apply on zeros).
- The final conv emits a 256-wide tile: lanes 0..127 = shift, 128..255 =
  log-scale, both already placed at the coupled-channel lanes.
- Scale-only conditional layers (sdn*, gain*, fitSDN, condSDN) all reduce to
  ``x *= sqrt(a*clean + b)`` with per-example scalars (a, b) — extracted by
  evaluating the layer's forward at clean=0 and clean=1 (gain-family layers
  ignore clean, so a = 0 and the sqrt is a per-example constant).

BatchNorm note: two modes. bn_mode='running' folds inference statistics into
the conv matrices (fastest). bn_mode='batch' reproduces the reference
wrapper's is_training=True quirk (ref:NoiseFlowWrapper.py:86): per-block
batch moments are computed IN-KERNEL (two extra channel-select matmuls per
BN); with block == batch this is bit-parity with the XLA train-BN path, and
for larger batches it is the deterministic ghost-BN variant.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.ops.conv1x1 import matrix_param_build
from noise_flow_tpu.ops.nn import BN_EPS, LOGSCALE_FACTOR, conv_zeros_apply

H = 32          # patch height (sublanes)
WC = 128        # W * C lanes
C = 4
W = WC // C
SUPPORTED_SCALE_KINDS = (
    "sdn", "sdn1", "sdn2", "sdn3", "sdn4", "sdn5", "sdn6",
    "gain", "gain1", "gain2", "gain3", "gain4", "fitSDN", "fitSDN2",
    "condSDN",
)


# ---------------------------------------------------------------------------
# host-side folding: conv weights -> banded lane matrices
# ---------------------------------------------------------------------------

def _band_matrix(w: np.ndarray, out_lanes: int = WC) -> np.ndarray:
    """[3, 3, cin, cout] (or [1,1,...]) -> [3, WC, out_lanes] banded matrices.

    Input lanes are wi*C + ci (ci < cin <= C, channel-aligned at stride C);
    output lanes are wo*C_out' + co with C_out' = out_lanes // W.
    """
    kh, kw, cin, cout = w.shape
    cpl_out = out_lanes // W
    assert cout <= cpl_out
    ms = np.zeros((3, WC, out_lanes), np.float32)
    for dh in range(kh):
        for dw in range(kw):
            off_w = dw - (kw - 1) // 2
            for wo in range(W):
                wi = wo + off_w
                if not (0 <= wi < W):
                    continue
                ms[dh + (3 - kh) // 2, wi * C: wi * C + cin,
                   wo * cpl_out: wo * cpl_out + cout] += w[dh, dw]
    return ms


def _bn_fold(ms: np.ndarray, bias: np.ndarray, bn: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """Fold inference BN into conv matrices + per-channel bias vector.

    ms: [3, WC, WC] writing `width` channels per lane group; bias: [width].
    """
    width = bias.shape[-1]
    s = 1.0 / np.sqrt(np.asarray(bn["var"]) + BN_EPS)
    scale_lane = np.tile(np.pad(s, (0, WC // W - width)), W)
    bias_lane = np.tile(np.pad((bias - np.asarray(bn["mean"])) * s,
                               (0, WC // W - width)), W)
    return ms * scale_lane[None, None, :], bias_lane.astype(np.float32)


def _coupling_fold(p: Dict, s: Dict, rescale: float,
                   fold_bn: bool = True) -> Dict:
    """Fold one affine coupling's NN into kernel tensors.

    Input half = channels {0,1}; coupled half = channels {2,3}. The final
    256-wide matrix writes shift into lanes [w*4+2, w*4+3] of cols 0..127 and
    log_scale into the same lanes of cols 128..255.

    fold_bn=False (bn_mode='batch') leaves BN out of the matrices: raw conv
    bias lanes are emitted and the kernel normalizes with in-block moments.
    """
    if "l1_w" not in p:
        raise ValueError("pallas sampler supports only the conv coupling "
                         "template (coupling_nn='conv'); use the XLA path "
                         "for dense couplings")
    width = p["l1_w"].shape[-1]
    if width > C:
        raise ValueError(f"pallas sampler supports coupling width <= {C}, "
                         f"got {width} (lane groups hold {C} channels)")
    m1 = _band_matrix(np.asarray(p["l1_w"]))                       # [3,128,128]
    m2_full = _band_matrix(np.asarray(p["l2_w"]))                  # [3,128,128]
    if fold_bn:
        m1, b1 = _bn_fold(m1, np.asarray(p["l1_b"]).reshape(-1), s["bn1"])
        m2_full, b2 = _bn_fold(m2_full, np.asarray(p["l2_b"]).reshape(-1),
                               s["bn2"])
    else:
        def lane(v):
            return np.tile(np.pad(np.asarray(v).reshape(-1),
                                  (0, WC // W - width)), W).astype(np.float32)
        b1, b2 = lane(p["l1_b"]), lane(p["l2_b"])
    m2 = m2_full[1]                                                # 1x1: middle band only

    # zero-conv: fold exp(3*logs) scaling; route outputs to coupled lanes
    wz = np.asarray(p["last"]["w"])                                # [3,3,width+1,4]
    logs_scale = np.exp(np.asarray(p["last"]["logs"]).reshape(-1)
                        * LOGSCALE_FACTOR)                         # [4]
    wz_x = wz[:, :, :width, :] * logs_scale                        # drop indicator ch
    # out channel j in {0,1} = shift for patch channel 2+j -> col (w*4+2+j)
    # out channel j in {2,3} = logscale for patch channel j   -> col 128 + w*4+j
    m3 = np.zeros((3, WC, 2 * WC), np.float32)
    raw = _band_matrix(wz_x, out_lanes=WC)                         # [3,128,128] 4ch/lane
    for wo in range(W):
        for j in range(2):
            m3[:, :, wo * C + 2 + j] = raw[:, :, wo * C + j]           # shift
            m3[:, :, WC + wo * C + 2 + j] = raw[:, :, wo * C + 2 + j]  # log_scale
    # edge-indicator + bias offset map: conv_zeros on zeros input
    zeros = jnp.zeros((1, H, W, width), jnp.float32)
    off_raw = np.asarray(conv_zeros_apply(p["last"], zeros))[0]    # [H,W,4]
    off = np.zeros((H, 2 * WC), np.float32)
    for wo in range(W):
        for j in range(2):
            off[:, wo * C + 2 + j] = off_raw[:, wo, j]
            off[:, WC + wo * C + 2 + j] = off_raw[:, wo, 2 + j]
    return {"m1": m1, "b1": b1, "m2": m2, "b2": b2, "m3": m3, "off": off,
            "rescale": float(rescale)}


def _coupling_fold2(p: Dict, s: Dict, rescale: float,
                    fold_bn: bool = True) -> Dict:
    """v2 fold: fewer padded matmuls than `_coupling_fold`.

    Two packings exploit the coupling's channel split (NN reads channels
    {0,1}, writes {2,3}):

    - m1 input packing: the NN-input rows of the dh=0 and dh=-1 band matrices
      never overlap in lanes — x's coupled lanes {2,3} are dead on input. The
      kernel builds ``z = where(keep, x, roll(shift_h(x,-1), 2))`` so lanes
      {2,3} carry the *up-shifted* rows' channels {0,1}; one matmul with
      ``m1a`` (dh=0 rows at lanes {0,1}, dh=-1 rows at {2,3}) then covers two
      of the three H-taps. 3 matmuls -> 2.
    - m3 output packing: shift and log-scale each occupy only the coupled
      lanes, so both fit in ONE 128-lane output: shift at lanes {2,3},
      log-scale at lanes {0,1} (recovered with a +2 lane roll).
      3x[128,256] matmuls -> 3x[128,128].

    Per-patch-row padded FLOPs drop from 327,680 to 196,608 per coupling.
    """
    v1 = _coupling_fold(p, s, rescale, fold_bn=fold_bn)
    m1, b1 = v1["m1"], v1["b1"]
    m1a = np.zeros((WC, WC), np.float32)
    for w in range(W):
        m1a[w * C: w * C + 2, :] = m1[1][w * C: w * C + 2, :]
        m1a[w * C + 2: w * C + 4, :] = m1[0][w * C: w * C + 2, :]
    m1b = m1[2]
    m3p = np.zeros((3, WC, WC), np.float32)
    offp = np.zeros((H, WC), np.float32)
    for wo in range(W):
        for j in range(2):
            # v1 layout: shift at col wo*C+2+j, log-scale at col WC+wo*C+2+j
            m3p[:, :, wo * C + j] = v1["m3"][:, :, WC + wo * C + 2 + j]
            m3p[:, :, wo * C + 2 + j] = v1["m3"][:, :, wo * C + 2 + j]
            offp[:, wo * C + j] = v1["off"][:, WC + wo * C + 2 + j]
            offp[:, wo * C + 2 + j] = v1["off"][:, wo * C + 2 + j]
    return {"m1a": m1a, "m1b": m1b, "b1": b1, "m2": v1["m2"], "b2": v1["b2"],
            "m3": m3p, "off": offp, "rescale": float(rescale)}


def _mix_matrix(a_inv: np.ndarray) -> np.ndarray:
    """Per-pixel channel transform (1x1 conv semantics y[co]=sum x[ci]*A[ci,co])
    -> block-diagonal [128,128]."""
    m = np.zeros((WC, WC), np.float32)
    for w in range(W):
        m[w * C:(w + 1) * C, w * C:(w + 1) * C] = a_inv
    return m


def _perm_matrix() -> np.ndarray:
    """Channel reverse (tfb.Permute) as a block-diagonal matrix."""
    return _mix_matrix(np.eye(C, dtype=np.float32)[::-1])


# ---------------------------------------------------------------------------
# program build
# ---------------------------------------------------------------------------

class SampleProgram:
    """Static kernel program: layer op-list + stacked weight tensors."""

    def __init__(self, ops, mixes, couplings, flow, version: int = 1,
                 bn_mode: str = "running"):
        self.ops = ops                # list of ("mix",i)|("coupling",i)|("scale",i)
        self.flow = flow
        self.version = version
        self.bn_mode = bn_mode
        # per-coupling NN width (for dead-lane masking under ghost BN)
        self.width = flow.cfg.width
        self.n_scale = sum(1 for o in ops if o[0] == "scale")
        self.scale_layers = [o[2] for o in ops if o[0] == "scale"]
        if mixes:
            self.mixes = jnp.asarray(np.stack(mixes))
        else:
            self.mixes = jnp.zeros((1, WC, WC), jnp.float32)
        out_lanes = 2 * WC if version == 1 else WC
        if couplings:
            if version == 1:
                self.m1s = jnp.asarray(np.stack([c["m1"] for c in couplings]))
            else:
                self.m1as = jnp.asarray(np.stack([c["m1a"] for c in couplings]))
                self.m1bs = jnp.asarray(np.stack([c["m1b"] for c in couplings]))
            self.b1s = jnp.asarray(np.stack([c["b1"] for c in couplings]))
            self.m2s = jnp.asarray(np.stack([c["m2"] for c in couplings]))
            self.b2s = jnp.asarray(np.stack([c["b2"] for c in couplings]))
            self.m3s = jnp.asarray(np.stack([c["m3"] for c in couplings]))
            self.offs = jnp.asarray(np.stack([c["off"] for c in couplings]))
            self.rescales = [c["rescale"] for c in couplings]
        else:
            if version == 1:
                self.m1s = jnp.zeros((1, 3, WC, WC), jnp.float32)
            else:
                self.m1as = jnp.zeros((1, WC, WC), jnp.float32)
                self.m1bs = jnp.zeros((1, WC, WC), jnp.float32)
            self.b1s = jnp.zeros((1, WC), jnp.float32)
            self.m2s = jnp.zeros((1, WC, WC), jnp.float32)
            self.b2s = jnp.zeros((1, WC), jnp.float32)
            self.m3s = jnp.zeros((1, 3, WC, out_lanes), jnp.float32)
            self.offs = jnp.zeros((1, H, out_lanes), jnp.float32)
            self.rescales = []

    @property
    def weights(self) -> tuple:
        """Stacked weight tensors, in the order the kernel receives them."""
        if self.version == 1:
            return (self.mixes, self.m1s, self.b1s, self.m2s, self.b2s,
                    self.m3s, self.offs)
        return (self.mixes, self.m1as, self.m1bs, self.b1s, self.m2s,
                self.b2s, self.m3s, self.offs)

    def scale_ab(self, cond, batch: int):
        """Per-example (a, b) for each scale layer: scale = sqrt(a*clean + b).

        Evaluated through the layer's own forward at clean={0,1}
        (x=1 => y=scale), so every conditional formula is reused, not
        re-derived. Returns [B, n_scale] a and b."""
        if not self.scale_layers:
            z = jnp.zeros((batch, 1), jnp.float32)
            return z, z
        a_cols, b_cols = [], []
        ones = jnp.ones((batch, 1, 1, 1), jnp.float32)
        for (ldef, p, st, shared) in self.scale_layers:
            c0 = dict(cond, clean=jnp.zeros_like(ones))
            c1 = dict(cond, clean=ones)
            s0, _, _ = ldef.forward(p, shared, st, ones, c0, False)
            s1, _, _ = ldef.forward(p, shared, st, ones, c1, False)
            b = (s0 * s0).reshape(batch, -1)[:, :1]
            a = (s1 * s1).reshape(batch, -1)[:, :1] - b
            a_cols.append(a)
            b_cols.append(b)
        return jnp.concatenate(a_cols, 1), jnp.concatenate(b_cols, 1)


def build_sample_program(flow, params, state, version: int = 2,
                         bn_mode: str = "running") -> SampleProgram:
    """Fold a NoiseFlow's params into a fused sampling program.

    version=2 (default) uses the packed-matmul coupling fold (`_coupling_fold2`,
    ~1.57x fewer padded MXU FLOPs); version=1 keeps the original layout.
    bn_mode='batch' computes coupling-NN BN from in-block batch moments
    (the reference wrapper's is_training=True quirk, NoiseFlowWrapper.py:86);
    'running' folds inference statistics into the matrices.
    """
    cfg = flow.cfg
    if flow.n_levels != 1 or cfg.squeeze_factor != 1:
        raise ValueError("pallas sampling supports single-level unsqueezed flows")
    if tuple(flow.x_shape) != (H, W, C):
        raise ValueError(f"pallas sampling requires x_shape {(H, W, C)}, "
                         f"got {flow.x_shape}")
    specs = flow.level_specs[0]
    shared = flow._shared_view(params)
    ops, mixes, couplings = [], [], []
    for s, p, st in zip(reversed(specs), reversed(params["layers"][0]),
                        reversed(state["layers"][0])):
        if s.kind == "conv1x1":
            m = matrix_param_build(cfg.decomp,
                                   {"trainable": p["mat"],
                                    "frozen": st["frozen"]})
            mixes.append(_mix_matrix(np.asarray(m["A_inv"])))
            ops.append(("mix", len(mixes) - 1))
        elif s.kind == "perm_reverse":
            mixes.append(_perm_matrix())
            ops.append(("mix", len(mixes) - 1))
        elif s.kind == "coupling":
            fold = _coupling_fold2 if version == 2 else _coupling_fold
            couplings.append(fold(
                p["nn"], st["nn"], float(np.asarray(p["rescale"])),
                fold_bn=bn_mode == "running"))
            ops.append(("coupling", len(couplings) - 1))
        elif s.kind in SUPPORTED_SCALE_KINDS:
            from noise_flow_tpu.models.layers import get_layer_def
            ldef = get_layer_def(s.kind, cfg)
            ops.append(("scale", None, (ldef, p, st, shared)))
        else:
            raise ValueError(f"layer kind {s.kind!r} not supported by the "
                             "fused pallas sampler (use the XLA path)")
    # re-number scale ops
    k = 0
    for i, o in enumerate(ops):
        if o[0] == "scale":
            ops[i] = ("scale", k, o[2])
            k += 1
    return SampleProgram(ops, mixes, couplings, flow, version=version,
                         bn_mode=bn_mode)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _shift_h(x, dh):
    """x: [Bt, 32, 128]; rows r of the result = x[r + dh] with zero fill."""
    if dh == 0:
        return x
    z = jnp.zeros_like(x[:, :1])
    if dh == -1:
        return jnp.concatenate([z, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], z], axis=1)


def _box_muller(bits1, bits2):
    """uint32 random bits -> standard normals (Box-Muller on the VPU).

    Uses BOTH halves (cos and sin) so each uniform pair yields two normals:
    bits of shape [..., S, L] produce normals of shape [..., 2*S, L]."""
    # 24 high bits -> uniform in (0, 1); offset avoids log(0).
    # Mosaic has no uint32->f32 cast; the 24-bit value fits int32 exactly.
    h1 = (bits1 >> 8).astype(jnp.int32)
    h2 = (bits2 >> 8).astype(jnp.int32)
    u1 = h1.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = h2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = (2.0 * np.pi) * u2
    return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=-2)


def _make_kernel(ops, rescales, bt: int, mm_dtype, temp: float,
                 use_prng: bool, version: int = 1,
                 bn_mode: str = "running"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from noise_flow_tpu.ops.nn import BN_EPS as _BN_EPS

    # f32 operands on the MXU default to a single bf16 pass inside Mosaic;
    # request HIGHEST so the f32 path really is f32 (multi-pass).
    precision = (jax.lax.Precision.HIGHEST
                 if mm_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    def mm(x2, m):
        return jnp.dot(x2.astype(mm_dtype), m.astype(mm_dtype),
                       preferred_element_type=jnp.float32,
                       precision=precision)

    n_el = bt * H * W  # elements per channel per block (ghost BN)

    def mm32(a, b):  # stats matmul always f32 (moments must be accurate)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def chan_sel():
        li = jax.lax.broadcasted_iota(jnp.int32, (WC, WC), 0) % C
        lj = jax.lax.broadcasted_iota(jnp.int32, (WC, WC), 1) % C
        return (li == lj).astype(jnp.float32)

    def bn_ghost(h2, csel):
        """h2 [bt*H, WC] -> normalized with per-block channel moments
        (the reference wrapper's is_training=True BN,
        ref:NoiseFlowWrapper.py:86; dead lanes have var 0 -> 0/sqrt(eps)=0)."""
        m = mm32(jnp.sum(h2, axis=0, keepdims=True), csel) * (1.0 / n_el)
        d = h2 - m
        v = mm32(jnp.sum(d * d, axis=0, keepdims=True), csel) * (1.0 / n_el)
        return d * jax.lax.rsqrt(v + _BN_EPS)

    def kernel(first_ref, clean_ref, sa_ref, sb_ref, *rest):
        out_ref = rest[-1]
        if version == 1:
            (mixes_ref, m1s_ref, b1s_ref, m2s_ref, b2s_ref, m3s_ref,
             offs_ref) = rest[:-1]
        else:
            (mixes_ref, m1as_ref, m1bs_ref, b1s_ref, m2s_ref, b2s_ref,
             m3s_ref, offs_ref) = rest[:-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WC), 2)
        keep_mask = (lane % C) < (C // 2)  # uncoupled channels {0,1}
        csel = chan_sel() if bn_mode == "batch" else None

        def bn_act(h2):
            """post-conv activation: ghost-BN normalize (batch mode) + relu;
            running mode has BN pre-folded into the matrices."""
            if bn_mode == "batch":
                h2 = bn_ghost(h2, csel)
            return jax.nn.relu(h2)
        if use_prng:
            # first_ref is a (1,1) SMEM seed; draw eps on-chip (no HBM eps).
            # Box-Muller yields 2 normals per uniform pair -> half-height bits.
            # prng_seed hashes its arguments together, so consecutive integer
            # seeds do NOT overlap across grid blocks (seed+1 block 0 vs
            # seed block 1 would collide under additive seeding).
            pltpu.prng_seed(first_ref[0, 0], pl.program_id(0))
            bits1 = pltpu.bitcast(pltpu.prng_random_bits((bt, H // 2, WC)),
                                  jnp.uint32)
            bits2 = pltpu.bitcast(pltpu.prng_random_bits((bt, H // 2, WC)),
                                  jnp.uint32)
            x = _box_muller(bits1, bits2) * temp
        else:
            x = first_ref[:]
        for op in ops:
            kind, idx = op[0], op[1]
            if kind == "mix":
                x2 = mm(x.reshape(bt * H, WC), mixes_ref[idx])
                x = x2.reshape(bt, H, WC)
            elif kind == "scale":
                a = sa_ref[:, idx].reshape(bt, 1, 1)
                b = sb_ref[:, idx].reshape(bt, 1, 1)
                x = x * jnp.sqrt(a * clean_ref[:] + b)
            elif version == 1:  # coupling, original fold
                h = mm(x.reshape(bt * H, WC), m1s_ref[idx, 1])
                h += mm(_shift_h(x, -1).reshape(bt * H, WC), m1s_ref[idx, 0])
                h += mm(_shift_h(x, 1).reshape(bt * H, WC), m1s_ref[idx, 2])
                h = bn_act(h + b1s_ref[idx].reshape(1, WC))
                h = bn_act(mm(h, m2s_ref[idx])
                           + b2s_ref[idx].reshape(1, WC))
                h3 = h.reshape(bt, H, WC)
                t = mm(h, m3s_ref[idx, 1])
                t += mm(_shift_h(h3, -1).reshape(bt * H, WC), m3s_ref[idx, 0])
                t += mm(_shift_h(h3, 1).reshape(bt * H, WC), m3s_ref[idx, 2])
                t = t.reshape(bt, H, 2 * WC) + offs_ref[idx].reshape(1, H, 2 * WC)
                shift = t[..., :WC]
                ls = rescales[idx] * jnp.tanh(t[..., WC:])
                x = jnp.where(keep_mask, x, (x - shift) * jnp.exp(-ls))
            else:  # coupling, packed fold (_coupling_fold2)
                # lanes {2,3} of z carry the up-shifted rows' channels {0,1}:
                # one matmul covers the dh=0 and dh=-1 conv taps.
                xu = _shift_h(x, -1)
                z = jnp.where(keep_mask, x, jnp.roll(xu, 2, axis=-1))
                h = mm(z.reshape(bt * H, WC), m1as_ref[idx])
                h += mm(_shift_h(x, 1).reshape(bt * H, WC), m1bs_ref[idx])
                h = bn_act(h + b1s_ref[idx].reshape(1, WC))
                h = bn_act(mm(h, m2s_ref[idx])
                           + b2s_ref[idx].reshape(1, WC))
                h3 = h.reshape(bt, H, WC)
                t = mm(h, m3s_ref[idx, 1])
                t += mm(_shift_h(h3, -1).reshape(bt * H, WC), m3s_ref[idx, 0])
                t += mm(_shift_h(h3, 1).reshape(bt * H, WC), m3s_ref[idx, 2])
                t = t.reshape(bt, H, WC) + offs_ref[idx].reshape(1, H, WC)
                # shift sits at coupled lanes {2,3}; log-scale at {0,1},
                # recovered with a +2 lane roll (group-period 4; the two
                # boundary lanes land on kept lanes and are masked out).
                ls = rescales[idx] * jnp.tanh(jnp.roll(t, 2, axis=-1))
                x = jnp.where(keep_mask, x, (x - t) * jnp.exp(-ls))
        out_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("program", "bt", "interpret",
                                             "mm_dtype", "temp", "use_prng"))
def _pallas_sample_padded(program: SampleProgram, first, clean, sa, sb,
                          bt: int, interpret: bool, mm_dtype,
                          temp: float = 1.0, use_prng: bool = False):
    """first = eps tile [B,H,WC] (use_prng=False) or (1,1) int32 seed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = clean.shape[0]
    grid = (b // bt,)
    kernel = _make_kernel(program.ops, tuple(program.rescales), bt, mm_dtype,
                          temp, use_prng, program.version, program.bn_mode)

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

    first_spec = (pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
                  if use_prng else batch_spec())
    n_scale = sa.shape[1]
    weights = program.weights
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            first_spec, batch_spec(), batch_spec(n_scale),
            batch_spec(n_scale),
        ] + [const_spec(w.shape) for w in weights],
        out_specs=batch_spec(),
        out_shape=jax.ShapeDtypeStruct((b, H, WC), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(first, clean, sa, sb, *weights)


@functools.partial(jax.jit, static_argnames=("program", "batch"))
def _scale_ab_jit(program: SampleProgram, cond, batch: int):
    return program.scale_ab(cond, batch)


@functools.partial(jax.jit, static_argnames=("program", "temp", "bt",
                                             "interpret", "mm_dtype",
                                             "use_eps", "in_kernel_rng",
                                             "has_sab", "tile_out"))
def _sample_full(program: SampleProgram, rng, cond, eps, temp: float,
                 bt: int, interpret: bool, mm_dtype, use_eps: bool,
                 in_kernel_rng: bool = False, sab=None, has_sab: bool = False,
                 tile_out: bool = False):
    clean = cond["clean"]
    batch = clean.shape[0]
    clean_t = jnp.asarray(clean, jnp.float32).reshape(batch, H, WC)
    sa, sb = sab if has_sab else program.scale_ab(cond, batch)

    pad = (-batch) % bt
    if pad:
        clean_t = jnp.concatenate([clean_t, jnp.ones((pad, H, WC))], 0)
        sa = jnp.concatenate([sa, jnp.zeros((pad, sa.shape[1]))], 0)
        sb = jnp.concatenate([sb, jnp.ones((pad, sb.shape[1]))], 0)

    if in_kernel_rng and not use_eps:
        if rng.dtype == jnp.int32:       # pre-made (1,1) seed, no key fold
            seed = rng
        else:
            seed = jax.random.randint(rng, (1, 1), 0, 2 ** 31 - 1, jnp.int32)
        out = _pallas_sample_padded(program, seed, clean_t, sa, sb, bt,
                                    interpret, mm_dtype, temp=temp,
                                    use_prng=True)
    else:
        if not use_eps:
            if rng.dtype == jnp.int32:   # int seed on the XLA-eps path
                rng = jax.random.PRNGKey(rng.reshape(())[()])
            eps = jax.random.normal(rng, (batch, H, W, C), jnp.float32)
        eps = (jnp.asarray(eps, jnp.float32) * temp).reshape(batch, H, WC)
        if pad:
            eps = jnp.concatenate([eps, jnp.zeros((pad, H, WC))], 0)
        out = _pallas_sample_padded(program, eps, clean_t, sa, sb, bt,
                                    interpret, mm_dtype)
    if tile_out:
        # [B, H, W*C] — the kernel's native layout. The NHWC reshape is a
        # physical relayout on TPU (last-dim 4 retiles poorly); consumers
        # that transfer to host or do elementwise work should take the tile.
        return out[:batch] if pad else out
    return out[:batch].reshape(batch, H, W, C)


def precompute_scale_ab(program: SampleProgram, cond, batch: int = None):
    """Precompute the per-example (a, b) scale coefficients.

    They depend only on (nlf0, nlf1, iso, cam) — NOT on `clean` — so a
    sampling loop with fixed conditioning can compute them once and pass
    them via `pallas_sample(..., scale_ab=...)`, removing ~40 tiny XLA ops
    from every call (the steady-state path of NoiseFlowWrapper)."""
    batch = batch or cond["clean"].shape[0]
    return _scale_ab_jit(program, cond, batch)


def make_sampler(program: SampleProgram, cond, temp: float = 1.0,
                 bt: int = 64, mm_dtype=jnp.bfloat16, tile_out: bool = True):
    """Build the leanest per-call sampling closure for FIXED conditioning.

    Returns `sample(seed: int) -> noise` ([B, H, W*C] tile layout by default;
    reshape to [B, 32, 32, 4] on the host for free — C-contiguous layouts
    match). Scale coefficients are precomputed once; eps is drawn in-kernel
    from the TPU PRNG; the only per-call host work is a (1,1) int32 seed.
    TPU-only (the interpreter lacks prng_random_bits) — falls back to the
    jitted XLA-eps path off-TPU.
    """
    on_tpu = jax.default_backend() == "tpu"
    batch = cond["clean"].shape[0]
    sa, sb = _scale_ab_jit(program, cond, batch)
    clean_t = jnp.asarray(cond["clean"], jnp.float32).reshape(batch, H, WC)
    if (-batch) % bt:
        raise ValueError(f"batch {batch} must be a multiple of bt {bt}")
    if not on_tpu:
        def sample_interp(seed: int):
            out = pallas_sample(program, int(seed), cond, temp=temp, bt=bt,
                                mm_dtype=mm_dtype, scale_ab=(sa, sb))
            return out.reshape(batch, H, WC) if tile_out else out
        return sample_interp

    def sample(seed: int):
        s = jnp.full((1, 1), int(seed) % (2 ** 31 - 1), jnp.int32)
        out = _pallas_sample_padded(program, s, clean_t, sa, sb, bt,
                                    False, mm_dtype, temp=float(temp),
                                    use_prng=True)
        return out if tile_out else out.reshape(batch, H, W, C)

    return sample


def pallas_sample(program: SampleProgram, rng, cond, temp: float = 1.0,
                  batch: int = None, bt: int = 64, interpret: bool = None,
                  mm_dtype=jnp.float32, eps=None, in_kernel_rng: bool = False,
                  scale_ab=None):
    """Sample noise with the fused kernel (one jitted program end-to-end).

    cond: {'clean':[B,32,32,4], 'nlf0','nlf1','iso','cam':[B]}.
    eps (optional): pre-drawn standard normals [B,32,32,4] for parity tests.
    in_kernel_rng: draw eps on-chip via the TPU PRNG + Box-Muller (no HBM
    eps traffic; TPU-only — the interpreter lacks prng_random_bits). With
    in_kernel_rng, `rng` may be a plain int (or (1,1) int32 array) seed —
    cheaper than a PRNG key fold per call.
    scale_ab: optional precomputed (sa, sb) from `precompute_scale_ab`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if isinstance(rng, int):
        rng = jnp.full((1, 1), rng % (2 ** 31 - 1), jnp.int32)
    use_eps = eps is not None
    if not use_eps:
        eps = jnp.zeros((0,))
    return _sample_full(program, rng, cond, eps, float(temp), bt,
                        interpret, mm_dtype, use_eps, in_kernel_rng,
                        sab=scale_ab, has_sab=scale_ab is not None)
