"""Bijector layer library: the full conditional-coupling family as pure functions.

Re-design of ref:borealisflows/layers.py and
ref:borealisflows/noise_flow_layers/*.py. Every layer is a ``LayerDef`` of
three pure functions over explicit pytrees:

    init(rng, x_shape, cfg)                          -> (params, state)
    inverse(params, shared, state, y, cond, train)   -> (x, ildj[B], new_state)
    forward(params, shared, state, x, cond, train)   -> (y, fldj[B], new_state)

Direction convention follows the reference: ``inverse`` maps data -> latent
(used by the NLL loss, ref:noise_flow_model.py:394-428) and ``forward`` maps
latent -> data (used by sampling, ref:noise_flow_model.py:430-447).

``cond`` is a dict: {'clean':[B,H,W,C], 'nlf0':[B], 'nlf1':[B], 'iso':[B],
'cam':[B]} — per-example on TPU; the reference's per-minibatch scalar
conditioning (ref:sidd/MiniBatchSampler.py:60-64) is the special case where
all entries are equal.

Faithfulness quirks preserved (they change NLL numbers):
- gain/gain1/gain2/gain3 log-dets carry NO pixel-count factor
  (ref:noise_flow_layers/AffineCouplingGain.py:86,96 returns ``tf.log(scale)``
  without spatial reduction), while sdn-family layers reduce over (H,W,C).
- gain4 DOES include the pixel factor: the reference broadcasts the scalar
  scale to the full tensor before reducing
  (ref:AffineCouplingGainEx4.py:92,97 — ``scale = scale + z*0.0``).
- sdn4/5/6 and gain4 share trainables through the 'sdn_gain' group
  (ref:cond_utils.py:181,207,244,437 AUTO_REUSE scope).
- every conditional layer owns a (mostly unused) ``rescaling_scale`` trainable
  initialized to 1e-4 (ref:AffineCouplingSdnEx5.py:44-46) — kept for parameter
  parity; it only enters the math for coupling-style layers.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.models import cond_params as cp
from noise_flow_tpu.ops.conv1x1 import (
    matrix_param_build,
    matrix_param_init,
    orthogonal_init,
)
from noise_flow_tpu.ops.nn import (
    batch_norm_init,
    conv2d_nhwc,
    coupling_nn_apply,
    coupling_nn_init,
    coupling_nn_iso_apply,
    coupling_nn_iso_init,
)


class LayerDef(NamedTuple):
    init: Callable
    inverse: Callable
    forward: Callable


def _bb(x):
    return x.reshape(-1, 1, 1, 1)


def _sum_hwc(t):
    return jnp.sum(t, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# permutation: channel reverse (tfb.Permute, ref:noise_flow_model.py:82-84)
# ---------------------------------------------------------------------------

def _perm_init(rng, x_shape, cfg):
    return {}, {}


def _perm_inverse(params, shared, state, y, cond, train):
    return y[..., ::-1], jnp.zeros((y.shape[0],), y.dtype), state


def _perm_forward(params, shared, state, x, cond, train):
    return x[..., ::-1], jnp.zeros((x.shape[0],), x.dtype), state


# ---------------------------------------------------------------------------
# invertible 1x1 conv (ref:borealisflows/layers.py:74-145)
# ---------------------------------------------------------------------------

def _conv1x1_init(rng, x_shape, cfg):
    c = x_shape[-1]
    seed = int(jax.random.randint(rng, (), 0, 2 ** 31 - 1))
    init_a = orthogonal_init(np.random.default_rng(seed), c)
    mp = matrix_param_init(cfg.decomp, init_a)
    return {"mat": mp["trainable"]}, {"frozen": mp["frozen"]}


def _conv1x1_built(params, state, cfg):
    return matrix_param_build(cfg.decomp, {"trainable": params["mat"],
                                           "frozen": state["frozen"]})


def make_conv1x1(cfg):
    def inverse(params, shared, state, y, cond, train):
        m = _conv1x1_built(params, state, cfg)
        w = m["A"].reshape(1, 1, *m["A"].shape)
        x = conv2d_nhwc(y, w)
        h, wd = y.shape[1], y.shape[2]
        ildj = jnp.broadcast_to(m["log_abs_det"] * (h * wd), (y.shape[0],))
        return x, ildj, state

    def forward(params, shared, state, x, cond, train):
        m = _conv1x1_built(params, state, cfg)
        w = m["A_inv"].reshape(1, 1, *m["A_inv"].shape)
        y = conv2d_nhwc(x, w)
        h, wd = x.shape[1], x.shape[2]
        fldj = jnp.broadcast_to(-m["log_abs_det"] * (h * wd), (x.shape[0],))
        return y, fldj, state

    return LayerDef(_conv1x1_init, inverse, forward)


# ---------------------------------------------------------------------------
# unconditional affine coupling (ref:borealisflows/layers.py:251-375)
# ---------------------------------------------------------------------------

def _coupling_init(rng, x_shape, cfg):
    c = x_shape[-1]
    nn_p, nn_s = coupling_nn_init(rng, c // 2, cfg.width, 2 * (c - c // 2))
    return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}


def _coupling_net(params, state, x0, train):
    shift, log_scale, new_nn = coupling_nn_apply(params["nn"], state["nn"], x0, train)
    log_scale = params["rescale"] * jnp.tanh(log_scale)
    return shift, log_scale, {"nn": new_nn}


def _coupling_inverse(params, shared, state, y, cond, train):
    c = y.shape[-1]
    y0, y1 = y[..., : c // 2], y[..., c // 2:]
    shift, ls, new_state = _coupling_net(params, state, y0, train)
    x1 = y1 * jnp.exp(ls) + shift
    return jnp.concatenate([y0, x1], -1), _sum_hwc(ls), new_state


def _coupling_forward(params, shared, state, x, cond, train):
    c = x.shape[-1]
    x0, x1 = x[..., : c // 2], x[..., c // 2:]
    shift, ls, new_state = _coupling_net(params, state, x0, train)
    y1 = (x1 - shift) * jnp.exp(-ls)
    return jnp.concatenate([x0, y1], -1), -_sum_hwc(ls), new_state


COUPLING = LayerDef(_coupling_init, _coupling_inverse, _coupling_forward)


def make_coupling_dense(cfg):
    """Affine coupling with the dense-MLP template
    (ref:borealisflows/layers.py:404-449, real_nvp_default_template) —
    selected by ``cfg.coupling_nn == 'dense'``."""
    from noise_flow_tpu.ops.nn import coupling_mlp_apply, coupling_mlp_init

    hidden = tuple(cfg.hidden_layers)

    def init(rng, x_shape, cfg_):
        h, w, c = x_shape
        nn_p, nn_s = coupling_mlp_init(rng, (h, w, c // 2), hidden)
        return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}

    def net(params, state, x0, train):
        shift, log_scale, new_nn = coupling_mlp_apply(
            params["nn"], state["nn"], x0, train)
        return shift, params["rescale"] * jnp.tanh(log_scale), {"nn": new_nn}

    def inverse(params, shared, state, y, cond, train):
        c = y.shape[-1]
        y0, y1 = y[..., : c // 2], y[..., c // 2:]
        shift, ls, new_state = net(params, state, y0, train)
        x1 = y1 * jnp.exp(ls) + shift
        return jnp.concatenate([y0, x1], -1), _sum_hwc(ls), new_state

    def forward(params, shared, state, x, cond, train):
        c = x.shape[-1]
        x0, x1 = x[..., : c // 2], x[..., c // 2:]
        shift, ls, new_state = net(params, state, x0, train)
        y1 = (x1 - shift) * jnp.exp(-ls)
        return jnp.concatenate([x0, y1], -1), -_sum_hwc(ls), new_state

    return LayerDef(init, inverse, forward)


# ---------------------------------------------------------------------------
# scale-only conditional layers (sdn*, gain*, fitSDN, condSDN)
#
# inverse: x = y / scale, ildj = -sum log scale
# forward: y = x * scale, fldj = +sum log scale
# (ref:AffineCouplingSdnEx5.py:50-132 and siblings)
# ---------------------------------------------------------------------------

def make_scale_only(scale_fn: Callable, init_fn: Callable, ldj_mode: str):
    """scale_fn(params, shared, cond, y) -> scale broadcastable against y.

    ldj_mode: 'full'  -> reduce log(scale broadcast to y) over (H,W,C)
              'scalar'-> per-example log(scale) with NO pixel factor
                         (gain-family quirk, ref:AffineCouplingGain.py:86,96)
    """

    def init(rng, x_shape, cfg):
        return {**init_fn(cfg), "rescale": jnp.full((), 1e-4)}, {}

    def _ldj(scale, y):
        if ldj_mode == "full":
            ls = jnp.log(jnp.broadcast_to(scale, y.shape))
            return _sum_hwc(ls)
        # 'scalar': scale is [B] or [1]; broadcast per example only
        return jnp.broadcast_to(jnp.log(scale).reshape(-1), (y.shape[0],))

    def inverse(params, shared, state, y, cond, train):
        scale = scale_fn(params, shared, cond, y)
        x = y / scale if scale.ndim == 4 else y / _bb(jnp.broadcast_to(
            scale.reshape(-1), (y.shape[0],)))
        return x, -_ldj(scale, y), state

    def forward(params, shared, state, x, cond, train):
        scale = scale_fn(params, shared, cond, x)
        y = x * scale if scale.ndim == 4 else x * _bb(jnp.broadcast_to(
            scale.reshape(-1), (x.shape[0],)))
        return y, _ldj(scale, x), state

    return LayerDef(init, inverse, forward)


def _broadcast_cond(v, b):
    """Reference feeds length-1 vectors for iso/cam/nlf; broadcast to [B]."""
    v = jnp.asarray(v, jnp.float32).reshape(-1)
    return jnp.broadcast_to(v, (b,))


def _iso(cond, y):
    return _broadcast_cond(cond["iso"], y.shape[0])


def _cam(cond, y):
    return _broadcast_cond(cond["cam"], y.shape[0])


SDN = make_scale_only(
    lambda p, sh, cond, y: cp.sdn_scale(p, cond["clean"]),
    lambda cfg: cp.sdn_init(), "full")

SDN1 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn1_scale(p, cond["clean"], _iso(cond, y)),
    lambda cfg: cp.sdn1_init(), "full")

SDN2 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn2_scale(p, cond["clean"], _iso(cond, y)),
    lambda cfg: cp.sdn2_init(cfg.gain_init), "full")

SDN3 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn3_scale(p, cond["clean"], _iso(cond, y)),
    lambda cfg: cp.sdn3_init(cfg.gain_init), "full")

SDN4 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn4_scale(sh["sdn_gain"], cond["clean"],
                                         _iso(cond, y), sh["c_i"]),
    lambda cfg: {}, "full")

SDN5 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn5_scale(sh["sdn_gain"], cond["clean"],
                                         _iso(cond, y), _cam(cond, y), sh["c_i"]),
    lambda cfg: {}, "full")

SDN6 = make_scale_only(
    lambda p, sh, cond, y: cp.sdn6_scale(sh["sdn_gain"], cond["clean"],
                                         _iso(cond, y), _cam(cond, y), sh["c_i"]),
    lambda cfg: {}, "full")

GAIN = make_scale_only(
    lambda p, sh, cond, y: cp.gain_scale(p, _iso(cond, y)),
    lambda cfg: cp.gain_init(), "scalar")

GAIN1 = make_scale_only(
    lambda p, sh, cond, y: cp.gain1_scale(p, _iso(cond, y)),
    lambda cfg: cp.gain1_init(), "scalar")

# gain2's reference ldj is ill-formed (reduce over spatial axes of a rank-1
# tensor raises at graph build, ref:AffineCouplingGainEx2.py:87); we use the
# well-defined per-example scalar ldj like its gain siblings.
GAIN2 = make_scale_only(
    lambda p, sh, cond, y: cp.gain2_scale(p, _iso(cond, y)),
    lambda cfg: cp.gain2_init(cfg.gain_init), "scalar")

GAIN3 = make_scale_only(
    lambda p, sh, cond, y: cp.gain3_scale(p, _iso(cond, y)),
    lambda cfg: cp.gain3_init(), "scalar")

# gain4: scalar scale but FULL pixel-count ldj via the reference's broadcast
# trick (ref:AffineCouplingGainEx4.py:84-97).
GAIN4 = make_scale_only(
    lambda p, sh, cond, y: cp.gain4_scale(sh["sdn_gain"]),
    lambda cfg: {}, "full")

FIT_SDN = make_scale_only(
    lambda p, sh, cond, y: jnp.sqrt(
        _bb(cp.sdn_iso3_betas(p, _iso(cond, y))[0]) * cond["clean"]
        + _bb(cp.sdn_iso3_betas(p, _iso(cond, y))[1])),
    lambda cfg: cp.sdn_iso3_init(), "full")

FIT_SDN2 = make_scale_only(
    lambda p, sh, cond, y: jnp.sqrt(
        _bb(cp.sdn_iso2_betas(p, _iso(cond, y))[0]) * cond["clean"]
        + _bb(cp.sdn_iso2_betas(p, _iso(cond, y))[1])),
    lambda cfg: cp.sdn_iso2_init(), "full")

# condSDN: non-trainable camera-NLF baseline (ref:AffineCouplingCamSdn.py:43-124)
CAM_SDN = make_scale_only(
    lambda p, sh, cond, y: jnp.sqrt(
        cond["clean"] * _bb(_broadcast_cond(cond["nlf0"], y.shape[0]))
        + _bb(_broadcast_cond(cond["nlf1"], y.shape[0]))),
    lambda cfg: {}, "full")


# ---------------------------------------------------------------------------
# conditional couplings driven by the clean image (condY / condXY families)
# ---------------------------------------------------------------------------

def _condY_init(rng, x_shape, cfg):
    c = x_shape[-1]
    # template built with doubled output channels (ref:noise_flow_model.py:275-279):
    # NN input = full clean image (C ch), output = 2C (shift+log_scale for all C)
    nn_p, nn_s = coupling_nn_init(rng, c, cfg.width, 2 * c)
    return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}


def _condY_net(params, state, yy, train):
    shift, ls, new_nn = coupling_nn_apply(params["nn"], state["nn"], yy, train)
    return shift, params["rescale"] * jnp.tanh(ls), {"nn": new_nn}


def _condY_inverse(params, shared, state, y, cond, train):
    shift, ls, new_state = _condY_net(params, state, cond["clean"], train)
    x = y * jnp.exp(ls) + shift
    return x, _sum_hwc(ls), new_state


def _condY_forward(params, shared, state, x, cond, train):
    shift, ls, new_state = _condY_net(params, state, cond["clean"], train)
    y = (x - shift) * jnp.exp(-ls)
    return y, -_sum_hwc(ls), new_state


COND_Y = LayerDef(_condY_init, _condY_inverse, _condY_forward)


def _condYG_init(rng, x_shape, cfg):
    c = x_shape[-1]
    nn_p, nn_s = coupling_nn_iso_init(rng, c, cfg.width, 2 * c)
    return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}


def _condYG_net(params, state, yy, iso0, train):
    shift, ls, new_nn = coupling_nn_iso_apply(params["nn"], state["nn"], yy, iso0, train)
    return shift, params["rescale"] * jnp.tanh(ls), {"nn": new_nn}


def _condYG_inverse(params, shared, state, y, cond, train):
    iso0 = jnp.asarray(cond["iso"], jnp.float32).reshape(-1)[0]
    shift, ls, new_state = _condYG_net(params, state, cond["clean"], iso0, train)
    x = y * jnp.exp(ls) + shift
    return x, _sum_hwc(ls), new_state


def _condYG_forward(params, shared, state, x, cond, train):
    iso0 = jnp.asarray(cond["iso"], jnp.float32).reshape(-1)[0]
    shift, ls, new_state = _condYG_net(params, state, cond["clean"], iso0, train)
    y = (x - shift) * jnp.exp(-ls)
    return y, -_sum_hwc(ls), new_state


COND_YG = LayerDef(_condYG_init, _condYG_inverse, _condYG_forward)


def _condXY_init(rng, x_shape, cfg):
    c = x_shape[-1]
    # NN input = concat(x0, clean) = C/2 + C channels, output = 2*(C/2)
    nn_p, nn_s = coupling_nn_init(rng, c // 2 + c, cfg.width, 2 * (c - c // 2))
    return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}


def _condXY_inverse(params, shared, state, y, cond, train):
    c = y.shape[-1]
    y0, y1 = y[..., : c // 2], y[..., c // 2:]
    inp = jnp.concatenate([y0, cond["clean"]], -1)
    shift, ls, new_nn = coupling_nn_apply(params["nn"], state["nn"], inp, train)
    ls = params["rescale"] * jnp.tanh(ls)
    x1 = y1 * jnp.exp(ls) + shift
    return jnp.concatenate([y0, x1], -1), _sum_hwc(ls), {"nn": new_nn}


def _condXY_forward(params, shared, state, x, cond, train):
    c = x.shape[-1]
    x0, x1 = x[..., : c // 2], x[..., c // 2:]
    inp = jnp.concatenate([x0, cond["clean"]], -1)
    shift, ls, new_nn = coupling_nn_apply(params["nn"], state["nn"], inp, train)
    ls = params["rescale"] * jnp.tanh(ls)
    y1 = (x1 - shift) * jnp.exp(-ls)
    return jnp.concatenate([x0, y1], -1), -_sum_hwc(ls), {"nn": new_nn}


COND_XY = LayerDef(_condXY_init, _condXY_inverse, _condXY_forward)


def _condXYG_init(rng, x_shape, cfg):
    c = x_shape[-1]
    nn_p, nn_s = coupling_nn_iso_init(rng, c // 2 + c, cfg.width, 2 * (c - c // 2))
    return {"nn": nn_p, "rescale": jnp.full((), 1e-4)}, {"nn": nn_s}


def _condXYG_inverse(params, shared, state, y, cond, train):
    c = y.shape[-1]
    iso0 = jnp.asarray(cond["iso"], jnp.float32).reshape(-1)[0]
    y0, y1 = y[..., : c // 2], y[..., c // 2:]
    inp = jnp.concatenate([y0, cond["clean"]], -1)
    shift, ls, new_nn = coupling_nn_iso_apply(params["nn"], state["nn"], inp, iso0, train)
    ls = params["rescale"] * jnp.tanh(ls)
    x1 = y1 * jnp.exp(ls) + shift
    return jnp.concatenate([y0, x1], -1), _sum_hwc(ls), {"nn": new_nn}


def _condXYG_forward(params, shared, state, x, cond, train):
    c = x.shape[-1]
    iso0 = jnp.asarray(cond["iso"], jnp.float32).reshape(-1)[0]
    x0, x1 = x[..., : c // 2], x[..., c // 2:]
    inp = jnp.concatenate([x0, cond["clean"]], -1)
    shift, ls, new_nn = coupling_nn_iso_apply(params["nn"], state["nn"], inp, iso0, train)
    ls = params["rescale"] * jnp.tanh(ls)
    y1 = (x1 - shift) * jnp.exp(-ls)
    return jnp.concatenate([x0, y1], -1), -_sum_hwc(ls), {"nn": new_nn}


COND_XYG = LayerDef(_condXYG_init, _condXYG_inverse, _condXYG_forward)


# ---------------------------------------------------------------------------
# BatchNorm bijector + LeakyReLU bijector (library completeness;
# ref:borealisflows/layers.py:149-247 and 26-71 — unused by the arch DSL)
# ---------------------------------------------------------------------------

def _bn_bij_init(rng, x_shape, cfg):
    return {}, {"bn": batch_norm_init(x_shape[-1])}


def _bn_bij_inverse(params, shared, state, y, cond, train):
    eps = 1e-4
    h, w = y.shape[1], y.shape[2]
    if train:
        m = jnp.mean(y, axis=(0, 1, 2))
        v = jnp.var(y, axis=(0, 1, 2))
        new = {"bn": {"mean": state["bn"]["mean"] - 0.1 * (state["bn"]["mean"] - m),
                      "var": state["bn"]["var"] - 0.1 * (state["bn"]["var"] - v)}}
        x = (y - m) * jax.lax.rsqrt(v + eps)
        ildj = jnp.sum(-0.5 * jnp.log(v + eps)) * (h * w)
    else:
        m, v = state["bn"]["mean"], state["bn"]["var"]
        new = state
        x = (y - m) * jax.lax.rsqrt(v + eps)
        ildj = jnp.sum(-0.5 * jnp.log(v + eps)) * (h * w)
    return x, jnp.broadcast_to(ildj, (y.shape[0],)), new


def _bn_bij_forward(params, shared, state, x, cond, train):
    eps = 1e-4
    h, w = x.shape[1], x.shape[2]
    m, v = state["bn"]["mean"], state["bn"]["var"]
    y = x * jnp.sqrt(v + eps) + m
    fldj = -jnp.sum(-0.5 * jnp.log(v + eps)) * (h * w)
    return y, jnp.broadcast_to(fldj, (x.shape[0],)), state


BATCH_NORM_BIJ = LayerDef(_bn_bij_init, _bn_bij_inverse, _bn_bij_forward)


def _lrelu_init(rng, x_shape, cfg):
    return {"alpha": jnp.full((), 1.0)}, {}


def _lrelu_inverse(params, shared, state, y, cond, train):
    alpha = jnp.abs(params["alpha"])
    x = jnp.where(y >= 0, y, alpha * y)
    j = jnp.where(y >= 0, jnp.ones_like(y), alpha * jnp.ones_like(y))
    return x, _sum_hwc(jnp.log(jnp.abs(j))), state


def _lrelu_forward(params, shared, state, x, cond, train):
    alpha = jnp.abs(params["alpha"])
    y = jnp.where(x >= 0, x, x / alpha)
    j = jnp.where(x >= 0, jnp.ones_like(x), jnp.ones_like(x) / alpha)
    return y, _sum_hwc(jnp.log(jnp.abs(j))), state


LEAKY_RELU = LayerDef(_lrelu_init, _lrelu_inverse, _lrelu_forward)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def get_layer_def(kind: str, cfg) -> LayerDef:
    table: Dict[str, LayerDef] = {
        "perm_reverse": LayerDef(_perm_init, _perm_inverse, _perm_forward),
        "conv1x1": make_conv1x1(cfg),
        "coupling": (make_coupling_dense(cfg)
                     if getattr(cfg, "coupling_nn", "conv") == "dense"
                     else COUPLING),
        "sdn": SDN, "sdn1": SDN1, "sdn2": SDN2, "sdn3": SDN3,
        "sdn4": SDN4, "sdn5": SDN5, "sdn6": SDN6,
        "gain": GAIN, "gain1": GAIN1, "gain2": GAIN2, "gain3": GAIN3,
        "gain4": GAIN4,
        "fitSDN": FIT_SDN, "fitSDN2": FIT_SDN2,
        "condSDN": CAM_SDN,
        "condY": COND_Y, "condYG": COND_YG,
        "condXY": COND_XY, "condXYG": COND_XYG,
        "batch_norm": BATCH_NORM_BIJ,
        "leaky_relu": LEAKY_RELU,
    }
    if kind not in table:
        raise ValueError(f"unknown layer kind {kind!r}")
    return table[kind]


SHARED_SDN_GAIN_KINDS = ("sdn4", "sdn5", "sdn6", "gain4")
