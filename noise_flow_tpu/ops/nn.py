"""Coupling-network primitives (pure JAX, NHWC, TPU-friendly).

Re-designs the reference's Glow-style conv templates
(ref:borealisflows/layers.py:452-689) as pure functions over explicit
parameter/state pytrees. BatchNorm running statistics — TF variables mutated
via assign_sub in the reference (ref:borealisflows/layers.py:378-401) — become
functional state threaded through apply calls.

All convs keep static shapes and NHWC layout so XLA tiles them onto the MXU
and fuses the elementwise tails (bias, BN, relu, tanh-rescale).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-4
BN_DECAY = 0.1
LOGSCALE_FACTOR = 3.0  # Glow zero-conv trick (ref:borealisflows/layers.py:671-673)


def conv2d_nhwc(x, w, padding: str = "SAME"):
    """Plain 2D conv, NHWC activations, HWIO weights."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# BatchNorm (functional; ref:borealisflows/layers.py:378-401)
# ---------------------------------------------------------------------------

def batch_norm_init(c: int) -> Dict[str, jnp.ndarray]:
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def batch_norm_apply(x, state, train: bool):
    """Normalize; in train mode use batch moments and emit updated running stats.

    Matches TF semantics: biased variance over all non-channel axes ((N,H,W)
    for conv activations, (N,) for dense); running stats updated as
    ``s -= decay * (s - batch_stat)`` (ref:borealisflows/layers.py:394-398).
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        m = jnp.mean(x, axis=axes)
        v = jnp.var(x, axis=axes)
        new_state = {
            "mean": state["mean"] - BN_DECAY * (state["mean"] - m),
            "var": state["var"] - BN_DECAY * (state["var"] - v),
        }
        x_hat = (x - m) * jax.lax.rsqrt(v + BN_EPS)
    else:
        new_state = state
        x_hat = (x - state["mean"]) * jax.lax.rsqrt(state["var"] + BN_EPS)
    return x_hat, new_state


# ---------------------------------------------------------------------------
# Glow edge padding + zero-init conv (ref:borealisflows/layers.py:555-583,651-674)
# ---------------------------------------------------------------------------

def _edge_pad_with_indicator(x):
    """Pad 1px of zeros spatially and append an indicator channel that is 1 on
    the padded border, 0 inside (ref:borealisflows/layers.py:555-583). The
    reference's zero-init conv sees width+1 input channels because of this."""
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ind = jnp.pad(jnp.zeros((h, w), x.dtype), ((1, 1), (1, 1)), constant_values=1.0)
    ind = jnp.broadcast_to(ind[None, :, :, None], (b, h + 2, w + 2, 1))
    return jnp.concatenate([xp, ind], axis=-1)


def conv_zeros_init(c_in: int, c_out: int, filter_size: int = 3,
                    edge_bias: bool = True) -> Dict[str, jnp.ndarray]:
    k_in = c_in + 1 if (edge_bias and filter_size > 1) else c_in
    return {
        "w": jnp.zeros((filter_size, filter_size, k_in, c_out), jnp.float32),
        "b": jnp.zeros((1, 1, 1, c_out), jnp.float32),
        "logs": jnp.zeros((1, c_out), jnp.float32),
    }


def conv_zeros_apply(p, x, edge_bias: bool = True):
    fs = p["w"].shape[0]
    if edge_bias and fs > 1:
        x = _edge_pad_with_indicator(x)
        y = conv2d_nhwc(x, p["w"], padding="VALID")
    else:
        y = conv2d_nhwc(x, p["w"], padding="SAME")
    y = y + p["b"]
    y = y * jnp.exp(p["logs"] * LOGSCALE_FACTOR).reshape(1, 1, 1, -1)
    return y


# ---------------------------------------------------------------------------
# real_nvp_conv_template (ref:borealisflows/layers.py:452-498)
# conv3x3(width) -> BN -> relu -> conv1x1(width) -> BN -> relu -> zero-conv3x3
# ---------------------------------------------------------------------------

def coupling_nn_init(rng, c_in: int, width: int, n_out: int):
    """n_out = 2 * (coupled channels) for shift+log_scale.

    Init std for hidden convs is ``width/512*0.05`` (ref:borealisflows/layers.py:599).
    """
    k1, k2 = jax.random.split(rng)
    std = width / 512.0 * 0.05
    params = {
        "l1_w": std * jax.random.normal(k1, (3, 3, c_in, width), jnp.float32),
        "l1_b": jnp.zeros((1, 1, 1, width), jnp.float32),
        "l2_w": std * jax.random.normal(k2, (1, 1, width, width), jnp.float32),
        "l2_b": jnp.zeros((1, 1, 1, width), jnp.float32),
        "last": conv_zeros_init(width, n_out, 3, edge_bias=True),
    }
    state = {"bn1": batch_norm_init(width), "bn2": batch_norm_init(width)}
    return params, state


def coupling_nn_apply(p, s, x, train: bool):
    """Returns (shift, log_scale, new_state)."""
    h = conv2d_nhwc(x, p["l1_w"]) + p["l1_b"]
    h, bn1 = batch_norm_apply(h, s["bn1"], train)
    h = jax.nn.relu(h)
    h = conv2d_nhwc(h, p["l2_w"]) + p["l2_b"]
    h, bn2 = batch_norm_apply(h, s["bn2"], train)
    h = jax.nn.relu(h)
    h = conv_zeros_apply(p["last"], h)
    shift, log_scale = jnp.split(h, 2, axis=-1)
    return shift, log_scale, {"bn1": bn1, "bn2": bn2}


# ---------------------------------------------------------------------------
# real_nvp_default_template (ref:borealisflows/layers.py:404-449)
# dense MLP over the flattened input half: [dense -> BN -> relu]* ->
# zero-init dense -> reshape -> split(shift, log_scale)
# ---------------------------------------------------------------------------

def coupling_mlp_init(rng, half_shape: Tuple[int, int, int],
                      hidden_layers: Tuple[int, ...],
                      shift_only: bool = False):
    """Dense-MLP coupling template. half_shape = (H, W, C//2)."""
    i0, i1, ic = half_shape
    in_units = i0 * i1 * ic
    out_units = (1 if shift_only else 2) * in_units
    params: Dict[str, jnp.ndarray] = {}
    state: Dict[str, Dict[str, jnp.ndarray]] = {}
    prev = in_units
    keys = jax.random.split(rng, max(len(hidden_layers), 1))
    for i, units in enumerate(hidden_layers):
        # TF dense default init: glorot uniform (ref:layers.py:424)
        lim = (6.0 / (prev + units)) ** 0.5
        params[f"d{i}_w"] = jax.random.uniform(
            keys[i], (prev, units), jnp.float32, -lim, lim)
        params[f"d{i}_b"] = jnp.zeros((units,), jnp.float32)
        state[f"bn{i}"] = batch_norm_init(units)
        prev = units
    # zero-init last dense => identity coupling at init (ref:layers.py:432-440)
    params["last_w"] = jnp.zeros((prev, out_units), jnp.float32)
    params["last_b"] = jnp.zeros((out_units,), jnp.float32)
    return params, state


def coupling_mlp_apply(p, s, x, train: bool, shift_only: bool = False):
    """Returns (shift, log_scale | None, new_state); x: [B, H, W, C//2]."""
    b, i0, i1, ic = x.shape
    h = x.reshape(b, i0 * i1 * ic)
    new_state = {}
    n_hidden = sum(1 for k in p if k.startswith("d") and k.endswith("_w"))
    for i in range(n_hidden):
        h = h @ p[f"d{i}_w"] + p[f"d{i}_b"]
        h, new_state[f"bn{i}"] = batch_norm_apply(h, s[f"bn{i}"], train)
        h = jax.nn.relu(h)
    h = h @ p["last_w"] + p["last_b"]
    if shift_only:
        return h.reshape(b, i0, i1, ic), None, new_state
    h = h.reshape(b, i0, i1, 2 * ic)
    shift, log_scale = jnp.split(h, 2, axis=-1)
    return shift, log_scale, new_state


# ---------------------------------------------------------------------------
# real_nvp_conv_template_iso (ref:borealisflows/layers.py:501-547,616-648)
# conv weights/biases are affine in ISO: w = B1*iso + B2, bias = C1*iso + C2.
# ---------------------------------------------------------------------------

def coupling_nn_iso_init(rng, c_in: int, width: int, n_out: int):
    k = jax.random.split(rng, 8)
    std = 0.05  # ref:borealisflows/layers.py:627 (init_sd fixed at 0.05)
    params = {
        "l1_B1": std * jax.random.normal(k[0], (3, 3, c_in, width), jnp.float32),
        "l1_B2": std * jax.random.normal(k[1], (3, 3, c_in, width), jnp.float32),
        "l1_C1": std * jax.random.normal(k[2], (1, 1, 1, width), jnp.float32),
        "l1_C2": std * jax.random.normal(k[3], (1, 1, 1, width), jnp.float32),
        "l2_B1": std * jax.random.normal(k[4], (1, 1, width, width), jnp.float32),
        "l2_B2": std * jax.random.normal(k[5], (1, 1, width, width), jnp.float32),
        "l2_C1": std * jax.random.normal(k[6], (1, 1, 1, width), jnp.float32),
        "l2_C2": std * jax.random.normal(k[7], (1, 1, 1, width), jnp.float32),
        "last": conv_zeros_init(width, n_out, 3, edge_bias=True),
    }
    state = {"bn1": batch_norm_init(width), "bn2": batch_norm_init(width)}
    return params, state


def coupling_nn_iso_apply(p, s, x, iso_scalar, train: bool):
    """iso_scalar: scalar ISO for the whole batch — the reference indexes
    ``iso[0]`` (ref:borealisflows/layers.py:633), i.e. conditioning is
    per-minibatch for the iso-weighted convs.
    Returns (shift, log_scale, new_state)."""
    w1 = p["l1_B1"] * iso_scalar + p["l1_B2"]
    h = conv2d_nhwc(x, w1) + (p["l1_C1"] * iso_scalar + p["l1_C2"])
    h, bn1 = batch_norm_apply(h, s["bn1"], train)
    h = jax.nn.relu(h)
    w2 = p["l2_B1"] * iso_scalar + p["l2_B2"]
    h = conv2d_nhwc(h, w2) + (p["l2_C1"] * iso_scalar + p["l2_C2"])
    h, bn2 = batch_norm_apply(h, s["bn2"], train)
    h = jax.nn.relu(h)
    h = conv_zeros_apply(p["last"], h)
    shift, log_scale = jnp.split(h, 2, axis=-1)
    return shift, log_scale, {"bn1": bn1, "bn2": bn2}
