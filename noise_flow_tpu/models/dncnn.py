"""DnCNN denoiser as pure JAX functions.

Re-design of the Keras model in ref:train_dncnn_noiseflow.py:77-105:
depth-9, 32 filters, 4 input channels, conv3x3 orthogonal init, interior
layers conv(no bias) + BatchNorm(momentum 0.0, eps 1e-4) + relu, final conv
(no bias) predicting the noise, residual head `output = input - noise`.

TPU notes: NHWC conv3x3 lowers onto the MXU; all layers fuse into one XLA
program. BN with Keras momentum 0.0 means running stats are REPLACED by each
batch's stats (new = batch), reproduced exactly here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-4


def _orthogonal_conv(rng, kh: int, kw: int, cin: int, cout: int) -> jnp.ndarray:
    """Orthogonal init over the flattened (kh*kw*cin, cout) matrix (Keras
    'Orthogonal', ref:train_dncnn_noiseflow.py:81-82)."""
    flat = jax.nn.initializers.orthogonal()(rng, (kh * kw * cin, cout))
    return flat.reshape(kh, kw, cin, cout)


def dncnn_init(rng, depth: int = 9, filters: int = 32,
               image_channels: int = 4, use_bnorm: bool = True):
    params: Dict = {"convs": [], "biases": {}}
    state: Dict = {"bn": []}
    keys = jax.random.split(rng, depth)
    # first layer: conv + bias + relu
    params["convs"].append(_orthogonal_conv(keys[0], 3, 3, image_channels, filters))
    params["biases"]["first"] = jnp.zeros((filters,))
    # interior: conv(no bias) + BN + relu
    params["bn_scale"] = []
    params["bn_bias"] = []
    for i in range(depth - 2):
        params["convs"].append(_orthogonal_conv(keys[i + 1], 3, 3, filters, filters))
        if use_bnorm:
            params["bn_scale"].append(jnp.ones((filters,)))
            params["bn_bias"].append(jnp.zeros((filters,)))
            state["bn"].append({"mean": jnp.zeros((filters,)),
                                "var": jnp.ones((filters,))})
    # last: conv(no bias) to image_channels
    params["convs"].append(_orthogonal_conv(keys[-1], 3, 3, filters, image_channels))
    return params, state


def _conv(x, w, dtype=None):
    if dtype is None:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # low-precision MXU compute; cast output back (TPU accumulates matmul
    # products in f32 internally). Explicit casts keep autodiff dtypes aligned.
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.astype(jnp.float32)


def dncnn_apply(params, state, x, train: bool,
                compute_dtype=None) -> Tuple[jnp.ndarray, Dict]:
    """Returns (denoised, new_state). Residual head: out = x - predicted_noise
    (ref:train_dncnn_noiseflow.py:102).

    compute_dtype: optional low-precision conv compute (e.g. jnp.bfloat16) —
    convs run on the MXU in that dtype with f32 accumulation; BN statistics,
    residual head, and params stay f32.
    """
    _c = lambda a, b: _conv(a, b, compute_dtype)
    h = jax.nn.relu(_c(x, params["convs"][0]) + params["biases"]["first"])
    new_bn = []
    use_bn = len(state["bn"]) > 0
    for i, w in enumerate(params["convs"][1:-1]):
        h = _c(h, w)
        if use_bn:
            if train:
                m = jnp.mean(h, axis=(0, 1, 2))
                v = jnp.var(h, axis=(0, 1, 2))
                # Keras momentum=0.0: running <- batch entirely
                new_bn.append({"mean": m, "var": v})
            else:
                m = state["bn"][i]["mean"]
                v = state["bn"][i]["var"]
                new_bn.append(state["bn"][i])
            h = (h - m) * jax.lax.rsqrt(v + BN_EPS)
            h = h * params["bn_scale"][i] + params["bn_bias"][i]
        h = jax.nn.relu(h)
    noise = _c(h, params["convs"][-1])
    return x - noise, {"bn": new_bn}


def dncnn_num_params(params) -> int:
    return int(sum(np.prod(np.shape(l))
                   for l in jax.tree_util.tree_leaves(params)))
