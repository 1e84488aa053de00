"""Importer for the reference's shipped TensorFlow checkpoint.

The reference trains with TF1 ``tf.train.Saver`` and ships its best model at
``models/NoiseFlow/ckpt/model.ckpt.best`` (restored by
ref:borealisflows/NoiseFlowWrapper.py:43,77). This module maps every variable
in that checkpoint onto our functional param/state pytrees so the JAX model
runs the *published weights* directly — the golden-parity anchor for the whole
framework.

Name scheme in the checkpoint (verified against the shipped blob; produced by
ref:borealisflows/noise_flow_model.py:79-234 scopes):

    level{L}/bijector{i}/rescaling_scale0                      (every layer)
    level{L}/bijector{i}/Conv2d_1x1_{i}/L_vec_matpar_lu_conv2d_1x1_{i}_0
                                        U_vec_..., log_S_..., sign_S_..., P_...
    model/real_nvp_conv_template[_{k}]/l_1/{W,b} l_2/{W,b}
                                       l_last/{W,b,logs}
                                       bn_nvp_conv_{1,2}/{mean,var}
    model/sdn_gain/{beta1,beta2,cam_params,gain_params,gain_val}

The LU strict-triangular vectors use TFP ``fill_triangular`` ordering
(ref:borealisflows/matrix_param.py:31-97), NOT row-major — converted here.

TensorFlow is imported lazily (only to read the checkpoint); everything else
is numpy. Use ``convert_reference_model`` to write a TF-free npz once.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# TFP fill_triangular ordering (ref:matrix_param.py:31-56 via
# tfp.math.fill_triangular). For n*(n+1)/2 vector -> [n,n] triangular matrix.
# ---------------------------------------------------------------------------

def fill_triangular_np(vec: np.ndarray, upper: bool) -> np.ndarray:
    m = vec.shape[-1]
    n = int((np.sqrt(8 * m + 1) - 1) / 2)
    assert n * (n + 1) // 2 == m, f"vector length {m} is not triangular"
    if upper:
        xs = np.concatenate([vec, vec[n:][::-1]])
    else:
        xs = np.concatenate([vec[n:], vec[::-1]])
    x = xs.reshape(n, n)
    return np.triu(x) if upper else np.tril(x)


def tfp_vec_to_strict_tri(vec: np.ndarray, c: int, upper: bool) -> np.ndarray:
    """TFP-ordered strict-triangular vector -> full [c,c] strict-tri matrix
    (reproduces ref:matrix_param.py:31-56 ``_vec2stricttri`` padding)."""
    tri = fill_triangular_np(np.asarray(vec), upper)  # [c-1, c-1] incl. diag
    out = np.zeros((c, c), np.float32)
    if upper:
        out[:-1, 1:] = tri
    else:
        out[1:, :-1] = tri
    return out


def strict_tri_to_tfp_vec(mat: np.ndarray, upper: bool) -> np.ndarray:
    """Inverse of ``tfp_vec_to_strict_tri`` (for tests / export)."""
    c = mat.shape[0]
    trimmed = mat[:-1, 1:] if upper else mat[1:, :-1]
    n = c - 1
    m = n * (n + 1) // 2
    # invert the fill: build index map once
    idx = fill_triangular_np(np.arange(1, m + 1, dtype=np.float64), upper)
    vec = np.zeros((m,), mat.dtype)
    for i in range(n):
        for j in range(n):
            k = int(idx[i, j])
            if k > 0:
                vec[k - 1] = trimmed[i, j]
    return vec


# ---------------------------------------------------------------------------
# checkpoint reading
# ---------------------------------------------------------------------------

def read_tf_checkpoint(prefix: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF checkpoint prefix into a dict."""
    import tensorflow as tf  # lazy: only needed to decode the TensorBundle

    reader = tf.train.load_checkpoint(prefix)
    out = {}
    for name in reader.get_variable_to_shape_map():
        if "/Adam" in name or "_power" in name:
            continue  # optimizer slots (absent in the shipped ckpt, but safe)
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def has_tf_checkpoint(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "model.ckpt.best.index"))


# ---------------------------------------------------------------------------
# mapping onto the NoiseFlow pytrees
# ---------------------------------------------------------------------------

def _row_major_strict_vec(mat: np.ndarray, upper: bool) -> np.ndarray:
    """Our ops.conv1x1.strict_tri_to_vec ordering (np.tril/triu_indices)."""
    from noise_flow_tpu.ops.conv1x1 import strict_tri_to_vec
    return strict_tri_to_vec(mat, upper)


def import_reference_checkpoint(ckpt_prefix: str, flow, params, state
                                ) -> Tuple[dict, dict]:
    """Map a reference TF checkpoint into (params, state) for ``flow``.

    ``flow`` must be built from the matching hps (arch DSL path, decomp LU or
    NONE, n_levels levels). Returns new pytrees; raises if any checkpoint
    variable is left unconsumed or any expected variable is missing.
    """
    tf_vars = read_tf_checkpoint(ckpt_prefix)
    used = set()

    def take(name: str) -> np.ndarray:
        if name not in tf_vars:
            raise KeyError(f"checkpoint missing variable {name!r}")
        used.add(name)
        return tf_vars[name].astype(np.float32)

    import jax.numpy as jnp

    new_params = {"layers": [], "shared": dict(params.get("shared", {})),
                  "splits": list(params.get("splits", []))}
    new_state = {"layers": []}
    template_idx = 0  # tf.make_template instances are numbered in creation order

    for li, specs in enumerate(flow.level_specs):
        lp, ls = [], []
        for si, spec in enumerate(specs):
            p_old = params["layers"][li][si]
            s_old = state["layers"][li][si]
            # bijector index in the reference == arch token index, recoverable
            # from our reference-identical names (sdn_0, Conv2d_1x1_1, unc_1 ...)
            tok_idx = spec.name.rsplit("_", 1)[-1]
            scope = f"level{li}/bijector{tok_idx}"

            if spec.kind == "conv1x1":
                c = flow.level_shapes[li][-1]
                inner = f"{scope}/Conv2d_1x1_{tok_idx}"
                tag = f"matpar_lu_conv2d_1x1_{tok_idx}_0"
                if "mat" in p_old and "l_vec" in p_old["mat"]:
                    l_full = tfp_vec_to_strict_tri(
                        take(f"{inner}/L_vec_{tag}"), c, upper=False)
                    u_full = tfp_vec_to_strict_tri(
                        take(f"{inner}/U_vec_{tag}"), c, upper=True)
                    p = {"mat": {
                        "log_s": jnp.asarray(take(f"{inner}/log_S_{tag}")),
                        "l_vec": jnp.asarray(_row_major_strict_vec(l_full, False)),
                        "u_vec": jnp.asarray(_row_major_strict_vec(u_full, True)),
                    }}
                    s = {"frozen": {
                        "p": jnp.asarray(take(f"{inner}/P_{tag}")),
                        "sign_s": jnp.asarray(take(f"{inner}/sign_S_{tag}")),
                    }}
                elif "mat" in p_old and "A" in p_old["mat"]:
                    p = {"mat": {"A": jnp.asarray(
                        take(f"{inner}/A_matpar_none_conv2d_1x1_{tok_idx}_0"))}}
                    s = {"frozen": {}}
                else:
                    raise ValueError(
                        f"unsupported conv1x1 parameterization for import: "
                        f"{sorted(p_old.get('mat', {}))}")
                lp.append(p)
                ls.append(s)

            elif spec.kind == "coupling":
                suffix = "" if template_idx == 0 else f"_{template_idx}"
                template_idx += 1
                t = f"model/real_nvp_conv_template{suffix}"
                p = {
                    "nn": {
                        "l1_w": jnp.asarray(take(f"{t}/l_1/W")),
                        "l1_b": jnp.asarray(take(f"{t}/l_1/b")),
                        "l2_w": jnp.asarray(take(f"{t}/l_2/W")),
                        "l2_b": jnp.asarray(take(f"{t}/l_2/b")),
                        "last": {
                            "w": jnp.asarray(take(f"{t}/l_last/W")),
                            "b": jnp.asarray(take(f"{t}/l_last/b")),
                            "logs": jnp.asarray(take(f"{t}/l_last/logs")),
                        },
                    },
                    "rescale": jnp.asarray(take(f"{scope}/rescaling_scale0")),
                }
                s = {"nn": {
                    "bn1": {"mean": jnp.asarray(take(f"{t}/bn_nvp_conv_1/mean")),
                            "var": jnp.asarray(take(f"{t}/bn_nvp_conv_1/var"))},
                    "bn2": {"mean": jnp.asarray(take(f"{t}/bn_nvp_conv_2/mean")),
                            "var": jnp.asarray(take(f"{t}/bn_nvp_conv_2/var"))},
                }}
                lp.append(p)
                ls.append(s)

            elif spec.kind in ("sdn4", "sdn5", "sdn6", "gain4"):
                # real trainables live in the shared 'sdn_gain' group below
                lp.append({"rescale": jnp.asarray(
                    take(f"{scope}/rescaling_scale0"))})
                ls.append(s_old)

            elif spec.kind == "perm_reverse":
                lp.append(p_old)
                ls.append(s_old)

            else:
                raise NotImplementedError(
                    f"TF import not implemented for layer kind {spec.kind!r} "
                    f"(shipped checkpoint uses only the arch-DSL published "
                    f"model; extend the mapping for legacy archs)")
        new_params["layers"].append(lp)
        new_state["layers"].append(ls)

    if flow._needs_shared:
        new_params["shared"]["sdn_gain"] = {
            "gain_val": np.atleast_1d(take("model/sdn_gain/gain_val")),
            "gain_params": take("model/sdn_gain/gain_params").reshape(5),
            "beta1": np.atleast_1d(take("model/sdn_gain/beta1")),
            "beta2": np.atleast_1d(take("model/sdn_gain/beta2")),
            "cam_params": take("model/sdn_gain/cam_params"),
        }

    leftovers = sorted(set(tf_vars) - used)
    if leftovers:
        raise ValueError(f"unmapped checkpoint variables: {leftovers[:10]} "
                         f"(+{max(0, len(leftovers) - 10)} more)")
    return new_params, new_state


def convert_reference_model(model_dir: str, out_dir: str) -> str:
    """One-shot TF -> npz conversion of a reference model directory.

    Reads ``{model_dir}/hps.txt`` + ``{model_dir}/ckpt/model.ckpt.best`` and
    writes ``{out_dir}/hps.txt`` + ``{out_dir}/ckpt/model.ckpt-best.npz`` so
    ``NoiseFlowWrapper`` (and everything else) can load it without TF.
    """
    import shutil

    import jax

    from noise_flow_tpu.config import load_hps
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.utils.checkpoint import save_checkpoint

    cfg = load_hps(os.path.join(model_dir, "hps.txt"))
    ph = cfg.patch_height
    flow = NoiseFlow((ph, ph, cfg.n_channels), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    params, state = import_reference_checkpoint(
        os.path.join(model_dir, "ckpt", "model.ckpt.best"), flow, params, state)
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(os.path.join(model_dir, "hps.txt"),
                os.path.join(out_dir, "hps.txt"))
    path = save_checkpoint(os.path.join(out_dir, "ckpt"), "best",
                           params, state, None, epoch=0)
    return path
