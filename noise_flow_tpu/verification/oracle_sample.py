"""Standalone numpy SAMPLING oracle for the published reference checkpoint.

Forward direction (latent -> noise) of the published arch, evaluated purely
in numpy from the reference equations over the raw TF checkpoint variables —
the generative twin of ``oracle_nll``. Together they make both directions of
the flow independently cross-checked, which turns the parity-grid outlier
explanation (VERDICT r4 "What's weak" #6: IP cells drift to std_ratio 1.5)
into evidence: if the JAX sampler and this oracle produce the same output
for the same latent draw, the drift is a property of the published model,
not of this implementation.

Semantics notes:
- forward order is the REVERSE of the bijector list, each bijector's
  `_forward` (ref:borealisflows/noise_flow_model.py:431-449);
- AffineCoupling forward UN-shifts and UN-scales: y1 = (x1 - shift) *
  exp(-log_scale) (ref:layers.py:279-295);
- Conv2d1x1 forward convolves with A_inv (ref:layers.py:108-116), rebuilt
  here via numpy triangular solves (ref:matrix_param.py:133-136);
- BatchNorm inside the coupling template follows the wrapper's
  is_training=True quirk when ``bn_batch_stats`` (the reference samples
  with batch statistics, ref:borealisflows/NoiseFlowWrapper.py:86);
- sdn5 / gain4 forward MULTIPLY by their scale (ref:AffineCouplingSdnEx5.py
  :50-66, AffineCouplingGainEx4.py:49-65).
"""

from __future__ import annotations

import numpy as np

from noise_flow_tpu.verification.oracle_nll import (
    _bn_eval,
    _conv2d_same,
    _conv2d_valid,
    _edge_pad,
    _lu_matrix,
    _sdn5_scale,
    _EPS_BN,
)


def _bn_batch(x):
    """Training-mode BN: biased moments of THIS batch over (B, H, W)
    (ref:layers.py:378-401 training branch, no gamma/beta)."""
    m = x.mean(axis=(0, 1, 2))
    v = x.var(axis=(0, 1, 2))
    return (x - m) / np.sqrt(v + _EPS_BN)


def _inv_from_lu(v, scope: str, i: int):
    """A_inv = U^-1 L^-1 P^T via numpy triangular solves
    (ref:matrix_param.py:133-136)."""
    import scipy.linalg as sla

    a, _ = _lu_matrix(v, scope, i)  # also validates the rebuild
    tag = f"matpar_lu_conv2d_1x1_{i}_0"
    p = v[f"{scope}/P_{tag}"]
    sign_s = v[f"{scope}/sign_S_{tag}"]
    log_s = v[f"{scope}/log_S_{tag}"]
    from noise_flow_tpu.verification.oracle_nll import _vec2stricttri
    l = _vec2stricttri(v[f"{scope}/L_vec_{tag}"], upper=False)
    np.fill_diagonal(l, 1.0)
    u = _vec2stricttri(v[f"{scope}/U_vec_{tag}"], upper=True)
    np.fill_diagonal(u, sign_s * np.exp(log_s))
    li_p = sla.solve_triangular(l, p.T, lower=True)
    return sla.solve_triangular(u, li_p, lower=False).astype(np.float32)


def _conv_template(v, scope: str, x0: np.ndarray, bn_batch: bool):
    bn = _bn_batch if bn_batch else None
    h = _conv2d_same(x0, v[f"{scope}/l_1/W"]) + v[f"{scope}/l_1/b"]
    h = (bn(h) if bn_batch else
         _bn_eval(h, v[f"{scope}/bn_nvp_conv_1/mean"],
                  v[f"{scope}/bn_nvp_conv_1/var"]))
    h = np.maximum(h, 0.0)
    h = _conv2d_same(h, v[f"{scope}/l_2/W"]) + v[f"{scope}/l_2/b"]
    h = (bn(h) if bn_batch else
         _bn_eval(h, v[f"{scope}/bn_nvp_conv_2/mean"],
                  v[f"{scope}/bn_nvp_conv_2/var"]))
    h = np.maximum(h, 0.0)
    h = _conv2d_valid(_edge_pad(h), v[f"{scope}/l_last/W"])
    h = (h + v[f"{scope}/l_last/b"]) * np.exp(v[f"{scope}/l_last/logs"] * 3.0)
    c = h.shape[-1] // 2
    return h[..., :c], h[..., c:]


def oracle_sample(variables, z, clean, iso: float, cam: float,
                  temp: float = 1.0, bn_batch: bool = True,
                  arch: str = "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc"):
    """Noise sampled from latent `z` (standard normal) under the published
    weights — the reference's forward pass (ref:noise_flow_model.py:431-458)
    with temperature applied to z (sample2 semantics,
    ref:noise_flow_model.py:525-541)."""
    v = {k: np.asarray(a, np.float32) for k, a in variables.items()}
    x = np.asarray(z, np.float32) * float(temp)
    yy = np.asarray(clean, np.float32)
    b, h, w, c = x.shape
    toks = arch.split("|")
    unc_total = sum(t == "unc" for t in toks)
    unc_seen = unc_total
    for i in reversed(range(len(toks))):
        tok = toks[i]
        if tok == "sdn5":
            x = x * _sdn5_scale(v, yy, iso, cam)
        elif tok == "gain4":
            x = x * float(v["model/sdn_gain/gain_val"][0])
        elif tok == "unc":
            # coupling forward FIRST (reverse of the inverse order:
            # [conv1x1, coupling] applies as coupling then conv)
            unc_seen -= 1
            suffix = "" if unc_seen == 0 else f"_{unc_seen}"
            scope = f"model/real_nvp_conv_template{suffix}"
            x0, x1 = x[..., :c // 2], x[..., c // 2:]
            shift, raw = _conv_template(v, scope, x0, bn_batch)
            rescale = v[f"level0/bijector{i}/rescaling_scale0"]
            log_scale = rescale * np.tanh(raw)
            y1 = (x1 - shift) * np.exp(-log_scale)
            x = np.concatenate([x0, y1], axis=3)
            a_inv = _inv_from_lu(v, f"level0/bijector{i}/Conv2d_1x1_{i}", i)
            x = np.einsum("bhwc,cd->bhwd", x, a_inv)
        else:
            raise ValueError(f"oracle does not implement arch token {tok!r}")
    return x
