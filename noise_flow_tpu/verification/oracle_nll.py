"""Standalone numpy NLL oracle for the published reference checkpoint.

Evaluates the published arch ``sdn5|unc x4|gain4|unc x4`` in eval mode
(running BN statistics) directly from the reference's equations, reading the
raw TF checkpoint variables by their original names — sharing NO code with
``noise_flow_tpu.models`` / ``noise_flow_tpu.ops``. Its purpose is to break
the self-reference of the golden-NLL constant in ``tests/test_tf_import.py``:
that constant was recorded from the JAX implementation, and the reference's
own TF-1.12 graph cannot run under the installed TF 2.x, so a quirk error
that shifted the JAX NLL and the golden identically would otherwise be
invisible. This oracle is a second, independent evaluation of the same
equations; ``tests/test_oracle_nll.py`` pins the two against each other.

Equation sources (each function cites its exact origin):
- model inverse pass + prior:  ref:borealisflows/noise_flow_model.py:394-428,458-506
- AffineCoupling / Conv2d1x1:  ref:borealisflows/layers.py:74-146,251-375
- conv template (zero-conv, edge indicator, eval BN):
                               ref:borealisflows/layers.py:378-400,452-499,555-665
- sdn5 / gain4 conditioning:   ref:borealisflows/noise_flow_layers/cond_utils.py:205-239,432-440
- LU matrix param:             ref:borealisflows/matrix_param.py:31-141
"""

from __future__ import annotations

import numpy as np

_EPS_BN = 1e-4  # ref:layers.py:372 batch_norm eps
_ISO_VALS = np.array([100, 400, 800, 1600, 3200], np.float32)
_C_I = 1.0  # param_inits c_i (ref:train_noise_flow.py:206)


# ----------------------------------------------------------- LU (matrix_param)
def _fill_triangular(vec: np.ndarray, upper: bool) -> np.ndarray:
    """tfp.math.fill_triangular semantics (the documented examples:
    [1..6] -> [[4,0,0],[6,5,0],[3,2,1]] lower, [[1,2,3],[0,5,6],[0,0,4]]
    upper), re-derived here independently of utils.tf_import."""
    m = vec.shape[0]
    n = int(round((np.sqrt(8 * m + 1) - 1) / 2))
    assert n * (n + 1) // 2 == m
    if upper:
        xs = np.concatenate([vec, vec[n:][::-1]])
        return np.triu(xs.reshape(n, n))
    xs = np.concatenate([vec[n:], vec[::-1]])
    return np.tril(xs.reshape(n, n))


def _vec2stricttri(vec: np.ndarray, upper: bool) -> np.ndarray:
    """ref:matrix_param.py:31-56 — fill_triangular then pad to strict."""
    tri = _fill_triangular(vec, upper)
    if upper:  # pad one row at the bottom, one column at the left
        return np.pad(tri, ((0, 1), (1, 0)))
    return np.pad(tri, ((1, 0), (0, 1)))  # one row top, one column right


def _lu_matrix(v, scope: str, i: int):
    """Rebuild A = P @ L @ U and log|det| from the checkpoint's LU vectors
    (ref:matrix_param.py:102-141)."""
    tag = f"matpar_lu_conv2d_1x1_{i}_0"
    p = v[f"{scope}/P_{tag}"]
    sign_s = v[f"{scope}/sign_S_{tag}"]
    log_s = v[f"{scope}/log_S_{tag}"]
    l = _vec2stricttri(v[f"{scope}/L_vec_{tag}"], upper=False)
    np.fill_diagonal(l, 1.0)
    u = _vec2stricttri(v[f"{scope}/U_vec_{tag}"], upper=True)
    np.fill_diagonal(u, sign_s * np.exp(log_s))
    return (p @ l @ u).astype(np.float32), float(np.sum(log_s))


# ------------------------------------------------------------------ conv math
def _conv2d_same(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """stride-1 SAME conv, NHWC x [kh,kw,Cin,Cout] (ref:layers.py:586-614)."""
    kh, kw = w.shape[:2]
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    b, h, wd = x.shape[:3]
    out = np.zeros((b, h, wd, w.shape[3]), np.float32)
    for di in range(kh):
        for dj in range(kw):
            out += np.einsum("bhwc,cd->bhwd", xp[:, di:di + h, dj:dj + wd],
                             w[di, dj])
    return out


def _edge_pad(x: np.ndarray) -> np.ndarray:
    """ref:layers.py:555-584 add_edge_padding for a 3x3 filter: zero-pad by 1
    and append an indicator channel that is 1 exactly on the padded ring."""
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ind = np.zeros(xp.shape[:3] + (1,), np.float32)
    ind[:, :1] = ind[:, -1:] = 1.0
    ind[:, :, :1] = ind[:, :, -1:] = 1.0
    return np.concatenate([xp, ind], axis=3)


def _conv2d_valid(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    kh, kw = w.shape[:2]
    b, hp, wp = x.shape[:3]
    h, wd = hp - kh + 1, wp - kw + 1
    out = np.zeros((b, h, wd, w.shape[3]), np.float32)
    for di in range(kh):
        for dj in range(kw):
            out += np.einsum("bhwc,cd->bhwd", x[:, di:di + h, dj:dj + wd],
                             w[di, dj])
    return out


def _bn_eval(x, mean, var):
    """functional batch_norm, eval branch (ref:layers.py:375-400): no
    gamma/beta, just normalize by the stored running moments."""
    return (x - mean) / np.sqrt(var + _EPS_BN)


def _conv_template(v, scope: str, x0: np.ndarray):
    """real_nvp_conv_template eval path (ref:layers.py:452-499):
    conv3x3 -> BN -> relu -> conv1x1 -> BN -> relu -> zero-conv3x3 with edge
    indicator and logscale_factor=3 (ref:layers.py:651-665); split into
    (shift, log_scale)."""
    h = _conv2d_same(x0, v[f"{scope}/l_1/W"]) + v[f"{scope}/l_1/b"]
    h = np.maximum(_bn_eval(h, v[f"{scope}/bn_nvp_conv_1/mean"],
                            v[f"{scope}/bn_nvp_conv_1/var"]), 0.0)
    h = _conv2d_same(h, v[f"{scope}/l_2/W"]) + v[f"{scope}/l_2/b"]
    h = np.maximum(_bn_eval(h, v[f"{scope}/bn_nvp_conv_2/mean"],
                            v[f"{scope}/bn_nvp_conv_2/var"]), 0.0)
    h = _conv2d_valid(_edge_pad(h), v[f"{scope}/l_last/W"])
    h = h + v[f"{scope}/l_last/b"]
    h = h * np.exp(v[f"{scope}/l_last/logs"] * 3.0)
    c = h.shape[-1] // 2
    return h[..., :c], h[..., c:]


# --------------------------------------------------------------- conditioning
def _sdn5_scale(v, yy, iso, cam):
    """sdn_model_params_ex5 (ref:cond_utils.py:205-239): camera-scaled
    exponential betas + per-ISO gain, shared 'sdn_gain' variable group."""
    cam_idx = int(cam)
    iso_idx = int(np.argmax(_ISO_VALS == iso))
    one_cam = np.exp(_C_I * v["model/sdn_gain/cam_params"][:, cam_idx])
    g = v["model/sdn_gain/gain_params"][iso_idx]
    gain = np.exp(_C_I * g * one_cam[2]) * iso
    beta1 = np.exp(_C_I * v["model/sdn_gain/beta1"][0] * one_cam[0])
    beta2 = np.exp(_C_I * v["model/sdn_gain/beta2"][0] * one_cam[1])
    return np.sqrt(beta1 * yy / gain + beta2)


# -------------------------------------------------------------------- the NLL
def oracle_nll(variables, x, clean, iso: float, cam: float,
               arch: str = "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc"):
    """Mean NLL of noise `x` given `clean` under the published weights, in
    eval mode — the reference's _loss (ref:noise_flow_model.py:460-489):
    inverse pass accumulating inverse log-dets, then the standard-normal
    base measure; nll = mean(-(objective + logp(z))).

    variables: raw checkpoint name->array dict
    (utils.tf_import.read_tf_checkpoint or the shipped-npz equivalent).
    """
    v = {k: np.asarray(a, np.float32) for k, a in variables.items()}
    z = np.asarray(x, np.float32).copy()
    yy = np.asarray(clean, np.float32)
    b, h, w, c = z.shape
    obj = np.zeros((b,), np.float32)
    unc_seen = 0
    for i, tok in enumerate(arch.split("|")):
        if tok == "sdn5":
            # AffineCouplingSdnEx5._inverse_and_log_det_jacobian
            # (ref:AffineCouplingSdnEx5.py:119-133): x = y / scale,
            # ildj = -sum(log scale) over pixels
            scale = _sdn5_scale(v, yy, iso, cam)
            z = z / scale
            obj += -np.sum(np.log(scale), axis=(1, 2, 3))
        elif tok == "gain4":
            # AffineCouplingGainEx4 (ref:AffineCouplingGainEx4.py:114-127):
            # scalar gain_val broadcast over the tensor, full pixel reduce
            # (ref:cond_utils.py:432-440)
            scale = float(v["model/sdn_gain/gain_val"][0])
            z = z / scale
            obj += -np.log(scale) * (h * w * c)
        elif tok == "unc":
            # Conv2d1x1 inverse: conv with A, ildj = log|det| * H * W
            # (ref:layers.py:118-130)
            a_mat, log_det = _lu_matrix(
                v, f"level0/bijector{i}/Conv2d_1x1_{i}", i)
            z = np.einsum("bhwc,cd->bhwd", z, a_mat)
            obj += log_det * (h * w)
            # AffineCoupling inverse: scale-and-shift the top half from the
            # bottom half, ildj = +sum(log_scale) (ref:layers.py:297-311,
            # 358-375); log_scale = rescaling_scale * tanh(raw)
            suffix = "" if unc_seen == 0 else f"_{unc_seen}"
            scope = f"model/real_nvp_conv_template{suffix}"
            unc_seen += 1
            y0, y1 = z[..., :c // 2], z[..., c // 2:]
            shift, raw = _conv_template(v, scope, y0)
            rescale = v[f"level0/bijector{i}/rescaling_scale0"]
            log_scale = rescale * np.tanh(raw)
            x1 = y1 * np.exp(log_scale) + shift
            z = np.concatenate([y0, x1], axis=3)
            obj += np.sum(log_scale, axis=(1, 2, 3))
        else:
            raise ValueError(f"oracle does not implement arch token {tok!r}")
    # prior: zero-mean unit-logsd diagonal Gaussian
    # (ref:noise_flow_model.py:489-506,525-541)
    logp = np.sum(-0.5 * (np.log(2 * np.pi) + z ** 2), axis=(1, 2, 3))
    nll = -(obj + logp)
    sd_z = float(np.mean(np.std(z.reshape(b, -1), axis=1)))
    return float(np.mean(nll)), sd_z
