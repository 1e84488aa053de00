"""Invertible 1x1 convolution matrix parameterizations.

Re-design of ref:borealisflows/matrix_param.py:23-204 for JAX:

- ``NONE``: store A directly; inverse + slogdet computed on the fly.
- ``LU``: trainable P·L·U with strict-triangular vectorized storage; logdet is
  O(C) as sum(log_s); inverse via two triangular solves.
- ``LU2``: LU with full-matrix storage and (optionally) float64 compute — kept
  for parity; on TPU f64 is emulated so this defaults to f32 unless jax x64 is
  enabled.

Channel counts here are tiny (C=4 for packed Bayer), so all of this is
negligible compute; what matters is that logdet stays O(C) under autodiff and
the built matrices are constants w.r.t. the batch so XLA hoists them out of
the per-sample conv.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def _tri_indices(c: int, upper: bool):
    if upper:
        return np.triu_indices(c, k=1)
    return np.tril_indices(c, k=-1)


def strict_tri_to_vec(m: np.ndarray, upper: bool) -> np.ndarray:
    i, j = _tri_indices(m.shape[0], upper)
    return np.asarray(m)[i, j]


def vec_to_strict_tri(v, c: int, upper: bool):
    i, j = _tri_indices(c, upper)
    out = jnp.zeros((c, c), v.dtype)
    return out.at[i, j].set(v)


def orthogonal_init(rng_np: np.random.Generator, c: int) -> np.ndarray:
    """QR-orthogonal init (ref:borealisflows/layers.py:95)."""
    return scipy.linalg.qr(rng_np.standard_normal((c, c)))[0].astype(np.float32)


def matrix_param_init(decomp: str, init_a: np.ndarray) -> Dict[str, jnp.ndarray]:
    """Returns {'trainable': {...}, 'frozen': {...}} parameter groups."""
    c = init_a.shape[0]
    if decomp == "NONE" or c <= 1:
        return {"trainable": {"A": jnp.asarray(init_a, jnp.float32)}, "frozen": {}}
    p, l, u = scipy.linalg.lu(init_a)
    s = np.diag(u)
    sign_s = np.sign(s)
    log_s = np.log(np.abs(s))
    u_strict = np.triu(u, k=1)
    if decomp == "LU":
        return {
            "trainable": {
                "log_s": jnp.asarray(log_s, jnp.float32),
                "l_vec": jnp.asarray(strict_tri_to_vec(l, upper=False), jnp.float32),
                "u_vec": jnp.asarray(strict_tri_to_vec(u_strict, upper=True), jnp.float32),
            },
            "frozen": {
                "p": jnp.asarray(p, jnp.float32),
                "sign_s": jnp.asarray(sign_s, jnp.float32),
            },
        }
    if decomp == "LU2":
        # full-matrix storage variant (ref:matrix_param.py:143-188)
        return {
            "trainable": {
                "log_s": jnp.asarray(log_s, jnp.float32),
                "l": jnp.asarray(np.tril(l, k=-1), jnp.float32),
                "u": jnp.asarray(u_strict, jnp.float32),
            },
            "frozen": {
                "p": jnp.asarray(p, jnp.float32),
                "sign_s": jnp.asarray(sign_s, jnp.float32),
            },
        }
    raise ValueError(f"unknown decomp {decomp!r}")


def matrix_param_build(decomp: str, params) -> Dict[str, jnp.ndarray]:
    """Builds {'A', 'A_inv', 'log_abs_det'} from the parameter group.

    A maps data->latent (applied in ``inverse``); A_inv is used when sampling
    (ref:borealisflows/layers.py:108-130).
    """
    t, f = params["trainable"], params["frozen"]
    if decomp == "NONE" or "A" in t:
        a = t["A"]
        a_inv = jnp.linalg.inv(a)
        _, log_abs_det = jnp.linalg.slogdet(a)
        return {"A": a, "A_inv": a_inv, "log_abs_det": log_abs_det}

    c = t["log_s"].shape[0]
    if decomp == "LU":
        l = vec_to_strict_tri(t["l_vec"], c, upper=False) + jnp.eye(c, dtype=jnp.float32)
        u = vec_to_strict_tri(t["u_vec"], c, upper=True) + jnp.diag(
            f["sign_s"] * jnp.exp(t["log_s"]))
    else:  # LU2
        mask_l = jnp.tril(jnp.ones((c, c), jnp.float32), k=-1)
        l = t["l"] * mask_l + jnp.eye(c, dtype=jnp.float32)
        u = t["u"] * mask_l.T + jnp.diag(f["sign_s"] * jnp.exp(t["log_s"]))
    p = f["p"]
    a = p @ (l @ u)
    # A_inv = U^-1 L^-1 P^T via triangular solves (ref:matrix_param.py:133-136)
    p_inv = p.T
    li_p = jax.scipy.linalg.solve_triangular(l, p_inv, lower=True)
    a_inv = jax.scipy.linalg.solve_triangular(u, li_p, lower=False)
    log_abs_det = jnp.sum(t["log_s"])
    return {"A": a, "A_inv": a_inv, "log_abs_det": log_abs_det}
