"""Diagonal-Gaussian base measure (ref:borealisflows/noise_flow_model.py:525-541).

The flow's prior is a standard normal over the latent tensor; temperature
scaling multiplies the noise draw by ``temp`` before pushing it through the
forward pass (ref:noise_flow_model.py:499-504).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def diag_gaussian_logp(z, mean=None, logsd=None):
    """Per-sample log-density summed over non-batch dims.

    logp = -0.5 * (log 2pi + 2*logsd + (z-mean)^2 / exp(2*logsd))
    (ref:noise_flow_model.py:537-539)
    """
    if mean is None and logsd is None:
        logps = -0.5 * (_LOG_2PI + z * z)
    else:
        mean = 0.0 if mean is None else mean
        logsd = 0.0 if logsd is None else logsd
        logps = -0.5 * (_LOG_2PI + 2.0 * logsd + (z - mean) ** 2 / jnp.exp(2.0 * logsd))
    return jnp.sum(logps.reshape(z.shape[0], -1), axis=1)


def diag_gaussian_sample(rng, shape, temp=1.0, mean=None, logsd=None, dtype=jnp.float32):
    """z = mean + exp(logsd) * (eps * temp) (ref:noise_flow_model.py:499-504)."""
    eps = jax.random.normal(rng, shape, dtype) * temp
    if mean is None and logsd is None:
        return eps
    mean = 0.0 if mean is None else mean
    logsd = 0.0 if logsd is None else logsd
    return mean + jnp.exp(logsd) * eps
