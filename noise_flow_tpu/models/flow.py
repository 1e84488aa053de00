"""NoiseFlow model: arch-DSL -> layer stack; NLL loss, sampling, priors.

Functional re-design of ref:borealisflows/noise_flow_model.py. The TF1 class
built a bijector list at graph-construction time and mutated variables; here
the model is a static spec (built once from the arch string) plus pure
``init/inverse/forward/loss/sample`` functions over parameter pytrees, so the
whole thing jits into a single fused XLA program per direction.

Arch DSL (ref:noise_flow_model.py:71-235): tokens split on '|'; ``unc``
expands to [permutation, affine coupling] where the permutation is a channel
reverse (flow_permutation=0), an invertible 1x1 conv (=1), or nothing; other
tokens are single conditional bijectors. The legacy revnet2d path
(ref:noise_flow_model.py:237-392) is supported via ``cfg.sidd_cond``/depth
when ``cfg.arch`` is empty.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.models import cond_params as cp
from noise_flow_tpu.models.layers import (
    SHARED_SDN_GAIN_KINDS,
    get_layer_def,
)
from noise_flow_tpu.ops.gaussian import diag_gaussian_logp, diag_gaussian_sample
from noise_flow_tpu.ops.nn import conv_zeros_apply, conv_zeros_init
from noise_flow_tpu.ops.squeeze import squeeze2d, unsqueeze2d


class LayerSpec(NamedTuple):
    kind: str
    name: str


def _arch_to_specs(cfg) -> List[LayerSpec]:
    """Arch token list -> layer specs, with reference-identical layer naming
    (ref:noise_flow_model.py:79-234 and models/NoiseFlow/hps.txt)."""
    specs: List[LayerSpec] = []
    for i, tok in enumerate(cfg.arch_tokens()):
        if tok == "unc":
            if cfg.flow_permutation == 0:
                specs.append(LayerSpec("perm_reverse", f"Permute_{i}"))
            elif cfg.flow_permutation == 1:
                specs.append(LayerSpec("conv1x1", f"Conv2d_1x1_{i}"))
            specs.append(LayerSpec("coupling", f"unc_{i}"))
        elif tok.startswith("sdn"):
            specs.append(LayerSpec(tok, f"sdn_{i}"))
        elif tok.startswith("gain"):
            specs.append(LayerSpec(tok, f"gain_{i}"))
        else:
            raise ValueError(f"unhandled arch token {tok!r}")
    return specs


def _revnet_specs(cfg) -> List[LayerSpec]:
    """Legacy Glow-style path (ref:noise_flow_model.py:237-392)."""
    specs: List[LayerSpec] = []
    if cfg.append_sdn2:
        specs.append(LayerSpec("fitSDN2", f"ac_fitSdnGain2_{cfg.depth}"))
    if cfg.append_sdn_first:
        specs.append(LayerSpec("fitSDN", f"ac_fitSdnGain_{cfg.depth}"))
    if cfg.append_cY:
        specs.append(LayerSpec("condY", "ac_cY_first"))
    cond_kind = {
        "condY": "condY", "condYG": "condYG", "condXY": "condXY",
        "condXYG": "condXYG", "condSDN": "condSDN", "fitSDN": "fitSDN",
    }.get(cfg.sidd_cond, "coupling")
    for i in range(max(cfg.depth, 0)):
        if cfg.flow_permutation == 0:
            specs.append(LayerSpec("perm_reverse", f"Permute_{i}"))
        elif cfg.flow_permutation == 1:
            specs.append(LayerSpec("conv1x1", f"Conv2d_1x1_{i}"))
        name = {"coupling": f"ac_unc_{i}", "condY": f"ac_cY_{i}",
                "condYG": f"ac_cYG_{i}", "condXY": f"ac_cXY_{i}",
                "condXYG": f"ac_cXYG_{i}", "condSDN": f"ac_cSDN_{i}",
                "fitSDN": f"ac_fitSDN_{i}"}[cond_kind]
        specs.append(LayerSpec(cond_kind, name))
    if cfg.append_sdn:
        specs.append(LayerSpec("fitSDN", f"ac_fitSDN_{cfg.depth}"))
    return specs


class NoiseFlow:
    """Conditional normalizing flow over [B,H,W,C] noise tensors."""

    def __init__(self, x_shape: Tuple[int, int, int], cfg):
        self.cfg = cfg
        self.x_shape = tuple(x_shape)
        self.n_levels = cfg.n_levels
        # per-level shapes after squeezing (ref:noise_flow_model.py:54-69)
        self.level_shapes: List[Tuple[int, int, int]] = []
        shape = list(self.x_shape)
        for i in range(self.n_levels):
            if cfg.squeeze_factor != 1:
                f = cfg.squeeze_factor
                if i == 0:
                    shape = [shape[0] // f, shape[1] // f, shape[2] * f * f]
                else:
                    shape = [shape[0] // f, shape[1] // f, shape[2] * 2]
            self.level_shapes.append(tuple(shape))
        base = _arch_to_specs(cfg) if cfg.arch else _revnet_specs(cfg)
        self.level_specs: List[List[LayerSpec]] = [list(base) for _ in range(self.n_levels)]
        self._defs = {s.kind: get_layer_def(s.kind, cfg) for lvl in self.level_specs for s in lvl}
        kinds = {s.kind for lvl in self.level_specs for s in lvl}
        self._needs_shared = bool(kinds & set(SHARED_SDN_GAIN_KINDS))
        self._npcam = 1 if "sdn6" in kinds else 3
        self.c_i = 1.0  # (ref:train_noise_flow.py:207)
        self._is_cond = bool(kinds - {"perm_reverse", "conv1x1", "coupling",
                                      "batch_norm", "leaky_relu"})

    # ----------------------------------------------------------------- init
    def init(self, rng, param_inits=None):
        params = {"layers": [], "shared": {}, "splits": []}
        state = {"layers": []}
        for li, specs in enumerate(self.level_specs):
            lp, ls = [], []
            for s in specs:
                rng, k = jax.random.split(rng)
                p, st = self._defs[s.kind].init(k, self.level_shapes[li], self.cfg)
                lp.append(p)
                ls.append(st)
            params["layers"].append(lp)
            state["layers"].append(ls)
            if li < self.n_levels - 1:
                c = self.level_shapes[li][-1] // 2
                params["splits"].append(conv_zeros_init(c, 2 * c, 3, edge_bias=True))
        if self._needs_shared:
            shared, self.c_i = cp.sdn_gain_shared_init(
                self.cfg.gain_init, param_inits, self._npcam)
            params["shared"]["sdn_gain"] = shared
        return params, state

    def _shared_view(self, params):
        sh = dict(params.get("shared", {}))
        sh["c_i"] = self.c_i
        return sh

    # ------------------------------------------------------------- inverse
    def inverse(self, params, state, x, cond, train: bool):
        """data -> latent; returns (z, objective[B], new_state).

        objective accumulates inverse log-det-jacobians and (between levels)
        the split-prior log-probs (ref:noise_flow_model.py:394-428).
        """
        shared = self._shared_view(params)
        z = x
        cond = dict(cond)
        obj = jnp.zeros((x.shape[0],), x.dtype)
        new_state = {"layers": []}
        f, st = self.cfg.squeeze_factor, self.cfg.squeeze_type
        for li in range(self.n_levels):
            z = squeeze2d(z, f, st)
            if cond.get("clean") is not None:
                cond["clean"] = squeeze2d(cond["clean"], f, st)
            new_lvl = []
            for s, p, stt in zip(self.level_specs[li], params["layers"][li],
                                 state["layers"][li]):
                z, ildj, nst = self._defs[s.kind].inverse(p, shared, stt, z, cond, train)
                obj = obj + ildj
                new_lvl.append(nst)
            new_state["layers"].append(new_lvl)
            if li < self.n_levels - 1:
                z, logp2 = _split2d(params["splits"][li], z)
                obj = obj + logp2
        return z, obj, new_state

    # ------------------------------------------------------------- forward
    def forward(self, params, state, z, cond, train: bool, rng=None, temp=1.0):
        """latent -> data (sampling direction, ref:noise_flow_model.py:430-447)."""
        shared = self._shared_view(params)
        x = z
        f, st = self.cfg.squeeze_factor, self.cfg.squeeze_type
        for li in reversed(range(self.n_levels)):
            if li < self.n_levels - 1:
                assert rng is not None, "multi-level sampling needs rng"
                rng, k = jax.random.split(rng)
                x = _split2d_reverse(params["splits"][li], x, k, temp)
            lvl_cond = dict(cond)
            if lvl_cond.get("clean") is not None:
                cc = lvl_cond["clean"]
                for _ in range(li + 1):
                    cc = squeeze2d(cc, f, st)
                lvl_cond["clean"] = cc
            for s, p, stt in zip(reversed(self.level_specs[li]),
                                 reversed(params["layers"][li]),
                                 reversed(state["layers"][li])):
                x, _, _ = self._defs[s.kind].forward(p, shared, stt, x, lvl_cond, train)
            x = unsqueeze2d(x, f, st)
        return x

    # ---------------------------------------------------------------- loss
    def loss(self, params, state, x, cond, train: bool):
        """Returns (mean NLL [nats/patch], sd_z, new_state)
        (ref:noise_flow_model.py:458-484)."""
        c = cond if self._is_cond else {"clean": None}
        z, obj, new_state = self.inverse(params, state, x, c, train)
        obj = obj + diag_gaussian_logp(z)
        nll = -obj
        var_z = jnp.var(z.reshape(z.shape[0], -1), axis=1)
        sd_z = jnp.mean(jnp.sqrt(var_z))
        return jnp.mean(nll), sd_z, new_state

    def nll_per_sample(self, params, state, x, cond, train: bool = False):
        c = cond if self._is_cond else {"clean": None}
        z, obj, _ = self.inverse(params, state, x, c, train)
        return -(obj + diag_gaussian_logp(z))

    # -------------------------------------------------------------- sample
    def sample(self, params, state, rng, cond, temp: float = 1.0,
               batch: Optional[int] = None, train: bool = False):
        """Temperature-scaled sampling (ref:noise_flow_model.py:449-456).

        NOTE: the reference's inference wrapper feeds is_training=True during
        sampling so coupling-NN batch norm uses batch statistics
        (ref:borealisflows/NoiseFlowWrapper.py:86); pass train=True to match.
        """
        if batch is None:
            batch = cond["clean"].shape[0]
        top_shape = self.level_shapes[-1]
        rng, k = jax.random.split(rng)
        z = diag_gaussian_sample(k, (batch,) + tuple(top_shape), temp)
        c = cond if self._is_cond else {"clean": None}
        return self.forward(params, state, z, c, train, rng=rng, temp=temp)

    # ------------------------------------------------------------- utility
    def get_layer_names(self) -> List[str]:
        return [s.name for lvl in self.level_specs for s in lvl]

    def num_params(self, params) -> int:
        return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params)))


# ---------------------------------------------------------------------------
# multi-scale split (ref:noise_flow_model.py:544-574)
# ---------------------------------------------------------------------------

def _split_prior(p_conv, z1):
    h = conv_zeros_apply(p_conv, z1)
    mean = h[..., 0::2]
    logs = h[..., 1::2]
    return mean, logs


def _split2d(p_conv, z):
    c = z.shape[-1]
    z1, z2 = z[..., : c // 2], z[..., c // 2:]
    mean, logs = _split_prior(p_conv, z1)
    logp2 = diag_gaussian_logp(z2, mean, logs)
    return z1, logp2


def _split2d_reverse(p_conv, z1, rng, temp):
    mean, logs = _split_prior(p_conv, z1)
    z2 = diag_gaussian_sample(rng, z1.shape, temp, mean, logs)
    return jnp.concatenate([z1, z2], axis=-1)
