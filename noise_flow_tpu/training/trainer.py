"""Training/eval/sampling orchestration.

Re-design of ref:train_noise_flow.py:30-541. The reference drove one TF
session from 16 hogwild Python threads (ref:train_noise_flow.py:30-77) — all
of that collapses into ONE jitted, sharded train step: batch sharded over the
'data' mesh axis, parameters replicated, gradient all-reduce inserted by XLA,
BN state threaded functionally (no races, bitwise deterministic).

Epoch schedule, TSV logs (train/test/sample.txt columns), best-model tracking,
and the NLL_G/NLL_SDN baseline columns match the reference
(ref:train_noise_flow.py:334-348,384-535).
"""

from __future__ import annotations

import logging
import os
import signal
import threading
import time
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from noise_flow_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_stacked,
)
from noise_flow_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from noise_flow_tpu.utils.logger import ResultLogger
from noise_flow_tpu.utils.metrics import calc_kldiv_mb, kl_div_3_data
from noise_flow_tpu.utils.profiling import PhaseTimers


def _timed_iter(it, timers, name: str):
    """Yield from `it`, charging the time spent INSIDE the iterator (host
    input: decode/patch/batch assembly) to timers[name] — the input-vs-step
    attribution the reference's tr/ts/tv status line never had."""
    it = iter(it)
    while True:
        with timers.phase(name):
            try:
                mb = next(it)
            except StopIteration:
                return
        yield mb


def make_optimizer(cfg):
    """Adam beta1=.9 beta2=.999 eps=1e-8, or SGD momentum .9
    (ref:train_noise_flow.py:187-198).

    The update is wrapped in optax.flatten: the flow is ~143 tiny leaves
    (2433 scalars total), and per-leaf optimizer math costs ~300 extra
    kernel launches per step; flattening runs the identical elementwise
    update on one fused vector."""
    if cfg.optim == "adam":
        opt = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optim == "sgd":
        opt = optax.sgd(cfg.lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optim!r}")
    return optax.flatten(opt)


def batch_to_cond(mb: Dict) -> Dict:
    return {
        "clean": mb["_y"],
        "nlf0": mb["nlf0"], "nlf1": mb["nlf1"],
        "iso": mb["iso"], "cam": mb["cam"],
    }


def _pick_block(b: int, target: int = 128, stretch: int = 0) -> int:
    """Largest divisor of the batch <= target, used as the fused kernel's
    per-grid-step block. b <= target keeps ghost BN == exact batch BN.

    The cap is set by the BACKWARD kernel's VMEM footprint: it stashes ~9
    residual tiles of [bt, 32, 128] f32 per coupling while recomputing
    (ops/pallas_train.py); bt=128 keeps a 4-coupling segment under ~80 MB
    and measured fastest on one chip (237k patches/s at batch 2048 bf16,
    vs 219k at bt=64).

    stretch > 0 also considers divisors in (target, target+stretch] and
    takes one when it needs FEWER grid blocks than the <=target choice:
    the one-shot kernel has a measured ~365 us per-CALL floor plus ~130 us
    per block (experiments/b138_kernel_scaling_dep.json), so b=138 runs
    faster as 2 blocks of 69 than 3 of 46; bt=69 was measured inside the
    VMEM envelope (the cap at 64 is conservative)."""
    if b <= target:
        return b
    bt = b
    for cand in range(target, 0, -1):
        if b % cand == 0:
            bt = cand
            break
    for cand in range(target + stretch, target, -1):
        if b % cand == 0 and b // cand < b // bt:
            return cand
    return bt


class Trainer:
    def __init__(self, flow, cfg, mesh=None, param_inits=None):
        self.flow = flow
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        self.optimizer = make_optimizer(cfg)
        self.timers = PhaseTimers()  # input/step wall-clock attribution
        self.params, self.state = flow.init(
            jax.random.PRNGKey(cfg.seed), param_inits)
        # condSDN is a non-trainable baseline: evaluate only, never step
        # (ref:train_noise_flow.py:189).
        self.trainable = cfg.sidd_cond != "condSDN"
        self.opt_state = self.optimizer.init(self.params)
        self.params = replicate(self.mesh, self.params)
        self.state = replicate(self.mesh, self.state)
        self.opt_state = replicate(self.mesh, self.opt_state)
        # fused Pallas NLL/backward path (ops/pallas_train.py). NOTE: for
        # batches larger than the kernel block this uses ghost-BN semantics
        # (per-block batch moments) — see the module docstring. The one-shot
        # default path blocks at _pick_block(b, target=64, stretch=8), so
        # exact-batch-BN parity with the reference holds for batch <= 64
        # there (the segment path blocks at 128); batch 128 runs as two
        # ghost-BN blocks of 64 (pinned by tests/test_fused_train.py oneshot
        # b=128/bt=64), batch 138 as two blocks of 69. The measured ghost-vs-
        # exact trajectory delta at the published batch is committed in
        # experiments/sidd/bn_delta/ (VERDICT r4 item 3); force the exact
        # path with use_pallas=False.
        self._fused_cache = {}
        self._step_cache = {}
        self.use_fused = False
        self.use_oneshot = False
        if getattr(cfg, "use_pallas", False):
            from noise_flow_tpu.ops.pallas_train import FusedFlow, FusedTrainStep
            try:
                FusedFlow(flow, bt=8)  # envelope check only
                self.use_fused = True
                self._fused_cls = FusedFlow
            except ValueError as e:
                import logging
                logging.getLogger(__name__).warning(
                    "use_pallas requested but arch outside the fused "
                    "envelope (%s); falling back to the XLA path", e)
            if self.use_fused:
                # one-shot loss+grad kernel (fwd once, in-kernel backward);
                # falls back to the custom_vjp segment path outside its
                # envelope (e.g. > 4 scale layers)
                try:
                    FusedTrainStep(flow, bt=8)
                    self.use_oneshot = getattr(cfg, "pallas_oneshot", True)
                    self._step_cls = FusedTrainStep
                except ValueError:
                    pass
        self._build_steps()

    # Distinct kernel-block sizes a Trainer keeps alive at once. The fused/
    # one-shot builder dicts FIFO-evict past this, like wrapper._jitted; the
    # compiled Mosaic executables themselves live in the outer jitted steps'
    # caches (keyed by batch shape), so eviction also clears those — a
    # batch-size sweep can no longer accumulate executables without bound.
    _KERNEL_CACHE_MAX = 4

    def _warn_new_kernel(self, cache, bt: int, what: str):
        """Each new block size means a fresh multi-minute Mosaic compile over
        a tunneled chip — make that visible instead of silent (a batch-size
        sweep or ragged epoch tails would otherwise stack them up quietly)."""
        if cache:
            logging.getLogger(__name__).warning(
                "%s: new kernel block bt=%d (known: %s) — unseen batch "
                "divisor triggers a fresh Pallas compile; keep batch sizes "
                "block-aligned to avoid this", what, bt, sorted(cache))
        if len(cache) >= self._KERNEL_CACHE_MAX:
            evicted = next(iter(cache))
            cache.pop(evicted)
            logging.getLogger(__name__).warning(
                "%s: kernel cache full (max %d) — evicting bt=%d and "
                "clearing compiled step caches", what,
                self._KERNEL_CACHE_MAX, evicted)
            for fn in (self._train_step, self._train_scan,
                       self._train_scan_idx, self._eval_scan_idx,
                       self._eval_step):
                fn.clear_cache()

    def _fused_for_batch(self, b: int):
        bt = _pick_block(b)
        if bt not in self._fused_cache:
            self._warn_new_kernel(self._fused_cache, bt, "fused loss")
            dtype = (jnp.bfloat16
                     if getattr(self.cfg, "pallas_train_dtype",
                                "bfloat16") == "bfloat16" else jnp.float32)
            self._fused_cache[bt] = self._fused_cls(self.flow, bt=bt,
                                                    mm_dtype=dtype)
        return self._fused_cache[bt]

    @staticmethod
    def _pack_batch(batch):
        """NHWC [B,32,32,4] -> packed [B,32,128] views (free reshapes)."""
        b = batch["_x"].shape[0]
        xp = batch["_x"].reshape(b, 32, 128)
        cond = batch_to_cond(batch)
        cond["clean"] = cond["clean"].reshape(b, 32, 128)
        return xp, cond

    def _fused_loss(self, params, state, batch, train: bool):
        """Fused-kernel loss, shard_map'd over the data mesh when it has more
        than one device (a Pallas call is opaque to the auto-partitioner, so
        each device runs its own kernel over its batch shard; metrics and BN
        updates pmean over the axis — XLA turns the grad psum into the usual
        data-parallel all-reduce under value_and_grad)."""
        xp, cond = self._pack_batch(batch)
        if self.mesh.size == 1:
            ff = self._fused_for_batch(xp.shape[0])
            return ff.loss(params, state, xp, cond, train)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        trainer = self

        def local(p_, st_, xp_, cond_):
            ff = trainer._fused_for_batch(xp_.shape[0])
            nll, sd_z, new_state = ff.loss(p_, st_, xp_, cond_, train)
            nll = jax.lax.pmean(nll, axis)
            sd_z = jax.lax.pmean(sd_z, axis)
            new_state = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, axis), new_state)
            return nll, sd_z, new_state

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # metadata, which the checker would otherwise require
        return shard_map(local, mesh=self.mesh,
                         in_specs=(P(), P(), P(axis), P(axis)),
                         out_specs=(P(), P(), P()),
                         check_vma=False)(params, state, xp, cond)

    def _step_for_batch(self, b: int):
        bt = _pick_block(b, target=64, stretch=8)
        if bt not in self._step_cache:
            self._warn_new_kernel(self._step_cache, bt, "one-shot step")
            dtype = (jnp.bfloat16
                     if getattr(self.cfg, "pallas_train_dtype",
                                "bfloat16") == "bfloat16" else jnp.float32)
            self._step_cache[bt] = self._step_cls(self.flow, bt=bt,
                                                  mm_dtype=dtype)
        return self._step_cache[bt]

    def _fused_loss_grad(self, params, state, batch):
        """One-shot fused loss AND grads (ops/pallas_train.FusedTrainStep),
        shard_map'd over the data mesh like _fused_loss; grads pmean over
        the axis (the explicit form of the DP gradient all-reduce)."""
        xp, cond = self._pack_batch(batch)
        if self.mesh.size == 1:
            fs = self._step_for_batch(xp.shape[0])
            return fs.loss_and_grad(params, state, xp, cond)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        trainer = self

        def local(p_, st_, xp_, cond_):
            fs = trainer._step_for_batch(xp_.shape[0])
            nll, sd_z, new_state, grads = fs.loss_and_grad(p_, st_, xp_,
                                                           cond_)
            pm = lambda t: jax.lax.pmean(t, axis)  # noqa: E731
            return (pm(nll), pm(sd_z),
                    jax.tree_util.tree_map(pm, new_state),
                    jax.tree_util.tree_map(pm, grads))

        return shard_map(local, mesh=self.mesh,
                         in_specs=(P(), P(), P(axis), P(axis)),
                         out_specs=(P(), P(), P(), P()),
                         check_vma=False)(params, state, xp, cond)

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        flow, optimizer = self.flow, self.optimizer
        trainer = self

        def train_step(params, state, opt_state, batch):
            if trainer.use_oneshot:
                # single-kernel loss+grad (analytic cotangents; no separate
                # primal forward) — see ops/pallas_train.FusedTrainStep
                nll, sd_z, new_state, grads = trainer._fused_loss_grad(
                    params, state, batch)
            else:
                def loss_fn(p):
                    if trainer.use_fused:
                        nll, sd_z, new_state = trainer._fused_loss(
                            p, state, batch, train=True)
                    else:
                        nll, sd_z, new_state = flow.loss(
                            p, state, batch["_x"], batch_to_cond(batch),
                            train=True)
                    return nll, (sd_z, new_state)

                (nll, (sd_z, new_state)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt, nll, sd_z

        def eval_step(params, state, batch):
            if trainer.use_fused:
                nll, sd_z, _ = trainer._fused_loss(
                    params, state, batch, train=False)
            else:
                nll, sd_z, _ = flow.loss(
                    params, state, batch["_x"], batch_to_cond(batch),
                    train=False)
            return nll, sd_z

        def sample_step(params, state, rng, batch, temp):
            cond = batch_to_cond(batch)
            x = flow.sample(params, state, rng, cond, temp,
                            batch=batch["_y"].shape[0], train=False)
            return x

        def sample_kld_step(params, state, rng, batch, temp, sc_sd):
            """Sample + NLL round-trip + per-patch marginal KLDs, entirely
            on device (VERDICT r4 item 4): the Gaussian / camera-NLF
            comparison noise is drawn on device and only 7 scalars come
            back per batch — no D2H of the sampled tensors, so the
            per-epoch sampling phase is no longer host-bound and
            --n_sample_batches need not cap full-scale splits.

            `rng` is used for the flow sample exactly as in sample_step
            (fold_in for the comparison draws), so the host (numpy) and
            device paths produce the SAME samples for a given key."""
            from noise_flow_tpu.utils.metrics import kldiv_batch_jax

            cond = batch_to_cond(batch)
            x = flow.sample(params, state, rng, cond, temp,
                            batch=batch["_y"].shape[0], train=False)
            nll, sd_z, _ = flow.loss(params, state, x, cond, train=False)
            y = batch["_y"]
            shp = (-1,) + (1,) * (y.ndim - 1)
            ng = sc_sd * jax.random.normal(jax.random.fold_in(rng, 1),
                                           y.shape)
            nlf_sd = jnp.sqrt(batch["nlf0"].reshape(shp) * y
                              + batch["nlf1"].reshape(shp))
            nl = nlf_sd * jax.random.normal(jax.random.fold_in(rng, 2),
                                            y.shape)
            sums, cnt = kldiv_batch_jax(ng, nl, x, batch["_x"])
            return nll, sd_z, sums, jnp.asarray(cnt, jnp.float32)

        def train_scan(params, state, opt_state, stacked):
            """K train steps in one jitted call via lax.scan over the leading
            (step) axis of `stacked` — amortizes per-step dispatch and the
            host loop (the natural TPU shape of the reference's epoch loop,
            ref:train_noise_flow.py:54-77)."""

            def body(carry, batch):
                p, s, o = carry
                new = train_step(*carry, batch)
                return new[:3], (new[3], new[4])

            (p, s, o), (nlls, sdzs) = jax.lax.scan(
                body, (params, state, opt_state), stacked)
            return p, s, o, nlls, sdzs

        def train_scan_idx(params, state, opt_state, data, idxs):
            """Device-resident variant: `data` is the FULL staged train set
            in HBM ({_x,_y,nlf0,nlf1,iso,cam}, leading dim N); idxs [K, B]
            int32 selects each step's batch by on-device gather. Per-call
            host->device traffic is ~K*B*4 bytes instead of the batch
            tensors — on a tunneled chip the per-flush H2D path both
            throttled the epoch AND leaked its host staging buffers
            (measured: RSS grows by exactly the bytes transferred)."""

            def body(carry, idx):
                batch = trainer._gather_staged(data, idx)
                new = train_step(*carry, batch)
                return new[:3], (new[3], new[4])

            (p, s, o), (nlls, sdzs) = jax.lax.scan(
                body, (params, state, opt_state), idxs)
            return p, s, o, nlls, sdzs

        def eval_scan_idx(params, state, data, idxs):
            def body(carry, idx):
                batch = trainer._gather_staged(data, idx)
                return carry, eval_step(params, state, batch)

            _, (nlls, sdzs) = jax.lax.scan(body, 0, idxs)
            return nlls, sdzs

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._train_scan = jax.jit(train_scan, donate_argnums=(0, 1, 2))
        self._train_scan_idx = jax.jit(train_scan_idx,
                                       donate_argnums=(0, 1, 2))
        self._eval_scan_idx = jax.jit(eval_scan_idx)
        self._eval_step = jax.jit(eval_step)
        self._sample_step = jax.jit(sample_step, static_argnums=(4,))
        self._sample_kld_step = jax.jit(sample_kld_step, static_argnums=(4,))

    # ------------------------------------------------- device-resident data
    _KEEP = ("_x", "_y", "nlf0", "nlf1", "iso", "cam")

    def stage_dataset(self, batches: Iterable[Dict], split: str = "train",
                      max_patches: int = 0):
        """Stream one pass of `batches` (e.g. the C++ native loader) and
        stage the full set in HBM as one device-resident array per field.

        TPU-native dataset residency: the SIDD train split's packed patches
        (~10.6 GB f32) fit a v5e's HBM, so epochs afterwards feed each jitted
        scan only [K, B] int32 index stacks and gather batches ON DEVICE.
        This removes the per-step host link from the training loop entirely —
        on a tunneled chip that link both throttled the epoch (~25x) and
        leaked its host staging buffers. Single-device/single-process only
        (pods shard the input per host instead).

        Patches are stored in the TILE-NATIVE packed layout [N, ph, ph*C]
        (lane dim a multiple of 128 at ph=32): NHWC [.., 32, 4] arrays cost
        a 4x lane-padding expansion in compiled TPU layouts, which OOM'd
        HBM at this scale. max_patches>0 truncates the stream (bounds the
        staged test set's HBM share). Returns the staged patch count."""
        assert self.mesh.size == 1 and jax.process_count() == 1, (
            "device-resident staging is single-device; shard inputs per "
            "host on pods")
        cols = {k: [] for k in self._KEEP}
        n = 0
        for mb in batches:
            for k in self._KEEP:
                cols[k].append(np.asarray(mb[k]))
            n += len(cols["_x"][-1])
            if max_patches and n >= max_patches:
                break
        if not cols["_x"]:
            raise ValueError("stage_dataset: empty batch stream")
        host = {k: np.concatenate(v) for k, v in cols.items()}
        if max_patches:
            host = {k: v[:max_patches] for k, v in host.items()}
        n, ph = host["_x"].shape[:2]
        self._staged_shape = host["_x"].shape[1:]
        for k in ("_x", "_y"):
            host[k] = host[k].reshape(n, ph, -1)
        dev = {k: jax.device_put(jnp.asarray(v)) for k, v in host.items()}
        setattr(self, f"_staged_{split}", dev)
        return n

    def _gather_staged(self, data: Dict, idx) -> Dict:
        """On-device batch gather from a staged set. Images are stored
        packed [N, ph, ph*C]; the fused kernels consume exactly that layout
        (_pack_batch's reshape becomes a no-op), the XLA path gets the NHWC
        view back (a [B]-sized transient, not a padded N-sized copy)."""
        batch = {kk: jnp.take(vv, idx, axis=0) for kk, vv in data.items()}
        if not self.use_fused:
            b = batch["_x"].shape[0]
            for k in ("_x", "_y"):
                batch[k] = batch[k].reshape((b,) + tuple(self._staged_shape))
        return batch

    def _train_epoch_staged(self, shuffle_seed: int):
        data = self._staged_train
        n = int(data["_x"].shape[0])
        b = self.cfg.n_batch_train
        k = max(int(getattr(self.cfg, "steps_per_call", 1)), 1)
        order = np.random.default_rng(shuffle_seed).permutation(n)
        nsteps = n // b
        if nsteps == 0:
            raise ValueError(
                f"staged train set has {n} patches < n_batch_train={b}; "
                "stage more patches or lower the batch size")
        order = order[:nsteps * b].reshape(nsteps, b).astype(np.int32)
        if not self.trainable:
            # condSDN-style non-trainable baseline: evaluate only, never
            # step (ref:train_noise_flow.py:189)
            with self.timers.phase("step"):
                nlls, sdzs = self._eval_scan_idx(self.params, self.state,
                                                 data, jnp.asarray(order))
            return float(jnp.mean(nlls)), float(jnp.mean(sdzs))
        losses, sdzs = [], []
        for s in range(0, nsteps - nsteps % k, k):
            with self.timers.phase("step"):
                idxs = jnp.asarray(order[s:s + k])
                (self.params, self.state, self.opt_state, nlls,
                 sds) = self._train_scan_idx(self.params, self.state,
                                             self.opt_state, data, idxs)
            losses.append(nlls)
            sdzs.append(sds)
        for s in range(nsteps - nsteps % k, nsteps):
            with self.timers.phase("step"):
                idx = jnp.asarray(order[s][None])
                (self.params, self.state, self.opt_state, nlls,
                 sds) = self._train_scan_idx(self.params, self.state,
                                             self.opt_state, data, idx)
            losses.append(nlls)
            sdzs.append(sds)
        # dispatch above is async; the device drains the queue here — charge
        # it to its own phase so step= reads as dispatch, sync= as compute
        with self.timers.phase("sync"):
            out = (float(jnp.mean(jnp.concatenate(losses))),
                   float(jnp.mean(jnp.concatenate(sdzs))))
        return out

    def _eval_epoch_staged(self):
        data = self._staged_test
        n = int(data["_x"].shape[0])
        b = self.cfg.n_batch_test
        nsteps = n // b
        if nsteps == 0:
            raise ValueError(
                f"staged test set has {n} patches < n_batch_test={b}; "
                "stage more patches or lower the batch size")
        idxs = jnp.asarray(
            np.arange(nsteps * b, dtype=np.int32).reshape(nsteps, b))
        nlls, sdzs = self._eval_scan_idx(self.params, self.state, data, idxs)
        return float(jnp.mean(nlls)), float(jnp.mean(sdzs))

    _staged_train = None
    _staged_test = None

    # ---------------------------------------------------------------- loops
    def _put(self, mb: Dict) -> Dict:
        """Host batch -> device-sharded global batch.

        Multi-process: each host contributes its LOCAL shard (global_batch
        assembles without host-side gathers; feed every host the same number
        of equally-sized batches per epoch — host_shard + drop_remainder).
        """
        keep = {k: mb[k] for k in ("_x", "_y", "nlf0", "nlf1", "iso", "cam")}
        if jax.process_count() > 1:
            from noise_flow_tpu.parallel.distributed import global_batch
            return global_batch(self.mesh, keep)
        return shard_batch(self.mesh, keep)

    def _prefetched(self, batches: Iterable[Dict]):
        """One-batch-ahead host->device transfer. device_put and jitted step
        dispatch are both async, so the N+1 transfer rides the interconnect
        while step N computes (replaces the reference's ImageLoader thread
        pool, ref:sidd/ImageLoader.py:36-78)."""
        it = iter(batches)
        try:
            nxt = self._put(next(it))
        except StopIteration:
            return
        for mb in it:
            cur, nxt = nxt, self._put(mb)
            yield cur
        yield nxt

    def train_epoch(self, batches: Iterable[Dict],
                    steps_per_call: Optional[int] = None):
        k = (steps_per_call if steps_per_call is not None
             else getattr(self.cfg, "steps_per_call", 1))
        if k > 1 and self.trainable:
            return self._train_epoch_scan(batches, k)
        losses, sdzs = [], []
        for b in self._prefetched(_timed_iter(batches, self.timers,
                                              "input")):
            with self.timers.phase("step"):
                if self.trainable:
                    self.params, self.state, self.opt_state, nll, sd_z = \
                        self._train_step(self.params, self.state,
                                         self.opt_state, b)
                else:
                    nll, sd_z = self._eval_step(self.params, self.state, b)
            losses.append(nll)
            sdzs.append(sd_z)
        return float(jnp.mean(jnp.stack(losses))), float(jnp.mean(jnp.stack(sdzs)))

    def _train_epoch_scan(self, batches: Iterable[Dict], k: int):
        """Epoch loop batching k steps per device dispatch (lax.scan).

        Host batches are grouped into [k, B, ...] stacks (full groups only —
        a ragged tail or a batch-size change falls back to single steps, so
        no extra scan programs compile). Multi-process: each host stacks its
        LOCAL shards and the [k, B_global, ...] arrays assemble without host
        gathers (distributed.global_batch_stacked) — every host must feed the
        same number of equally-sized batches (host_shard + drop_remainder +
        the min-steps clamp in cli.train)."""
        keep = ("_x", "_y", "nlf0", "nlf1", "iso", "cam")
        losses, sdzs = [], []

        def flush(buf):
            if len(buf) == k:
                stacked = {key: np.stack([np.asarray(b[key]) for b in buf])
                           for key in keep}
                if jax.process_count() > 1:
                    from noise_flow_tpu.parallel.distributed import (
                        global_batch_stacked)
                    db = global_batch_stacked(self.mesh, stacked)
                else:
                    db = shard_batch_stacked(self.mesh, stacked)
                (self.params, self.state, self.opt_state, nlls,
                 sds) = self._train_scan(self.params, self.state,
                                         self.opt_state, db)
                losses.append(nlls)
                sdzs.append(sds)
            else:
                for b in buf:
                    db = self._put({key: b[key] for key in keep})
                    (self.params, self.state, self.opt_state, nll,
                     sd_z) = self._train_step(self.params, self.state,
                                              self.opt_state, db)
                    losses.append(jnp.reshape(nll, (1,)))
                    sdzs.append(jnp.reshape(sd_z, (1,)))

        buf = []
        for mb in _timed_iter(batches, self.timers, "input"):
            if buf and mb["_x"].shape != buf[0]["_x"].shape:
                with self.timers.phase("step"):
                    flush(buf)
                buf = []
            buf.append(mb)
            if len(buf) == k:
                with self.timers.phase("step"):
                    flush(buf)
                buf = []
        if buf:
            with self.timers.phase("step"):
                flush(buf)
        all_nll = jnp.concatenate(losses)
        all_sdz = jnp.concatenate(sdzs)
        return float(jnp.mean(all_nll)), float(jnp.mean(all_sdz))

    def eval_epoch(self, batches: Iterable[Dict]):
        losses, sdzs = [], []
        for b in self._prefetched(batches):
            nll, sd_z = self._eval_step(self.params, self.state, b)
            losses.append(nll)
            sdzs.append(sd_z)
        return float(jnp.mean(jnp.stack(losses))), float(jnp.mean(jnp.stack(sdzs)))

    def sample_epoch(self, batches: Iterable[Dict], temp: float, rng,
                     sc_sd: float = 1.0, fix_cam_iso: bool = True,
                     compute_kld: bool = True, vis_dir: Optional[str] = None,
                     on_device_kld: bool = True):
        """Per-epoch sampling diagnostics (ref:train_noise_flow.py:139-184):
        sample with (optionally) fixed cam=S6 iso=100, push samples back
        through the inverse for their NLL, and compute marginal KLDs.
        With vis_dir, dumps the per-patch .mat artifact set there
        (ref:train_noise_flow.py:176-177 -> sidd_utils.py:995-1058).

        on_device_kld (default): sample, NLL and KLD histograms all run in
        one jitted step per batch; only scalars cross the device link. The
        numpy path is kept for the first batch when vis_dir is set (it owns
        the .mat artifact dump) and as the multi-host shard-local fallback
        — set on_device_kld=False to force it everywhere."""
        nlf_s6 = {100: 0.000479, 400: 0.001774, 800: 0.003696,
                  1600: 0.008211, 3200: 0.019930}
        losses, sdzs = [], []
        kld_sum, kld_cnt = np.zeros(4), 0.0
        for bi, mb in enumerate(batches):
            mb = dict(mb)
            if fix_cam_iso:
                b = mb["_x"].shape[0]
                mb["iso"] = np.full((b,), 100.0, np.float32)
                mb["cam"] = np.full((b,), 2.0, np.float32)
                # reference feeds nlf0 == nlf1 == table[iso][0]
                # (ref:train_noise_flow.py:158-159)
                mb["nlf0"] = np.full((b,), nlf_s6[100], np.float32)
                mb["nlf1"] = np.full((b,), nlf_s6[100], np.float32)
            db = self._put(mb)
            rng, k = jax.random.split(rng)
            if self.mesh.size > 1:
                # split() commits the key to the default device; replicate it
                # so the jitted step sees mesh-consistent argument placement
                k = replicate(self.mesh, k)
            use_dev = (compute_kld and on_device_kld
                       and not (vis_dir is not None and bi == 0))
            if use_dev:
                with self.timers.phase("sample"):
                    nll, sd_z, sums, cnt = self._sample_kld_step(
                        self.params, self.state, k, db, float(temp),
                        jnp.float32(sc_sd))
                losses.append(nll)
                sdzs.append(sd_z)
                kld_sum += np.asarray(sums)
                kld_cnt += float(cnt)
                continue
            with self.timers.phase("sample"):
                x_sample = self._sample_step(self.params, self.state, k, db,
                                             float(temp))
                nll, sd_z = self._eval_step(
                    self.params, self.state, {**db, "_x": x_sample})
            losses.append(nll)
            sdzs.append(sd_z)
            if compute_kld:
                with self.timers.phase("sample_host"):
                    if jax.process_count() > 1:
                        # only this host's shard is addressable; its rows are
                        # exactly this host's contribution to the global batch
                        shards = sorted(x_sample.addressable_shards,
                                        key=lambda s: s.index[0].start or 0)
                        xs = np.concatenate([np.asarray(s.data)
                                             for s in shards])
                        mb = {k: np.asarray(v)[:len(xs)] if np.ndim(v) else v
                              for k, v in mb.items()}
                    else:
                        xs = np.asarray(x_sample)
                    # .mat artifact dump only for the first batch: one
                    # representative set per epoch (a full-scale test split
                    # would otherwise write 11 files per sampled patch)
                    mean_kld = calc_kldiv_mb(
                        mb, xs, sc_sd, vis_dir=vis_dir if bi == 0 else None)
                n_pat = len(range(0, len(xs), 5))
                kld_sum += mean_kld * n_pat
                kld_cnt += n_pat
        kld = kld_sum / kld_cnt if kld_cnt else np.zeros(4)
        return (float(jnp.mean(jnp.stack(losses))),
                float(jnp.mean(jnp.stack(sdzs))), kld)

    def _sample_epoch_staged(self, temp: float, rng, sc_sd: float = 1.0,
                             fix_cam_iso: bool = True,
                             vis_dir: Optional[str] = None,
                             max_batches: int = 0):
        """sample_epoch over the HBM-staged test set: batches gather on
        device and the whole sample + NLL + KLD step runs jitted — no
        host->device transfer at all (the host-batch path measured
        H2D-bound on the tunneled chip: 113 s of a 119 s full-scale phase
        was device_put, experiments/sample_phase_fullscale.json). The
        first batch still round-trips once when vis_dir is set (it owns
        the reference's .mat artifact dump)."""
        data = self._staged_test
        n = int(data["_x"].shape[0])
        b = self.cfg.n_batch_test
        nsteps = n // b
        if max_batches:
            nsteps = min(nsteps, max_batches)
        nlf_s6 = 0.000479  # S6/ISO-100 (ref:train_noise_flow.py:158-159)
        losses, sdzs = [], []
        # device-resident accumulators: a per-batch np.asarray would pay the
        # tunnel's ~25 ms D2H latency 400x per full-scale phase (measured:
        # it dominated the 37 s wall); everything drains in ONE pull below
        kld_sum = jnp.zeros((4,), jnp.float32)
        kld_cnt = jnp.zeros((), jnp.float32)
        host_sum, host_cnt = np.zeros(4), 0.0
        ph = self._staged_shape[0]
        for s in range(nsteps):
            idx = jnp.arange(s * b, (s + 1) * b, dtype=jnp.int32)
            batch = self._gather_staged(data, idx)
            for k in ("_x", "_y"):  # flow.sample consumes NHWC
                batch[k] = batch[k].reshape((b,) + tuple(self._staged_shape))
            if fix_cam_iso:
                batch["iso"] = jnp.full((b,), 100.0, jnp.float32)
                batch["cam"] = jnp.full((b,), 2.0, jnp.float32)
                batch["nlf0"] = jnp.full((b,), nlf_s6, jnp.float32)
                batch["nlf1"] = jnp.full((b,), nlf_s6, jnp.float32)
            rng, k = jax.random.split(rng)
            if vis_dir is not None and s == 0:
                with self.timers.phase("sample_host"):
                    x_sample = self._sample_step(self.params, self.state, k,
                                                 batch, float(temp))
                    nll, sd_z = self._eval_step(
                        self.params, self.state, {**batch, "_x": x_sample})
                    mb_host = {kk: np.asarray(v) for kk, v in batch.items()}
                    mean_kld = calc_kldiv_mb(mb_host, np.asarray(x_sample),
                                             sc_sd, vis_dir=vis_dir)
                n_pat = len(range(0, b, 5))
                host_sum += mean_kld * n_pat
                host_cnt += n_pat
            else:
                with self.timers.phase("sample"):
                    nll, sd_z, sums, cnt = self._sample_kld_step(
                        self.params, self.state, k, batch, float(temp),
                        jnp.float32(sc_sd))
                kld_sum = kld_sum + sums
                kld_cnt = kld_cnt + cnt
            losses.append(nll)
            sdzs.append(sd_z)
        with self.timers.phase("sync"):
            tot_sum = np.asarray(kld_sum) + host_sum
            tot_cnt = float(kld_cnt) + host_cnt
            kld = tot_sum / tot_cnt if tot_cnt else np.zeros(4)
            out = (float(jnp.mean(jnp.stack(losses))),
                   float(jnp.mean(jnp.stack(sdzs))), kld)
        return out

    # number of test batches the per-epoch sampling phase runs over when
    # sampling from the staged set (0 = the full staged split; set from
    # cli --n_sample_batches)
    sample_batches_cap = 0

    # ------------------------------------------------------------ main loop
    def fit(self, train_batches_fn, test_batches_fn, logdir: str,
            epochs: Optional[int] = None, nll_gauss: float = 0.0,
            nll_sdn: float = 0.0, sc_sd: float = 1.0,
            do_sampling: bool = True, verbose: bool = True,
            sample_batches_fn=None):
        """Full epoch loop with the reference's test gating
        (ref:train_noise_flow.py:384-535). *_batches_fn are callables
        returning fresh batch iterators per epoch.

        sample_batches_fn (default: test_batches_fn) feeds the per-epoch
        sampling diagnostics only — at full SIDD scale the sample phase is
        host-bound (D2H of every sampled batch + histogram KLDs), so
        production runs cap it to a subset of test batches
        (cli.train --n_sample_batches)."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        # multi-process: only process 0 writes checkpoints/logs; metrics are
        # already global (psum'd) so every process agrees on best-model
        is_chief = jax.process_index() == 0
        os.makedirs(logdir, exist_ok=True)
        ckpt_dir = os.path.join(logdir, "ckpt")

        class _NullLogger:
            def log(self, row):
                pass

            def close(self):
                pass

        def mk_logger(name, columns):
            if not is_chief:
                return _NullLogger()
            return ResultLogger(os.path.join(logdir, name), columns,
                                cfg.continue_training)

        cols = ["epoch", "NLL", "NLL_G", "NLL_SDN", "sdz"]
        train_logger = mk_logger("train.txt", cols + ["train_time"])
        test_logger = mk_logger("test.txt", cols + ["msg"])
        sample_logger = mk_logger(
            "sample.txt",
            cols + ["sample_time", "KLD_G", "KLD_NLF", "KLD_NF", "KLD_R"])

        start_epoch = 1
        if cfg.continue_training:
            last = latest_checkpoint(ckpt_dir)
            if last:
                self.params, self.state, opt, ep = load_checkpoint(
                    last, self.params, self.state, self.opt_state)
                if opt is not None:
                    self.opt_state = opt
                start_epoch = ep + 1

        best_nll = np.inf
        rng = jax.random.PRNGKey(cfg.seed + 1)
        train_time = 0.0
        history = {"train": [], "test": [], "sample": []}

        # Ctrl-C: finish the current epoch, save a resumable checkpoint,
        # close the TSV logs, and exit cleanly (ref:train_noise_flow.py:545-548
        # traps KeyboardInterrupt for a clean exit; here it also checkpoints,
        # so --continue_training picks up where the interrupt landed).
        interrupted = {"flag": False}
        prev_handler = None
        in_main_thread = threading.current_thread() is threading.main_thread()
        if in_main_thread:
            def _on_sigint(signum, frame):
                interrupted["flag"] = True
                print("SIGINT: finishing epoch, saving checkpoint...",
                      flush=True)
            prev_handler = signal.signal(signal.SIGINT, _on_sigint)

        try:
            for epoch in range(start_epoch, epochs + 1):
                do_test = (epoch < 10 or (epoch < 100 and epoch % 10 == 0)
                           or epoch % cfg.epochs_full_valid == 0)
                is_best = 0
                if do_test:
                    if self._staged_test is not None:
                        ts_nll, ts_sdz = self._eval_epoch_staged()
                    else:
                        ts_nll, ts_sdz = self.eval_epoch(test_batches_fn())
                    history["test"].append(ts_nll)
                    if is_chief:
                        save_checkpoint(ckpt_dir, epoch, self.params, self.state,
                                        self.opt_state, epoch)
                    if ts_nll < best_nll:
                        best_nll = ts_nll
                        if is_chief:
                            save_checkpoint(ckpt_dir, "best", self.params,
                                            self.state, self.opt_state, epoch)
                        is_best = 1
                    test_logger.log({"epoch": epoch, "NLL": ts_nll,
                                     "NLL_G": nll_gauss, "NLL_SDN": nll_sdn,
                                     "sdz": ts_sdz, "msg": is_best})

                if do_sampling and do_test:
                    t0 = time.time()
                    rng, k = jax.random.split(rng)
                    # per-epoch sample visualization artifacts
                    # (ref:train_noise_flow.py:176-177)
                    vis_dir = os.path.join(
                        logdir, "samples_epoch_%04d" % epoch,
                        "samples_%.1f" % cfg.temp)
                    if self._staged_test is not None:
                        sm_nll, sm_sdz, kld = self._sample_epoch_staged(
                            cfg.temp, k, sc_sd, vis_dir=vis_dir,
                            max_batches=self.sample_batches_cap)
                    else:
                        sm_nll, sm_sdz, kld = self.sample_epoch(
                            (sample_batches_fn or test_batches_fn)(),
                            cfg.temp, k, sc_sd, vis_dir=vis_dir)
                    history["sample"].append(sm_nll)
                    sample_logger.log({
                        "epoch": epoch, "NLL": sm_nll, "NLL_G": nll_gauss,
                        "NLL_SDN": nll_sdn, "sdz": sm_sdz,
                        "sample_time": time.time() - t0,
                        "KLD_G": kld[0], "KLD_NLF": kld[1],
                        "KLD_NF": kld[2], "KLD_R": kld[3]})

                t0 = time.time()
                self.timers.reset()
                if self._staged_train is not None:
                    tr_nll, tr_sdz = self._train_epoch_staged(cfg.seed + epoch)
                else:
                    tr_nll, tr_sdz = self.train_epoch(train_batches_fn())
                train_time += time.time() - t0
                history["train"].append(tr_nll)
                train_logger.log({"epoch": epoch, "NLL": tr_nll,
                                  "NLL_G": nll_gauss, "NLL_SDN": nll_sdn,
                                  "sdz": tr_sdz, "train_time": int(train_time)})
                if verbose and do_test:
                    print(f"E={epoch} tL={tr_nll:9.1f} sL={history['test'][-1]:9.1f} "
                          f"SDr={tr_sdz:.2f} B={is_best} [{self.timers.line()}]",
                          flush=True)
                if is_chief and self.timers.totals:
                    # steady-state input-vs-step attribution artifact (the last
                    # epoch's split; overwritten each epoch)
                    with open(os.path.join(logdir, "phase_timers.txt"), "w") as f:
                        f.write(f"epoch {epoch}: {self.timers.line()}\n")
                if interrupted["flag"]:
                    if is_chief:
                        save_checkpoint(ckpt_dir, epoch, self.params, self.state,
                                        self.opt_state, epoch)
                    break
        finally:
            # restore Ctrl-C semantics and flush the TSV logs even when an
            # exception escapes mid-fit (multi-run drivers keep a working
            # KeyboardInterrupt afterwards)
            if in_main_thread:
                signal.signal(signal.SIGINT, prev_handler)
            for lg in (train_logger, test_logger, sample_logger):
                lg.close()
        return history
