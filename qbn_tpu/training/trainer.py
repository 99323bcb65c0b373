"""Trainer: jitted train/eval steps + host-side epoch loop.

TPU-native re-design of the reference Trainer (reference: src/trainer.py):
the per-batch work (forward, ELBO loss, backward, NaN-guarded optimiser
step, metric accumulation) is ONE compiled XLA program; the host loop only
feeds batches and handles checkpoint policy. Under a device mesh the same
step runs SPMD with the batch sharded over the 'data' axis (metric states
are summed contributions, so they shard transparently).

Reference behaviours kept:
  * skip the optimiser step when the loss is non-finite
    (trainer.py:103), zero NaN gradients (trainer.py:105-107);
  * SGHMC adaptive gradient clipping (in the optax chain, optim.py);
  * cosine LR stepped per epoch;
  * checkpoint every epoch when save_last, else on best validation key
    metric; SGHMC epoch-stamped snapshots every 2nd epoch past burn-in
    within the last samples*2 epochs (trainer.py:72-83);
  * QAT validation updates quantisation observers but never BN running
    stats (torch observer semantics).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from qbn_tpu.config import Config
from qbn_tpu.training import metrics as M
from qbn_tpu.training.losses import classification_loss, regression_loss
from qbn_tpu.training.checkpoint import (
    save_variables, checkpoint_path,
)
from qbn_tpu.utils import split_rngs, sum_kl

log = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    params: Any
    model_state: Any          # batch_stats / quant / qconst collections
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def _metrics_init(task: str):
    return (M.cls_metrics_init() if task == "classification"
            else M.reg_metrics_init())


def _metrics_update(task, state, out, target):
    if task == "classification":
        return M.cls_metrics_update(state, out, target)
    mu, var = out
    return M.reg_metrics_update(state, mu, var, target)


def _metrics_compute(task, state):
    return (M.cls_metrics_compute(state) if task == "classification"
            else M.reg_metrics_compute(state))


def make_train_step(model, cfg: Config, tx, mode: str, n_batches: int,
                    n_points: int, jit_compile: bool = True):
    """Build the training step (jitted by default; pass jit_compile=False
    to get the raw function for mesh-sharded or vmapped wrapping)."""
    task = cfg.task
    loss_fn = (classification_loss if task == "classification"
               else regression_loss)

    def step(state: TrainState, metric_state, x, y):
        key = jax.random.fold_in(state.rng, state.step)

        def objective(params):
            variables = {"params": params, **state.model_state}
            out, updates = model.apply(
                variables, x, train=True, mode=mode, update_stats=True,
                rngs=split_rngs(key), mutable=["batch_stats", "quant", "kl"])
            kl = sum_kl(updates.pop("kl", {}))
            loss, main, kl_t = loss_fn(
                out, y, kl, cfg.gamma, n_batches, n_points,
                scaling=cfg.loss_scaling,
                loss_multiplier=cfg.loss_multiplier)
            return loss, (out, updates, main, kl_t)

        (loss, (out, updates, main, kl_t)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)

        # zero NaN grads (reference: trainer.py:105-107)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        ok = jnp.isfinite(loss)

        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        # skip the whole step on a non-finite loss (reference: trainer.py:103)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old),
            new_params, state.params)
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old),
            new_opt, state.opt_state)

        model_state = dict(state.model_state)
        for col in ("batch_stats", "quant"):
            if col in updates:
                # the step-skip must cover the MUTABLE STATS too: a
                # single overflowing batch otherwise poisons the BN
                # running stats / observer EMAs permanently even though
                # params were restored — every later forward is then
                # NaN. Observed on the sgld-cifar a7w4 per-snapshot-QAT
                # leg (round 5): one member went non-finite at its first
                # epoch in all 3 seeds and never recovered, collapsing
                # the INT ensemble to constant predictions + NaN NLL.
                model_state[col] = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old),
                    updates[col], state.model_state[col])

        metric_state = _metrics_update(task, metric_state, out, y)
        logs = {"obj": loss, "main_obj": main, "kl": kl_t}
        new_state = TrainState(
            params=new_params, model_state=model_state, opt_state=new_opt,
            step=state.step + 1, rng=state.rng)
        return new_state, metric_state, logs

    # no donation: optimizer states may alias identical constant buffers
    # (per-leaf scalar weight_decay), which donation rejects
    return jax.jit(step) if jit_compile else step


def make_eval_step(model, cfg: Config, mode: str, update_observers: bool,
                   jit_compile: bool = True):
    """Build the jitted (validation) eval step: no grads, no BN updates;
    quant observers update iff update_observers (QAT validation)."""
    task = cfg.task

    def step(state: TrainState, metric_state, x, y, key):
        variables = {"params": state.params, **state.model_state}
        mutable = ["kl"] + (["quant"] if update_observers else [])
        out, updates = model.apply(
            variables, x, train=False, mode=mode, update_stats=update_observers,
            rngs=split_rngs(key), mutable=mutable)
        model_state = dict(state.model_state)
        if "quant" in updates:
            model_state["quant"] = updates["quant"]
        new_state = state.replace(model_state=model_state)
        metric_state = _metrics_update(task, metric_state, out, y)
        return new_state, metric_state

    return jax.jit(step) if jit_compile else step


def _device_augment_cifar(x, ys, xs, flip):
    """Bitwise device replay of loaders.augment_cifar: flip, pad 4 with
    zeros, random 32x32 crop — pure integer pixel moves, so identical to
    the host/native path given the same sampled parameters."""
    xf = jnp.where(flip[:, None, None, None].astype(bool),
                   x[:, :, ::-1, :], x)
    xp = jnp.pad(xf, ((0, 0), (4, 4), (4, 4), (0, 0)))

    def crop(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), x.shape[1:])

    return jax.vmap(crop)(xp, ys, xs)


def _device_normalize(x, kind):
    if kind == "cifar":
        from qbn_tpu.data.datasets import CIFAR_INV_STD, CIFAR_MEAN
        return (x - jnp.asarray(CIFAR_MEAN)) * jnp.asarray(CIFAR_INV_STD)
    return x


def _ckpt_flush_every() -> int:
    """Epoch interval for flushing the deferred save-last checkpoint
    (crash insurance); QBN_CKPT_FLUSH=1 restores the per-epoch reference
    behaviour."""
    import os
    return max(1, int(os.environ.get("QBN_CKPT_FLUSH", "25")))


def _scan_eligible(cfg, mesh, loader, need_full: bool = False) -> bool:
    """Device-resident epoch scan preconditions: single device, no debug
    single-batch mode, an ArrayLoader whose augment/normalize recipe we
    can replay on device, and at least two full-size batches (a ragged
    tail batch is run as one extra step outside the scan)."""
    from qbn_tpu.data.loaders import ArrayLoader, augment_cifar
    from qbn_tpu.utils import scan_enabled
    if mesh is not None or cfg.debug:
        return False
    if not scan_enabled("QBN_EPOCH_SCAN"):
        return False
    if not isinstance(loader, ArrayLoader):
        return False
    if len(loader.x) // loader.batch_size < 2:
        return False
    if loader.augment is not None and loader.augment is not augment_cifar:
        return False
    if loader.normalize is not None and \
            getattr(loader, "normalize_kind", None) is None:
        return False
    return True


# ---------------------------------------------------------------------
# Cross-run step memo. A grid sweep (experiments/sweep.py) runs the same
# (method x tier x cell) for several seeds / SGHMC snapshots in one
# process; every run builds a fresh model/tx, so the jit caches miss and
# the identical programs remote-recompile each time (~10 min per CIFAR
# QAT cell through the relay — measured as the dominant campaign cost).
# Flax modules hash/compare by hyperparameter VALUE, so (model, semantic
# cfg, mode, n_batches, n_points) identifies the traced computation; the
# memo is opt-in (flows._fit) because it additionally requires tx ==
# build_optimizer(cfg, n_batches) — true on every production path, not
# necessarily for tests passing custom transforms.
_STEP_MEMO: dict = {}
_SCAN_MEMO: dict = {}


def _memo_cfg_key(cfg: Config):
    """Config with pure-bookkeeping fields neutralised: what remains is
    exactly what can reach the traced step (loss/optimiser/schedule/quant
    semantics). cfg.seed only reaches the step through the SGHMC noise
    transform."""
    import dataclasses

    from qbn_tpu.evaluation.mc import _trace_time_flags
    neutral = cfg.replace(
        save="", load=None, data="", profile=False, debug=False,
        debug_nans=False, report_freq=0,
        seed=cfg.seed if cfg.optimizer == "sghmc" else 0)
    # QBN_* env flags are read at trace time inside the layers — fold the
    # snapshot in so a mid-process toggle retraces (mc.py does the same)
    return dataclasses.astuple(neutral) + _trace_time_flags()


class Trainer:
    """Host-side epoch loop around the jitted steps."""

    def __init__(self, model, cfg: Config, tx, mode: str,
                 train_loader, valid_loader=None, writer=None, mesh=None,
                 step_memo: bool = False):
        self.model = model
        self.cfg = cfg
        self.tx = tx
        self.mode = mode
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.writer = writer
        self.mesh = mesh
        self.train_time = 0.0
        self.val_time = 0.0
        self.epoch = 0
        n_batches = len(train_loader)
        # reference n_points = len(loader.dataset): the pre-valid-split
        # dataset size (src/trainer.py:140) — NOT the train-subset size
        n_points = getattr(train_loader, "dataset_size",
                           train_loader.num_examples)
        self._step_memo = step_memo and mesh is None
        if self._step_memo:
            ck = _memo_cfg_key(cfg)
            tkey = ("train", model, ck, mode, n_batches, n_points)
            if tkey not in _STEP_MEMO:
                _STEP_MEMO[tkey] = make_train_step(model, cfg, tx, mode,
                                                   n_batches, n_points)
            self._train_step = _STEP_MEMO[tkey]
            ekey = ("eval", model, ck, mode, mode == "qat")
            if ekey not in _STEP_MEMO:
                _STEP_MEMO[ekey] = make_eval_step(
                    model, cfg, mode, update_observers=(mode == "qat"))
            self._eval_step = _STEP_MEMO[ekey]
        else:
            self._train_step = make_train_step(model, cfg, tx, mode,
                                               n_batches, n_points)
            self._eval_step = make_eval_step(
                model, cfg, mode, update_observers=(mode == "qat"))
        self._sharded_train_step = self._sharded_eval_step = None
        if mesh is not None:
            # SPMD data-parallel steps: used for batches divisible by the
            # mesh; partial batches fall back to the unsharded step, so a
            # mesh run is numerically identical to a single-device run.
            from qbn_tpu.parallel.sharded import (
                make_sharded_train_step, make_sharded_eval_step,
            )
            self._sharded_train_step = make_sharded_train_step(
                model, cfg, tx, mode, n_batches, n_points, mesh)
            self._sharded_eval_step = make_sharded_eval_step(
                model, cfg, mode, (mode == "qat"), mesh)

        self._dev_data = {}          # id(loader) -> (x_dev, y_dev)
        self._train_scan = None
        self._eval_scans = {}        # (id(loader), k) -> jitted scan

    def _pick_step(self, sharded, plain, batch_len: int):
        if sharded is not None and batch_len % self.mesh.devices.size == 0:
            return sharded, True
        return plain, False

    # ---- device-resident epoch scan --------------------------------
    # The per-step host loop pays one H2D upload + dispatch per batch
    # through the axon relay (whose host staging buffers leak ~3 MB per
    # transfer on long runs — measured OOM risk at CIFAR batch sizes)
    # and syncs every report_freq steps. The scan path uploads the raw
    # dataset ONCE, replays the loader's shuffle + augment draws on
    # device bit-for-bit (loaders.epoch_plan), and runs a whole epoch as
    # one lax.scan: one dispatch, one fetch, zero per-step H2D.

    def _loader_dev(self, loader):
        # the cached loader reference pins the object so the id() key
        # cannot be reused by a different loader after garbage collection
        key = id(loader)
        if key not in self._dev_data:
            self._dev_data[key] = (loader, jnp.asarray(loader.x),
                                   jnp.asarray(loader.y))
        return self._dev_data[key][1:]

    def _get_train_scan(self, loader):
        if self._train_scan is not None:
            return self._train_scan
        bsz = loader.batch_size
        k = min(len(loader), len(loader.x) // bsz)   # full batches only
        augmented = loader.augment is not None
        norm = getattr(loader, "normalize_kind", None) \
            if loader.normalize is not None else None
        step = self._train_step
        skey = None
        if self._step_memo:
            # memoised steps are process-immortal, so keying the scan on
            # the step OBJECT is stable; per-shape retraces live inside
            # the one jitted callable
            skey = ("train_scan", step, k, bsz, augmented, norm)
            hit = _SCAN_MEMO.get(skey)
            if hit is not None:
                self._train_scan = hit
                return hit

        @jax.jit
        def run(state, metric_state, xd, yd, idx, ays, axs, afl):
            xe = jnp.take(xd, idx, 0).reshape((k, bsz) + xd.shape[1:])
            ye = jnp.take(yd, idx, 0).reshape((k, bsz) + yd.shape[1:])

            def body(carry, inp):
                st, ms = carry
                x, y, a_ys, a_xs, a_fl = inp
                if augmented:
                    x = _device_augment_cifar(x, a_ys, a_xs, a_fl)
                x = _device_normalize(x, norm)
                st, ms, logs = step(st, ms, x, y)
                return (st, ms), logs

            (st, ms), logs = jax.lax.scan(
                body, (state, metric_state), (xe, ye, ays, axs, afl))
            return st, ms, jax.tree.map(lambda a: a[-1], logs)

        self._train_scan = run
        if skey is not None:
            _SCAN_MEMO[skey] = run
        return run

    def _get_eval_scan(self, loader, k: int):
        ck = (id(loader), k)
        if ck in self._eval_scans:
            return self._eval_scans[ck][1]
        bsz = loader.batch_size
        norm = getattr(loader, "normalize_kind", None) \
            if loader.normalize is not None else None
        step = self._eval_step
        skey = None
        if self._step_memo:
            skey = ("eval_scan", step, k, bsz, norm)
            hit = _SCAN_MEMO.get(skey)
            if hit is not None:
                self._eval_scans[ck] = (loader, hit)
                return hit

        @jax.jit
        def run(state, metric_state, xd, yd, base_key, key_base_idx):
            xe = xd[:k * bsz].reshape((k, bsz) + xd.shape[1:])
            ye = yd[:k * bsz].reshape((k, bsz) + yd.shape[1:])

            def body(carry, inp):
                st, ms = carry
                i, x, y = inp
                x = _device_normalize(x, norm)
                key = jax.random.fold_in(base_key, key_base_idx + i)
                st, ms = step(st, ms, x, y, key)
                return (st, ms), None

            (st, ms), _ = jax.lax.scan(
                body, (state, metric_state),
                (jnp.arange(k, dtype=jnp.int32), xe, ye))
            return st, ms

        self._eval_scans[ck] = (loader, run)   # pin loader (id-key reuse)
        if skey is not None:
            _SCAN_MEMO[skey] = run
        return run

    def init_state(self, variables, rng) -> TrainState:
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return TrainState(
            params=params, model_state=model_state,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=rng)

    def variables(self, state: TrainState):
        return {"params": state.params, **state.model_state}

    # ------------------------------------------------------------------
    def train_epoch(self, state: TrainState):
        t0 = time.time()
        metric_state = _metrics_init(self.cfg.task)
        logs = {}
        loader = self.train_loader
        if _scan_eligible(self.cfg, self.mesh, loader):
            idx, aug, tail_aug = loader.epoch_plan()
            n, bsz = len(loader.x), loader.batch_size
            k = min(len(loader), n // bsz)           # full batches
            if aug is None:
                dummy = np.zeros((k, bsz), np.int32)
                aug = (dummy, dummy, dummy)
            xd, yd = self._loader_dev(loader)
            run = self._get_train_scan(loader)
            state, metric_state, logs = run(
                state, metric_state, xd, yd,
                jnp.asarray(idx[:k * bsz]), *map(jnp.asarray, aug))
            if len(loader) > k:
                # ragged tail batch (drop_last=False, torch semantics):
                # one extra step outside the scan, same draws/order as
                # the host loop (epoch_plan consumed the tail draws)
                sel = jnp.asarray(idx[k * bsz:])
                xb = jnp.take(xd, sel, 0)
                yb = jnp.take(yd, sel, 0)
                if tail_aug is not None:
                    xb = _device_augment_cifar(
                        xb, *map(jnp.asarray, tail_aug))
                norm = getattr(loader, "normalize_kind", None) \
                    if loader.normalize is not None else None
                xb = _device_normalize(xb, norm)
                state, metric_state, logs = self._train_step(
                    state, metric_state, xb, yb)
            # one batched device->host transfer for all scalars (each
            # separate float() pays a full relay RTT)
            fetched = jax.device_get(
                (_metrics_compute(self.cfg.task, metric_state), logs))
            out = {k2: float(v) for d in fetched for k2, v in d.items()}
            self.train_time += time.time() - t0
            return state, out
        for i, (x, y) in enumerate(self.train_loader):
            step, sharded = self._pick_step(self._sharded_train_step,
                                            self._train_step, len(y))
            if sharded:
                from qbn_tpu.parallel.mesh import shard_batch
                x, y = shard_batch((x, y), self.mesh)
            state, metric_state, logs = step(state, metric_state, x, y)
            if i % self.cfg.report_freq == 0 and i > 0:
                log.info("train step %d/%d obj=%.4f", i,
                         len(self.train_loader), float(logs["obj"]))
            if self.cfg.debug:
                break
        fetched = jax.device_get(
            (_metrics_compute(self.cfg.task, metric_state), logs))
        out = {k: float(v) for d in fetched for k, v in d.items()}
        self.train_time += time.time() - t0
        return state, out

    def _eval_batches(self, loader, start: int):
        """Batches from index `start` on. start > 0 only on the eval-scan
        path (shuffle=False, augment=None — see _scan_eligible), where the
        remainder batch is sliced directly."""
        if start == 0:
            yield from enumerate(loader)
            return
        bsz = loader.batch_size
        for i in range(start, len(loader)):
            xb = loader.x[i * bsz:(i + 1) * bsz]
            if loader.normalize is not None:
                xb = loader.normalize(xb)
            yield i, (xb, loader.y[i * bsz:(i + 1) * bsz])

    def eval_epoch(self, state: TrainState, loader, seed: int = 0):
        t0 = time.time()
        metric_state = _metrics_init(self.cfg.task)
        start = 0
        if _scan_eligible(self.cfg, self.mesh, loader, need_full=False) \
                and not loader.shuffle and loader.augment is None:
            k = len(loader.x) // loader.batch_size
            if k >= 2:
                xd, yd = self._loader_dev(loader)
                run = self._get_eval_scan(loader, k)
                state, metric_state = run(
                    state, metric_state, xd, yd,
                    jax.random.PRNGKey(self.cfg.seed + 17),
                    jnp.asarray(seed * 100003, jnp.int32))
                start = k
        for i, (x, y) in self._eval_batches(loader, start):
            key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 17),
                                     seed * 100003 + i)
            step, sharded = self._pick_step(self._sharded_eval_step,
                                            self._eval_step, len(y))
            if sharded:
                from qbn_tpu.parallel.mesh import shard_batch
                x, y = shard_batch((x, y), self.mesh)
            state, metric_state = step(state, metric_state, x, y, key)
            if self.cfg.debug:
                break
        out = {k: float(v) for k, v in jax.device_get(
            _metrics_compute(self.cfg.task, metric_state)).items()}
        self.val_time += time.time() - t0
        return state, out

    def key_metric(self, metrics: Dict[str, float]) -> float:
        return metrics["error" if self.cfg.task == "classification"
                       else "rmse"]

    # ------------------------------------------------------------------
    def train_loop(self, state: TrainState, special_info: str = ""):
        """Full training run with checkpoint policy. Returns
        (state, best_error)."""
        cfg = self.cfg
        best_error = float("inf")
        dirty = False
        for epoch in range(cfg.epochs):
            self.epoch = epoch
            state, train_m = self.train_epoch(state)
            log.info("epoch %d/%d train %s", epoch, cfg.epochs, train_m)
            if self.writer is not None:
                for k, v in train_m.items():
                    self.writer.scalar(f"train/{k}", v, epoch)

            val_error = best_error
            if self.valid_loader is not None:
                state, val_m = self.eval_epoch(state, self.valid_loader,
                                               seed=epoch)
                val_error = self.key_metric(val_m)
                log.info("epoch %d valid %s", epoch, val_m)
                if self.writer is not None:
                    for k, v in val_m.items():
                        self.writer.scalar(f"valid/{k}", v, epoch)

            if cfg.save_last or val_error <= best_error:
                info = special_info
                if (cfg.optimizer == "sghmc"
                        and epoch >= cfg.burnin_epochs and epoch % 2 == 0
                        and epoch >= cfg.epochs - cfg.samples * 2):
                    # posterior snapshot (reference: trainer.py:75-79) —
                    # stamped files always hit disk (each is a distinct
                    # posterior member). With sghmc_guard > 0 (framework
                    # extra, default off) a snapshot is skipped while the
                    # chain sits in a diverged mode (val key metric above
                    # best-so-far + guard), so late mode-hops cannot fill
                    # the ensemble with garbage members.
                    diverged = (cfg.sghmc_guard > 0.0
                                and self.valid_loader is not None
                                and val_error > best_error
                                + cfg.sghmc_guard)
                    if diverged:
                        log.info(
                            "epoch %d: SKIPPING sghmc snapshot "
                            "(val %.4f > best %.4f + guard %.4f)",
                            epoch, val_error, best_error, cfg.sghmc_guard)
                    else:
                        info = f"{special_info}_{epoch}"
                        save_variables(self.variables(state),
                                       checkpoint_path(cfg.save, info))
                elif cfg.save_last:
                    # save-last overwrites one file per epoch; through the
                    # relay each save is a full variable-tree fetch (RTT +
                    # transfer + staging-buffer leak), so defer to a
                    # periodic flush + one final save — the final artifact
                    # is identical (the last state)
                    dirty = True
                    if (epoch + 1) % _ckpt_flush_every() == 0:
                        save_variables(self.variables(state),
                                       checkpoint_path(cfg.save,
                                                       special_info))
                        dirty = False
                else:
                    # best-only policy: save exactly on improvement
                    save_variables(self.variables(state),
                                   checkpoint_path(cfg.save, info))
                best_error = min(best_error, val_error)
        if dirty:
            save_variables(self.variables(state),
                           checkpoint_path(cfg.save, special_info))
        return state, best_error
