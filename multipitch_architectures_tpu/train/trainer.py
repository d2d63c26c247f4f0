"""The single configurable trainer.

Replaces the copy-pasted train/val/checkpoint loop of the reference's 111
experiment scripts (canonical anatomy: exp180d…py:290-398, SURVEY §2.8)
with one implementation, TPU-first:

- jitted train/eval steps over a 1-D ``data`` mesh: the batch is sharded
  across devices (NamedSharding), params are replicated; XLA inserts the
  gradient all-reduce over ICI (GSPMD — no hand-written collectives).
  Batch sizes that don't divide the device count are padded and masked
  via per-sample loss weights, so the loss equals the unpadded mean.
- BatchNorm statistics are GLOBAL batch statistics by construction (the
  batch axis is sharded, but XLA computes the true mean/var across
  shards) — stronger than torch DataParallel's per-replica stats.
- AdamW via ``optax.inject_hyperparams`` so the host-side schedulers
  (ReduceLROnPlateau / polynomial LambdaLR / Noam) can set the LR
  between epochs, exactly like the reference's epoch-level scheduling.
- checkpoint-on-best-val + epoch-0 baseline (exp180d…py:372-378), but
  saving the FULL train state (params + batch_stats + optimizer state +
  epoch) via orbax, so training can truly resume — the reference only
  saved model weights (SURVEY §5).
- the reference never calls ``model.eval()`` for validation (dropout and
  batch-mode BN stay active, exp180d…py:340-352); ``val_in_train_mode``
  reproduces that, default False (the sane choice) — set True for
  faithful replication.
"""

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import core as flax_core
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import bce_loss, multitask_bce_ce_loss
from .monitoring import EarlyStopping
from .schedulers import NoamSchedule, ReduceLROnPlateau, \
    noam_optax_schedule, polynomial_decay_lambda


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


@dataclass
class TrainConfig:
    """Mirrors the experiment scripts' config blocks (exp180d…py:100-151)."""

    max_epochs: int = 100
    batch_size: int = 25
    # optimizer (AdamW, exp180d…py:107-113)
    initial_lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01
    # scheduler (exp180d…py:115-135)
    scheduler: Optional[str] = "ReduceLROnPlateau"   # | 'LambdaLR' | 'Noam' | None
    scheduler_params: dict = field(default_factory=dict)
    # early stopping (exp180d…py:139-144)
    early_stopping: bool = True
    es_mode: str = "min"
    es_min_delta: float = 1e-5
    es_patience: int = 12
    es_percentage: bool = False
    # loss
    loss: str = "bce"                                # | 'multitask'
    # reference quirks / caps
    val_in_train_mode: bool = False
    max_train_batches: Optional[int] = None          # 'moresamples' 3800 cap
    seed: int = 0


def _loss_fn_for(name: str) -> Callable:
    if name == "bce":
        def fn(outputs, y, weights):
            if isinstance(outputs, tuple):
                outputs = outputs[0]
            return bce_loss(outputs, y, weights)
        return fn
    if name == "multitask":
        return multitask_bce_ce_loss
    raise ValueError(f"unknown loss {name!r}")


class Trainer:
    """Owns the jitted steps, the mesh, and the epoch loop.

    Args:
        model: a flax module from ``.models`` (NCHW in/out).
        config: :class:`TrainConfig`.
        mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis;
            defaults to all visible devices on one axis.
        logger: python logger (reference-format epoch lines).
    """

    def __init__(self, model, config: TrainConfig,
                 mesh: Optional[Mesh] = None,
                 logger: Optional[logging.Logger] = None):
        self.model = model
        self.config = config
        self.mesh = mesh or Mesh(np.array(jax.devices()), ("data",))
        self.logger = logger or logging.getLogger(__name__)
        self._loss = _loss_fn_for(config.loss)
        if config.scheduler == "Noam":
            # per-STEP warmup (reference noam_opt.step wraps every
            # optimizer.step, lr_schedulers.py:26-31) — an on-device optax
            # schedule, not host epoch-level injection
            sp = dict(config.scheduler_params)
            self._noam = NoamSchedule(sp.get("model_size", 512),
                                      sp.get("warmup", 4000))
            self.tx = optax.adamw(
                learning_rate=noam_optax_schedule(
                    self._noam.model_size, self._noam.warmup),
                b1=config.betas[0], b2=config.betas[1], eps=config.eps,
                weight_decay=config.weight_decay)
            self.lr = self._noam.rate(2)  # rate of the first update
        else:
            self.tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=config.initial_lr, b1=config.betas[0],
                b2=config.betas[1], eps=config.eps,
                weight_decay=config.weight_decay)
            self.lr = config.initial_lr
        self._make_scheduler()
        self._replicated = NamedSharding(self.mesh, P())

    # -- setup ------------------------------------------------------------

    def _make_scheduler(self):
        cfg = self.config
        sp = dict(cfg.scheduler_params)
        if cfg.scheduler == "ReduceLROnPlateau":
            sp.setdefault("factor", 0.5)
            sp.setdefault("patience", 5)
            sp.setdefault("threshold", 1e-4)
            sp.setdefault("min_lr", 1e-6)
            self.scheduler = ReduceLROnPlateau(cfg.initial_lr, **sp)
        elif cfg.scheduler == "LambdaLR":
            self._lambda = polynomial_decay_lambda(
                sp.get("start_lr", 1.0), sp.get("end_lr", 1e-2),
                sp.get("n_decay", 20), sp.get("exp_decay", 0.5))
            self.scheduler = None
        elif cfg.scheduler == "Noam":
            self.scheduler = None  # handled per-step inside optax
        else:
            self.scheduler = None

    def init(self, sample_x, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        variables = self.model.init({"params": rng}, jnp.asarray(sample_x),
                                    train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", flax_core.freeze({}))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            tx=self.tx,
        )
        return jax.device_put(state, self._replicated)

    # -- steps ------------------------------------------------------------

    def _forward_loss(self, params, batch_stats, x, y, w, key, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        out = self.model.apply(
            variables, x, train=train,
            rngs={"dropout": key} if train else None,
            mutable=mutable)
        if mutable:
            outputs, updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            outputs, new_stats = out, batch_stats
        return self._loss(outputs, y, w), new_stats

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _train_step(self, state: TrainState, x, y, w, key):
        def lf(params):
            return self._forward_loss(params, state.batch_stats, x, y, w,
                                      key, train=True)

        (loss, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_stats), loss

    @partial(jax.jit, static_argnums=(0, 6))
    def _eval_step(self, params, batch_stats, x, y, w, train_mode, key):
        """Returns (loss, batch_stats). Under ``train_mode`` (the
        reference's val loop never calls model.eval(), exp180d…py:340-352)
        every val forward ALSO advances the BatchNorm running statistics —
        and those mutated stats are what the reference checkpoints and
        uses at test time, so they are returned for the caller to keep."""
        if train_mode:
            loss, new_stats = self._forward_loss(params, batch_stats, x, y,
                                                 w, key, train=True)
        else:
            loss, new_stats = self._forward_loss(params, batch_stats, x, y,
                                                 w, key, train=False)
        return loss, new_stats

    def _shard(self, x, y):
        """Pad the batch to a multiple of the mesh size, build loss
        weights, and place shards.

        Padding REPLICATES leading samples (wrap-around) rather than
        zero-filling: padded samples carry zero loss weight either way,
        but batch-coupled computations (train-mode BatchNorm statistics,
        the reference's cross-batch attention quirk) then see real data
        instead of zeros. For batch-decoupled models the computed loss is
        exactly the unpadded mean (tests/test_parallel.py)."""
        n = x.shape[0]
        d = self.mesh.devices.size
        pad = (-n) % d
        w = np.ones(n + pad, np.float32)
        if pad:
            reps = -(-(n + pad) // n)
            x = jnp.concatenate([x] * reps, axis=0)[:n + pad]
            y = jnp.concatenate([y] * reps, axis=0)[:n + pad]
            w[n:] = 0.0
        sharding = NamedSharding(self.mesh, P("data"))
        return (jax.device_put(x, sharding), jax.device_put(y, sharding),
                jax.device_put(jnp.asarray(w), sharding))

    # -- epoch loop -------------------------------------------------------

    def fit(self, train_batches_fn, val_batches_fn=None,
            state: Optional[TrainState] = None,
            checkpoint_dir: Optional[str] = None,
            start_epoch: int = 0, initial_best: Optional[float] = None):
        """Run the full training loop.

        Args:
            train_batches_fn: callable(epoch, key) → iterable of (x, y)
                device batches (e.g. a TrainPipeline.batches closure).
            val_batches_fn: like train_batches_fn, or None.
            state: optional initial state (else caller must have used
                ``init`` and pass it here).
            checkpoint_dir: where to save best checkpoints (orbax).
            start_epoch: first epoch index to run — pass
                ``epoch + 1`` from ``_Checkpointer.restore`` to resume.
                PRNG streams are a pure function of (seed, epoch,
                batch index), so a resumed run replays the exact
                augmentation/dropout randomness of a straight run
                (deterministic resume; the restored lr and best metric
                are carried in the checkpoint — patience counters
                restart).
            initial_best: the restored checkpoint's metric — seeds the
                early-stopping best so a resumed run never overwrites
                the best checkpoint with a worse first epoch.
        Returns: (state_of_best_or_last, history dict)
        """
        cfg = self.config
        assert state is not None, "call trainer.init(...) first"
        es = EarlyStopping(cfg.es_mode, cfg.es_min_delta, cfg.es_patience,
                           cfg.es_percentage) if cfg.early_stopping else None
        if es is not None and initial_best is not None \
                and not np.isnan(initial_best):
            es.best = initial_best
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        history = {"train_loss": [], "val_loss": [], "lr": []}
        ckpt = _Checkpointer(checkpoint_dir) if checkpoint_dir else None

        for epoch in range(start_epoch, cfg.max_epochs):
            if cfg.scheduler == "LambdaLR":
                self.lr = cfg.initial_lr * self._lambda(epoch)
            # per-epoch streams derived by fold_in: identical whether the
            # epoch is reached by straight training or by resume
            ktrain, kval, kepoch, kvdata = jax.random.split(
                jax.random.fold_in(base_key, epoch), 4)

            accum, n_batches = 0.0, 0
            state = self._with_lr(state, self.lr)
            for x, y in train_batches_fn(epoch, kepoch):
                kstep = jax.random.fold_in(ktrain, n_batches)
                xs, ys, ws = self._shard(x, y)
                state, loss = self._train_step(state, xs, ys, ws, kstep)
                accum += float(loss)
                n_batches += 1
                if cfg.max_train_batches and n_batches >= cfg.max_train_batches:
                    break
            train_loss = accum / max(n_batches, 1)

            val_loss = None
            if val_batches_fn is not None:
                vaccum, vn = 0.0, 0
                for x, y in val_batches_fn(epoch, kvdata):
                    kstep = jax.random.fold_in(kval, vn)
                    n = x.shape[0]
                    if cfg.val_in_train_mode and n % self.mesh.devices.size:
                        # exact-batch placement: padded rows would enter
                        # the train-mode BatchNorm statistics that this
                        # mode PERSISTS into the checkpoint; run ragged
                        # val batches replicated so stats cover exactly
                        # the reference's batch rows
                        xs = jax.device_put(jnp.asarray(x), self._replicated)
                        ys = jax.device_put(jnp.asarray(y), self._replicated)
                        ws = jax.device_put(jnp.ones(n, jnp.float32),
                                            self._replicated)
                    else:
                        xs, ys, ws = self._shard(x, y)
                    loss, new_stats = self._eval_step(
                        state.params, state.batch_stats, xs, ys, ws,
                        cfg.val_in_train_mode, kstep)
                    if cfg.val_in_train_mode:
                        state = state.replace(batch_stats=new_stats)
                    vaccum += float(loss)
                    vn += 1
                # an empty val iterator must not masquerade as perfect loss
                val_loss = vaccum / vn if vn else None

            if cfg.scheduler == "Noam":
                # the schedule lives inside optax; refresh the logged lr
                # to the rate applied by this epoch's most recent update
                # (reference noam_opt._rate, lr_schedulers.py:31) BEFORE
                # the epoch line, not after
                self.lr = self._noam.rate(int(state.step) + 1)

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["lr"].append(self.lr)
            self.logger.info(
                "Epoch #%d finished. Train Loss: %.4f%s with lr: %.5f",
                epoch, train_loss,
                f", Val Loss: {val_loss:.4f}" if val_loss is not None else "",
                self.lr)

            metric = val_loss if val_loss is not None else train_loss
            if self.scheduler is not None and cfg.scheduler == \
                    "ReduceLROnPlateau":
                self.lr = self.scheduler.step(metric)

            if es is not None:
                # the run's first epoch checkpoints when there is no
                # prior best (the reference's epoch-0 baseline save,
                # exp180d…py:372); a resumed run seeds es.best from the
                # checkpoint, so a WORSE first resumed epoch does not
                # clobber the restored best
                if es.best is None:
                    # patience==0 never records a best (reference
                    # monitoring.py:23-25 - every epoch "is better").
                    # A RESUMED run whose checkpoint carried no metric
                    # (legacy/NaN) must NOT save unconditionally — the
                    # on-disk best may beat this epoch; wait until
                    # es.step seeds a comparable best
                    if start_epoch > 0 and epoch == start_epoch \
                            and es.patience != 0:
                        self.logger.warning(
                            "resumed without a best metric: epoch #%d "
                            "is not checkpointed unconditionally to "
                            "avoid clobbering a better on-disk best",
                            epoch)
                    save = (epoch == start_epoch and start_epoch == 0) \
                        or es.patience == 0
                else:
                    save = es.curr_is_better(metric)
                if save:
                    if ckpt:
                        ckpt.save(state, epoch, self.lr, metric)
                    self.logger.info("  .... model of epoch #%d saved.", epoch)
                if es.step(metric):
                    break
            elif ckpt:
                ckpt.save(state, epoch, self.lr, metric)
        return state, history

    def _with_lr(self, state: TrainState, lr: float) -> TrainState:
        opt_state = state.opt_state
        try:
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        except (AttributeError, TypeError):
            pass
        return state.replace(opt_state=opt_state)


class _Checkpointer:
    """orbax full-train-state checkpointing (params + batch_stats +
    optimizer state + epoch) — true resume, unlike the reference's
    weights-only torch.save (SURVEY §5)."""

    def __init__(self, directory):
        import os

        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, state: TrainState, epoch: int, lr: float = 0.0,
             metric: Optional[float] = None):
        import os

        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": jnp.asarray(epoch),
            "lr": np.asarray(float(lr), np.float64),
            "metric": np.asarray(
                float("nan") if metric is None else float(metric),
                np.float64),
        }
        path = os.path.join(self.dir, "best")
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, like_state: TrainState):
        """Returns (state, epoch, lr, metric) — resume with
        ``trainer.lr = lr; trainer.fit(..., state=state,
        start_epoch=epoch + 1, initial_best=metric)``. ``lr`` is 0.0 and
        ``metric`` NaN for checkpoints written before these fields
        existed (restore falls back to the bare-state template)."""
        import os

        path = os.path.join(self.dir, "best")
        base = {
            "params": like_state.params,
            "batch_stats": like_state.batch_stats,
            "opt_state": like_state.opt_state,
            "step": like_state.step,
            "epoch": jnp.asarray(0),
        }
        extras = {"lr": np.asarray(0.0, np.float64),
                  "metric": np.asarray(float("nan"), np.float64)}
        try:
            restored = self._ckptr.restore(path, {**base, **extras})
        except Exception:
            restored = dict(self._ckptr.restore(path, base))
            restored.update(lr=0.0, metric=float("nan"))
        return like_state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ), int(restored["epoch"]), float(restored["lr"]), \
            float(restored["metric"])
