"""Jitted train/eval engine.

The TPU-native counterpart of ``medsos_lrcn/src/train_eval.py``: one compiled
train step (forward + loss + backward + optimizer update, parameters donated),
one compiled eval step accumulating confusion counts on device, epoch loop on
the host. Matches the reference's training semantics:

  * multiclass: cross-entropy, optionally class-weighted like torch
    ``CrossEntropyLoss(weight=...)`` (weighted mean) — ``train_eval.py:25-29``
  * multiple_binary: per-class ``BCEWithLogits(pos_weight)`` summed over
    classes — ``train_eval.py:31-39``
  * epoch loss/accuracy lines, ``training_duration`` / ``inference_duration``
    prints, loss-threshold early stop — ``train_eval.py:45-54``, and the
    patience-based variant of ``lrcn/videomamba.py:632-658``
  * parameter counting (trainable vs frozen) — ``train_eval.py:121-129``

Parallelism: batches shard over the mesh ``data`` axis, parameters replicate;
with N devices the same compiled step runs SPMD and XLA all-reduces gradients
over ICI (replacing nothing in the reference — it is single-device only).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from vct.core.config import Config
from vct.core.metrics_contract import (
    RunMetrics,
    print_epoch_line,
    print_inference_duration,
    print_metric_block,
    print_param_counts,
    print_training_duration,
)
from vct.models import build_model
from vct.parallel.mesh import batch_sharding, host_to_device, make_mesh
from vct.train.metrics import (
    multiclass_confusion,
    multiclass_metrics,
    multilabel_counts,
    multilabel_metrics,
)

__all__ = ["TrainState", "Trainer", "compute_class_weights", "count_parameters"]

FROZEN_KEY = "cnn_backbone"


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    extra_vars: Any  # batch_stats etc. (held fixed: frozen backbone)
    opt_state: Any
    rng: jax.Array


def compute_class_weights(y: np.ndarray, num_classes: int, classif_mode: str):
    """Balanced class weights (reference: sklearn compute_class_weight
    'balanced' for CE — ``ucf50-lrcn.py:591-602``; pos_weight = neg/pos for
    the per-class BCE losses)."""
    if classif_mode == "multiclass":
        counts = np.bincount(y.astype(np.int64), minlength=num_classes).astype(np.float64)
        weights = len(y) / np.maximum(num_classes * counts, 1.0)
        return weights.astype(np.float32)
    pos = y.sum(axis=0).astype(np.float64)
    neg = len(y) - pos
    return (neg / np.maximum(pos, 1.0)).astype(np.float32)


def _param_label_tree(params, finetune: bool, freeze_until: str = ""):
    """Optimizer labels: freeze the whole backbone (finetune=False), or —
    with finetune=True and freeze_until set — only the listed backbone
    prefixes (rgb_lrcn.py:208-245 freeze_until_layer pattern)."""
    labels = {}
    prefixes = [p.strip() for p in freeze_until.split(",") if p.strip()]
    for k in params:
        if k != FROZEN_KEY:
            labels[k] = "train"
        elif not finetune:
            labels[k] = "freeze"
        elif prefixes:
            labels[k] = {
                kk: (
                    "freeze"
                    if any(kk == p or kk.startswith(p) for p in prefixes)
                    else "train"
                )
                for kk in params[k]
            }
        else:
            labels[k] = "train"
    return labels


def _scale_learning_rate(state: TrainState, factor: float):
    """Multiply the injected learning_rate hyperparameter in the optimizer
    state by ``factor`` (ReduceLROnPlateau's lr update, host-side between
    epochs — no retrace, the lr is state not a compile-time constant)."""
    import optax.tree_utils as otu

    current = otu.tree_get(state.opt_state, "learning_rate")
    new_lr = jnp.asarray(current) * factor
    opt_state = otu.tree_set(state.opt_state, learning_rate=new_lr)
    return state.replace(opt_state=opt_state), float(new_lr)


def count_parameters(
    params, finetune: bool = False, freeze_until: str = ""
) -> Dict[str, int]:
    """Trainable / non-trainable / total (train_eval.py:121-129). Matches
    torch semantics: BN running stats are buffers and not counted. Respects
    partial freezing (finetune=True + freeze_until)."""

    def _size(tree):
        return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)))

    backbone = params.get(FROZEN_KEY, {})
    if not finetune:
        frozen = _size(backbone)
    elif freeze_until:
        prefixes = [p.strip() for p in freeze_until.split(",") if p.strip()]
        frozen = sum(
            _size(sub)
            for key, sub in backbone.items()
            if any(key == p or key.startswith(p) for p in prefixes)
        )
    else:
        frozen = 0
    total = _size(params)
    return {
        "Trainable parameters": total - frozen,
        "Non-trainable parameters": frozen,
        "Total parameters": total,
    }


class Trainer:
    def __init__(
        self,
        cfg: Config,
        class_names: List[str],
        mesh: Optional[Mesh] = None,
        class_weights: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        self.class_names = class_names
        self.num_classes = cfg.model.num_classes
        self.classif_mode = cfg.model.classif_mode
        self.model = build_model(cfg.model, cfg.data.sequence_length)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.class_weights = (
            jnp.asarray(class_weights) if class_weights is not None else None
        )
        self._tx = self._make_optimizer()
        self._train_step = None
        self._eval_step = None
        self._val_step = None
        self._feat_fn = None
        # train.feature_cache: train/val steps consume cached backbone
        # features instead of raw clips (set in fit; baked into the traced
        # steps, so flipping it rebuilds them).
        self._feature_mode = False
        # Batches must divide evenly over the mesh data axis; pad with
        # mask-0 rows up to the next multiple (loss/metrics ignore padding).
        data_size = self.mesh.shape["data"]
        bs = cfg.train.batch_size
        self._padded_bs = ((bs + data_size - 1) // data_size) * data_size

    def _pad_batch(self, xb, yb, mask):
        target = self._padded_bs
        if xb.shape[0] > target:
            # A loader with a bigger batch than cfg.train.batch_size: pad up
            # to its own next mesh multiple (one extra compile per distinct
            # batch size, never a negative pad).
            data_size = self.mesh.shape["data"]
            target = ((xb.shape[0] + data_size - 1) // data_size) * data_size
        pad = target - xb.shape[0]
        if pad:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            yb = np.concatenate([yb, np.zeros((pad,) + yb.shape[1:], yb.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        return xb, yb, mask

    # ------------------------------------------------------------------
    def _make_optimizer(self):
        t = self.cfg.train
        # inject_hyperparams puts learning_rate into the optimizer STATE, so
        # the plateau scheduler can lower it between epochs (host-side
        # tree_set) without retracing the compiled step.
        if t.optimizer == "adam":
            base = optax.inject_hyperparams(optax.adam)(
                learning_rate=t.learning_rate
            )
        elif t.optimizer == "adamw":
            base = optax.inject_hyperparams(optax.adamw)(
                learning_rate=t.learning_rate, weight_decay=t.weight_decay
            )
        elif t.optimizer == "sgd":
            base = optax.inject_hyperparams(optax.sgd)(
                learning_rate=t.learning_rate
            )
        else:
            raise KeyError(f"Unknown optimizer: {t.optimizer}")
        chain = []
        if t.grad_clip and t.grad_clip > 0:
            chain.append(optax.clip_by_global_norm(t.grad_clip))
        chain.append(base)
        tx = optax.chain(*chain)
        return optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            lambda params: _param_label_tree(
                params, self.cfg.model.finetune, self.cfg.model.freeze_until
            ),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_x: np.ndarray) -> TrainState:
        from vct.parallel.mesh import activate_mesh

        with activate_mesh(self.mesh):  # seq_shard needs axis names at trace
            variables = self.model.init(rng, jnp.asarray(sample_x[:1]))
        if self.cfg.model.backbone_weights:
            # pretrained=True equivalent (models.py:133): port a user-supplied
            # torchvision state_dict into the backbone submodule.
            from vct.models.backbones.port import (
                load_state_dict_file,
                port_backbone_into_model,
            )

            variables = port_backbone_into_model(
                variables,
                self.cfg.model.cnn_backbone,
                load_state_dict_file(self.cfg.model.backbone_weights),
            )
        if self.cfg.train.init_from:
            # Warm-start from a saved checkpoint (shapes must match).
            from vct.train.checkpoint import load_checkpoint

            loaded, _, _, _ = load_checkpoint(self.cfg.train.init_from)
            jax.tree_util.tree_map(
                lambda a, b: None
                if a.shape == b.shape
                else (_ for _ in ()).throw(
                    ValueError(f"init_from shape mismatch: {a.shape} vs {b.shape}")
                ),
                variables["params"],
                loaded["params"],
            )
            variables = {
                k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in loaded.items()
            }
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        opt_state = self._tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            extra_vars=extra,
            opt_state=opt_state,
            rng=rng,
        )
        return host_to_device(state, self.mesh)

    # ------------------------------------------------------------------
    def _loss_fn(self, logits, labels, mask):
        if self.classif_mode == "multiclass":
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            if self.class_weights is not None:
                w = self.class_weights[labels] * mask
                loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
            else:
                loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1e-8)
            preds = jnp.argmax(logits, axis=-1)
            correct = jnp.sum((preds == labels).astype(jnp.float32) * mask)
            total = jnp.sum(mask)
        else:
            labels_f = labels.astype(logits.dtype)
            # per-class BCEWithLogits(pos_weight), mean over batch, summed
            # over classes (train_eval.py:31-36).
            log_p = jax.nn.log_sigmoid(logits)
            log_not_p = jax.nn.log_sigmoid(-logits)
            pw = self.class_weights if self.class_weights is not None else 1.0
            bce = -(pw * labels_f * log_p + (1 - labels_f) * log_not_p)
            per_class_mean = jnp.sum(bce * mask[:, None], axis=0) / jnp.maximum(
                jnp.sum(mask), 1e-8
            )
            loss = jnp.sum(per_class_mean)
            preds = (jax.nn.sigmoid(logits) > 0.5).astype(labels_f.dtype)
            correct = jnp.sum((preds == labels_f).astype(jnp.float32) * mask[:, None])
            total = jnp.sum(mask) * self.num_classes
        return loss, (correct, total)

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model = self.model
        tx = self._tx
        donate = self.cfg.mesh.donate

        # from_features is only a kwarg on feature-cache-capable models —
        # pass it solely when the mode is on, so scratch CNNs and other
        # families keep their plain signature.
        apply_kwargs = {"from_features": True} if self._feature_mode else {}

        def train_step(state: TrainState, xb, yb, mask):
            rng, dropout_rng = jax.random.split(state.rng)
            # Mutable collections (batch_stats in the scratch CNN models)
            # update during the step; frozen-backbone models never write
            # theirs, so the returned collection equals the input.
            mutable = list(state.extra_vars.keys())

            def loss_of(params):
                logits, new_vars = model.apply(
                    {"params": params, **state.extra_vars},
                    xb,
                    deterministic=False,
                    rngs={"dropout": dropout_rng},
                    mutable=mutable,
                    **apply_kwargs,
                )
                loss, aux = self._loss_fn(logits, yb, mask)
                return loss, (aux, new_vars)

            (loss, ((correct, total), new_vars)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state, rng=rng,
                extra_vars={**state.extra_vars, **new_vars},
            )
            return new_state, loss, correct, total

        return self._with_mesh(
            jax.jit(train_step, donate_argnums=(0,) if donate else ())
        )

    def _build_eval_step(self):
        model = self.model
        num_classes = self.num_classes
        mode = self.classif_mode

        def eval_step(params, extra_vars, xb, yb, mask):
            logits = model.apply({"params": params, **extra_vars}, xb)
            if mode == "multiclass":
                # One forward serves both confusion counts and AUC probs.
                conf = multiclass_confusion(logits, yb, num_classes, mask)
                return conf, jax.nn.softmax(logits, axis=-1)
            return multilabel_counts(logits, yb, mask)

        return self._with_mesh(jax.jit(eval_step))

    def _put_batch(self, xb, yb, mask, shard):
        """Device-put one padded batch; uint8 clips are normalized on-device
        (uint8 also quarters the host->device copy). Multi-process aware:
        each host contributes its local rows of the global batch
        (vct.parallel.mesh.put_sharded)."""
        from vct.parallel.mesh import put_sharded

        if xb.dtype == np.uint8:
            from vct.data.preprocess import preprocess_clips

            xd = preprocess_clips(put_sharded(xb, shard))
        else:
            xd = put_sharded(np.asarray(xb), shard)
        return (
            xd,
            put_sharded(np.asarray(yb), shard),
            put_sharded(np.asarray(mask, np.float32), shard),
        )

    def _extract_features(self, state: TrainState, loader, shard):
        """One pass over the loader: backbone features (N, T, F) + labels,
        in loader order (so the shuffle stream pairs them identically to the
        raw-clip path — same num_examples, same permutations)."""
        model = self.model
        if self._feat_fn is None:
            def feat_fn(params, extra_vars, xb):
                return model.apply(
                    {"params": params, **extra_vars}, xb, features_only=True
                )

            self._feat_fn = self._with_mesh(jax.jit(feat_fn))
        chunks, labels, counts = [], [], []
        for xb, yb, mask in loader.epoch():
            n = int(np.sum(mask))
            if n == 0:
                continue
            xbp, ybp, maskp = self._pad_batch(xb, yb, mask)
            xd, _, _ = self._put_batch(xbp, ybp, maskp, shard)
            chunks.append(self._feat_fn(state.params, state.extra_vars, xd))
            counts.append(n)
            labels.append(np.asarray(yb)[:n])
        if not chunks:
            raise ValueError("feature_cache: loader yielded no examples")
        feats = np.concatenate(
            [np.asarray(c)[:n] for c, n in zip(chunks, counts)], axis=0
        )
        return feats, np.concatenate(labels, axis=0)

    def _with_mesh(self, fn):
        """Run a jitted step inside the mesh context so bare-PartitionSpec
        sharding constraints (model.seq_shard) resolve axis names."""
        mesh = self.mesh

        from vct.parallel.mesh import activate_mesh

        def wrapped(*args, **kwargs):
            with activate_mesh(mesh):
                return fn(*args, **kwargs)

        return wrapped

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        x,
        y: Optional[np.ndarray] = None,
        log: bool = True,
        val=None,
    ) -> Tuple[TrainState, RunMetrics]:
        """Epoch loop with the reference's stdout contract.

        ``x`` is either an in-memory array (with labels ``y``) or any batch
        loader (``vct.data.loaders``) — the out-of-core HDF5/clipcache
        streams and the in-RAM path share this one engine (resume, both
        early stops, history JSON, profiling, log_every).

        ``val``: optional held-out data — an (x, y) tuple or a loader. When
        given, a validation loss is computed each epoch and drives BOTH the
        patience early stop and the ReduceLROnPlateau scheduler
        (train.lr_plateau_factor), the VideoMambaTrainer recipe
        (lrcn/mamba.py:374-420); without it, both monitor the train loss."""
        from vct.data.loaders import as_loader
        from vct.utils.profiling import StepTimer, device_trace, write_history

        t = self.cfg.train
        loader = as_loader(x, y, t.batch_size)
        val_loader = None
        if val is not None:
            val_loader = (
                as_loader(val[0], val[1], t.batch_size)
                if isinstance(val, tuple)
                else as_loader(val, None, t.batch_size)
            )
        shard = batch_sharding(self.mesh)
        feature_mode = (
            t.feature_cache
            and not self.cfg.model.finetune
            and getattr(self.model, "supports_feature_cache", False)
        )
        if feature_mode != self._feature_mode:
            self._feature_mode = feature_mode
            self._train_step = None
            self._val_step = None
        rng = np.random.RandomState(t.seed)
        run = RunMetrics()

        stop = False
        best_loss, bad_epochs = float("inf"), 0
        plateau_best, plateau_bad = float("inf"), 0
        start_epoch = 0
        if t.resume:
            from vct.train.checkpoint import load_train_state, save_train_state

            state, start_epoch, saved = load_train_state(t.model_path, state)
            if start_epoch:
                print(f"Resuming training from epoch {start_epoch}")
                # Fast-forward the shuffle stream so epoch k sees the same
                # permutation it would in an uninterrupted run (every loader
                # consumes exactly one permutation per epoch).
                for _ in range(start_epoch):
                    rng.permutation(loader.num_examples)
                if hasattr(loader, "set_epoch"):
                    # Native-shuffle loaders: jump their (seed, epoch)-keyed
                    # permutation stream to the resume point too.
                    loader.set_epoch(start_epoch)
                # Early-stop / LR-plateau counters continue where they were,
                # not from fresh values (a resumed run must behave like an
                # uninterrupted one).
                best_loss = saved.get("best_loss", best_loss)
                bad_epochs = saved.get("bad_epochs", bad_epochs)
                plateau_best = saved.get("plateau_best", plateau_best)
                plateau_bad = saved.get("plateau_bad", plateau_bad)
                # Pre-crash epoch history continues too, so history JSON /
                # RunMetrics cover the whole run, not just post-resume.
                run.epoch_losses = list(saved.get("epoch_losses", []))
                run.epoch_accs = list(saved.get("epoch_accs", []))
                run.val_losses = list(saved.get("val_losses", []))
                if saved.get("stopped"):
                    # The run already early-stopped; training further would
                    # diverge from the uninterrupted run it resumes.
                    print("Checkpointed run had early-stopped; not training "
                          "further.")
                    start_epoch = t.epochs
        if feature_mode and start_epoch < t.epochs:
            # Frozen backbone => per-clip features are bit-constant across
            # epochs (stop_gradient + frozen params + fixed batch_stats).
            # Extract them ONCE, then every epoch trains adapter/RNN/head
            # from the cached block — identical loss trajectory for
            # rng-driven loaders (equality-tested; native-shuffle stream
            # loaders train on the same (feature, label) pairs under their
            # own permutation), no conv-stack recompute per epoch.
            # This runs AFTER the resume restore on purpose: a resumed run
            # must extract from the checkpoint's backbone (warm-started or
            # differently-seeded inits differ from the restored params).
            t0 = time.time()
            fx, fy = self._extract_features(state, loader, shard)
            loader = as_loader(fx, fy, t.batch_size)
            if val_loader is not None:
                vx, vy = self._extract_features(state, val_loader, shard)
                val_loader = as_loader(vx, vy, t.batch_size)
            if log:
                print(
                    f"feature_cache: extracted {fx.shape} backbone features "
                    f"in {time.time() - t0:.1f}s"
                )
        if self._train_step is None:
            self._train_step = self._build_train_step()
        step_fn = self._train_step
        timer = StepTimer()
        start = time.time()
        for epoch in range(start_epoch, t.epochs):
            # Per-step scalars stay ON DEVICE for the whole epoch: fetching
            # loss each step forces a device->host sync that serializes the
            # host-side batch gather against device compute (and costs a full
            # round trip per step on remote-attached chips). One fetch per
            # epoch; log_every opts back into per-step syncs for visibility.
            step_stats = []  # [(loss, correct, total) device scalars]
            step_bs = []  # valid rows per step (host-known from the mask)
            # Trace the FIRST EXECUTED epoch (resumed runs start past 0).
            trace_ctx = device_trace(t.profile_dir if epoch == start_epoch
                                     else None)
            with trace_ctx:
                for step_i, (xb, yb, mask) in enumerate(loader.epoch(rng)):
                    timer.start()  # opens a sync-to-sync span (no-op mid-span)
                    xb, yb, mask = self._pad_batch(xb, yb, mask)
                    xb, yb, mb = self._put_batch(xb, yb, mask, shard)
                    state, loss, c, n = step_fn(state, xb, yb, mb)
                    timer.step()
                    sync = t.log_every and (step_i + 1) % t.log_every == 0
                    if sync:
                        loss_f = float(loss)  # forces completion for timing
                        timer.sync()
                    step_stats.append((loss, c, n))
                    step_bs.append(float(np.sum(mask)))
                    if sync:
                        print(
                            f"step {int(state.step)}: loss {loss_f:.4f} "
                            f"({timer.last_ms:.1f} ms/step)"
                        )
                # One stacked device->host fetch for the whole epoch; loss is
                # each step's mean over valid rows, weighted by that step's
                # valid count. INSIDE the trace context: the fetch forces the
                # queued device work to finish before stop_trace, so the
                # profile actually contains the epoch's compute.
                seen = int(sum(step_bs))
                if step_stats:
                    losses, cs, ns = (
                        np.asarray(jnp.stack(col)) for col in zip(*step_stats)
                    )
                    timer.sync()  # the stacked fetch completed every step
                    epoch_loss = (
                        float(np.dot(losses, np.asarray(step_bs))) / max(seen, 1)
                    )
                    epoch_acc = float(np.sum(cs)) / max(float(np.sum(ns)), 1.0)
                else:
                    epoch_loss, epoch_acc = 0.0, 0.0
            run.epoch_losses.append(epoch_loss)
            run.epoch_accs.append(epoch_acc)
            if log:
                print_epoch_line(epoch, t.epochs, epoch_loss, epoch_acc)
            monitored = epoch_loss
            if val_loader is not None:
                monitored = self._val_loss(state, val_loader, shard)
                run.val_losses.append(monitored)
                if log:
                    print(f"Validation Loss: {monitored:.4f}")
            # loss-threshold early stop (all_config.py:30 EARLY_STOP)
            if t.early_stop and epoch_loss < t.early_stop:
                stop = True
            # patience-based early stop (lrcn/videomamba.py:632-658; on val
            # loss when a val set is given, mamba.py:393-405)
            if t.early_stop_patience:
                if monitored < best_loss - 1e-6:
                    best_loss, bad_epochs = monitored, 0
                else:
                    bad_epochs += 1
                    if bad_epochs >= t.early_stop_patience:
                        stop = True
            # ReduceLROnPlateau (mamba.py:474-476: factor 0.1, patience 5)
            if t.lr_plateau_factor:
                if monitored < plateau_best - 1e-6:
                    plateau_best, plateau_bad = monitored, 0
                else:
                    plateau_bad += 1
                    if plateau_bad >= t.lr_plateau_patience:
                        state, new_lr = _scale_learning_rate(
                            state, t.lr_plateau_factor
                        )
                        plateau_bad = 0
                        if log:
                            print(f"Reducing learning rate to {new_lr:.3e}")
            if t.resume:
                save_train_state(
                    t.model_path, state, self.cfg, self.class_names, epoch + 1,
                    extra={
                        "best_loss": best_loss, "bad_epochs": bad_epochs,
                        "plateau_best": plateau_best,
                        "plateau_bad": plateau_bad,
                        "stopped": bool(stop),
                        "epoch_losses": run.epoch_losses,
                        "epoch_accs": run.epoch_accs,
                        "val_losses": run.val_losses,
                    },
                )
            if stop:
                break

        run.training_duration = time.time() - start
        # Param counts are data consumed downstream (RunMetrics -> sweep
        # stores), not logging — compute them regardless of `log`.
        counts = count_parameters(
            state.params, self.cfg.model.finetune, self.cfg.model.freeze_until
        )
        run.trainable_params = counts["Trainable parameters"]
        run.non_trainable_params = counts["Non-trainable parameters"]
        run.total_params = counts["Total parameters"]
        if log:
            print_training_duration(run.training_duration)
            print_param_counts(run.trainable_params, run.non_trainable_params)
        if t.history_path:
            # per-epoch history JSON (lrcn/training_history.json counterpart)
            write_history(
                t.history_path,
                {
                    "train_loss": run.epoch_losses,
                    "train_acc": run.epoch_accs,
                    "val_loss": run.val_losses,
                    "training_duration": run.training_duration,
                    "step_times": timer.summary(),
                    "config": self.cfg.to_dict(),
                },
            )
        return state, run

    # ------------------------------------------------------------------
    def _build_val_step(self):
        model = self.model
        apply_kwargs = {"from_features": True} if self._feature_mode else {}

        def val_step(params, extra_vars, xb, yb, mask):
            logits = model.apply(
                {"params": params, **extra_vars}, xb, **apply_kwargs
            )
            loss, _ = self._loss_fn(logits, yb, mask)
            return loss

        return self._with_mesh(jax.jit(val_step))

    def _val_loss(self, state: TrainState, val_loader, shard) -> float:
        """Mean of batch losses over the val set (the reference's
        total/len(loader) aggregation, mamba.py:316-324)."""
        if self._val_step is None:
            self._val_step = self._build_val_step()
        # Device scalars accumulate; ONE fetch at the end (a per-batch
        # float() would serialize host gather against device compute, the
        # same sync the train loop avoids).
        losses = []
        for xb, yb, mask in val_loader.epoch():
            xb, yb, mask = self._pad_batch(xb, yb, mask)
            xd, yd, md = self._put_batch(xb, yb, mask, shard)
            losses.append(
                self._val_step(state.params, state.extra_vars, xd, yd, md)
            )
        if not losses:
            return 0.0
        return float(np.mean(np.asarray(jnp.stack(losses))))

    # ------------------------------------------------------------------
    def fit_stream(self, state: TrainState, loader, log: bool = True):
        """Back-compat alias: the loader path IS ``fit`` now."""
        return self.fit(state, loader, log=log)

    # ------------------------------------------------------------------
    def evaluate(
        self,
        state: TrainState,
        x,
        y: Optional[np.ndarray] = None,
        log: bool = True,
        run: Optional[RunMetrics] = None,
        compute_auc: bool = False,
    ) -> RunMetrics:
        """``x`` is an array (with labels ``y``) or any batch loader —
        evaluation streams out-of-core exactly like ``fit``."""
        from vct.data.loaders import as_loader

        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        eval_fn = self._eval_step
        shard = batch_sharding(self.mesh)
        loader = as_loader(x, y, self.cfg.train.batch_size)

        auc_probs, auc_labels = [], []
        want_auc = compute_auc and self.classif_mode == "multiclass"

        start = time.time()
        n_examples = 0
        if self.classif_mode == "multiclass":
            # Per-batch results stay on device; one stacked fetch at the end
            # (a per-batch np.asarray would sync each step).
            confs = []
            for xb, yb, mask in loader.epoch():
                n_valid = int(mask.sum())
                n_examples += n_valid
                xb, yb_h, mask = self._pad_batch(xb, yb, mask)
                xd, yd, md = self._put_batch(xb, yb_h, mask, shard)
                conf, probs = eval_fn(state.params, state.extra_vars, xd, yd, md)
                confs.append(conf)
                if want_auc:
                    auc_probs.append((probs, n_valid))
                    auc_labels.append(yb[:n_valid])
            confusion = (
                np.sum(np.asarray(jnp.stack(confs)), axis=0)
                if confs
                else np.zeros((self.num_classes, self.num_classes))
            )
            if auc_probs:
                # concatenate, not stack: _pad_batch pads oversized loader
                # batches to their OWN mesh multiple, so padded batch shapes
                # can differ within an epoch — still one device->host fetch.
                fetched = np.asarray(
                    jnp.concatenate([p for p, _ in auc_probs], axis=0)
                )
                rows, offset = [], 0
                for p, k in auc_probs:
                    rows.append(fetched[offset : offset + k])
                    offset += p.shape[0]
                auc_probs = rows
            metrics = multiclass_metrics(confusion, self.class_names)
            if auc_probs:
                from vct.train.metrics import macro_auc

                auc = macro_auc(
                    np.concatenate(auc_probs), np.concatenate(auc_labels),
                    self.num_classes,
                )
                metrics.per_class["__auc__"] = {"auc": auc}
                if log:
                    print(f"AUC: {auc:.4f}")
        else:
            batch_counts, batch_exact = [], []
            for xb, yb, mask in loader.epoch():
                n_examples += int(mask.sum())
                xb, yb, mask = self._pad_batch(xb, yb, mask)
                xd, yd, md = self._put_batch(xb, yb, mask, shard)
                c, e = eval_fn(state.params, state.extra_vars, xd, yd, md)
                batch_counts.append(c)
                batch_exact.append(e)
            if batch_counts:
                counts = np.sum(np.asarray(jnp.stack(batch_counts)), axis=0)
                exact = float(np.sum(np.asarray(jnp.stack(batch_exact))))
            else:
                counts, exact = np.zeros((self.num_classes, 4)), 0.0
            metrics = multilabel_metrics(
                counts, exact, float(n_examples), self.class_names
            )

        metrics.inference_duration = time.time() - start
        if run is not None:
            metrics.training_duration = run.training_duration
            metrics.trainable_params = run.trainable_params
            metrics.non_trainable_params = run.non_trainable_params
            metrics.total_params = run.total_params
            metrics.epoch_losses = run.epoch_losses
            metrics.epoch_accs = run.epoch_accs
        if log:
            print_metric_block(metrics, self.class_names, self.classif_mode)
        return metrics
