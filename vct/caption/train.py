"""Caption training/eval (C30).

Teacher-forced cross-entropy ignoring <pad>, gradient clipping, per-epoch
checkpoints with resume (``s2vt/beam_search.py:207-226,441-480``;
``main_configurable.py:337-457``), greedy + beam-search evaluation with the
'Average BLEU score' print. The train step is jitted with donated state;
checkpoints are Orbax trees with an epoch-stamped manifest instead of the
reference's ``torch.save({'model_state_dict', ...})`` pickle.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vct.caption.beam import beam_search, decode_tokens, greedy_decode
from vct.caption.bleu import corpus_average_bleu
from vct.caption.models import S2VTModel
from vct.caption.vocab import Vocabulary
from vct.core.config import CaptionConfig

__all__ = ["CaptionTrainer", "CaptionState", "build_captioner",
           "restore_caption_trainer"]

PAD_ID = 0


def build_captioner(cfg: CaptionConfig, vocab_size: int):
    """String-dispatched captioner families (caption.model_kind)."""
    if cfg.model_kind == "transformer":
        from vct.caption.transformer import TransformerCaptioner

        return TransformerCaptioner(
            vocab_size=vocab_size, cnn_backbone=cfg.cnn_backbone,
            cnn_output_size=cfg.cnn_output_size, hidden_size=cfg.hidden_size,
            max_len=cfg.max_caption_len, dropout=cfg.dropout,
        )
    if cfg.model_kind in ("v1_lstm", "v1_gru"):
        from vct.caption.v1_rnn import V1RNNCaptioner

        return V1RNNCaptioner(
            vocab_size=vocab_size, cnn_backbone=cfg.cnn_backbone,
            embed_size=cfg.cnn_output_size, hidden_size=cfg.hidden_size,
            rnn_type=cfg.model_kind.split("_")[1],
            max_len=cfg.max_caption_len, dropout=cfg.dropout,
        )
    if cfg.model_kind != "s2vt":
        raise KeyError(
            f"Unknown caption.model_kind {cfg.model_kind!r}; "
            "available: s2vt, transformer, v1_lstm, v1_gru"
        )
    return S2VTModel(
        vocab_size=vocab_size,
        cnn_backbone=cfg.cnn_backbone,
        cnn_output_size=cfg.cnn_output_size,
        hidden_size=cfg.hidden_size,
        max_len=cfg.max_caption_len,
        dropout=cfg.dropout,
        rnn_layers=cfg.encoder_layers,
    )


class CaptionState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    extra_vars: Any
    opt_state: Any
    rng: jax.Array


class CaptionTrainer:
    def __init__(self, cfg: CaptionConfig, vocab: Vocabulary):
        self.cfg = cfg
        self.vocab = vocab
        self.model = build_captioner(cfg, len(vocab))
        tx = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
        tx.append(optax.adam(cfg.learning_rate))
        base = optax.chain(*tx)
        # Frozen CNN backbone; its projection fc stays trainable
        # (beam_search.py:290-291 wraps only the feature extractor in no_grad).
        def labels(params):
            out = {}
            for k in params:
                if k == "cnn":
                    out[k] = {
                        kk: ("freeze" if kk == "cnn" else "train")
                        for kk in params[k]
                    }
                else:
                    out[k] = "train"
            return out

        self._tx = optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels
        )
        self._train_step = None
        self._val_step = None
        self._feat_fn = None
        # caption.feature_cache: steps consume cached backbone features
        # (set in fit; baked into the traced steps).
        self._feature_mode = False

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_video, sample_caption) -> CaptionState:
        variables = self.model.init(
            rng, jnp.asarray(sample_video[:1]), jnp.asarray(sample_caption[:1])
        )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return CaptionState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            extra_vars=extra,
            opt_state=self._tx.init(params),
            rng=rng,
        )

    @staticmethod
    def _token_nll(logp, captions, row_mask):
        """(mean CE over non-pad tokens of valid rows, token count).

        CE(ignore_index=<pad>) over (B, L, V) vs targets (B, L); ``row_mask``
        zeroes the loader's padding rows so tail batches keep a fixed jit
        shape without training phantom samples."""
        tgt = captions.astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        tok = (tgt != PAD_ID).astype(jnp.float32) * row_mask[:, None]
        count = jnp.sum(tok)
        return jnp.sum(nll * tok) / jnp.maximum(count, 1.0), count

    def _build_train_step(self):
        model, tx = self.model, self._tx
        apply_kwargs = {"from_features": True} if self._feature_mode else {}

        def train_step(state: CaptionState, video, captions, row_mask):
            rng, dropout_rng = jax.random.split(state.rng)

            def loss_of(params):
                logp = model.apply(
                    {"params": params, **state.extra_vars},
                    video,
                    captions,
                    deterministic=False,
                    rngs={"dropout": dropout_rng},
                    **apply_kwargs,
                )
                return self._token_nll(logp, captions, row_mask)

            (loss, tokens), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=params,
                    opt_state=opt_state, rng=rng,
                ),
                loss,
                tokens,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_val_step(self):
        model = self.model
        apply_kwargs = {"from_features": True} if self._feature_mode else {}

        def val_step(params, extra_vars, video, captions, row_mask):
            logp = model.apply(
                {"params": params, **extra_vars}, video, captions,
                **apply_kwargs,
            )
            return self._token_nll(logp, captions, row_mask)

        return jax.jit(val_step)

    def _put_batch(self, xb, yb, mask):
        """Device-put one batch; uint8 clips (the lazy out-of-core loader's
        native dtype) normalize on device — same kernel as the classifier
        engine (engine.py _put_batch)."""
        if xb.dtype == np.uint8:
            from vct.data.preprocess import preprocess_clips

            xd = preprocess_clips(jax.device_put(xb))
        else:
            xd = jnp.asarray(xb)
        return xd, jnp.asarray(yb), jnp.asarray(mask, jnp.float32)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: CaptionState,
        videos,
        captions: Optional[np.ndarray] = None,
        batch_size: int = 4,
        checkpoint_dir: Optional[str] = None,
        log: bool = True,
        val=None,
    ) -> Tuple[CaptionState, List[float]]:
        """Teacher-forced epoch loop with the classifier engine's discipline.

        ``videos`` is either an in-memory clip array (with ``captions``) or
        any caption batch loader (``vct.caption.data``) — in particular
        ``LazyCaptionLoader``, which decodes per batch so training is
        out-of-core. Per-step scalars stay ON DEVICE for the whole epoch
        (one stacked fetch per epoch; ``caption.log_every`` opts back into
        per-step syncs); resume fast-forwards the shuffle stream so epoch k
        of a resumed run trains on the same permutation as an uninterrupted
        one. ``val``: optional (videos, captions) tuple or loader scored
        each epoch with the deterministic val step.
        """
        from vct.caption.data import as_caption_loader
        from vct.utils.profiling import StepTimer, write_history

        cfg = self.cfg
        loader = as_caption_loader(videos, captions, batch_size)
        val_loader = None
        if val is not None:
            val_loader = (
                as_caption_loader(val[0], val[1], batch_size)
                if isinstance(val, tuple) else as_caption_loader(val)
            )
        feature_mode = bool(
            getattr(cfg, "feature_cache", False)
            and getattr(self.model, "supports_feature_cache", False)
        )
        if feature_mode != self._feature_mode:
            self._feature_mode = feature_mode
            self._train_step = None
            self._val_step = None
        ckpt_dir = checkpoint_dir or cfg.checkpoint_dir
        start_epoch = 0
        loss_arr: List[float] = []
        val_arr: List[float] = []
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
            state, start_epoch, manifest = self.load_checkpoint(ckpt_dir, state)
            # Pre-crash history continues, so the returned losses (and the
            # history JSON) cover the whole run, not just post-resume.
            loss_arr = list(manifest.get("epoch_losses", []))
            val_arr = list(manifest.get("val_losses", []))
            print(f"Checkpoint loaded. Resuming from epoch {start_epoch}")
        if feature_mode and start_epoch < cfg.epochs:
            # The caption pipeline is ~98.5% frozen CNN: extract its
            # (bit-constant) features once, train fc/encoder/decoder from
            # the block — identical loss trajectory, no per-epoch convs.
            # AFTER the resume restore on purpose: a resumed run must
            # extract from the checkpoint's backbone, not this process's
            # fresh init (they differ under warm starts or other seeds).
            t0 = time.time()
            fx, fy = self._extract_features(state, loader)
            loader = as_caption_loader(fx, fy, batch_size)
            if val_loader is not None:
                vx, vy = self._extract_features(state, val_loader)
                val_loader = as_caption_loader(vx, vy, batch_size)
            if log:
                print(
                    f"feature_cache: extracted {fx.shape} backbone features "
                    f"in {time.time() - t0:.1f}s"
                )
        if self._train_step is None:
            self._train_step = self._build_train_step()
        step_fn = self._train_step

        rng = np.random.RandomState(0)
        # Fast-forward the shuffle stream: every loader consumes exactly one
        # permutation per epoch, so epoch k resumes onto ITS permutation
        # (the invariant the classifier engine keeps, engine.py fit).
        for _ in range(start_epoch):
            rng.permutation(loader.num_examples)
        timer = StepTimer()
        start = time.time()
        for epoch in range(start_epoch, cfg.epochs):
            step_stats = []  # [(loss, token_count) device scalars]
            for step_i, (xb, yb, mask) in enumerate(loader.epoch(rng)):
                timer.start()
                xd, yd, md = self._put_batch(xb, yb, mask)
                state, loss, tokens = step_fn(state, xd, yd, md)
                timer.step()
                sync = cfg.log_every and (step_i + 1) % cfg.log_every == 0
                if sync:
                    loss_f = float(loss)  # forces completion for timing
                    timer.sync()
                    print(
                        f"step {int(state.step)}: loss {loss_f:.4f} "
                        f"({timer.last_ms:.1f} ms/step)"
                    )
                step_stats.append((loss, tokens))
            # ONE stacked device->host fetch per epoch; the epoch loss is the
            # token-weighted mean (exact: each step's loss is a mean over its
            # own valid-token count).
            if step_stats:
                losses, toks = (
                    np.asarray(jnp.stack(col)) for col in zip(*step_stats)
                )
                timer.sync()
                epoch_loss = (
                    float(np.dot(losses, toks)) / max(float(toks.sum()), 1.0)
                )
            else:
                epoch_loss = 0.0
            loss_arr.append(epoch_loss)
            if log:
                print(f"Epoch [{epoch + 1}/{cfg.epochs}], Loss: {epoch_loss}")
            if val_loader is not None:
                val_loss = self._val_loss(state, val_loader)
                val_arr.append(val_loss)
                if log:
                    print(f"Validation Loss: {val_loss:.4f}")
            if ckpt_dir:
                self.save_checkpoint(
                    ckpt_dir, state, epoch + 1, epoch_loss,
                    extra={"epoch_losses": loss_arr, "val_losses": val_arr},
                )
        if cfg.history_path:
            write_history(
                cfg.history_path,
                {
                    "train_loss": loss_arr,
                    "val_loss": val_arr,
                    "training_duration": time.time() - start,
                    "step_times": timer.summary(),
                },
            )
        return state, loss_arr

    def _extract_features(self, state: CaptionState, loader):
        """One pass over the loader: frozen-backbone features (N, T, F) +
        caption tensors, in loader order (same num_examples -> the shuffle
        stream pairs them identically to the raw-clip path)."""
        model = self.model
        if self._feat_fn is None:
            def feat_fn(params, extra_vars, video):
                return model.apply(
                    {"params": params, **extra_vars}, video,
                    method=model.extract_features,
                )

            self._feat_fn = jax.jit(feat_fn)
        chunks, caps, counts = [], [], []
        for xb, yb, mask in loader.epoch():
            n = int(np.sum(mask))
            if n == 0:
                continue
            xd, _, _ = self._put_batch(xb, yb, mask)
            chunks.append(self._feat_fn(state.params, state.extra_vars, xd))
            counts.append(n)
            caps.append(np.asarray(yb)[:n])
        if not chunks:
            raise ValueError("feature_cache: loader yielded no examples")
        feats = np.concatenate(
            [np.asarray(c)[:n] for c, n in zip(chunks, counts)], axis=0
        )
        return feats, np.concatenate(caps, axis=0)

    def _val_loss(self, state: CaptionState, val_loader) -> float:
        """Token-weighted mean CE over the val set; device scalars
        accumulate, ONE fetch at the end (no per-batch sync)."""
        if self._val_step is None:
            self._val_step = self._build_val_step()
        stats = []
        for xb, yb, mask in val_loader.epoch():
            xd, yd, md = self._put_batch(xb, yb, mask)
            stats.append(
                self._val_step(state.params, state.extra_vars, xd, yd, md)
            )
        if not stats:
            return 0.0
        losses, toks = (np.asarray(jnp.stack(col)) for col in zip(*stats))
        return float(np.dot(losses, toks)) / max(float(toks.sum()), 1.0)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str, state: CaptionState, epoch: int,
                        loss: float, extra: Optional[dict] = None):
        # Reuse the classifier's crash-safe swap: a kill mid-save leaves the
        # previous complete checkpoint, never a manifest pointing at nothing.
        from vct.train.checkpoint import _atomic_json_write, _atomic_tree_save

        path = os.path.abspath(path)  # Orbax requires absolute paths
        os.makedirs(path, exist_ok=True)
        # rng + step included so a resumed run continues the dropout stream
        # exactly where the crash left it (engine-grade resume: a resumed
        # run must reproduce the uninterrupted run bit-for-bit).
        tree = {
            "params": jax.device_get(state.params),
            "extra_vars": jax.device_get(state.extra_vars),
            "opt_state": jax.device_get(state.opt_state),
            "rng": jax.device_get(state.rng),
            "step": jax.device_get(state.step),
        }
        _atomic_tree_save(os.path.join(path, "state"), tree)
        # config in the manifest makes the checkpoint self-describing: the
        # AOT exporter (vct.serve.aot) and any restore path can rebuild the
        # exact model without replaying the training CLI flags (the
        # classifier manifest has recorded its Config from the start).
        import dataclasses

        _atomic_json_write(
            os.path.join(path, "manifest.json"),
            {"epoch": epoch, "loss": loss, "vocab": self.vocab.to_dict(),
             "config": dataclasses.asdict(self.cfg), **(extra or {})},
        )
        print(f"Checkpoint saved at epoch {epoch}")

    def load_checkpoint(
        self, path: str, state: CaptionState
    ) -> Tuple[CaptionState, int, dict]:
        import orbax.checkpoint as ocp

        from vct.caption.vocab import Vocabulary
        from vct.train.checkpoint import _recover_checkpoint_dir

        path = os.path.abspath(path)  # Orbax requires absolute paths
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        # The checkpointed weights are only meaningful against the vocab
        # they were trained with — restore it rather than trusting the
        # freshly rebuilt one to assign identical ids.
        if "vocab" in manifest:
            self.vocab = Vocabulary.from_dict(manifest["vocab"])
        _recover_checkpoint_dir(os.path.join(path, "state"))
        ckpt = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(state.params),
            "extra_vars": jax.device_get(state.extra_vars),
            "opt_state": jax.device_get(state.opt_state),
            "rng": jax.device_get(state.rng),
            "step": jax.device_get(state.step),
        }
        # Legacy checkpoints (saved before rng/step were added to the
        # tree): restore the keys that exist and keep the fresh state's
        # rng/step — an automatic resume must not become a hard crash
        # on upgrade. The resumed run then matches the legacy resume
        # semantics (dropout stream restarts), not bit-exact replay.
        # Detect legacy STRUCTURALLY (is "rng" in the saved tree?) via
        # checkpoint metadata rather than by matching Orbax's mismatch
        # error message, which is version-dependent and can itself crash
        # while formatting the structural diff.
        state_dir = os.path.join(path, "state")
        legacy_ckpt = None  # unknown until probed
        try:
            saved_tree = ckpt.metadata(state_dir).item_metadata.tree
            legacy_ckpt = "rng" not in saved_tree
        except Exception:
            pass  # metadata API unavailable: fall back to try/except below
        def _restore_legacy():
            legacy = {k: target[k]
                      for k in ("params", "extra_vars", "opt_state")}
            tree = ckpt.restore(state_dir, legacy)
            print("Restored legacy caption checkpoint (no rng/step saved); "
                  "dropout stream restarts from the fresh seed")
            return {**tree, "rng": target["rng"], "step": target["step"]}
        if legacy_ckpt is True:
            tree = _restore_legacy()
        elif legacy_ckpt is False:
            tree = ckpt.restore(state_dir, target)
        else:
            try:
                tree = ckpt.restore(state_dir, target)
            except Exception:
                # Unreadable dirs / corrupt arrays fail here too — so only
                # accept the legacy interpretation if its restore succeeds.
                try:
                    tree = _restore_legacy()
                except Exception:
                    raise  # surface the legacy failure with full context
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        state = state.replace(
            params=as_jnp(tree["params"]),
            extra_vars=as_jnp(tree["extra_vars"]),
            opt_state=as_jnp(tree["opt_state"]),
            rng=jnp.asarray(tree["rng"]),
            step=jnp.asarray(tree["step"]),
        )
        return state, int(manifest["epoch"]), manifest

    # ------------------------------------------------------------------
    def _prep_videos(self, videos) -> jax.Array:
        if np.asarray(videos).dtype == np.uint8:
            from vct.data.preprocess import preprocess_clips

            return preprocess_clips(jax.device_put(np.asarray(videos)))
        return jnp.asarray(videos)

    def _decode_batch(self, variables, videos, beam_width: int) -> List[List[str]]:
        if beam_width <= 1:
            tokens = np.asarray(
                greedy_decode(self.model, variables, self._prep_videos(videos),
                              max_len=self.cfg.max_caption_len)
            )
        else:
            tokens, _ = beam_search(
                self.model, variables, self._prep_videos(videos),
                beam_width=beam_width, max_len=self.cfg.max_caption_len,
            )
            tokens = np.asarray(tokens)
        return [decode_tokens(row, self.vocab) for row in tokens]

    def caption_videos(
        self,
        state: CaptionState,
        videos,
        beam_width: Optional[int] = None,
    ) -> List[List[str]]:
        """Decode captions for an array of clips OR a caption loader.

        The loader path streams: each fixed-shape batch decodes on device,
        padded rows drop on the host — captioning is out-of-core end to end
        (the reference's beam eval also decodes per DataLoader batch,
        ``s2vt/beam_search.py:488-491``)."""
        variables = {"params": state.params, **state.extra_vars}
        beam_width = beam_width if beam_width is not None else self.cfg.beam_width
        if not hasattr(videos, "epoch"):
            return self._decode_batch(variables, np.asarray(videos), beam_width)
        hyps: List[List[str]] = []
        for xb, _, mask in videos.epoch():
            rows = self._decode_batch(variables, xb, beam_width)
            # Select by the mask flags, not a prefix count: a lazy loader
            # masks a mid-batch row to 0 when that clip's decode failed.
            hyps.extend(r for r, m in zip(rows, mask) if m > 0)
        return hyps

    def evaluate_bleu(
        self,
        state: CaptionState,
        videos,
        references: Optional[List[List[List[str]]]] = None,
        beam_width: Optional[int] = None,
        log: bool = True,
    ) -> float:
        if references is None and not hasattr(videos, "references"):
            raise TypeError(
                "references required unless the loader carries them"
            )
        start = time.time()
        hyps = self.caption_videos(state, videos, beam_width)
        if references is None:
            # AFTER decoding: a lazy loader's references property excludes
            # clips whose decode failed during the pass just made, keeping
            # the zip aligned with the surviving hypotheses.
            references = videos.references
        avg = corpus_average_bleu(list(zip(references, hyps)))
        if log:
            print(f"Average BLEU score: {avg:.4f}")
            print(f"inference_duration: {time.time() - start:.4f}")
        return avg


def restore_caption_trainer(
    ckpt_dir: str, height: int = 224, width: int = 224
) -> Tuple["CaptionTrainer", CaptionState, CaptionConfig]:
    """(trainer, restored state, config) from a self-describing caption
    checkpoint directory — the manifest records config + vocab at save time,
    so no training CLI flags are replayed. Shared by the AOT exporter
    (``vct.serve.aot``) and the directory-captioning CLI
    (``vct.caption.infer``); ``height``/``width`` fix the frame geometry the
    state is initialized against (CaptionConfig carries no image size — the
    reference's caption pipeline hardcodes 224, ``s2vt/beam_search.py:143``).
    """
    import dataclasses

    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if "config" not in manifest:
        raise ValueError(
            f"{ckpt_dir}: caption checkpoint manifest has no 'config' "
            "(saved by an older vct) — re-save a checkpoint with the "
            "current trainer"
        )
    known = {f.name for f in dataclasses.fields(CaptionConfig)}
    cfg = CaptionConfig(
        **{k: v for k, v in manifest["config"].items() if k in known}
    )
    vocab = Vocabulary.from_dict(manifest["vocab"])
    trainer = CaptionTrainer(cfg, vocab)
    sample_v = np.zeros((1, cfg.num_frames, height, width, 3), np.float32)
    sample_c = np.zeros((1, cfg.max_caption_len), np.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), sample_v, sample_c)
    state, _, _ = trainer.load_checkpoint(ckpt_dir, state)
    return trainer, state, cfg
