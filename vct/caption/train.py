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

__all__ = ["CaptionTrainer", "CaptionState", "build_captioner"]

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

    def _build_train_step(self):
        model, tx = self.model, self._tx

        def train_step(state: CaptionState, video, captions):
            rng, dropout_rng = jax.random.split(state.rng)

            def loss_of(params):
                logp = model.apply(
                    {"params": params, **state.extra_vars},
                    video,
                    captions,
                    deterministic=False,
                    rngs={"dropout": dropout_rng},
                )
                # CE(ignore_index=<pad>) over (B, L, V) vs targets (B, L)
                tgt = captions.astype(jnp.int32)
                nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
                mask = (tgt != PAD_ID).astype(jnp.float32)
                return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=params,
                    opt_state=opt_state, rng=rng,
                ),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def fit(
        self,
        state: CaptionState,
        videos: np.ndarray,
        captions: np.ndarray,
        batch_size: int = 4,
        checkpoint_dir: Optional[str] = None,
        log: bool = True,
    ) -> Tuple[CaptionState, List[float]]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        step_fn = self._train_step
        cfg = self.cfg
        ckpt_dir = checkpoint_dir or cfg.checkpoint_dir
        start_epoch = 0
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
            state, start_epoch = self.load_checkpoint(ckpt_dir, state)
            print(f"Checkpoint loaded. Resuming from epoch {start_epoch}")

        loss_arr: List[float] = []
        n = len(videos)
        rng = np.random.RandomState(0)
        for epoch in range(start_epoch, cfg.epochs):
            order = rng.permutation(n)
            total_loss, batches_n = 0.0, 0
            for s in range(0, n, batch_size):
                idx = order[s : s + batch_size]
                if len(idx) < batch_size:
                    # Wrap-pad the tail batch from the epoch's own order so
                    # every sample trains every epoch at a fixed jit shape.
                    pad = np.resize(order, batch_size - len(idx))
                    idx = np.concatenate([idx, pad])
                state, loss = step_fn(
                    state, jnp.asarray(videos[idx]), jnp.asarray(captions[idx])
                )
                total_loss += float(loss)
                batches_n += 1
            epoch_loss = total_loss / max(batches_n, 1)
            loss_arr.append(epoch_loss)
            if log:
                print(f"Epoch [{epoch + 1}/{cfg.epochs}], Loss: {epoch_loss}")
            if ckpt_dir:
                self.save_checkpoint(ckpt_dir, state, epoch + 1, epoch_loss)
        return state, loss_arr

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str, state: CaptionState, epoch: int, loss: float):
        # Reuse the classifier's crash-safe swap: a kill mid-save leaves the
        # previous complete checkpoint, never a manifest pointing at nothing.
        from vct.train.checkpoint import _atomic_json_write, _atomic_tree_save

        os.makedirs(path, exist_ok=True)
        tree = {
            "params": jax.device_get(state.params),
            "extra_vars": jax.device_get(state.extra_vars),
            "opt_state": jax.device_get(state.opt_state),
        }
        _atomic_tree_save(os.path.join(path, "state"), tree)
        _atomic_json_write(
            os.path.join(path, "manifest.json"),
            {"epoch": epoch, "loss": loss, "vocab": self.vocab.to_dict()},
        )
        print(f"Checkpoint saved at epoch {epoch}")

    def load_checkpoint(self, path: str, state: CaptionState) -> Tuple[CaptionState, int]:
        import orbax.checkpoint as ocp

        from vct.caption.vocab import Vocabulary
        from vct.train.checkpoint import _recover_checkpoint_dir

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
        }
        tree = ckpt.restore(os.path.join(path, "state"), target)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        state = state.replace(
            params=as_jnp(tree["params"]),
            extra_vars=as_jnp(tree["extra_vars"]),
            opt_state=as_jnp(tree["opt_state"]),
        )
        return state, int(manifest["epoch"])

    # ------------------------------------------------------------------
    def caption_videos(
        self,
        state: CaptionState,
        videos: np.ndarray,
        beam_width: Optional[int] = None,
    ) -> List[List[str]]:
        variables = {"params": state.params, **state.extra_vars}
        beam_width = beam_width if beam_width is not None else self.cfg.beam_width
        if beam_width <= 1:
            tokens = np.asarray(
                greedy_decode(self.model, variables, jnp.asarray(videos),
                              max_len=self.cfg.max_caption_len)
            )
            return [decode_tokens(row, self.vocab) for row in tokens]
        tokens, _ = beam_search(
            self.model, variables, jnp.asarray(videos),
            beam_width=beam_width, max_len=self.cfg.max_caption_len,
        )
        return [decode_tokens(row, self.vocab) for row in np.asarray(tokens)]

    def evaluate_bleu(
        self,
        state: CaptionState,
        videos: np.ndarray,
        references: List[List[List[str]]],
        beam_width: Optional[int] = None,
        log: bool = True,
    ) -> float:
        start = time.time()
        hyps = self.caption_videos(state, videos, beam_width)
        avg = corpus_average_bleu(list(zip(references, hyps)))
        if log:
            print(f"Average BLEU score: {avg:.4f}")
            print(f"inference_duration: {time.time() - start:.4f}")
        return avg
