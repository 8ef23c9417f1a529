"""On-device beam search (C29) — for EVERY captioner family.

The reference beam-searches on the host: a Python list of
(score, token_list, hidden) tuples re-invoking the decoder per beam per step
(``s2vt/beam_search.py:384-436``) — and its decoder call itself loops
``max_len`` internally, an O(max_len^2) quirk (``beam_search.py:330-341``)
that SURVEY.md §7 explicitly says to fix, not copy. It also only exists for
the v2 GRU+Luong model; here one jitted search serves the S2VT, the v1
stepwise LSTM/GRU, and the transformer captioners.

The whole search is one jitted ``lax.fori_loop`` with fixed-shape state:

    tokens (B, K, L+1) | scores (B, K) | stepper state pytree (B*K, ...) | done

Each step runs the family's single-step decoder over all B·K beams in one
batch, expands to K·V candidates, masks finished beams (only a zero-cost
<pad> continuation survives), and ``top_k``-prunes back to K. No host
round-trips. The family dispatch happens at trace time (the model is a
static jit argument).

Greedy decode is the K=1 special case and is exposed separately for the
evaluate path (``beam_search.py:493-...`` evaluate_video_to_text).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp

__all__ = ["beam_search", "greedy_decode", "decode_tokens"]

NEG_INF = -1e9


def _make_stepper(model, variables, video, max_len: int):
    """(enc_state, beam_state, step_fn) for the model's family.

    step_fn(tokens_flat (B*K, L+1), i, state, enc) -> (logits (B*K, V), state)
    with every beam_state leaf carrying a LEADING B*K axis (so the core loop
    can reorder it by parent beam).
    """
    # Dispatch by type name: linen submodules (decoder_step etc.) only exist
    # on BOUND instances, so hasattr on the bare module is useless here.
    name = type(model).__name__
    if name == "S2VTModel":  # v2 GRU + Luong
        enc_out, hidden = model.apply(variables, video, method=model.encode)

        def step(tokens_flat, i, state, enc):
            logits, new_hidden, _ = model.apply(
                variables, tokens_flat[:, i], state, enc,
                method=lambda mdl, t, h, e: mdl.decoder_step(t, h, e),
            )
            return logits, new_hidden

        return enc_out, hidden, step

    if name == "V1RNNCaptioner":
        enc = model.apply(variables, video, method=model.encode)
        B = video.shape[0]
        L, H = model.dec_layers, model.hidden_size
        zeros = jnp.zeros((B, L, H), enc.dtype)
        state0 = (zeros, zeros) if model.rnn_type == "lstm" else zeros

        def step(tokens_flat, i, state, enc_k):
            def body(mdl, tok, st, e):
                # the stacked cell wants (num_layers, batch, H)
                st_t = jax.tree_util.tree_map(
                    lambda x: jnp.swapaxes(x, 0, 1), st
                )
                out, new_st = mdl.dec_cell(mdl.embed(tok), st_t)
                attn = mdl.cross_attn(out[:, None, :], e, e)[:, 0]
                new_st = jax.tree_util.tree_map(
                    lambda x: jnp.swapaxes(x, 0, 1), new_st
                )
                return mdl.fc(attn), new_st

            return model.apply(
                variables, tokens_flat[:, i], state, enc_k, method=body
            )

        return enc, state0, step

    if name == "TransformerCaptioner":
        if max_len > model.max_len:
            raise ValueError(
                f"beam max_len={max_len} exceeds the transformer's "
                f"max_len={model.max_len} (positions beyond it would "
                "silently clamp)"
            )
        enc = model.apply(variables, video, method=model.encode)

        def step(tokens_flat, i, state, enc_k):
            # No recurrent state: re-decode the causal prefix and read the
            # logits at position i (the decoder is tiny; max_len re-passes
            # stay inside the one compiled loop).
            logits_all = model.apply(
                variables, enc_k, tokens_flat[:, : model.max_len],
                method=lambda mdl, e, t: mdl.decode_logits(e, t),
            )
            return logits_all[:, i], state

        return enc, (), step

    raise TypeError(f"No beam stepper for captioner type {name}")


@partial(jax.jit, static_argnames=("model", "beam_width", "max_len", "start_token", "end_token", "pad_token"))
def _beam_search_jit(
    variables,
    video,
    model,
    beam_width: int,
    max_len: int,
    start_token: int,
    end_token: int,
    pad_token: int,
):
    enc, state0, step_fn = _make_stepper(model, variables, video, max_len)
    B = video.shape[0]
    K = beam_width

    # Broadcast encoder output and stepper state across beams: (B*K, ...).
    enc_k = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), enc)
    state_k = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), state0)

    tokens = jnp.full((B, K, max_len + 1), pad_token, jnp.int32)
    tokens = tokens.at[:, :, 0].set(start_token)
    # Only beam 0 is live initially (all beams identical otherwise).
    scores = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ) * jnp.ones((B, K))
    done = jnp.zeros((B, K), bool)

    def step(i, loop_state):
        tokens, scores, state_k, done = loop_state
        tokens_flat = tokens.reshape(B * K, max_len + 1)
        logits, new_state_k = step_fn(tokens_flat, i, state_k, enc_k)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, -1)
        V = logp.shape[-1]

        # Finished beams: only <pad> continues, at zero cost.
        pad_row = jnp.full((V,), NEG_INF).at[pad_token].set(0.0)
        logp = jnp.where(done[:, :, None], pad_row[None, None, :], logp)

        cand = scores[:, :, None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)  # (B, K)
        beam_idx = idx // V  # which parent beam
        tok_idx = (idx % V).astype(jnp.int32)  # which token

        # Reorder all beam state by parent beam.
        batch_idx = jnp.arange(B)[:, None]
        tokens = tokens[batch_idx, beam_idx]  # (B, K, L+1)
        tokens = tokens.at[:, :, i + 1].set(tok_idx)

        def reorder(x):  # (B*K, ...) gather along the beam axis
            xk = x.reshape((B, K) + x.shape[1:])
            return xk[batch_idx, beam_idx].reshape((B * K,) + x.shape[1:])

        new_state_k = jax.tree_util.tree_map(reorder, new_state_k)
        done = done[batch_idx, beam_idx] | (tok_idx == end_token)
        return tokens, new_scores, new_state_k, done

    tokens, scores, _, _ = jax.lax.fori_loop(
        0, max_len, step, (tokens, scores, state_k, done)
    )
    best = jnp.argmax(scores, axis=1)
    return tokens[jnp.arange(B), best], scores[jnp.arange(B), best]


def beam_search(
    model,
    variables,
    video,
    beam_width: int = 3,
    max_len: int = 30,
    start_token: int = 1,
    end_token: int = 2,
    pad_token: int = 0,
):
    """Returns (tokens (B, max_len+1) incl. leading <start>, scores (B,)).

    Works for every captioner family (S2VT, v1 LSTM/GRU, transformer)."""
    return _beam_search_jit(
        variables, video, model, beam_width, max_len,
        start_token, end_token, pad_token,
    )


def greedy_decode(model, variables, video, max_len: int = 30):
    """Free-running argmax decode via the model's own scan (targets=None).

    The reference's non-beam caption variant decodes exactly this way —
    free-running topk(1) through the same GRU+Luong stack
    (``s2vt/edit_configurable.py:305-343``, the ``DecoderAttention``
    inference branch); here it is one traced scan instead of a host loop.

    The scan always runs the model's compiled ``model.max_len`` steps; the
    returned tokens truncate to ``max_len`` (greedy decoding is
    prefix-deterministic, so this equals decoding fewer steps)."""
    logp = model.apply(variables, video, deterministic=True)
    return jnp.argmax(logp, axis=-1)[:, :max_len]


def decode_tokens(token_row, vocab, start_token=1, end_token=2, pad_token=0) -> List[str]:
    """Token ids -> words, stripping start/end/pad (beam_search.py:433-435)."""
    words = []
    for t in [int(x) for x in token_row]:
        if t == end_token:
            break
        if t in (start_token, pad_token):
            continue
        words.append(vocab.idx2word.get(t, "<unk>"))
    return words
