"""On-device beam search (C29).

The reference beam-searches on the host: a Python list of
(score, token_list, hidden) tuples re-invoking the decoder per beam per step
(``s2vt/beam_search.py:384-436``) — and its decoder call itself loops
``max_len`` internally, an O(max_len^2) quirk (``beam_search.py:330-341``)
that SURVEY.md §7 explicitly says to fix, not copy.

Here the whole search is one jitted ``lax.fori_loop`` with fixed-shape state:

    tokens (B, K, L+1) | scores (B, K) | hidden (B, K, H) | done (B, K)

Each step runs the single-step decoder over all B·K beams in one batch,
expands to K·V candidates, masks finished beams (only a zero-cost <pad>
continuation survives), and ``top_k``-prunes back to K. No host round-trips.

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
    def apply_fn(variables, *args, method):
        if method == "encode":
            return model.apply(variables, *args, method=model.encode)
        token, hidden, enc = args
        return model.apply(
            variables, token, hidden, enc,
            method=lambda mdl, t, h, e: mdl.decoder_step(t, h, e),
        )

    enc_out, hidden = apply_fn(variables, video, method="encode")
    B, T, H = enc_out.shape
    K, V_dummy = beam_width, None
    del V_dummy

    # Broadcast encoder state across beams: (B*K, ...)
    enc_k = jnp.repeat(enc_out, K, axis=0)  # (B*K, T, H)
    hidden_k = jnp.repeat(hidden, K, axis=0)  # (B*K, H)

    tokens = jnp.full((B, K, max_len + 1), pad_token, jnp.int32)
    tokens = tokens.at[:, :, 0].set(start_token)
    # Only beam 0 is live initially (all beams identical otherwise).
    scores = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ) * jnp.ones((B, K))
    done = jnp.zeros((B, K), bool)

    def step(i, state):
        tokens, scores, hidden_k, done = state
        last = tokens[:, :, i].reshape(B * K)
        logits, new_hidden_k, _ = apply_fn(
            variables, last, hidden_k, enc_k, method="decode_step"
        )
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
        new_hidden = new_hidden_k.reshape(B, K, -1)[batch_idx, beam_idx]
        done = done[batch_idx, beam_idx] | (tok_idx == end_token)
        return tokens, new_scores, new_hidden.reshape(B * K, -1), done

    tokens, scores, _, _ = jax.lax.fori_loop(
        0, max_len, step, (tokens, scores, hidden_k, done)
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
    """Returns (tokens (B, max_len+1) incl. leading <start>, scores (B,))."""
    return _beam_search_jit(
        variables, video, model, beam_width, max_len,
        start_token, end_token, pad_token,
    )


def greedy_decode(model, variables, video, max_len: int = 30):
    """Free-running argmax decode via the model's own scan (targets=None)."""
    logp = model.apply(variables, video, deterministic=True)
    return jnp.argmax(logp, axis=-1)


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
