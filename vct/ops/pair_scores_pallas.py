"""One-pass Pallas SAD / flow-proxy pair scoring for on-device selection.

The XLA scoring path (``vct.data.samplers.device_frame_scores`` vmapped over
the batch) costs ~2.0-2.3 ms at the bench geometry (32 clips x 80 frames x
80x80x3 uint8) — ~18x off the memory bound for the 49 MB of uint8 it reads,
because XLA materializes the uint8->f32 convert of the whole shifted-pair
tensors before the diff/abs/reduce fusion consumes them. Since SAD selection
is the recorded headline mode (``BENCH_r04.json``), that cost is most of the
gap between the sad and uniform sampling modes (1912-1990 vs 2143 clips/s).

Two kernel layouts, routed by per-clip VMEM footprint (both measured on the
v5e at the bench geometry, scoring stage alone, vs XLA's 1.97 ms):

* **clip layout** (clip block <= _CLIP_VMEM_BYTES): grid over clips only;
  the whole (L, H, W*C) clip is one VMEM block, transitions are scored in
  statically-unrolled K-frame chunks with leading-axis slices (no alignment
  constraints there). Each frame is read from HBM ONCE. **1.18 ms**.
* **blocked layout** (any size): grid (B, ceil((L-1)/K)); the two shifted
  views x[:, :-1] / x[:, 1:] are blocked K transitions at a time. Each frame
  is read twice plus the shifted-view materialization, but VMEM holds only
  2K frames. **1.30 ms**.

K adapts to the frame size (``_chunk_len``) so the chunk's f32/i32
temporaries stay within budget at any geometry — huge frames degrade toward
K=1, which for the blocked layout is exactly the original per-transition
grid (grid (B, L-1), one frame pair per step, the ``ssim_pallas`` layout).
That variant measured **1.89 ms** — no better than XLA; the 2528 tiny DMA
steps dominate, which is why the chunked layouts exist.

The math is INTEGER for "sad" (`sum |a - b|` in i32 — exact, so scores are
bit-identical to the XLA f32 path whenever the true sum fits f32's 2^24
integer window; 80x80x3 frames max out at 4.9M) and f32-accumulated for
"flow" (`sum (a - b)^2`: 255^2-sized terms overflow i32 at >= 224x224x3,
and the XLA path accumulates f32 anyway). Float-dtype clips are rejected —
the in-kernel int32 widen would truncate them; callers
(``vct.data.preprocess.device_sample_clips``) route those to the XLA
scorer instead.

Reference behavior being matched: the host per-pair SAD / Farneback loops in
``lrcn/lrcn.py:57-72`` (flow magnitude proxied by difference energy — the
documented deviation, SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pair_scores"]

# Whole-clip blocks above this byte budget fall back to the blocked layout:
# the clip block plus one chunk's temporaries must fit ~16 MB of VMEM.
_CLIP_VMEM_BYTES = 4 * 1024 * 1024
# Per-live-temporary budget for one chunk: K is chosen so a (K, H, W*C) f32
# array stays under this (a few are live at once — diff, abs/square, the
# widened inputs — leaving headroom under VMEM alongside the input block).
_CHUNK_F32_BYTES = 2 * 1024 * 1024
_K_MAX = 16  # transitions per chunk at the default geometry


def _chunk_len(H: int, W: int, C: int, cap: int = _K_MAX,
               budget: int = _CHUNK_F32_BYTES) -> int:
    """Transitions per chunk such that one (K, H, W*C) f32 temporary fits
    ``budget`` — degrades toward 1 for huge frames instead of blowing VMEM."""
    frame_f32 = H * W * C * 4
    return max(1, min(cap, budget // frame_f32))


def _chunk_scores(a, b, square: bool):
    """(k, H, WC) integer pair -> (k, 1) f32 scores. i32 diff in-register;
    sad accumulates i32 (exact), flow f32 (overflow-safe, XLA-equivalent)."""
    d = b.astype(jnp.int32) - a.astype(jnp.int32)
    if square:
        df = d.astype(jnp.float32)
        s = jnp.sum(df * df, axis=2, keepdims=True)  # lane reduce
        return jnp.sum(s, axis=1)  # (k, 1) — keep 2-D: Mosaic rejects
        # 1-D i32->f32 converts (vector<Kxi32> sitofp has no layout)
    s = jnp.sum(jnp.abs(d), axis=2, keepdims=True)
    return jnp.sum(s, axis=1).astype(jnp.float32)


def _scatter_row(row, lane, base: int, s, k: int):
    """Write the chunk's k scores into lanes [base, base+k) of the revisited
    output row. TPU lowering rejects narrow output blocks and dynamic
    single-lane stores (see ssim_pallas), so each scalar lands via a
    one-hot select; the row stays VMEM-resident across the unrolled chunks
    and flushes once per clip."""
    for kk in range(k):
        row = jnp.where(lane == base + kk, s[kk, 0], row)
    return row


def _clip_kernel(x_ref, o_ref, *, L: int, K: int, square: bool):
    x = x_ref[0]  # (L, H, WC), the whole clip
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    # Statically-unrolled chunks: leading-axis slices carry no tile-alignment
    # constraints, so the +1-frame shift needs no second input view.
    for j in range(0, L - 1, K):
        k = min(K, L - 1 - j)
        s = _chunk_scores(x[j:j + k], x[j + 1:j + 1 + k], square)
        row = _scatter_row(row, lane, j, s, k)
    o_ref[0] = row


def _blocked_kernel(a_ref, b_ref, o_ref, *, K: int, square: bool):
    i = pl.program_id(1)
    s = _chunk_scores(a_ref[0], b_ref[0], square)
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    o_ref[0] = _scatter_row(row, lane, i * K, s, K)


@partial(jax.jit, static_argnames=("method",))
def pair_scores(clips: jax.Array, method: str = "sad") -> jax.Array:
    """Per-transition change score of every consecutive frame pair, batched.

    clips: (B, L, H, W, C) uint8 (any integer dtype). Returns (B, L-1) f32 —
    score(frame[i] -> frame[i+1]); per clip identical to
    ``device_frame_scores(clip, method)``. methods: "sad" | "flow".
    """
    if method not in ("sad", "flow"):
        raise KeyError(f"pair_scores supports sad|flow, got {method!r}")
    if not jnp.issubdtype(clips.dtype, jnp.integer):
        raise TypeError(
            f"pair_scores wants integer frames (got {clips.dtype}); the f32 "
            "path is vct.data.samplers.device_frame_scores"
        )
    B, L, H, W, C = clips.shape
    if L < 2:
        return jnp.zeros((B, 0), jnp.float32)
    x = clips.reshape(B, L, H, W * C)  # row-major: free reshape
    square = method == "flow"
    K = _chunk_len(H, W, C)
    interpret = jax.default_backend() != "tpu"
    out_spec = pl.BlockSpec(
        (1, 1, L - 1), lambda bi, *_: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((B, 1, L - 1), jnp.float32)
    if clips.dtype.itemsize * L * H * W * C <= _CLIP_VMEM_BYTES:
        out = pl.pallas_call(
            partial(_clip_kernel, L=L, K=K, square=square),
            grid=(B,),
            in_specs=[pl.BlockSpec(
                (1, L, H, W * C), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x)
    else:
        # K-transition blocks over the two shifted views. The final ragged
        # block reads past L-1 into padding; its scores land in lanes
        # >= L-1 of the one-hot scatter, which the (L-1)-wide row ignores.
        a, b = x[:, :L - 1], x[:, 1:]
        nb = -(-(L - 1) // K)
        out = pl.pallas_call(
            partial(_blocked_kernel, K=K, square=square),
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec(
                    (1, K, H, W * C), lambda bi, i: (bi, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, K, H, W * C), lambda bi, i: (bi, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(a, b)
    return out[:, 0, :]
