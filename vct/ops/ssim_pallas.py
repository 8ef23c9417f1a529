"""One-pass Pallas SSIM pair scoring for on-device frame selection.

The XLA path (``vct.data.samplers._device_ssim``) computes the five windowed
moments (mu_a, mu_b, mu_aa, mu_bb, mu_ab) as five separable depthwise conv
pairs per frame pair — ten conv launches whose intermediates round-trip HBM.
Three XLA-level fusions were measured SLOWER on the v5e and are documented
at-site in samplers.py (15-channel stacked conv, shifted-slice-add, shared
filtering across consecutive pairs): XLA materializes every rearrangement
back to HBM.

This kernel computes the whole thing in ONE pass per frame pair: the uint8
frames are DMA'd to VMEM, converted to f32 in-register, all five 3x3-window
moments come from roll-shifted adds entirely inside VMEM, and only the
scalar mean-SSIM leaves the core. HBM traffic drops from ~10 f32-map round
trips per pair to 1-2 uint8 frame reads + 4 bytes out.
Measured on the v5e at the bench geometry (32 clips x 80 frames x 80x80x3,
``VCT_BENCH_MODE=sampling VCT_BENCH_SAMPLING=ssim``): **1216 -> 1795
clips/s end to end (+48%)** with the per-pair grid, then **-> 1960** after
the chunked whole-clip layout landed (scoring stage 3.83 -> 2.40 ms: the
per-pair grid's 2528 small DMA steps carry real overhead — the same finding
that drove ``vct.ops.pair_scores_pallas``); ssim's selection overhead vs
the uniform mode (2143 clips/s) drops from 43% to ~9%, in line with the
other scored modes (sad 2087, flow 2089).

Two layouts share the moment math (``_ssim_chunk_scores``), routed by the
clip's VMEM byte footprint: the chunked whole-clip layout (each frame read
from HBM once, K transitions per statically-unrolled chunk, K adapted to
the frame size so the ~8 live (K, H, W*C) f32 moment maps stay in budget)
and the per-pair grid fallback for clips too big to hold in VMEM (only two
frames resident; frame i is fetched as `b` of step i-1 and `a` of step i).

Channel handling without a transpose: an (H, W, C) frame in row-major order
IS an (H, W*C) array, and a window shift by one frame column is a shift by C
flattened columns — so the W-direction window sum adds slices offset by C
and the valid region keeps every channel's windows interleaved. Mean over
the (H-2, (W-2)*C) valid block equals skimage's mean over (H-2, W-2, C).

Integer frames only: the in-kernel widen goes through int32 (Mosaic has no
direct uint8->f32 cast), which would TRUNCATE float inputs — those are
rejected, and ``device_sample_clips`` routes them to the XLA scorer.

Parity: ranking-equal and value-close to the host skimage-style SSIM
(``tests/test_data.py``); bit-level agreement with the XLA `_device_ssim`
to ~1e-6 for BOTH layouts (``test_pallas_ops.py``).
Reference behavior being matched: per-pair ``compare_ssim`` host scoring in
``medsos_lrcn/src/loader_data.py:15-33``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vct.ops.pair_scores_pallas import _chunk_len, _scatter_row

__all__ = ["ssim_pair_scores"]

# Clips whose whole-clip block fits this byte budget take the chunked
# layout; bigger clips keep the per-pair grid, which only ever holds two
# frames (plus their f32 moment maps) in VMEM.
_CLIP_VMEM_BYTES = 4 * 1024 * 1024
# ~8 (K, H, W*C) f32 moment maps are live per chunk — a tighter per-array
# budget than the SAD kernel's keeps their sum within VMEM.
_K_MAX = 8
_CHUNK_F32_BYTES = 768 * 1024


def _ssim_chunk_scores(a, b, *, C: int, win: int, c1: float, c2: float,
                       cov_norm: float):
    """(..., H, WC) f32 frame pairs -> (..., 1) mean-SSIM over the last two
    axes (2-D for the per-pair grid, (k, H, WC) for the chunked layout).
    The win x win window sums are roll-shifted adds (Mosaic rejects
    lane-dim slices at non-128-multiple offsets; roll is a native rotate);
    wrapped tail rows/cols are garbage and are masked out of the mean."""
    h_ax, l_ax = a.ndim - 2, a.ndim - 1
    H, WC = a.shape[-2:]
    n2 = WC - (win - 1) * C  # (W - win + 1) * C valid flattened columns

    def win_sum(v):
        rows = v
        for r in range(1, win):
            # roll by size-k == roll by -k (pltpu.roll wants shift >= 0)
            rows = rows + pltpu.roll(v, shift=H - r, axis=h_ax)
        out = rows
        for c in range(1, win):
            out = out + pltpu.roll(rows, shift=WC - c * C, axis=l_ax)
        return out

    inv_n = 1.0 / (win * win)
    ua = win_sum(a) * inv_n
    ub = win_sum(b) * inv_n
    uaa = win_sum(a * a) * inv_n
    ubb = win_sum(b * b) * inv_n
    uab = win_sum(a * b) * inv_n
    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)
    s = ((2.0 * ua * ub + c1) * (2.0 * vab + c2)) / (
        (ua * ua + ub * ub + c1) * (va + vb + c2)
    )
    rid = jax.lax.broadcasted_iota(jnp.int32, s.shape, h_ax)
    cid = jax.lax.broadcasted_iota(jnp.int32, s.shape, l_ax)
    s = jnp.where((rid <= H - win) & (cid < n2), s, 0.0)
    count = (H - win + 1) * n2
    sm = jnp.sum(s, axis=l_ax, keepdims=True)
    return jnp.sum(sm, axis=h_ax) / count  # (..., 1)


def _widen(x):
    # Mosaic has no direct uint8->f32 cast; widen through int32 (free on
    # the VPU) so raw frames stay uint8 all the way into VMEM.
    return x.astype(jnp.int32).astype(jnp.float32)


def _ssim_pair_kernel(a_ref, b_ref, o_ref, *, C: int, win: int, c1: float,
                      c2: float, cov_norm: float):
    """Per-pair grid: one (H, W*C) frame pair per step. One scalar per grid
    step lands in the clip's revisited (1, 1, L-1) output row — TPU lowering
    rejects (1, 1) output blocks and dynamic single-lane stores, so the
    store is a one-hot select of the whole row (the index_map is constant in
    i, so the row stays VMEM-resident until the clip index advances)."""
    i = pl.program_id(1)
    sm = _ssim_chunk_scores(
        _widen(a_ref[0, 0]), _widen(b_ref[0, 0]),
        C=C, win=win, c1=c1, c2=c2, cov_norm=cov_norm,
    )
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    o_ref[0] = jnp.where(lane == i, sm[0], row)


def _ssim_clip_kernel(x_ref, o_ref, *, L: int, K: int, C: int, win: int,
                      c1: float, c2: float, cov_norm: float):
    """Chunked layout: the whole (L, H, W*C) uint8 clip is one VMEM block;
    each statically-unrolled chunk scores K transitions vectorized over the
    leading axis. Leading-axis slices carry no tile-alignment constraints,
    so the +1-frame shift needs no second input view."""
    x = x_ref[0]
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    for j in range(0, L - 1, K):
        k = min(K, L - 1 - j)
        sm = _ssim_chunk_scores(
            _widen(x[j:j + k]), _widen(x[j + 1:j + 1 + k]),
            C=C, win=win, c1=c1, c2=c2, cov_norm=cov_norm,
        )
        row = _scatter_row(row, lane, j, sm, k)
    o_ref[0] = row


@partial(jax.jit, static_argnames=("win", "data_range"))
def ssim_pair_scores(
    clips: jax.Array, win: int = 3, data_range: float = 255.0
) -> jax.Array:
    """Mean SSIM of every consecutive frame pair, batched.

    clips: (B, L, H, W, C) uint8 (any integer dtype). Returns (B, L-1) f32 —
    SSIM(frame[i], frame[i+1]). Matches ``_device_ssim(clip[:-1], clip[1:])``
    per clip.
    """
    if not jnp.issubdtype(clips.dtype, jnp.integer):
        raise TypeError(
            f"ssim_pair_scores wants integer frames (got {clips.dtype}); "
            "the f32 path is vct.data.samplers._device_ssim"
        )
    B, L, H, W, C = clips.shape
    if L < 2:
        return jnp.zeros((B, 0), jnp.float32)
    if H < win or W < win:
        raise ValueError(f"frames {H}x{W} smaller than SSIM window {win}")
    # On-chip parity note: the kernels compute in full f32 and match the
    # XLA reference bit-for-bit ONLY when that reference runs its convs at
    # f32 precision (the CPU test lane pins this). On the TPU the XLA
    # conv default is bf16-class, so kernel-vs-XLA deltas of ~1e-3 there
    # are the REFERENCE degrading, not the kernel — measured and verified
    # by re-running the reference under default_matmul_precision(float32).
    x = clips.reshape(B, L, H, W * C)  # row-major: free reshape
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)
    interpret = jax.default_backend() != "tpu"
    out_spec = pl.BlockSpec(
        (1, 1, L - 1), lambda bi, *_: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((B, 1, L - 1), jnp.float32)
    if clips.dtype.itemsize * L * H * W * C <= _CLIP_VMEM_BYTES:
        K = _chunk_len(H, W, C, cap=_K_MAX, budget=_CHUNK_F32_BYTES)
        return pl.pallas_call(
            partial(_ssim_clip_kernel, L=L, K=K, C=C, win=win, c1=c1, c2=c2,
                    cov_norm=cov_norm),
            grid=(B,),
            in_specs=[pl.BlockSpec(
                (1, L, H, W * C), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x)[:, 0, :]
    return pl.pallas_call(
        partial(_ssim_pair_kernel, C=C, win=win, c1=c1, c2=c2,
                cov_norm=cov_norm),
        grid=(B, L - 1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, W * C), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, H, W * C), lambda bi, i: (bi, i + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x, x)[:, 0, :]
