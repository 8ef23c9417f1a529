"""One-pass Pallas SSIM pair scoring for on-device frame selection.

The XLA path (``vct.data.samplers._device_ssim``) computes the five windowed
moments (mu_a, mu_b, mu_aa, mu_bb, mu_ab) as five separable depthwise conv
pairs per frame pair — ten conv launches whose intermediates round-trip HBM.
Three XLA-level fusions were measured SLOWER on the v5e and are documented
at-site in samplers.py (15-channel stacked conv, shifted-slice-add, shared
filtering across consecutive pairs): XLA materializes every rearrangement
back to HBM.

This kernel computes the whole thing in ONE pass per frame pair: the two
uint8 frames are DMA'd to VMEM once, converted to f32 in-register, all five
3x3-window moments come from roll-shifted adds entirely inside VMEM, and
only the scalar mean-SSIM leaves the core. HBM traffic drops from ~10
f32-map round trips per pair to 2 uint8 frame reads + 4 bytes out.
Measured on the v5e at the bench geometry (32 clips x 80 frames x 80x80x3,
``VCT_BENCH_MODE=sampling VCT_BENCH_SAMPLING=ssim``): **1216 -> 1795
clips/s end to end (+48%)** with the per-pair grid, then **-> 1960** after
the chunked whole-clip layout landed (scoring stage 3.83 -> 2.40 ms: the
per-pair grid's 2528 small DMA steps carry real overhead — the same finding
that drove ``vct.ops.pair_scores_pallas``); ssim's selection overhead vs
the uniform mode (2143 clips/s) drops from 43% to ~9%, in line with the
other scored modes (sad 2087, flow 2089).

Channel handling without a transpose: an (H, W, C) frame in row-major order
IS an (H, W*C) array, and a window shift by one frame column is a shift by C
flattened columns — so the W-direction window sum adds slices offset by C
and the valid region keeps every channel's windows interleaved. Mean over
the (H-2, (W-2)*C) valid block equals skimage's mean over (H-2, W-2, C).

Parity: ranking-equal and value-close to the host skimage-style SSIM
(``tests/test_data.py``); bit-level agreement with the XLA `_device_ssim`
to ~1e-6 (``test_pallas_ops.py::test_ssim_pair_scores_matches_xla``).
Reference behavior being matched: per-pair ``compare_ssim`` host scoring in
``medsos_lrcn/src/loader_data.py:15-33``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ssim_pair_scores"]

# Clips whose whole-clip uint8 block fits this budget take the chunked
# layout (grid over clips, K transitions per statically-unrolled chunk, each
# frame DMA'd once — measured 3.83 -> 2.40 ms scoring stage at the bench
# geometry: the per-pair grid's 2528 small DMA steps carry real overhead,
# same finding as vct.ops.pair_scores_pallas). Bigger clips keep the
# per-pair grid, which only ever holds two frames in VMEM.
_CLIP_VMEM_BYTES = 4 * 1024 * 1024
_K = 8  # transitions per chunk; ~8 live (K, H, W*C) f32 temporaries


def _ssim_kernel(a_ref, b_ref, o_ref, *, C: int, win: int, c1: float,
                 c2: float, cov_norm: float):
    i = pl.program_id(1)
    # Mosaic has no direct uint8->f32 cast; widen through int32 (free on the
    # VPU) so raw frames can stay uint8 all the way into VMEM.
    a = a_ref[0, 0].astype(jnp.int32).astype(jnp.float32)  # (H, W*C)
    b = b_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
    H, WC = a.shape
    n2 = WC - (win - 1) * C  # (W - win + 1) * C valid flattened columns

    def win_sum(x):
        # win x win window sum anchored top-left, via lane/sublane rotates
        # (Mosaic rejects lane-dim slices at non-128-multiple offsets; roll
        # is a native rotate). Wrapped tail rows/cols are garbage and are
        # masked out of the final mean.
        rows = x
        for r in range(1, win):
            # roll by size-k == roll by -k (pltpu.roll wants shift >= 0)
            rows = rows + pltpu.roll(x, shift=H - r, axis=0)
        out = rows
        for c in range(1, win):
            out = out + pltpu.roll(rows, shift=WC - c * C, axis=1)
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
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 1)
    valid = (row_ids <= H - win) & (col_ids < n2)
    s = jnp.where(valid, s, 0.0)
    count = (H - win + 1) * n2
    # One scalar per grid step into the clip's revisited (1, 1, L-1) output
    # row. TPU lowering rejects (1, 1) output blocks (last two block dims
    # must be (8, 128)-divisible or span the array) AND dynamic single-lane
    # stores, so: the output carries a singleton middle axis making the
    # block's trailing dims span the array, and the store is a one-hot
    # select read-modify-write of the whole row (each lane is written at
    # exactly its own grid step; the index_map is constant in i, so the row
    # stays VMEM-resident until the clip index advances, then flushes once).
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    o_ref[0] = jnp.where(lane == i, jnp.sum(s) / count, row)


def _ssim_clip_kernel(x_ref, o_ref, *, L: int, C: int, win: int, c1: float,
                      c2: float, cov_norm: float):
    """Chunked layout: the whole (L, H, W*C) uint8 clip is one VMEM block;
    each unrolled chunk scores K transitions vectorized over the leading
    axis (same roll-shifted window sums as `_ssim_kernel`, axes shifted by
    one). Leading-axis slices carry no tile-alignment constraints, so the
    +1-frame shift needs no second input view."""
    x = x_ref[0]
    _, H, WC = x.shape
    n2 = WC - (win - 1) * C
    inv_n = 1.0 / (win * win)
    count = (H - win + 1) * n2
    row = o_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    for j in range(0, L - 1, _K):
        k = min(_K, L - 1 - j)
        a = x[j:j + k].astype(jnp.int32).astype(jnp.float32)  # (k, H, WC)
        b = x[j + 1:j + 1 + k].astype(jnp.int32).astype(jnp.float32)

        def win_sum(v):
            rows = v
            for r in range(1, win):
                rows = rows + pltpu.roll(v, shift=H - r, axis=1)
            out = rows
            for c in range(1, win):
                out = out + pltpu.roll(rows, shift=WC - c * C, axis=2)
            return out

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
        rid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        cid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where((rid <= H - win) & (cid < n2), s, 0.0)
        sm = jnp.sum(s, axis=2, keepdims=True)
        sm = jnp.sum(sm, axis=1) / count  # (k, 1)
        for kk in range(k):
            row = jnp.where(lane == j + kk, sm[kk, 0], row)
    o_ref[0] = row


@partial(jax.jit, static_argnames=("win", "data_range"))
def ssim_pair_scores(
    clips: jax.Array, win: int = 3, data_range: float = 255.0
) -> jax.Array:
    """Mean SSIM of every consecutive frame pair, batched.

    clips: (B, L, H, W, C) uint8 (or any real dtype; converted to f32
    in-kernel). Returns (B, L-1) f32 — SSIM(frame[i], frame[i+1]).
    Matches ``_device_ssim(clip[:-1], clip[1:])`` per clip.
    """
    B, L, H, W, C = clips.shape
    if L < 2:
        return jnp.zeros((B, 0), jnp.float32)
    if H < win or W < win:
        raise ValueError(f"frames {H}x{W} smaller than SSIM window {win}")
    x = clips.reshape(B, L, H, W * C)  # row-major: free reshape
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    n = win * win
    interpret = jax.default_backend() != "tpu"
    if L * H * W * C <= _CLIP_VMEM_BYTES:
        return pl.pallas_call(
            partial(_ssim_clip_kernel, L=L, C=C, win=win, c1=c1, c2=c2,
                    cov_norm=n / (n - 1)),
            grid=(B,),
            in_specs=[pl.BlockSpec(
                (1, L, H, W * C), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec(
                (1, 1, L - 1), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, 1, L - 1), jnp.float32),
            interpret=interpret,
        )(x)[:, 0, :]
    kernel = partial(
        _ssim_kernel, C=C, win=win, c1=c1, c2=c2, cov_norm=n / (n - 1)
    )
    # Grid over (clip, transition): the pallas pipeline double-buffers the
    # two frame blocks; frame i is fetched as `b` of step i-1 and `a` of
    # step i (2 uint8 reads per frame — still ~40x less HBM traffic than
    # the ten-f32-map XLA path).
    return pl.pallas_call(
        kernel,
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
        out_specs=pl.BlockSpec(
            (1, 1, L - 1), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, L - 1), jnp.float32),
        interpret=interpret,
    )(x, x)[:, 0, :]
