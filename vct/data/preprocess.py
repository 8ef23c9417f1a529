"""On-device preprocessing: the TPU tail of the ingest pipeline.

The reference preprocesses per-frame on the host (resize + BGR->RGB + /255 in
the cv2 loop, ``loader_data.py:161-182``). Here the host stops at decoded
uint8 frames; everything after runs on device inside one jitted function
(fusable by XLA, or via the Pallas kernel in ``vct.ops.preprocess_pallas``):

    uint8 (B, L, H, W, 3)
      -> f32 /255 normalize            (loader_data.py:182)
      -> optional bilinear resize      (cv2.INTER_LINEAR equivalent)
      -> optional content-aware frame selection on device
         (SAD / SSIM / flow-proxy scores + top-k gather, vct.data.samplers)
      -> (B, T, h, w, 3) model input
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vct.data.samplers import device_frame_scores, device_topk_indices

__all__ = ["preprocess_clips", "device_sample_clips"]


def _resize_bilinear(x, out_h: int, out_w: int):
    """cv2.INTER_LINEAR-equivalent resize (half-pixel centers) over the last
    three axes of (..., H, W, C).

    antialias=False is required for the cv2 parity: cv2 bilinear does NOT
    low-pass on downscale, while jax.image.resize defaults to antialias=True
    (measured up to 102/255 apart on a 64->16 downscale; with
    antialias=False the two are bit-exact)."""
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, shape, method="linear", antialias=False)


@partial(jax.jit, static_argnames=("out_hw", "normalize"))
def preprocess_clips(
    raw: jax.Array,
    out_hw: Optional[Tuple[int, int]] = None,
    normalize: bool = True,
) -> jax.Array:
    """uint8 (B, T, H, W, 3) -> float32 model input, fused on device."""
    x = raw.astype(jnp.float32)
    if normalize:
        x = x / 255.0
    if out_hw is not None and out_hw != raw.shape[-3:-1]:
        x = _resize_bilinear(x, out_hw[0], out_hw[1])
    return x


@partial(
    jax.jit, static_argnames=("sequence_length", "method", "out_hw", "short_pad")
)
def device_sample_clips(
    raw: jax.Array,
    sequence_length: int,
    method: str = "sad",
    out_hw: Optional[Tuple[int, int]] = None,
    lengths: Optional[jax.Array] = None,
    short_pad: str = "cycle",
) -> jax.Array:
    """uint8 (B, L, H, W, 3) with L >= T: select T frames per clip on device,
    then normalize/resize.

    ``lengths`` (B,) gives each clip's true frame count when the L axis is
    padded up to a bucket size (bounded compile count — the padded tail is
    masked out of selection). Clips shorter than T extend their real frames
    per ``short_pad``: "cycle" duplicates cyclically, matching the
    classifier's host ``duplicate_frames`` path (loader_data.py:43-51);
    "last" repeats the final real frame, matching the caption pipeline's
    ``extract_frames`` padding (s2vt/beam_search.py:176-180).

    Methods — the device analogues of the host samplers:
      * "uniform": stride selection, idx = (true_len // T) * arange(T)
        (identical indices to ``vct.data.samplers.uniform_sampling`` and to
        the caption pipeline's interval extraction)
      * "sad" (exact), "ssim" (uniform-window SSIM), "flow" (the documented
        difference-energy proxy for Farneback magnitude, SURVEY.md §7): score
        transitions, keep frame 0 + the (T-1) most-dynamic frames.
    """
    if short_pad not in ("cycle", "last"):
        raise ValueError(f"short_pad must be 'cycle' or 'last', got {short_pad!r}")
    L = raw.shape[1]
    lens = (
        lengths.astype(jnp.int32)
        if lengths is not None
        else jnp.full((raw.shape[0],), L, jnp.int32)
    )
    # Short-clip parity with the host paths: for true length n <= T the host
    # keeps all real frames then pads — never selects padding, never scores.
    pos = jnp.arange(sequence_length, dtype=jnp.int32)[None, :]
    if short_pad == "cycle":
        cyc = pos % jnp.maximum(lens, 1)[:, None]
    else:
        cyc = jnp.minimum(pos, jnp.maximum(lens, 1)[:, None] - 1)
    short = (lens <= sequence_length)[:, None]
    if raw.shape[1] <= sequence_length:
        idx = cyc
    elif method == "uniform":
        interval = jnp.maximum(lens // sequence_length, 1)
        idx = interval[:, None] * jnp.arange(sequence_length, dtype=jnp.int32)
        idx = jnp.where(short, cyc, idx)
    else:
        # ssim keeps the canonical frame0+later shape; sad/flow keep their
        # lrcn-script earlier-frame shape (see device_topk_indices).
        style = "canonical" if method == "ssim" else "script"
        if jnp.issubdtype(raw.dtype, jnp.integer):
            # One-pass Pallas scoring kernels (vct.ops.ssim_pallas /
            # pair_scores_pallas): scores computed inside VMEM, only the
            # per-transition scalars leave the core; sad is bit-identical
            # to the XLA path. Integer frames only — the kernels' in-VMEM
            # widen goes through int32 and would truncate floats, so those
            # take the vmapped XLA scorer below (which also stays the
            # golden reference the kernels are tested against).
            if method == "ssim":
                from vct.ops.ssim_pallas import ssim_pair_scores

                scores_all = 1.0 - ssim_pair_scores(raw)
            else:
                from vct.ops.pair_scores_pallas import pair_scores

                scores_all = pair_scores(raw, method)
        elif method == "ssim":
            # Reshape-batched with an optimization_barrier, NOT vmapped: a
            # reshape feeding _device_ssim's feature-grouped convs inside
            # one jit MISCOMPILES on this TPU stack (uniform ~0.75 scores
            # vs the true values — vmap lowers to the same pattern; eager,
            # CPU, and the barrier'd version agree). See
            # vct.ops.ssim_pallas for the on-chip measurements.
            from vct.data.samplers import _device_ssim

            Bn, Ln = raw.shape[0], raw.shape[1]
            a = raw[:, :-1].astype(jnp.float32).reshape(
                (Bn * (Ln - 1),) + raw.shape[2:])
            b = raw[:, 1:].astype(jnp.float32).reshape(
                (Bn * (Ln - 1),) + raw.shape[2:])
            a, b = jax.lax.optimization_barrier((a, b))
            scores_all = 1.0 - _device_ssim(a, b).reshape(Bn, Ln - 1)
        else:
            scores_all = jax.vmap(
                lambda c: device_frame_scores(c, method)
            )(raw)

        def one(scores, length):
            # transitions at/after the true end are padding: never selected
            pos = jnp.arange(scores.shape[0])
            scores = jnp.where(pos < length - 1, scores, -jnp.inf)
            return device_topk_indices(scores, sequence_length, style)

        idx = jnp.where(short, cyc, jax.vmap(one)(scores_all, lens))
    selected = jnp.take_along_axis(raw, idx[:, :, None, None, None], axis=1)
    return preprocess_clips(selected, out_hw=out_hw)
