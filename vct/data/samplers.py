"""Content-aware frame sampling.

Host reference-parity implementations of the reference's samplers:

  * ``uniform_sampling`` — stride = len//T, truncate to T (``loader_data.py:35-41``)
  * ``ssim_sampling`` — SSIM between consecutive frames (win 3, channelwise
    mean), keep frame 0 + the T-1 *lowest*-similarity (most-changed) frames in
    temporal order (``loader_data.py:19-33``)
  * ``sad_sampling`` — sum-of-absolute-differences score
    (``lrcn/lrcn.py:57-59`` compute_sad), lrcn-script selection shape
    (``lrcn.py:158-161``: top-T transitions' earlier frames)
  * ``optical_flow_sampling`` — Farneback flow-magnitude score
    (``lrcn/lrcn.py:65-72``), same script selection shape; a
    frame-difference-energy proxy when OpenCV is unavailable
  * ``duplicate_frames`` — cyclic repeat up to T (``loader_data.py:43-51``)

plus **device-side** scoring (``vct.data.samplers.device_*``): the same
frame-change scores computed in JAX on the TPU (SAD / uniform-filter SSIM /
difference-energy flow proxy) feeding a ``top_k`` gather, so the
"long video -> fixed T" reduction can run on-device as part of the fused
preprocessing path instead of per-frame host Python.

scikit-image is not a dependency: ``ssim_pair`` reimplements
``skimage.metrics.structural_similarity(win_size=3, channel_axis=-1)``
(uniform-filter statistics, channel mean, valid-region crop) in numpy.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

__all__ = [
    "uniform_sampling",
    "ssim_sampling",
    "sad_sampling",
    "optical_flow_sampling",
    "duplicate_frames",
    "sample_frames",
    "ssim_pair",
    "SAMPLERS",
]


# ----------------------------------------------------------------------
# SSIM (skimage-compatible, win_size=3, uniform filter, channel mean)


def _uniform_filter(x: np.ndarray, win: int) -> np.ndarray:
    """Mean filter with reflect-ish edge handling cropped to valid region
    later; plain cumulative-sum implementation, no scipy dependency."""
    from numpy.lib.stride_tricks import sliding_window_view

    pad = win // 2
    xp = np.pad(x, ((pad, pad), (pad, pad)), mode="edge")
    w = sliding_window_view(xp, (win, win))
    return w.mean(axis=(-1, -2))


def ssim_pair(img1: np.ndarray, img2: np.ndarray, win_size: int = 3,
              data_range: float = 255.0) -> float:
    """Mean SSIM between two HxWxC uint8/float frames (channelwise mean)."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    pad = (win_size - 1) // 2
    vals = []
    # cov_norm matches skimage's default (sample covariance, N/(N-1))
    n = win_size * win_size
    cov_norm = n / (n - 1)
    for c in range(img1.shape[-1]):
        x, y = img1[..., c], img2[..., c]
        ux, uy = _uniform_filter(x, win_size), _uniform_filter(y, win_size)
        uxx = _uniform_filter(x * x, win_size)
        uyy = _uniform_filter(y * y, win_size)
        uxy = _uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        a1, a2 = 2 * ux * uy + C1, 2 * vxy + C2
        b1, b2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
        s = (a1 * a2) / (b1 * b2)
        vals.append(s[pad:-pad or None, pad:-pad or None].mean())
    return float(np.mean(vals))


# ----------------------------------------------------------------------
# Host samplers (reference semantics)


def uniform_sampling(frames: Sequence[np.ndarray], sequence_length: int):
    if len(frames) <= sequence_length:
        return list(frames)
    interval = len(frames) // sequence_length
    return [frames[i] for i in range(0, len(frames), interval)][:sequence_length]


def _score_based_sampling(frames, sequence_length, scores_low_is_selected):
    """Canonical (loader_data.py:20-33 / ucf50-lrcn.py:69-82) selection:
    frame 0 + the (T-1) best-scoring transitions' LATER frames, temporal
    order. Used by ssim_sampling."""
    order = np.argsort(scores_low_is_selected, kind="stable")
    selected = [0] + [int(i) + 1 for i in order[: sequence_length - 1]]
    selected = sorted(set(selected))[:sequence_length]
    return [frames[i] for i in selected]


def _script_sampling(frames, sequence_length, diffs_high_is_selected):
    """lrcn-script (lrcn.py:158-161 / rgb_lrcn.py:152-156) selection:
    ``sorted(np.argsort(differences)[-T:])`` — the top-T transitions each
    contribute their EARLIER frame index; frame 0 appears only when
    transition 0 ranks, the last frame never does. SAD and optical-flow
    sampling exist only in those scripts, so this is their parity shape.

    Tie-order divergence: the scripts use numpy's default (unstable)
    argsort, so tied transition scores (plausible on uint8 SAD of
    near-static clips) can select different frames there run-to-run;
    ``kind="stable"`` here is deterministic — a deliberate improvement,
    not a parity bug."""
    order = np.argsort(diffs_high_is_selected, kind="stable")
    selected = sorted(int(i) for i in order[-sequence_length:])
    return [frames[i] for i in selected]


def ssim_sampling(frames: Sequence[np.ndarray], sequence_length: int):
    if len(frames) <= sequence_length:
        return list(frames)
    sims = np.array([
        ssim_pair(frames[i - 1], frames[i]) for i in range(1, len(frames))
    ])
    return _score_based_sampling(frames, sequence_length, sims)


def sad_sampling(frames: Sequence[np.ndarray], sequence_length: int):
    """Sum-of-absolute-differences (lrcn.py:57-59): high SAD = most changed;
    selection follows the lrcn-script shape (``_script_sampling``)."""
    if len(frames) <= sequence_length:
        return list(frames)
    sads = np.array([
        np.abs(np.asarray(frames[i], np.float64)
               - np.asarray(frames[i - 1], np.float64)).sum()
        for i in range(1, len(frames))
    ])
    return _script_sampling(frames, sequence_length, sads)


def optical_flow_sampling(frames: Sequence[np.ndarray], sequence_length: int):
    """Farneback flow-magnitude score (lrcn.py:65-72); selection follows the
    lrcn-script shape (``_script_sampling``, lrcn.py:158-161). Falls back to
    frame-difference energy when OpenCV is unavailable."""
    if len(frames) <= sequence_length:
        return list(frames)
    scores = []
    for i in range(1, len(frames)):
        if _HAS_CV2:
            prev = cv2.cvtColor(np.asarray(frames[i - 1]), cv2.COLOR_RGB2GRAY)
            curr = cv2.cvtColor(np.asarray(frames[i]), cv2.COLOR_RGB2GRAY)
            flow = cv2.calcOpticalFlowFarneback(
                prev, curr, None, 0.5, 3, 15, 3, 5, 1.2, 0
            )
            mag, _ = cv2.cartToPolar(flow[..., 0], flow[..., 1])
            scores.append(float(mag.sum()))
        else:
            d = np.asarray(frames[i], np.float64) - np.asarray(frames[i - 1], np.float64)
            scores.append(float(np.square(d).sum()))
    return _script_sampling(frames, sequence_length, np.asarray(scores))


def duplicate_frames(frames: Sequence[np.ndarray], sequence_length: int):
    """Cyclic repeat to reach T (loader_data.py:43-51)."""
    frames = list(frames)
    if len(frames) >= sequence_length:
        return frames[:sequence_length]
    out: List[np.ndarray] = []
    while len(out) < sequence_length:
        out.extend(frames)
    return out[:sequence_length]


def ssim_sampling_most_unique(frames: Sequence[np.ndarray], sequence_length: int):
    """Most-unique variant (``lrcn/dump_lrcn.py:68-102``): each middle frame
    scores by its *maximum* dissimilarity to either neighbor,
    max(|ssim(f,prev)-1|, |ssim(f,next)-1|); frame 0 always kept; top scorers
    selected and re-sorted into temporal order."""
    if len(frames) <= sequence_length:
        return list(frames)
    scores = []
    for i in range(1, len(frames) - 1):
        # dump_lrcn's compute_ssim (dump_lrcn.py:64-66) uses skimage's
        # DEFAULT window (7), unlike the canonical loader's win_size=3 —
        # keep each variant on its own source's window.
        before = ssim_pair(frames[i], frames[i - 1], win_size=7)
        after = ssim_pair(frames[i], frames[i + 1], win_size=7)
        scores.append((max(abs(before - 1), abs(after - 1)), i))
    scores.sort(reverse=True, key=lambda x: x[0])
    selected = {0}
    for _, idx in scores:
        if len(selected) >= sequence_length:
            break
        selected.add(idx)
    return [frames[i] for i in sorted(selected)[:sequence_length]]


def optical_flow_sampling_most_unique(frames: Sequence[np.ndarray], sequence_length: int):
    """Most-unique flow variant (``lrcn/dump_lrcn.py:165-192``) — identical
    transition scoring to optical_flow_sampling, kept as a distinct name for
    the reference's sampling-method registry."""
    return optical_flow_sampling(frames, sequence_length)


SAMPLERS = {
    "uniform": uniform_sampling,
    # seek-decode fast path: the DECODER reads only the T frames
    # (vct.data.video.decode_uniform_seek); on an already-decoded frame list
    # it is plain uniform selection (same indices).
    "uniform_seek": uniform_sampling,
    "ssim": ssim_sampling,
    "sad": sad_sampling,
    "optical_flow": optical_flow_sampling,
    "optiflow": optical_flow_sampling,
    "ssim_most_unique": ssim_sampling_most_unique,
    "optiflow_most_unique": optical_flow_sampling_most_unique,
}


def sample_frames(frames, sequence_length: int, method: str = "uniform"):
    """Sample + pad to exactly ``sequence_length`` frames."""
    try:
        sampler = SAMPLERS[method]
    except KeyError:
        raise KeyError(
            f"Unknown sampling method '{method}'. Available: {sorted(SAMPLERS)}"
        ) from None
    frames = sampler(frames, sequence_length)
    if len(frames) < sequence_length:
        frames = duplicate_frames(frames, sequence_length)
    return frames


# ----------------------------------------------------------------------
# Device-side scoring (JAX) — used by the fused preprocessing path.


def device_frame_scores(clip, method: str = "sad"):
    """Per-transition change scores for a (T, H, W, C) clip on device.

    Higher = more changed. methods: sad | ssim (1 - mean SSIM, win 3) |
    flow (difference-energy proxy for Farneback magnitude).
    Returns (T-1,) scores for transitions 1..T-1.
    """
    import jax.numpy as jnp

    # f32 on purpose: an int32-domain SAD (bit-identical selection for uint8
    # frames — both domains are exact at this reduction size) measured 32%
    # SLOWER on the v5e (3.59 vs 2.71 ms for score+topk+gather+norm at the
    # bench geometry); the VPU's f32 lanes beat its i32 path here.
    # The batched selection path now scores sad/flow through the chunked
    # Pallas kernel (vct.ops.pair_scores_pallas, 1.97 -> 1.18 ms scoring
    # stage; sad bit-identical to this function) — this XLA version remains
    # the per-clip API and the golden reference the kernel is tested
    # against.
    x = clip.astype(jnp.float32)
    prev, curr = x[:-1], x[1:]
    if method == "sad":
        return jnp.sum(jnp.abs(curr - prev), axis=(1, 2, 3))
    if method == "flow":
        return jnp.sum(jnp.square(curr - prev), axis=(1, 2, 3))
    if method == "ssim":
        return 1.0 - _device_ssim(prev, curr)
    raise KeyError(f"Unknown device score method: {method}")


def _device_ssim(a, b, win: int = 3, data_range: float = 255.0):
    """Batched mean-SSIM over (N, H, W, C) frame pairs with uniform windows."""
    import jax
    import jax.numpy as jnp

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)

    def filt(x):
        # separable uniform filter via depthwise convs on the H and W axes
        ch = x.shape[-1]
        kh = jnp.ones((win, 1, 1, ch), x.dtype) / win
        kw = jnp.ones((1, win, 1, ch), x.dtype) / win
        dn = ("NHWC", "HWIO", "NHWC")
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=ch
        )
        return jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=ch
        )

    # Five separate filter calls, NOT one conv over the stacked moments:
    # measured on the v5e chip, fusing the five inputs into a single
    # 15-channel depthwise conv ran 24% SLOWER end to end (921 vs 1216
    # clips/s in bench sampling_ssim mode) — the concat's HBM round trip and
    # the wider channel padding cost more than the saved launches. A
    # shifted-slice-add separable filter (pure VPU adds, no conv) was also
    # measured SLOWER (975 vs 1221 clips/s): XLA materializes the shifted
    # slices as extra HBM copies where the conv reads each input once.
    # Sharing filter work across consecutive pairs (filter all L frames once,
    # slice u[:-1]/u[1:] instead of filtering prev and curr separately — 2L+
    # (L-1) frame passes vs 5(L-1)) was ALSO measured slower (1085 vs 1225
    # clips/s, bit-exact): the overlapping slices of the shared moment
    # tensors break XLA's conv→elementwise fusion and force the full-L
    # moments out to HBM, costing more than the redundant filter math saves.
    # What finally beat this XLA version is a SINGLE-PASS PALLAS KERNEL
    # (vct.ops.ssim_pallas, 1216 -> 1795 -> 1960 clips/s after its chunked
    # whole-clip layout): all five moments as
    # roll-shifted adds inside VMEM, only the scalar mean leaving the core —
    # the batched selection path (preprocess.device_sample_clips) uses it;
    # this XLA implementation remains the per-clip API and the golden
    # reference the kernel is tested against.
    ua, ub = filt(a), filt(b)
    uaa, ubb, uab = filt(a * a), filt(b * b), filt(a * b)
    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)
    s = ((2 * ua * ub + C1) * (2 * vab + C2)) / (
        (ua ** 2 + ub ** 2 + C1) * (va + vb + C2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def device_topk_indices(scores, sequence_length: int, style: str = "canonical"):
    """Sorted frame indices (T,) from per-transition scores (L-1,).

    ``style="canonical"`` (ssim — loader_data.py:20-33): frame 0 + the
    top-(T-1) transitions' LATER frames.
    ``style="script"`` (sad/flow — lrcn.py:158-161): the top-T transitions'
    EARLIER frames, no forced frame 0.
    """
    import jax
    import jax.numpy as jnp

    if style == "script":
        _, top_idx = jax.lax.top_k(scores, sequence_length)
        return jnp.sort(top_idx)
    k = sequence_length - 1
    _, top_idx = jax.lax.top_k(scores, k)
    return jnp.sort(jnp.concatenate([jnp.zeros(1, top_idx.dtype), top_idx + 1]))


def device_select_topk(clip, scores, sequence_length: int):
    """Select frame 0 + top-(T-1) transitions by score, temporal order.

    clip: (L, H, W, C) device array; scores: (L-1,). Returns (T, H, W, C).
    """
    import jax.numpy as jnp

    return jnp.take(clip, device_topk_indices(scores, sequence_length), axis=0)
