"""Batch inference CLI (C19).

The counterpart of ``medsos_lrcn/src/deployment.py:61-191``: load a model,
classify a directory of videos, print per-video sorted labels + scores +
timestamp as JSON, print label counts, optionally POST each result to the
backend. Same CLI surface (``--model --videos --sampling --sequence_length``,
``deployment.py:179-191``) — but the model is an Orbax checkpoint+manifest
(rebuilt, not unpickled), inference is one jitted **batched** forward over
all clips (the reference loops clip-by-clip with batch 1,
``deployment.py:65-70``), and the URL construction keeps the
``@user_video_<id>`` filename convention (``loader_data.py:546-553``).
"""

from __future__ import annotations

import argparse
import json
import re
from collections import Counter
from datetime import datetime
from typing import List, Optional

import numpy as np

__all__ = ["classify_videos", "classify_and_display", "post_results", "construct_url", "main"]


def construct_url(video_name: str) -> Optional[str]:
    """'@user_video_123.mp4' -> tiktok URL (loader_data.py:546-553)."""
    match = re.match(r"(?P<username>@.+?)_video_(?P<video_id>\d+)", video_name)
    if match:
        return (
            f"https://www.tiktok.com/{match.group('username')}"
            f"/video/{match.group('video_id')}"
        )
    return None


def load_model(model_dir: str):
    """Rebuild (model, variables, class_names, cfg) from a checkpoint dir."""
    import jax

    from vct.models import build_model
    from vct.train.checkpoint import load_checkpoint

    variables, cfg, class_names, _ = load_checkpoint(model_dir)
    model = build_model(cfg.model, cfg.data.sequence_length)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return model, variables, class_names, cfg


import weakref

# WeakValue on the compiled fn would drop it immediately; weak-KEYING on the
# model lets a caller that cycles models (many sweep trials in one process)
# release each model's compiled step instead of leaking one per model.
_infer_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jitted_infer(model):
    """One cached jit per model instance — the worker must NOT re-trace per
    message (linen modules hash by their fields).

    The closure holds the model by WEAK reference: a cached value that
    strongly referenced its key would pin the WeakKeyDictionary entry
    forever and re-create the leak the weak keying exists to fix."""
    import jax

    fn = _infer_cache.get(model)
    if fn is None:
        model_ref = weakref.ref(model)

        @jax.jit
        def infer(variables, x):
            return jax.nn.softmax(model_ref().apply(variables, x), axis=-1)

        _infer_cache[model] = fn = infer
    return fn


def classify_videos(model, variables, clips: np.ndarray, batch_size: int = 32,
                    mesh=None):
    """Jitted batched softmax probabilities for (N, T, H, W, 3) clips.

    The final partial chunk zero-pads up to batch_size so every call
    compiles at most one shape. With ``mesh`` (a ``jax.sharding.Mesh``),
    chunks shard over the ``data`` axis and parameters replicate — the same
    compiled step runs SPMD across every chip in the mesh (multi-chip
    serving; the reference is single-device-only)."""
    import jax
    import jax.numpy as jnp

    infer = _jitted_infer(model)
    put = lambda x: jnp.asarray(x)  # noqa: E731
    if mesh is not None and mesh.size > 1:
        from vct.parallel.mesh import batch_sharding, host_to_device

        # Pad chunks up to a multiple of the data axis.
        data_size = mesh.shape["data"]
        batch_size = ((batch_size + data_size - 1) // data_size) * data_size
        shard = batch_sharding(mesh)
        variables = host_to_device(variables, mesh)
        from vct.parallel.mesh import put_sharded

        put = lambda x: put_sharded(np.asarray(x), shard)  # noqa: E731
    probs = []
    for start in range(0, len(clips), batch_size):
        chunk = clips[start : start + batch_size]
        n = len(chunk)
        if n < batch_size:
            pad = np.zeros((batch_size - n,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        probs.append(np.asarray(infer(variables, put(chunk)))[:n])
    return np.concatenate(probs) if probs else np.zeros((0,))


def classify_and_display(
    model, variables, clips, video_names: List[str], class_names: List[str],
    mesh=None, batch_size: int = 32, probs: Optional[np.ndarray] = None,
) -> List[dict]:
    """Reference output contract (deployment.py:61-101).

    ``probs`` short-circuits the forward for callers that already computed
    probabilities (the AOT-artifact path, ``vct.serve.aot``)."""
    results = []
    label_counter = Counter()
    if probs is None:
        probs = classify_videos(
            model, variables, clips, batch_size=batch_size, mesh=mesh
        )
    for idx, name in enumerate(video_names):
        order = np.argsort(-probs[idx])
        sorted_labels = [class_names[i] for i in order]
        sorted_scores = probs[idx][order].tolist()
        results.append(
            {
                "video_name": name,
                "labels": sorted_labels,
                "scores": sorted_scores,
                "timestamp": datetime.now().isoformat(),
            }
        )
        label_counter[sorted_labels[0]] += 1
        print(f"Processed {name}: {sorted_labels[0]}")

    print(json.dumps(results, indent=4))
    print("\nLabel Counts:")
    for label, count in label_counter.items():
        print(f"{label}: {count}")
    return results


def post_results(results: List[dict], backend_url: str) -> dict:
    """POST each result to the backend (deployment.py:103-132).

    Returns {video_name: bool} — True only for results the backend confirmed
    (HTTP 200/201), so callers can keep unconfirmed videos for retry."""
    import requests

    posted = {}
    for result in results:
        video_name = result["video_name"]
        posted[video_name] = False
        video_url = construct_url(video_name)
        if not video_url:
            print(f"Failed to construct URL for {video_name}")
            continue
        payload = {
            "url": video_url,
            "labels": result["labels"],
            "scores": result["scores"],
            "timestamp": result["timestamp"],
        }
        try:
            response = requests.post(backend_url, json=payload, timeout=10)
            if response.status_code in (200, 201):
                posted[video_name] = True
                print(f"Successfully sent classification result to backend for {video_name}")
            else:
                print(
                    f"Failed to send classification result for {video_name}. "
                    f"HTTP {response.status_code}: {response.text}"
                )
        except Exception as e:
            print(f"Error sending result to backend for {video_name}: {e}")
    return posted


_DEVICE_METHODS = {
    "uniform": "uniform",
    # uniform_seek is plain uniform selection whose host path merely decodes
    # by seeking; on device all frames are already decoded, so it is uniform.
    "uniform_seek": "uniform",
    "ssim": "ssim",
    "sad": "sad",
    "optical_flow": "flow",
    "optiflow": "flow",
    # The *_most_unique variants score neighbor transitions; on device they
    # map to the plain transition-score selectors (the same degradation the
    # host flow-proxy path documents) so every SAMPLERS name stays valid
    # under --device_sampling.
    "ssim_most_unique": "ssim",
    "optiflow_most_unique": "flow",
}


def _length_bucket(n_frames: int, seq_len: int) -> int:
    """Pad decoded length up to seq_len * 2^k: at most 2x selection work and
    a log-bounded number of compiled executables across arbitrary videos."""
    bucket = seq_len * 2
    while bucket < n_frames:
        bucket *= 2
    return bucket


def _load_with_device_sampling(
    videos_dir: str, sampling: str, seq_len: int, img_h: int, img_w: int
):
    """Decode ALL frames per clip on the host (uint8, no per-frame python
    scoring), then run frame selection + normalization on-device
    (``vct.data.preprocess.device_sample_clips``). Decoded lengths pad up to
    power-of-two buckets of seq_len with the true length passed in, so the
    compile count stays O(log max_len) instead of one per distinct length."""
    import os

    import jax.numpy as jnp

    from vct.data.preprocess import device_sample_clips, preprocess_clips
    from vct.data.video import decode_video

    if sampling not in _DEVICE_METHODS:
        raise KeyError(
            f"Unknown sampling method {sampling!r} for --device_sampling; "
            f"available: {sorted(_DEVICE_METHODS)}"
        )
    method = _DEVICE_METHODS[sampling]
    names, clips = [], []
    for fname in sorted(os.listdir(videos_dir)):
        if not fname.lower().endswith((".mp4", ".avi", ".mov", ".mkv", ".webm")):
            continue
        try:
            frames = decode_video(os.path.join(videos_dir, fname), img_h, img_w)
        except Exception as e:
            print(f"Error processing {fname}: {e}")
            continue
        if not frames:
            continue
        n = len(frames)
        if n <= seq_len:
            from vct.data.samplers import duplicate_frames

            padded = np.stack(duplicate_frames(frames, seq_len))[None]
            clip = np.asarray(preprocess_clips(jnp.asarray(padded)))
        else:
            bucket = _length_bucket(n, seq_len)
            raw = np.zeros((1, bucket) + frames[0].shape, np.uint8)
            raw[0, :n] = np.stack(frames)
            raw[0, n:] = frames[-1]  # pad tail; masked out of selection
            clip = np.asarray(
                device_sample_clips(
                    jnp.asarray(raw), seq_len, method=method,
                    lengths=jnp.asarray([n], jnp.int32),
                )
            )
        clips.append(clip[0])
        names.append(fname)
    x = (
        np.stack(clips).astype(np.float32)
        if clips
        else np.zeros((0, seq_len, img_h, img_w, 3), np.float32)
    )
    print(f"Final data shape: {x.shape}")
    return x, names


def main(argv=None) -> int:
    from vct.utils.compilecache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description="Batch video classification")
    parser.add_argument(
        "--model", required=True,
        help="checkpoint directory, or a .vctaot artifact file "
             "(vct.serve.aot) to serve without the model zoo in the path",
    )
    parser.add_argument("--videos", default=None, help="directory of videos")
    parser.add_argument(
        "--frames", default=None,
        help="directory of extracted frame images for ONE clip "
             "(lrcn/deployment.py --frames variant)",
    )
    parser.add_argument("--sampling", default=None, help="override sampling method")
    parser.add_argument("--sequence_length", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--post", action="store_true", help="POST results to backend")
    parser.add_argument("--backend_url", default=None)
    parser.add_argument(
        "--mesh", action="store_true",
        help="shard batch inference over ALL local devices (data-parallel "
             "SPMD; single-device behavior is unchanged without it)",
    )
    parser.add_argument(
        "--device_sampling", action="store_true",
        help="run content-aware frame selection on the TPU (decode all "
             "frames on host, score + top-k select on device)",
    )
    args = parser.parse_args(argv)

    from vct.data.ingest import load_dataset_inference

    if not args.videos and not args.frames:
        parser.error("one of --videos or --frames is required")
    import os

    servable = None
    if os.path.isfile(args.model):
        # A .vctaot artifact: weights + compiled forward in one file — no
        # model zoo, config, or checkpoint restore in the serving path.
        from vct.serve.aot import AotServable

        servable = AotServable.load(args.model)
        if servable.device_sampling:
            parser.error(
                "this artifact bakes on-device sampling in (raw-input "
                "contract, AotServable.classify_raw); the deployment CLI "
                "feeds pre-sampled clips — export without --device_sampling"
            )
        class_names = servable.class_names
        model = variables = cfg = None
        # The manifest records the training-time sampling so artifact
        # serving preprocesses like the checkpoint path would.
        sampling = args.sampling or servable.sampling_method or "uniform"
        art_T = servable.input_shape[0]
        if args.sequence_length and args.sequence_length != art_T:
            print(
                f"--sequence_length {args.sequence_length} overridden to "
                f"{art_T}: the artifact's executables are compiled for "
                f"T={art_T}"
            )
        seq_len = art_T
        img_h, img_w = servable.input_shape[1], servable.input_shape[2]
        if args.mesh:
            print(
                "--mesh is ignored for .vctaot artifacts; export with "
                "--data_parallel to bake multi-chip sharding into the file"
            )
    else:
        model, variables, class_names, cfg = load_model(args.model)
        sampling = args.sampling or cfg.data.sampling_method
        seq_len = args.sequence_length or cfg.data.sequence_length
        img_h, img_w = cfg.data.img_height, cfg.data.img_width
    if args.frames:
        from vct.data.frames import preprocess_frames_dir

        clip = preprocess_frames_dir(args.frames, seq_len, img_h, img_w)
        probs = (
            servable.classify(clip)
            if servable is not None
            else classify_videos(model, variables, clip, batch_size=1)
        )
        predicted = class_names[int(np.argmax(probs[0]))]
        print(f"Predicted class: {predicted}")
        return 0
    if args.device_sampling:
        clips, names = _load_with_device_sampling(
            args.videos, sampling, seq_len, img_h, img_w
        )
    else:
        clips, names = load_dataset_inference(
            args.videos,
            sampling_method=sampling,
            sequence_length=seq_len,
            img_height=img_h,
            img_width=img_w,
        )
    if len(names) == 0:
        print("No videos found.")
        return 1
    mesh = None
    if args.mesh and servable is None:
        import jax

        from vct.parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh(jax.devices(), model=1)
            print(f"Sharding inference over {mesh.size} devices")
    results = classify_and_display(
        model, variables, clips, names, class_names, mesh=mesh,
        batch_size=args.batch_size,
        probs=servable.classify(clips) if servable is not None else None,
    )
    if args.post:
        if cfg is not None:
            backend_url = args.backend_url or cfg.serve.backend_url
        else:
            from vct.core.config import ServeConfig

            backend_url = args.backend_url or ServeConfig().backend_url
        post_results(results, backend_url)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
