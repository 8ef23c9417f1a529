"""AOT-exported servable artifacts (jax.export).

The reference serves from a whole serialized module — ``torch.load(path)``
in ``medsos_lrcn/src/deployment.py:63`` deserializes model code + weights in
one file. vct's checkpoints are rebuild-from-manifest (safer, but the serving
path still needs the Python model zoo + config + Orbax restore). This module
adds the TPU-native analogue of the whole-model file: the jitted softmax
forward with the **weights baked in as constants**, serialized as StableHLO
via ``jax.export`` — one executable per batch bucket, plus a JSON manifest.

A server that loads the artifact classifies with zero model-zoo code, zero
config plumbing, and zero checkpoint restore in the path; the StableHLO
compile of the deserialized function hits the persistent XLA compile cache
across process restarts, so warm cold-starts skip straight to execution.

Artifacts are **per-platform** (the StableHLO is lowered for the platform
that exported it — cpu artifacts serve on cpu, tpu artifacts on tpu), and
``jax.export`` guarantees backward compatibility for serialized artifacts.
``data_parallel=N`` exports executables sharded batch-wise over an N-device
mesh — one file that serves data-parallel across N chips over ICI (weights
replicated, batch split; serving requires >= N visible devices).

Usage::

    # build (once, after training)
    python -m vct.serve.aot --model /ckpt/run1 --out run1.vctaot --batches 1,32

    # serve
    sv = AotServable.load("run1.vctaot")
    probs = sv.classify(clips)          # (N, T, H, W, 3) float32 in [0, 1]
"""

from __future__ import annotations

import json
import zipfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "export_servable", "export_from_checkpoint", "AotServable",
    "export_caption_servable", "export_from_caption_checkpoint",
    "CaptionAotServable", "main",
]

_MANIFEST = "manifest.json"
_FORMAT = "vct-aot-v1"
_CAPTION_FORMAT = "vct-aot-caption-v1"


def _batch_sharding(n_dev: int):
    """Batch-axis NamedSharding over the first ``n_dev`` devices."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    return NamedSharding(mesh, PartitionSpec("data"))


def _make_stager(n_devices: int):
    """Host chunk -> device array, batch-sharded over the artifact's mesh
    when it was exported data-parallel. The sharding is built lazily on the
    first call so loading an artifact never touches devices; shared by the
    classifier and caption servables."""
    state = {"sharding": None}

    def stage(chunk):
        import jax
        import jax.numpy as jnp

        if n_devices > 1 and state["sharding"] is None:
            if len(jax.devices()) < n_devices:
                raise ValueError(
                    f"artifact was exported for {n_devices} devices; "
                    f"only {len(jax.devices())} are visible"
                )
            state["sharding"] = _batch_sharding(n_devices)
        if state["sharding"] is not None:
            return jax.device_put(chunk, state["sharding"])
        return jnp.asarray(chunk)

    return stage


def _check_platform(platform: str) -> None:
    """Raise a clear error when an artifact was lowered for a platform other
    than the default backend (artifacts are per-platform: the serialized
    StableHLO embeds its target). Shared by both servable loaders."""
    import jax

    here = jax.default_backend()
    # jax.export spells the TPU platform "tpu"; backends agree today,
    # but compare case-insensitively to be safe.
    if platform.lower() != here.lower():
        raise ValueError(
            f"artifact was exported for platform={platform!r} but "
            f"the default backend here is {here!r}; re-export on this "
            "platform (python -m vct.serve.aot)"
        )


def _bucket_for(buckets: List[int], n: int) -> int:
    """Smallest compiled bucket that fits ``n`` rows, else the largest."""
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


def _run_bucketed(fns, buckets, arrays, stage, empty):
    """Stream ``(array_0[i], array_1[i], ...)`` batches through the bucketed
    executables: full chunks use the largest bucket, the tail pads up to the
    smallest bucket that fits (same shape discipline as
    ``deployment.classify_videos``), padded rows slice off host-side.

    ``stage`` places one host chunk on device; ``empty`` is the tuple of
    zero-row outputs returned for empty input. Executables may return one
    array or a tuple — outputs concatenate per position. Shared by the
    classifier and caption servables so the chunking discipline has ONE
    implementation."""
    outs = tuple([] for _ in empty)
    big = buckets[-1]
    n = len(arrays[0])
    start = 0
    while start < n:
        chunks = [a[start : start + big] for a in arrays]
        m = len(chunks[0])
        b = _bucket_for(buckets, m)
        if m < b:
            chunks = [
                np.concatenate([c, np.zeros((b - m,) + c.shape[1:], c.dtype)])
                for c in chunks
            ]
        res = fns[b].call(*[stage(c) for c in chunks])
        if not isinstance(res, (tuple, list)):
            res = (res,)
        for acc, r in zip(outs, res):
            acc.append(np.asarray(r)[:m])
        start += m
    if not outs[0]:
        return empty
    return tuple(np.concatenate(acc) for acc in outs)


def export_servable(
    model,
    variables,
    class_names: Sequence[str],
    input_shape: Tuple[int, int, int, int],
    path: str,
    batch_sizes: Sequence[int] = (1, 32),
    data_parallel: int = 1,
    sampling_method: Optional[str] = None,
    device_sampling: Optional[str] = None,
    raw_len: Optional[int] = None,
) -> None:
    """Serialize ``softmax(model.apply(variables, x))`` for each batch bucket.

    ``sampling_method`` records the frame-sampling the model was trained
    with so artifact-serving paths preprocess the same way the checkpoint
    path would (a ssim-trained model served with uniform sampling silently
    changes predictions).

    ``input_shape`` is the per-clip (T, H, W, C) geometry; ``variables`` are
    closed over, so they lower to constants inside the artifact (the
    whole-model property of the reference's ``torch.save``).

    ``data_parallel=N`` exports every executable sharded batch-wise over an
    N-device ``Mesh`` (weights replicated by propagation): ONE artifact file
    that serves data-parallel across N chips over ICI. Loading then requires
    exactly N devices, and every batch bucket must be a multiple of N.

    ``device_sampling`` bakes the ENTIRE serving pipeline into the
    executables: they take ragged raw uint8 clips (B, raw_len, H, W, 3)
    plus true lengths (B,) and run frame scoring + top-T selection + /255
    (``vct.data.preprocess.device_sample_clips``) before the forward — a
    server needs only jax and the artifact, no preprocessing code. Serve
    with ``AotServable.classify_raw``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    T = int(input_shape[0])
    if raw_len is not None and not device_sampling:
        raise ValueError(
            "raw_len only applies with device_sampling (it sizes the raw "
            "uint8 clip capacity the baked-in sampler selects from)"
        )
    raw_len = int(raw_len) if raw_len is not None else 2 * T
    if device_sampling:
        from vct.data.preprocess import device_sample_clips

        if raw_len <= T:
            raise ValueError(
                f"raw_len {raw_len} must exceed the sampled T={T}"
            )

        def forward(raw, lengths):
            x = device_sample_clips(
                raw, T, method=device_sampling, lengths=lengths
            )
            return jax.nn.softmax(model.apply(variables, x), axis=-1)

    else:

        def forward(x):
            return jax.nn.softmax(model.apply(variables, x), axis=-1)

    n_dev = int(data_parallel)
    if n_dev < 1:
        raise ValueError(f"data_parallel must be >= 1, got {n_dev}")
    if n_dev > 1:
        if len(jax.devices()) < n_dev:
            raise ValueError(
                f"data_parallel={n_dev} but only {len(jax.devices())} "
                "devices are visible at export time"
            )
        sharding = _batch_sharding(n_dev)
        n_args = 2 if device_sampling else 1
        fwd = jax.jit(forward, in_shardings=(sharding,) * n_args,
                      out_shardings=sharding)
    else:
        fwd = jax.jit(forward)

    blobs = {}
    for b in sorted(set(int(b) for b in batch_sizes)):
        if b <= 0:
            raise ValueError(f"batch sizes must be positive, got {b}")
        if b % n_dev:
            raise ValueError(
                f"batch bucket {b} is not a multiple of data_parallel={n_dev}"
            )
        if device_sampling:
            specs = (
                jax.ShapeDtypeStruct(
                    (b, raw_len) + tuple(input_shape[1:]), jnp.uint8
                ),
                jax.ShapeDtypeStruct((b,), jnp.int32),
            )
        else:
            specs = (
                jax.ShapeDtypeStruct((b,) + tuple(input_shape), jnp.float32),
            )
        exported = jex.export(fwd)(*specs)
        blobs[b] = exported.serialize()

    manifest = {
        "format": _FORMAT,
        "class_names": list(class_names),
        "input_shape": list(input_shape),
        "batch_sizes": sorted(blobs),
        "n_devices": n_dev,
        "sampling_method": sampling_method,
        "device_sampling": device_sampling,
        "raw_len": raw_len if device_sampling else None,
        "platform": jex.default_export_platform(),
        "jax_version": jax.__version__,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST, json.dumps(manifest, indent=2))
        for b, blob in blobs.items():
            zf.writestr(f"batch_{b}.stablehlo", blob)


def export_from_checkpoint(
    model_dir: str,
    path: str,
    batch_sizes: Sequence[int] = (1, 32),
    data_parallel: int = 1,
    device_sampling: Optional[str] = None,
    raw_len: Optional[int] = None,
) -> None:
    """Build an artifact straight from an Orbax checkpoint directory."""
    from vct.serve.deployment import load_model

    model, variables, class_names, cfg = load_model(model_dir)
    export_servable(
        model,
        variables,
        class_names,
        (
            cfg.data.sequence_length,
            cfg.data.img_height,
            cfg.data.img_width,
            3,
        ),
        path,
        batch_sizes=batch_sizes,
        data_parallel=data_parallel,
        sampling_method=cfg.data.sampling_method,
        device_sampling=device_sampling,
        raw_len=raw_len,
    )


def export_caption_servable(
    model,
    variables,
    vocab,
    input_shape: Tuple[int, int, int, int],
    path: str,
    batch_sizes: Sequence[int] = (1, 8),
    beam_width: int = 3,
    max_len: int = 30,
    device_sampling: bool = False,
    raw_len: Optional[int] = None,
    data_parallel: int = 1,
) -> None:
    """Serialize the FULL captioning pipeline per batch bucket: CNN features
    -> encoder -> jitted beam search, weights baked in as constants.

    The reference's captioning deploy story is ``torch.load`` of the whole
    model plus a host-Python beam loop (``s2vt/beam_search.py:384-436``);
    here the entire decode — encoder, per-step decoder, top-k pruning — is
    ONE serialized StableHLO executable per bucket. The vocabulary travels
    in the manifest, so a ``CaptionAotServable`` turns (B, T, H, W, 3)
    float32 clips into word lists with zero model-zoo code in the path.

    ``beam_width``/``max_len`` are baked in (they shape the compiled loop);
    export another artifact to change them. Works for every captioner family
    ``vct.caption.beam.beam_search`` supports (s2vt, v1_lstm/gru,
    transformer).

    ``device_sampling=True`` additionally bakes the caption pipeline's
    interval frame selection (``s2vt/beam_search.py:143-180``: stride
    ``true_len // T``, last-frame padding) into the executables: they then
    take ragged raw uint8 clips (B, raw_len, H, W, 3) plus true lengths (B,)
    and run selection + /255 on device before the encoder — serve with
    ``CaptionAotServable.caption_raw``. ``raw_len`` sizes the raw capacity
    (default 2x T).

    ``data_parallel=N`` exports every executable sharded batch-wise over an
    N-device ``Mesh`` (same contract as the classifier artifact: weights
    replicate by propagation, loading requires exactly N devices, every
    batch bucket must be a multiple of N). The whole pipeline — CNN,
    encoder, the beam-search loop's per-step top-k — is batch-parallel, so
    the captioning rate scales with chips over ICI from ONE artifact file.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from vct.caption.beam import beam_search

    if beam_width < 1:
        raise ValueError(f"beam_width must be >= 1, got {beam_width}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    T = int(input_shape[0])
    if raw_len is not None and not device_sampling:
        raise ValueError(
            "raw_len only applies with device_sampling (it sizes the raw "
            "uint8 clip capacity the baked-in selection samples from)"
        )
    raw_len = int(raw_len) if raw_len is not None else 2 * T
    if device_sampling:
        from vct.data.preprocess import device_sample_clips

        if raw_len <= T:
            raise ValueError(f"raw_len {raw_len} must exceed the sampled T={T}")

        def forward(raw, lengths):
            video = device_sample_clips(
                raw, T, method="uniform", lengths=lengths, short_pad="last"
            )
            return beam_search(
                model, variables, video, beam_width=beam_width, max_len=max_len
            )

    else:

        def forward(video):
            return beam_search(
                model, variables, video, beam_width=beam_width, max_len=max_len
            )

    n_dev = int(data_parallel)
    if n_dev < 1:
        raise ValueError(f"data_parallel must be >= 1, got {n_dev}")
    if n_dev > 1:
        if len(jax.devices()) < n_dev:
            raise ValueError(
                f"data_parallel={n_dev} but only {len(jax.devices())} "
                "devices are visible at export time"
            )
        sharding = _batch_sharding(n_dev)
        n_args = 2 if device_sampling else 1
        # beam_search returns (tokens, scores), both batch-leading.
        fwd = jax.jit(forward, in_shardings=(sharding,) * n_args,
                      out_shardings=(sharding, sharding))
    else:
        fwd = jax.jit(forward)
    blobs = {}
    for b in sorted(set(int(b) for b in batch_sizes)):
        if b <= 0:
            raise ValueError(f"batch sizes must be positive, got {b}")
        if b % n_dev:
            raise ValueError(
                f"batch bucket {b} is not a multiple of data_parallel={n_dev}"
            )
        if device_sampling:
            specs = (
                jax.ShapeDtypeStruct(
                    (b, raw_len) + tuple(input_shape[1:]), jnp.uint8
                ),
                jax.ShapeDtypeStruct((b,), jnp.int32),
            )
        else:
            specs = (
                jax.ShapeDtypeStruct((b,) + tuple(input_shape), jnp.float32),
            )
        exported = jex.export(fwd)(*specs)
        blobs[b] = exported.serialize()

    manifest = {
        "format": _CAPTION_FORMAT,
        "vocab": vocab.to_dict(),
        "input_shape": list(input_shape),
        "batch_sizes": sorted(blobs),
        "n_devices": n_dev,
        "beam_width": int(beam_width),
        "max_len": int(max_len),
        "start_token": 1,
        "end_token": 2,
        "pad_token": 0,
        "device_sampling": bool(device_sampling),
        "raw_len": raw_len if device_sampling else None,
        "platform": jex.default_export_platform(),
        "jax_version": jax.__version__,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST, json.dumps(manifest, indent=2))
        for b, blob in blobs.items():
            zf.writestr(f"batch_{b}.stablehlo", blob)


def export_from_caption_checkpoint(
    ckpt_dir: str,
    path: str,
    batch_sizes: Sequence[int] = (1, 8),
    beam_width: Optional[int] = None,
    max_len: Optional[int] = None,
    height: int = 224,
    width: int = 224,
    device_sampling: bool = False,
    raw_len: Optional[int] = None,
    data_parallel: int = 1,
) -> None:
    """Build a caption artifact straight from a ``CaptionTrainer`` checkpoint.

    The checkpoint manifest is self-describing (config + vocab recorded at
    save time); ``height``/``width`` fix the frame geometry to bake in (the
    reference's caption pipeline is 224x224, ``s2vt/beam_search.py:143-180``
    — CaptionConfig carries no image size, the dataset does).
    ``device_sampling``/``raw_len``: bake interval frame selection in (see
    ``export_caption_servable``).
    """
    from vct.caption.train import restore_caption_trainer

    trainer, state, cfg = restore_caption_trainer(
        ckpt_dir, height=height, width=width
    )
    export_caption_servable(
        trainer.model,
        {"params": state.params, **state.extra_vars},
        trainer.vocab,
        (cfg.num_frames, height, width, 3),
        path,
        batch_sizes=batch_sizes,
        beam_width=beam_width if beam_width is not None else cfg.beam_width,
        max_len=max_len if max_len is not None else cfg.max_caption_len,
        device_sampling=device_sampling,
        raw_len=raw_len,
        data_parallel=data_parallel,
    )


def _warmup_servable(sv, dense_fn, raw_fn) -> None:
    """Shared warmup: run every compiled bucket once on zeros, through the
    servable's dense entry point (pre-sampled clips) or its raw entry point
    (ragged uint8 + lengths) depending on how it was exported."""
    for b in sv._buckets:
        if sv.device_sampling:
            raw = np.zeros(
                (b, sv.raw_len) + tuple(sv.input_shape[1:]), np.uint8
            )
            raw_fn(raw, np.full((b,), sv.input_shape[0], np.int32))
        else:
            dense_fn(np.zeros((b,) + sv.input_shape, np.float32))


class AotServable:
    """A loaded artifact: per-bucket compiled forwards + the label manifest."""

    def __init__(self, manifest: dict, fns: dict):
        self.class_names: List[str] = list(manifest["class_names"])
        self.input_shape = tuple(manifest["input_shape"])
        self.platform: str = manifest["platform"]
        self.n_devices: int = int(manifest.get("n_devices", 1))
        self.sampling_method: Optional[str] = manifest.get("sampling_method")
        self.device_sampling: Optional[str] = manifest.get("device_sampling")
        self.raw_len: Optional[int] = manifest.get("raw_len")
        self._fns = fns  # batch size -> Exported
        self._buckets = sorted(fns)
        self._stage = _make_stager(self.n_devices)

    @property
    def buckets(self) -> Tuple[int, ...]:
        """Compiled batch buckets, ascending — callers feeding chunks should
        chunk by ``buckets[-1]`` (smaller chunks zero-pad up to a bucket)."""
        return tuple(self._buckets)

    @classmethod
    def load(cls, path: str) -> "AotServable":
        from jax import export as jex

        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read(_MANIFEST))
            if manifest.get("format") == _CAPTION_FORMAT:
                raise ValueError(
                    f"{path} is a captioning artifact — load it with "
                    "CaptionAotServable.load"
                )
            if manifest.get("format") != _FORMAT:
                raise ValueError(
                    f"{path}: not a {_FORMAT} artifact "
                    f"(format={manifest.get('format')!r})"
                )
            fns = {
                b: jex.deserialize(bytearray(zf.read(f"batch_{b}.stablehlo")))
                for b in manifest["batch_sizes"]
            }
        sv = cls(manifest, fns)
        sv.check_platform()
        return sv

    def _bucket_for(self, n: int) -> int:
        return _bucket_for(self._buckets, n)

    def check_platform(self) -> None:
        _check_platform(self.platform)

    def _run_chunks(self, arrays: Tuple[np.ndarray, ...]) -> np.ndarray:
        """Stream batches through the bucketed executables (shared
        ``_run_bucketed`` discipline). Multi-device artifacts shard every
        chunk batch-wise over the mesh via ``_stage``."""
        (probs,) = _run_bucketed(
            self._fns, self._buckets, arrays, self._stage,
            empty=(np.zeros((0, len(self.class_names)), np.float32),),
        )
        return probs

    def warmup(self) -> None:
        """Execute every compiled bucket once on zeros. An executable's
        first run pays one-time costs — weights land on the device, the
        runtime warms up (measured: 50 s through a tunneled chip, 0.1 s
        steady-state) — and those belong at load time, not inside the first
        user request. The queue worker calls this before binding its port."""
        _warmup_servable(self, self.classify, self.classify_raw)

    def classify(self, clips: np.ndarray) -> np.ndarray:
        """Softmax probabilities for pre-sampled (N, T, H, W, 3) f32 clips."""
        if self.device_sampling:
            raise ValueError(
                "this artifact bakes in on-device sampling — feed raw clips "
                "via classify_raw(raw, lengths)"
            )
        clips = np.asarray(clips, np.float32)
        if clips.ndim != 5 or clips.shape[1:] != self.input_shape:
            raise ValueError(
                f"expected (N,) + {self.input_shape}, got {clips.shape}"
            )
        return self._run_chunks((clips,))

    def classify_raw(self, raw: np.ndarray, lengths) -> np.ndarray:
        """Softmax probabilities straight from RAGGED RAW uint8 clips.

        ``raw`` is (N, raw_len, H, W, 3) uint8 (each clip's true frames
        first, tail padding ignored); ``lengths`` the true frame counts.
        Frame scoring + top-T selection + /255 + forward all run inside the
        artifact's executable — the caller needs no preprocessing code."""
        if not self.device_sampling:
            raise ValueError(
                "this artifact has no baked-in sampling — feed sampled "
                "clips via classify(clips)"
            )
        raw = np.asarray(raw)
        want = (self.raw_len,) + tuple(self.input_shape[1:])
        if raw.dtype != np.uint8 or raw.ndim != 5 or raw.shape[1:] != want:
            raise ValueError(
                f"expected (N,) + {want} uint8, got {raw.shape} {raw.dtype}"
            )
        lengths = np.asarray(lengths, np.int32)
        if lengths.shape != (len(raw),):
            raise ValueError(
                f"lengths must be ({len(raw)},), got {lengths.shape}"
            )
        # Value-validate too: the executable's gather clamps out-of-range
        # frame indices, so a length beyond raw_len would silently classify
        # padding frames instead of erroring.
        if len(lengths) and (lengths.min() < 1 or lengths.max() > self.raw_len):
            raise ValueError(
                f"lengths must be in [1, raw_len={self.raw_len}], got "
                f"range [{lengths.min()}, {lengths.max()}] — truncate clips "
                "to the artifact's raw capacity before calling"
            )
        return self._run_chunks((raw, lengths))


class CaptionAotServable:
    """A loaded captioning artifact: per-bucket compiled beam searches plus
    the vocabulary — clips in, word lists out, no model zoo in the path."""

    def __init__(self, manifest: dict, fns: dict):
        self.input_shape = tuple(manifest["input_shape"])
        self.platform: str = manifest["platform"]
        self.beam_width: int = int(manifest["beam_width"])
        self.max_len: int = int(manifest["max_len"])
        self.start_token: int = int(manifest["start_token"])
        self.end_token: int = int(manifest["end_token"])
        self.pad_token: int = int(manifest["pad_token"])
        # absent in artifacts exported before the raw contract existed
        self.device_sampling: bool = bool(manifest.get("device_sampling"))
        self.raw_len: Optional[int] = manifest.get("raw_len")
        # absent in artifacts exported before data-parallel caption export
        self.n_devices: int = int(manifest.get("n_devices", 1))
        from vct.caption.vocab import Vocabulary

        self.vocab = Vocabulary.from_dict(manifest["vocab"])
        self._fns = fns
        self._buckets = sorted(fns)
        self._stage = _make_stager(self.n_devices)

    @property
    def buckets(self) -> Tuple[int, ...]:
        """Compiled batch buckets, ascending — callers feeding chunks should
        chunk by ``buckets[-1]`` (smaller chunks zero-pad up to a bucket)."""
        return tuple(self._buckets)

    @classmethod
    def load(cls, path: str) -> "CaptionAotServable":
        from jax import export as jex

        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read(_MANIFEST))
            if manifest.get("format") == _FORMAT:
                raise ValueError(
                    f"{path} is a classification artifact — load it with "
                    "AotServable.load"
                )
            if manifest.get("format") != _CAPTION_FORMAT:
                raise ValueError(
                    f"{path}: not a {_CAPTION_FORMAT} artifact "
                    f"(format={manifest.get('format')!r})"
                )
            fns = {
                b: jex.deserialize(bytearray(zf.read(f"batch_{b}.stablehlo")))
                for b in manifest["batch_sizes"]
            }
        sv = cls(manifest, fns)
        # Same per-platform contract as the classifier artifact.
        _check_platform(sv.platform)
        return sv

    def _empty(self):
        return (
            np.zeros((0, self.max_len + 1), np.int32),
            np.zeros((0,), np.float32),
        )

    def warmup(self) -> None:
        """Run every compiled bucket once on zeros (same rationale as
        ``AotServable.warmup`` — move the one-time first-execution cost out
        of the first user request)."""
        _warmup_servable(self, self.decode, self.decode_raw)

    def decode(self, clips: np.ndarray):
        """(tokens (N, max_len+1) int32 incl. leading <start>, scores (N,))
        for pre-sampled (N, T, H, W, 3) float32 clips in [0, 1]."""
        if self.device_sampling:
            raise ValueError(
                "this artifact bakes in on-device frame selection — feed "
                "raw clips via decode_raw/caption_raw(raw, lengths)"
            )
        clips = np.asarray(clips, np.float32)
        if clips.ndim != 5 or clips.shape[1:] != self.input_shape:
            raise ValueError(
                f"expected (N,) + {self.input_shape}, got {clips.shape}"
            )
        return _run_bucketed(
            self._fns, self._buckets, (clips,), self._stage,
            empty=self._empty(),
        )

    def decode_raw(self, raw: np.ndarray, lengths):
        """(tokens, scores) straight from RAGGED RAW uint8 clips.

        ``raw`` is (N, raw_len, H, W, 3) uint8 (each clip's true frames
        first, tail padding ignored); ``lengths`` the true frame counts.
        Interval frame selection + /255 + encode + beam search all run
        inside the artifact's executable."""
        if not self.device_sampling:
            raise ValueError(
                "this artifact has no baked-in frame selection — feed "
                "pre-sampled clips via decode/caption(clips)"
            )
        raw = np.asarray(raw)
        want = (self.raw_len,) + tuple(self.input_shape[1:])
        if raw.dtype != np.uint8 or raw.ndim != 5 or raw.shape[1:] != want:
            raise ValueError(
                f"expected (N,) + {want} uint8, got {raw.shape} {raw.dtype}"
            )
        lengths = np.asarray(lengths, np.int32)
        if lengths.shape != (len(raw),):
            raise ValueError(
                f"lengths must be ({len(raw)},), got {lengths.shape}"
            )
        # Same value validation as the classifier raw contract: the
        # executable's gather clamps, so out-of-range lengths would silently
        # select padding frames instead of erroring.
        if len(lengths) and (lengths.min() < 1 or lengths.max() > self.raw_len):
            raise ValueError(
                f"lengths must be in [1, raw_len={self.raw_len}], got "
                f"range [{lengths.min()}, {lengths.max()}] — truncate clips "
                "to the artifact's raw capacity before calling"
            )
        return _run_bucketed(
            self._fns, self._buckets, (raw, lengths), self._stage,
            empty=self._empty(),
        )

    def _words(self, tokens) -> List[List[str]]:
        from vct.caption.beam import decode_tokens

        return [
            decode_tokens(row, self.vocab, self.start_token, self.end_token,
                          self.pad_token)
            for row in tokens
        ]

    def caption(self, clips: np.ndarray) -> List[List[str]]:
        """Word lists for (N, T, H, W, 3) float32 clips in [0, 1]."""
        tokens, _ = self.decode(clips)
        return self._words(tokens)

    def caption_raw(self, raw: np.ndarray, lengths) -> List[List[str]]:
        """Word lists straight from ragged raw uint8 clips (see decode_raw)."""
        tokens, _ = self.decode_raw(raw, lengths)
        return self._words(tokens)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    from vct.utils.compilecache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    parser = argparse.ArgumentParser(
        description="Export an AOT servable artifact from a checkpoint"
    )
    parser.add_argument("--model", required=True, help="checkpoint directory")
    parser.add_argument("--out", required=True, help="artifact output path")
    parser.add_argument(
        "--batches",
        default=None,
        help="comma-separated batch buckets to compile (default 1,32 for "
             "classifier checkpoints; 1,8 for caption checkpoints — beam "
             "search per row is far heavier than one classifier forward)",
    )
    parser.add_argument(
        "--data_parallel",
        type=int,
        default=1,
        help="shard every executable batch-wise over this many devices "
             "(serving then requires the same device count)",
    )
    parser.add_argument(
        "--device_sampling",
        default=None,
        help="bake on-device frame selection into the executables: they "
             "then take ragged raw uint8 clips + lengths. Classifier "
             "checkpoints: sad|ssim|uniform|flow "
             "(AotServable.classify_raw); caption checkpoints: interval "
             "(CaptionAotServable.caption_raw)",
    )
    parser.add_argument(
        "--raw_len",
        type=int,
        default=None,
        help="raw frame capacity per clip for --device_sampling "
             "(default 2x the model's T)",
    )
    parser.add_argument(
        "--beam_width", type=int, default=None,
        help="caption checkpoints only: beam width to bake in "
             "(default: the checkpoint config's)",
    )
    parser.add_argument(
        "--max_len", type=int, default=None,
        help="caption checkpoints only: max caption length to bake in",
    )
    parser.add_argument(
        "--height", type=int, default=None,
        help="caption checkpoints only: frame height to bake in "
             "(default 224 — the reference caption pipeline)",
    )
    parser.add_argument(
        "--width", type=int, default=None,
        help="caption checkpoints only: frame width to bake in",
    )
    args = parser.parse_args(argv)

    # A caption checkpoint manifest carries the vocab; a classifier one
    # carries class_names — dispatch on that, no flag needed.
    import os

    manifest_path = os.path.join(args.model, _MANIFEST)
    is_caption = False
    if os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            is_caption = "vocab" in json.load(f)

    if args.batches is None:
        args.batches = "1,8" if is_caption else "1,32"
    batch_sizes = [int(b) for b in args.batches.split(",") if b.strip()]

    if is_caption:
        if args.device_sampling not in (None, "interval"):
            parser.error(
                "caption artifacts support --device_sampling interval only "
                "(the caption pipeline's stride selection, "
                "s2vt/beam_search.py:143-180); sad/ssim/uniform/flow are "
                "classifier selection methods"
            )
        if args.raw_len is not None and not args.device_sampling:
            parser.error("--raw_len requires --device_sampling (it sizes "
                         "the raw clip capacity the baked-in selection "
                         "samples from)")
        export_from_caption_checkpoint(
            args.model, args.out, batch_sizes=batch_sizes,
            beam_width=args.beam_width, max_len=args.max_len,
            height=args.height if args.height is not None else 224,
            width=args.width if args.width is not None else 224,
            device_sampling=args.device_sampling == "interval",
            raw_len=args.raw_len,
            data_parallel=args.data_parallel,
        )
        csv = CaptionAotServable.load(args.out)
        print(
            f"exported {args.out}: caption platform={csv.platform} "
            f"buckets={sorted(csv._fns)} beam_width={csv.beam_width} "
            f"max_len={csv.max_len} "
            + (f"device_sampling=interval raw_len={csv.raw_len} "
               if csv.device_sampling else "")
            + (f"data_parallel={csv.n_devices} " if csv.n_devices > 1 else "")
            + f"vocab={len(csv.vocab)} words"
        )
        return 0

    for flag, val in (("--beam_width", args.beam_width),
                      ("--max_len", args.max_len),
                      ("--height", args.height), ("--width", args.width)):
        if val is not None:
            parser.error(f"{flag} applies to caption checkpoints only "
                         "(classifier geometry comes from the checkpoint "
                         "config)")
    if args.raw_len is not None and not args.device_sampling:
        parser.error("--raw_len requires --device_sampling (it sizes the "
                     "raw clip capacity the baked-in sampler selects from)")
    export_from_checkpoint(args.model, args.out, batch_sizes=batch_sizes,
                           data_parallel=args.data_parallel,
                           device_sampling=args.device_sampling,
                           raw_len=args.raw_len)
    sv = AotServable.load(args.out)
    print(
        f"exported {args.out}: platform={sv.platform} "
        f"buckets={sorted(sv._fns)} devices={sv.n_devices} "
        + (f"device_sampling={sv.device_sampling} raw_len={sv.raw_len} "
           if sv.device_sampling else "")
        + f"classes={sv.class_names}"
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
