"""Headline benchmark: UCF50-style LRCN inference throughput per chip.

Measures preprocessing + forward on the flagship UCF50 config of the
reference (``lrcn/ucf50-lrcn.py:31-38``: 80x80 frames, T=40, resnet50
backbone, 4-layer LSTM hidden 56, rnn_input 512, rnn_out=all), bf16 compute.
The /255 normalization is folded into the stem conv kernel
(``vct.models.backbones.port.fold_input_scale_into_stem``) so raw uint8
frames feed the conv stack directly — numerically identical, one less
full-tensor HBM pass.

Modes (env VCT_BENCH_MODE):
  * sampling (default) — the full on-device preprocessing claim: bucket-
    padded raw uint8 clips (L = 2T frames, ragged true lengths) staged in
    HBM -> device_sample_clips (VCT_BENCH_SAMPLING: sad | ssim | uniform |
    flow; frame scoring + top-T selection + /255) -> forward. Covers the
    north-star's "with on-device preprocessing" clause end to end — frame
    SELECTION included in the timed path, not just the normalize. This is
    the recorded headline (BENCH_r04+); rounds <=3 recorded the device mode.
  * device — raw uint8 clips already sampled to T staged in HBM before
    timing; measures normalize + forward only. This machine reaches its
    TPU through a network tunnel (~40 MB/s), so host->device copies here
    would measure the tunnel, not a v5e host link.
  * train — training throughput: the jitted donated train step (forward +
    loss + backward + adam; backbone frozen like every reference config) on
    the same model/shape. Reference record ~70 clips/s through training.
  * caption — S2VT captioning: CNN + encoder GRU + jitted on-device beam
    search (width 3) at the reference caption geometry (30x224x224,
    resnet50); captions/s. No reference rate exists (vs_baseline null).
  * aot — the same forward served through a .vctaot AOT artifact
    (vct.serve.aot): export, deserialize, then time the StableHLO
    executable's .call — shows artifact serving matches the live-jit rate.
  * hostfed — every batch is device_put from host RAM inside the timed
    window, double-buffered against compute. On a real v5e host the copy
    (24.6 MB uint8/batch, ~1.5 ms at PCIe gen4) hides entirely under the
    ~15 ms compute; through this tunnel the copy dominates and the number
    reflects tunnel bandwidth — reported for pipeline honesty, see
    docs/performance.md.

Knobs: VCT_BENCH_MODEL=mamba (the deployed prod config), VCT_BENCH_BATCH
(clip batch; default 32 — measured best throughput; caption mode defaults
16, where 32 measures ~4% more throughput at double the latency — see
docs/performance.md), VCT_BENCH_SAMPLING (sampling mode), VCT_BENCH_ITERS.

Baseline: the reference's best derived GPU inference throughput is
~156 clips/s (lstm best entry, ``dumps/medsos_checkpoint.json``; see
BASELINE.md). North star: >=500 clips/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Persistent compile cache: repeat bench runs skip the remote compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vct_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

BASELINE_CLIPS_PER_SEC = 156.0  # BASELINE.md: 3.596s / ~560 clips (GPU, lstm)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vct.core.config import Config
    from vct.models import build_model
    from vct.models.backbones.port import fold_input_scale_into_stem

    batch = int(os.environ.get("VCT_BENCH_BATCH", "32"))
    iters = int(os.environ.get("VCT_BENCH_ITERS", "20"))
    mode = os.environ.get("VCT_BENCH_MODEL", "lstm")
    feed = os.environ.get("VCT_BENCH_MODE", "sampling")

    if mode == "mamba":
        # The deployed production config (worker.py:24 filename: mamba,
        # seq60, resnet50, rnn_input 8, 3 layers, 80x80), Pallas scan.
        T, H, W = 60, 80, 80
        metric = "tikharm_prod_mamba_infer_clips_per_sec_per_chip"
        baseline = 66.0  # BASELINE.md mamba-derived clips/s
        overrides = {
            "model.cnn_backbone": "resnet50",
            "model.rnn_type": "mamba",
            "model.rnn_input_size": "8",
            "model.rnn_layer": "3",
            "model.scan_impl": "pallas",
            "model.compute_dtype": "bfloat16",
        }
    else:
        T, H, W = 40, 80, 80
        metric = "ucf50_lrcn_infer_clips_per_sec_per_chip"
        baseline = BASELINE_CLIPS_PER_SEC
        overrides = {
            "model.cnn_backbone": "resnet50",
            "model.rnn_type": "lstm",
            "model.rnn_input_size": "512",
            "model.rnn_layer": "4",
            "model.hidden_size": "56",
            "model.rnn_out": "all",
            "model.compute_dtype": "bfloat16",
        }
    overrides.update({
        "data.sequence_length": str(T),
        "data.img_height": str(H),
        "data.img_width": str(W),
    })
    cfg = Config().replace(**overrides)
    model = build_model(cfg.model, T)

    rng = np.random.RandomState(0)
    raw_u8 = rng.randint(0, 256, size=(batch, T, H, W, 3), dtype=np.uint8)

    if feed == "train":
        # Training throughput on the same config: jitted donated train step
        # (forward + loss + backward + adam) over synthetic labeled clips.
        # (Branches before the inference init below — a wasted remote
        # resnet50 compile through the tunnel otherwise.)
        # Reference training record: 365.96 s for 8 epochs x ~3200 train
        # clips (~70 clips/s) — the bayesian-best MAMBA entry, the only
        # training rate the reference persisted anywhere; both model modes
        # compare against it (BASELINE.md).
        from vct.train.engine import Trainer

        metric = metric.replace("_infer_", "_train_")
        baseline = 70.0  # 8 * 3200 / 365.96
        cfg = cfg.replace(**{"train.batch_size": str(batch),
                             "mesh.donate": "true"})
        names = [f"c{i}" for i in range(cfg.model.num_classes)]
        trainer = Trainer(cfg, names)
        x = raw_u8.astype(np.float32) / 255.0
        y = np.random.RandomState(1).randint(
            0, cfg.model.num_classes, batch
        ).astype(np.int64)
        state = trainer.init_state(jax.random.PRNGKey(0), x)
        if os.environ.get("VCT_BENCH_FEATURE_CACHE") == "1":
            # Steady-state (epoch >= 2) throughput with train.feature_cache:
            # the step consumes the cached backbone features, no conv stack.
            metric += "_feature_cache"
            trainer._feature_mode = True
            feats = jax.jit(
                lambda v, xx: trainer.model.apply(v, xx, features_only=True)
            )({"params": state.params, **state.extra_vars}, jnp.asarray(x))
            x = np.asarray(feats)
        step_fn = trainer._build_train_step()
        xb = jax.device_put(jnp.asarray(x))
        yb = jax.device_put(jnp.asarray(y))
        mask = jax.device_put(jnp.ones((batch,), jnp.float32))
        state, loss, _, _ = step_fn(state, xb, yb, mask)  # compile
        np.asarray(loss)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            loss = None
            for _ in range(iters):
                state, loss, _, _ = step_fn(state, xb, yb, mask)
            np.asarray(loss)
            windows.append(time.perf_counter() - t0)
        clips_per_sec = batch * iters / min(windows)
        print(json.dumps({
            "metric": metric,
            "value": round(clips_per_sec, 2),
            "unit": "clips/s",
            "vs_baseline": round(clips_per_sec / baseline, 3),
        }))
        return 0

    if feed == "sampling":
        # On-device frame selection ahead of the forward: the reference does
        # this per clip on host CPU (ssim_sampling/compute_sad,
        # loader_data.py:15-51); here scoring + top-T + normalize run fused
        # on device over the whole batch (vct/data/preprocess.py).
        from vct.data.preprocess import device_sample_clips

        method = os.environ.get("VCT_BENCH_SAMPLING", "sad")
        metric += f"_sampling_{method}"
        L = 2 * T  # bucket-padded raw length (deployment.py bucketing shape)
        raw_long = rng.randint(0, 256, size=(batch, L, H, W, 3), dtype=np.uint8)
        lengths = rng.randint(T + 1, L + 1, size=(batch,)).astype(np.int32)

        init_x = jnp.zeros((2, T, H, W, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)
        # No stem folding here: device_sample_clips already emits normalized
        # float frames, so the stem must see [0,1] inputs, not raw uint8.

        @jax.jit
        def sample_and_infer(variables, raw, lens):
            x = device_sample_clips(raw, T, method=method, lengths=lens)
            logits = model.apply(variables, x.astype(jnp.bfloat16))
            return jnp.argmax(logits, axis=-1)

        raw_dev = jax.device_put(raw_long)
        lens_dev = jax.device_put(lengths)
        np.asarray(sample_and_infer(variables, raw_dev, lens_dev))  # compile
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = sample_and_infer(variables, raw_dev, lens_dev)
            np.asarray(out)
            windows.append(time.perf_counter() - t0)
        clips_per_sec = batch * iters / min(windows)
        print(json.dumps({
            "metric": metric,
            "value": round(clips_per_sec, 2),
            "unit": "clips/s",
            "vs_baseline": round(clips_per_sec / baseline, 3),
        }))
        return 0

    if feed == "caption":
        # S2VT captioning throughput: full pipeline CNN -> encoder GRU ->
        # jitted on-device beam search (width 3, max_len 30) at the
        # reference's caption geometry (224x224, 30 frames, resnet50 —
        # s2vt/beam_search.py:91-118, 384-436). The reference persisted no
        # captioning rate anywhere (SURVEY.md §6) and its beam search runs
        # per-beam per-step host Python with an O(max_len^2) decoder quirk,
        # so vs_baseline is null — the number stands on its own.
        from vct.caption.beam import beam_search
        from vct.caption.models import S2VTModel

        cb = int(os.environ.get("VCT_BENCH_BATCH", "16"))
        T, H, W = 30, 224, 224
        vocab = 3000
        cmodel = S2VTModel(
            vocab_size=vocab,
            cnn_backbone="resnet50",
            cnn_output_size=512,
            hidden_size=512,
            max_len=30,
            dtype=jnp.bfloat16,
        )
        raw = rng.randint(0, 256, size=(cb, T, H, W, 3), dtype=np.uint8)
        init_x = jnp.zeros((2, T, H, W, 3), jnp.float32)
        variables = jax.jit(cmodel.init)(jax.random.PRNGKey(0), init_x)

        @jax.jit
        def caption(variables, raw):
            x = raw.astype(jnp.float32) / 255.0
            tokens, scores = beam_search(
                cmodel, variables, x, beam_width=3, max_len=30
            )
            return tokens

        raw_dev = jax.device_put(raw)
        np.asarray(caption(variables, raw_dev))  # compile
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = caption(variables, raw_dev)
            np.asarray(out)
            windows.append(time.perf_counter() - t0)
        caps_per_sec = cb * iters / min(windows)
        print(json.dumps({
            "metric": "s2vt_caption_beam3_captions_per_sec_per_chip",
            "value": round(caps_per_sec, 2),
            "unit": "captions/s",
            "vs_baseline": None,
        }))
        return 0

    if feed == "aot":
        # Throughput through a .vctaot artifact (vct.serve.aot): the
        # deserialized StableHLO executable with weights baked in — measures
        # that AOT serving costs nothing vs the live-jitted path. Input is
        # the artifact's deployed contract (f32 clips in [0,1], softmax
        # out); conv/matmul compute stays bf16 via the model's dtype.
        import tempfile

        from vct.serve.aot import AotServable, export_servable

        metric += "_aot"
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, T, H, W, 3), jnp.float32)
        )
        x_f32 = raw_u8.astype(np.float32) / 255.0
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "bench.vctaot")
            export_servable(
                model, variables,
                [f"c{i}" for i in range(cfg.model.num_classes)],
                (T, H, W, 3), path, batch_sizes=(batch,),
            )
            sv = AotServable.load(path)
        exp = sv._fns[batch]
        xb = jax.device_put(jnp.asarray(x_f32))
        np.asarray(exp.call(xb))  # compile
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = exp.call(xb)
            np.asarray(out)
            windows.append(time.perf_counter() - t0)
        clips_per_sec = batch * iters / min(windows)
        print(json.dumps({
            "metric": metric,
            "value": round(clips_per_sec, 2),
            "unit": "clips/s",
            "vs_baseline": round(clips_per_sec / baseline, 3),
        }))
        return 0

    init_x = jnp.zeros((2, T, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)
    # Fold /255 into the stem kernel once, outside the step.
    params = dict(variables["params"])
    params["cnn_backbone"] = fold_input_scale_into_stem(
        params["cnn_backbone"], cfg.model.cnn_backbone
    )
    variables = {**variables, "params": params}

    @jax.jit
    def infer(variables, raw):
        # uint8 frames feed the conv stack directly (scale folded into the
        # stem kernel; loader_data.py:182 /255 semantics preserved exactly).
        x = raw.astype(jnp.bfloat16)
        logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    if feed == "hostfed":
        metric += "_hostfed"
        # Warmup / compile.
        np.asarray(infer(variables, jax.device_put(raw_u8)))
        # Double-buffered host feed: device_put batch k+1 while batch k
        # computes (jax dispatch is async; the copy and the compute overlap).
        t0 = time.perf_counter()
        pending = jax.device_put(raw_u8)
        out = None
        for i in range(iters):
            out = infer(variables, pending)
            if i + 1 < iters:  # no dangling copy contending with the fetch
                pending = jax.device_put(raw_u8)
        np.asarray(out)
        elapsed = time.perf_counter() - t0
    else:
        raw_dev = jax.device_put(raw_u8)
        # Warmup / compile (fetch the value: through the axon tunnel
        # block_until_ready alone can return before remote execution ends).
        np.asarray(infer(variables, raw_dev))

        # Pipelined throughput: queue all iterations, force completion by
        # fetching the final result — executions serialize on one chip, so
        # the last result completing bounds the whole window. The tunnel
        # injects ±10% jitter between windows; take the best of 3 windows
        # (peak sustained throughput).
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = infer(variables, raw_dev)
            np.asarray(out)
            windows.append(time.perf_counter() - t0)
        elapsed = min(windows)
    clips_per_sec = batch * iters / elapsed

    print(json.dumps({
        "metric": metric,
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
