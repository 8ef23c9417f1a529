"""Headline benchmark: UCF50-style LRCN inference throughput per chip.

Measures preprocessing + forward on the flagship UCF50 config of the
reference (``lrcn/ucf50-lrcn.py:31-38``: 80x80 frames, T=40, resnet50
backbone, 4-layer LSTM hidden 56, rnn_input 512, rnn_out=all), bf16 compute.

The timed region is on-device preprocessing (uint8 -> f32 normalize, the
tail of the decode pipeline) + the full jitted model forward. Raw uint8 clips
are staged in device HBM before timing — this machine reaches its TPU through
a network tunnel, so host->device copies here measure the tunnel, not a v5e
host link; a real v5e host feeds HBM faster than the chip consumes at this
FLOP intensity.

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

BASELINE_CLIPS_PER_SEC = 156.0  # BASELINE.md: 3.596s / ~560 clips (GPU, lstm)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vct.core.config import Config
    from vct.models import build_model

    batch = int(os.environ.get("VCT_BENCH_BATCH", "32"))
    iters = int(os.environ.get("VCT_BENCH_ITERS", "20"))
    mode = os.environ.get("VCT_BENCH_MODEL", "lstm")

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

    init_x = jnp.zeros((2, T, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)

    @jax.jit
    def infer(variables, raw):
        # On-device preprocessing tail: uint8 -> f32, /255 normalize
        # (loader_data.py:182 semantics), then the model forward.
        x = raw.astype(jnp.float32) / 255.0
        logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    raw_dev = jax.device_put(raw_u8)
    # Warmup / compile (fetch the value: through the axon tunnel
    # block_until_ready alone can return before remote execution finishes).
    np.asarray(infer(variables, raw_dev))

    # Pipelined throughput: queue all iterations, force completion by
    # fetching the final result — executions are serialized on one chip, so
    # the last result completing bounds the whole window.
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = infer(variables, raw_dev)
    np.asarray(out)
    elapsed = time.perf_counter() - t0
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
