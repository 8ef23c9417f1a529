"""Out-of-core captioning: the lazy per-batch decode loader, RSS-bounded
training, streaming BLEU eval, and engine-grade crash resume (VERDICT r2
directives #2/#3).

Reference parity target: the caption ``VideoDataset`` decodes lazily in
``__getitem__`` (``/root/reference/s2vt/beam_search.py:91-118``) so caption
training scales past RAM; vct reaches the same property through
``LazyCaptionLoader`` + ``CaptionTrainer.fit``'s loader protocol.
"""

import os

import numpy as np
import pytest

import jax

from vct.caption.data import (
    CaptionArrayLoader,
    LazyCaptionLoader,
    as_caption_loader,
    encode_caption,
)
from vct.caption.vocab import Vocabulary
from vct.core.config import CaptionConfig

SENTENCES = ["a man is cooking", "a dog runs fast", "a man runs",
             "a dog is cooking"]


def _vocab():
    v = Vocabulary(freq_threshold=1)
    v.build_vocabulary(SENTENCES)
    return v


def _write_videos(dirpath, n, frames, size, ext=".mp4"):
    cv2 = pytest.importorskip("cv2")
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(0)
    ann_lines = []
    for i in range(n):
        name = f"vid{i}"
        w = cv2.VideoWriter(
            os.path.join(dirpath, name + ext),
            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (size, size),
        )
        for _ in range(frames):
            w.write(rng.randint(0, 256, (size, size, 3), np.uint8))
        w.release()
        ann_lines.append(f"{name} {SENTENCES[i % len(SENTENCES)]}")
    ann = os.path.join(dirpath, "ann.txt")
    with open(ann, "w") as f:
        f.write("\n".join(ann_lines) + "\n")
    return ann


def _vm_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    raise RuntimeError("no VmRSS")


def test_lazy_loader_streams_uint8(tmp_path):
    v = _vocab()
    d = str(tmp_path / "vids")
    ann = _write_videos(d, 5, frames=6, size=32)
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=3,
                               max_caption_len=6, size=32, video_ext=".mp4")
    assert loader.num_examples == 5
    assert len(loader.references) == 5
    batches = list(loader.epoch())
    assert len(batches) == 3
    xb, yb, mask = batches[0]
    assert xb.dtype == np.uint8 and xb.shape == (2, 3, 32, 32, 3)
    assert yb.shape == (2, 6) and yb[0, 0] == v["<start>"]
    # tail batch mask-pads to the fixed jit shape
    xt, yt, mt = batches[-1]
    assert xt.shape == (2, 3, 32, 32, 3)
    np.testing.assert_array_equal(mt, [1.0, 0.0])
    # exactly one permutation consumed per shuffled epoch (resume contract)
    rng = np.random.RandomState(7)
    list(loader.epoch(rng))
    rng2 = np.random.RandomState(7)
    rng2.permutation(5)
    assert rng.randint(1 << 30) == rng2.randint(1 << 30)


def test_lazy_loader_skips_missing_files(tmp_path, capsys):
    v = _vocab()
    d = str(tmp_path / "vids")
    ann = _write_videos(d, 2, frames=4, size=32)
    with open(ann, "a") as f:
        f.write("ghost a man runs\n")
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=2,
                               size=32, video_ext=".mp4")
    assert loader.num_examples == 2
    assert "Error processing ghost" in capsys.readouterr().out


def test_lazy_loader_skips_corrupt_clip_mid_epoch(tmp_path, capsys):
    """A file that EXISTS but cannot decode (corrupt download) must not
    crash training mid-epoch: its row masks to 0 for this epoch, the item
    drops from the dataset at the next epoch, and the BLEU references stay
    aligned with what actually decoded."""
    v = _vocab()
    d = str(tmp_path / "vids")
    ann = _write_videos(d, 4, frames=4, size=32)
    # Overwrite vid1 with garbage bytes: exists, passes __init__, fails decode.
    with open(os.path.join(d, "vid1.mp4"), "wb") as f:
        f.write(b"not a video at all")
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=2,
                               max_caption_len=6, size=32, video_ext=".mp4")
    assert loader.num_examples == 4

    batches = list(loader.epoch())  # sequential order: [0,1], [2,3]
    assert len(batches) == 2
    _, _, mask0 = batches[0]
    np.testing.assert_array_equal(mask0, [1.0, 0.0])  # vid1 masked out
    _, _, mask1 = batches[1]
    np.testing.assert_array_equal(mask1, [1.0, 1.0])
    assert "Error processing vid1.mp4" in capsys.readouterr().out
    # references reflect the failure for alignment with decoded rows
    assert len(loader.references) == 3

    # next epoch: the item is gone for good, full masks again
    batches = list(loader.epoch())
    assert loader.num_examples == 3
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0][2], [1.0, 1.0])
    np.testing.assert_array_equal(batches[1][2], [1.0, 0.0])  # tail pad
    assert len(loader.references) == 3


def test_lazy_loader_peek_skips_corrupt_and_empty_raises(tmp_path):
    v = _vocab()
    d = str(tmp_path / "vids")
    ann = _write_videos(d, 2, frames=4, size=32)
    with open(os.path.join(d, "vid0.mp4"), "wb") as f:
        f.write(b"garbage")
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=2,
                               size=32, video_ext=".mp4")
    clip, cap = loader.peek()  # falls through to vid1
    assert clip.shape == (1, 2, 32, 32, 3)

    empty = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=2,
                              size=32, video_ext=".avi")  # no .avi files
    with pytest.raises(ValueError, match="no decodable clips"):
        empty.peek()


def test_as_caption_loader_coerces():
    v = _vocab()
    videos = np.random.RandomState(0).rand(3, 2, 16, 16, 3).astype(np.float32)
    caps = np.stack([encode_caption(s, v, 5) for s in SENTENCES[:3]])
    loader = as_caption_loader(videos, caps, batch_size=2)
    assert isinstance(loader, CaptionArrayLoader)
    assert as_caption_loader(loader) is loader
    with pytest.raises(TypeError):
        as_caption_loader(videos)


@pytest.mark.slow
def test_caption_training_out_of_core_rss(tmp_path):
    """Training over a lazy loader keeps RSS growth far below the decoded
    float32 dataset (the round-2 regression: load_caption_dataset
    materialized every clip up front; 36 GB at MSVD scale).

    A trivial registered backbone keeps per-frame compute negligible so the
    dataset can be big enough (151 MB decoded) that data residency dwarfs
    allocator noise; the first fit call warms every XLA arena, the second is
    the measurement."""
    import flax.linen as nn

    from vct.models.backbones import BACKBONES

    class _TinyBackbone(nn.Module):
        dtype: object = np.float32
        feature_dim: int = 8

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(8, 8), name="conv")(x)
            return x.mean(axis=(1, 2))

    BACKBONES.register(
        "tiny_test_rss",
        lambda dtype=np.float32, name=None: _TinyBackbone(dtype=dtype, name=name),
    )
    v = _vocab()
    n, t, size = 96, 8, 128
    d = str(tmp_path / "vids")
    ann = _write_videos(d, n, frames=t, size=size)
    f32_mb = n * t * size * size * 3 * 4 / 1e6  # ~151 MB decoded dataset
    cfg = CaptionConfig(
        cnn_backbone="tiny_test_rss", cnn_output_size=8, hidden_size=8,
        num_frames=t, max_caption_len=6, epochs=1, dropout=0.0,
        checkpoint_dir="",
    )
    from vct.caption.train import CaptionTrainer

    trainer = CaptionTrainer(cfg, v)
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=t,
                               max_caption_len=6, size=size, video_ext=".mp4")
    sample_x, sample_y = loader.peek()
    state = trainer.init_state(
        jax.random.PRNGKey(0), sample_x.astype(np.float32) / 255.0, sample_y
    )
    # Warm epoch: compiles the fixed-shape step and touches every arena.
    state, _ = trainer.fit(state, loader, batch_size=2, log=False)

    before = _vm_rss_mb()
    state, losses = trainer.fit(state, loader, batch_size=2, log=False)
    growth = _vm_rss_mb() - before
    assert len(losses) == 1 and np.isfinite(losses[-1])
    assert growth < f32_mb / 3, (
        f"RSS grew {growth:.0f} MB on a {f32_mb:.0f} MB (decoded) dataset"
    )


@pytest.mark.slow
def test_caption_resume_matches_uninterrupted(tmp_path):
    """Crash-resumed caption training reproduces the uninterrupted run's
    losses exactly: same permutations (shuffle fast-forward), same dropout
    stream (rng checkpointed), same optimizer moments."""
    v = _vocab()
    rng = np.random.RandomState(0)
    videos = rng.rand(6, 3, 32, 32, 3).astype(np.float32)
    caps = np.stack([
        encode_caption(SENTENCES[i % len(SENTENCES)], v, 6) for i in range(6)
    ])
    base = dict(cnn_backbone="resnet18", cnn_output_size=8, hidden_size=8,
                num_frames=3, max_caption_len=6, learning_rate=3e-3,
                checkpoint_dir="")
    from vct.caption.train import CaptionTrainer

    # uninterrupted 3-epoch reference run
    tr_ref = CaptionTrainer(CaptionConfig(epochs=3, **base), v)
    s = tr_ref.init_state(jax.random.PRNGKey(0), videos, caps)
    _, losses_ref = tr_ref.fit(s, videos, caps, batch_size=2, log=False)

    ck = str(tmp_path / "ck")
    # epoch 1, then "crash"
    tr1 = CaptionTrainer(CaptionConfig(epochs=1, **base), v)
    s1 = tr1.init_state(jax.random.PRNGKey(0), videos, caps)
    tr1.fit(s1, videos, caps, batch_size=2, checkpoint_dir=ck, log=False)

    # fresh process: resume to 3 epochs
    tr2 = CaptionTrainer(CaptionConfig(epochs=3, **base), v)
    s2 = tr2.init_state(jax.random.PRNGKey(0), videos, caps)
    _, losses_res = tr2.fit(s2, videos, caps, batch_size=2,
                            checkpoint_dir=ck, log=False)
    assert len(losses_res) == 3
    np.testing.assert_allclose(losses_res, losses_ref, rtol=1e-5)


def test_legacy_caption_checkpoint_restores(tmp_path, capsys):
    """Checkpoints saved before rng/step joined the state tree still
    restore (params/opt only, fresh rng) — an automatic resume must not
    become a hard crash on upgrade."""
    import jax as _jax

    from vct.caption.train import CaptionTrainer
    from vct.train.checkpoint import _atomic_json_write, _atomic_tree_save

    v = _vocab()
    videos = np.random.RandomState(0).rand(2, 2, 24, 24, 3).astype(np.float32)
    caps = np.stack([encode_caption(s, v, 6) for s in SENTENCES[:2]])
    cfg = CaptionConfig(cnn_backbone="resnet18", cnn_output_size=8,
                        hidden_size=8, num_frames=2, max_caption_len=6,
                        epochs=1, checkpoint_dir="")
    trainer = CaptionTrainer(cfg, v)
    state = trainer.init_state(_jax.random.PRNGKey(0), videos, caps)

    ck = str(tmp_path / "ck")
    os.makedirs(ck, exist_ok=True)
    _atomic_tree_save(os.path.join(ck, "state"), {
        "params": _jax.device_get(state.params),
        "extra_vars": _jax.device_get(state.extra_vars),
        "opt_state": _jax.device_get(state.opt_state),
    })  # the legacy 3-key layout
    _atomic_json_write(os.path.join(ck, "manifest.json"),
                       {"epoch": 1, "loss": 0.5, "vocab": v.to_dict()})

    restored, epoch, _ = trainer.load_checkpoint(ck, state)
    assert epoch == 1
    assert "legacy caption checkpoint" in capsys.readouterr().out
    np.testing.assert_array_equal(
        _jax.device_get(restored.step), _jax.device_get(state.step)
    )


@pytest.mark.slow
def test_streaming_bleu_eval(tmp_path, capsys):
    """BLEU eval consumes the lazy loader directly (references ride along),
    decoding per fixed-shape batch — captioning is out-of-core end to end."""
    v = _vocab()
    d = str(tmp_path / "vids")
    ann = _write_videos(d, 3, frames=4, size=32)
    cfg = CaptionConfig(cnn_backbone="resnet18", cnn_output_size=8,
                        hidden_size=8, num_frames=2, max_caption_len=6,
                        epochs=1, beam_width=2)
    from vct.caption.train import CaptionTrainer

    trainer = CaptionTrainer(cfg, v)
    loader = LazyCaptionLoader(d, ann, v, batch_size=2, num_frames=2,
                               max_caption_len=6, size=32, video_ext=".mp4")
    sample_x, sample_y = loader.peek()
    state = trainer.init_state(
        jax.random.PRNGKey(0), sample_x.astype(np.float32) / 255.0, sample_y
    )
    score = trainer.evaluate_bleu(state, loader)  # references from loader
    out = capsys.readouterr().out
    assert "Average BLEU score:" in out
    assert 0.0 <= score <= 1.0
    hyps = trainer.caption_videos(state, loader, beam_width=1)
    assert len(hyps) == 3  # padded rows dropped
