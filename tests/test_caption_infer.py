"""Caption inference CLI/API (vct/caption/infer.py): checkpoint dir and
.vctaot artifact both caption a directory of videos with the reference's
``Generated Caption:`` print (s2vt/beam_search.py:552-570)."""

import os

import numpy as np
import pytest

import jax

from vct.caption.train import CaptionTrainer
from vct.caption.vocab import Vocabulary
from vct.core.config import CaptionConfig

SIZE = 24


def _write_videos(dirpath, n, frames=4, size=SIZE):
    cv2 = pytest.importorskip("cv2")
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        w = cv2.VideoWriter(
            os.path.join(dirpath, f"vid{i}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (size, size),
        )
        for _ in range(frames):
            w.write(rng.randint(0, 256, (size, size, 3), np.uint8))
        w.release()


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    v = Vocabulary(1)
    v.build_vocabulary(["a man is cooking", "a dog runs fast"])
    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=16, hidden_size=16,
        num_frames=3, max_caption_len=6, beam_width=2,
    )
    trainer = CaptionTrainer(cfg, v)
    vids = np.random.RandomState(0).rand(1, 3, SIZE, SIZE, 3).astype(np.float32)
    caps = np.zeros((1, 6), np.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), vids, caps)
    path = str(tmp_path_factory.mktemp("capinfer") / "ck")
    trainer.save_checkpoint(path, state, epoch=0, loss=1.0)
    return path


def test_checkpoint_and_artifact_agree(ckpt_dir, tmp_path, capsys):
    from vct.caption.infer import caption_directory
    from vct.serve.aot import export_from_caption_checkpoint

    vids = tmp_path / "vids"
    _write_videos(str(vids), 2)
    # a junk file is skipped, not fatal (defensive-skip style)
    (vids / "broken.mp4").write_bytes(b"not a video")

    got = caption_directory(ckpt_dir, str(vids), height=SIZE, width=SIZE)
    out = capsys.readouterr().out
    assert len(got) == 2
    assert out.count("Generated Caption:") == 2
    assert "Error processing broken.mp4" in out

    art = str(tmp_path / "c.vctaot")
    export_from_caption_checkpoint(
        ckpt_dir, art, batch_sizes=(2,), height=SIZE, width=SIZE
    )
    got_art = caption_directory(art, str(vids))
    assert got_art == got  # artifact path == live checkpoint path


def test_cli_caption_videos_mode(ckpt_dir, tmp_path, capsys):
    from vct.caption.__main__ import main

    vids = tmp_path / "v2"
    _write_videos(str(vids), 2)
    rc = main([
        "--caption_videos", str(vids), "--model", ckpt_dir,
        "--height", str(SIZE), "--width", str(SIZE),
    ])
    assert rc == 0
    assert capsys.readouterr().out.count("Generated Caption:") == 2


def test_cli_caption_videos_requires_model(tmp_path):
    from vct.caption.__main__ import main

    assert main(["--caption_videos", str(tmp_path)]) == 2


def test_restore_caption_trainer_relative_path(ckpt_dir, monkeypatch):
    """Orbax requires absolute paths; a relative --model must still restore
    (CLI users run from the checkpoint's parent dir all the time)."""
    from vct.caption.train import restore_caption_trainer

    monkeypatch.chdir(os.path.dirname(ckpt_dir))
    trainer, state, cfg = restore_caption_trainer(
        os.path.basename(ckpt_dir), height=SIZE, width=SIZE
    )
    assert cfg.num_frames == 3


def test_caption_directory_missing_model_path(tmp_path):
    from vct.caption.infer import caption_directory

    vids = tmp_path / "vids"
    _write_videos(str(vids), 1)
    with pytest.raises(FileNotFoundError, match="no such file"):
        caption_directory(str(tmp_path / "nope"), str(vids))


def test_cli_caption_videos_rejects_training_flags(tmp_path, capsys):
    """Training-mode flags (--eval, --video_dir, ...) are unknown in caption
    mode and must be rejected, not silently swallowed."""
    from vct.caption.__main__ import main

    rc = main(["--caption_videos", str(tmp_path), "--model", "x", "--eval"])
    assert rc == 2
    assert "Unknown arguments" in capsys.readouterr().out


def test_artifact_rejects_mismatched_baked_flags(ckpt_dir, tmp_path):
    """Artifacts bake beam width + geometry into the executable: an explicit
    flag that differs must error (re-export), never silently ignore."""
    from vct.caption.infer import caption_directory
    from vct.serve.aot import export_from_caption_checkpoint

    vids = tmp_path / "vids"
    _write_videos(str(vids), 1)
    art = str(tmp_path / "c.vctaot")
    export_from_caption_checkpoint(
        ckpt_dir, art, batch_sizes=(1,), height=SIZE, width=SIZE
    )
    with pytest.raises(ValueError, match="beam_width"):
        caption_directory(art, str(vids), beam_width=5)
    with pytest.raises(ValueError, match="re-export"):
        caption_directory(art, str(vids), height=SIZE * 2)
    # matching explicit values are fine
    got = caption_directory(art, str(vids), beam_width=2,
                            height=SIZE, width=SIZE)
    assert len(got) == 1


def test_raw_artifact_caption_directory_agrees(ckpt_dir, tmp_path):
    """A raw-contract caption artifact (baked interval selection) captions a
    directory identically to the plain artifact whose selection ran on the
    host — including a video shorter than T (last-frame padding parity) and
    a video LONGER than the artifact's raw capacity (host interval-extraction
    fallback, not silent truncation to the first raw_len frames)."""
    cv2 = pytest.importorskip("cv2")
    from vct.caption.infer import caption_directory
    from vct.serve.aot import export_from_caption_checkpoint

    vids = tmp_path / "vids"
    os.makedirs(str(vids))
    rng = np.random.RandomState(7)
    # c.mp4 (2 frames < T): last-frame padding parity; d.mp4 (20 frames >
    # raw_len=8): the over-capacity host-extraction fallback
    for name, n_frames in (("c.mp4", 2), ("d.mp4", 20)):
        w = cv2.VideoWriter(
            str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
            (SIZE, SIZE),
        )
        for _ in range(n_frames):
            w.write(rng.randint(0, 256, (SIZE, SIZE, 3), np.uint8))
        w.release()

    plain = str(tmp_path / "plain.vctaot")
    raw = str(tmp_path / "raw.vctaot")
    export_from_caption_checkpoint(
        ckpt_dir, plain, batch_sizes=(2,), height=SIZE, width=SIZE
    )
    export_from_caption_checkpoint(
        ckpt_dir, raw, batch_sizes=(2,), height=SIZE, width=SIZE,
        device_sampling=True, raw_len=8,
    )
    want = caption_directory(plain, str(vids))
    got = caption_directory(raw, str(vids))
    assert got == want and len(got) == 2


def test_caption_directory_all_files_skipped_raises(ckpt_dir, tmp_path):
    """A directory where EVERY video individually fails decode must raise —
    not print N errors and return [] with exit 0."""
    from vct.caption.infer import caption_directory

    vids = tmp_path / "vids"
    os.makedirs(str(vids))
    (vids / "x.mp4").write_bytes(b"junk")
    (vids / "y.mp4").write_bytes(b"also junk")
    with pytest.raises(RuntimeError, match="all 2 videos"):
        caption_directory(ckpt_dir, str(vids), height=SIZE, width=SIZE)


def test_systemic_decode_errors_propagate(ckpt_dir, tmp_path, monkeypatch):
    """Per-file decode failures skip; a systemic failure (cv2 missing) must
    propagate — not print N errors and exit 0 having captioned nothing."""
    import vct.caption.data as capdata
    from vct.caption.infer import caption_directory

    vids = tmp_path / "vids"
    _write_videos(str(vids), 1)

    def broken(*a, **k):
        raise ImportError("No module named cv2")

    monkeypatch.setattr(capdata, "extract_frames_interval", broken)
    with pytest.raises(ImportError):
        caption_directory(ckpt_dir, str(vids), height=SIZE, width=SIZE)
