"""AOT servable artifacts (vct/serve/aot.py): export -> load -> classify.

The TPU-native analogue of the reference's whole-model serving file
(``torch.load`` in ``medsos_lrcn/src/deployment.py:63``): weights baked as
StableHLO constants, one executable per batch bucket, label manifest inside.
"""

import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.core.config import Config
from vct.models import build_model
from vct.serve.aot import AotServable, export_servable

SHAPE = (3, 24, 24, 3)  # (T, H, W, C)


@pytest.fixture(scope="module")
def tiny():
    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "gru",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "model.num_classes": "4",
        "data.sequence_length": str(SHAPE[0]),
        "data.img_height": str(SHAPE[1]),
        "data.img_width": str(SHAPE[2]),
    })
    model = build_model(cfg.model, cfg.data.sequence_length)
    x0 = jnp.zeros((1,) + SHAPE, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    return cfg, model, variables


def test_export_load_roundtrip_matches_direct_forward(tiny, tmp_path):
    """N=5 with buckets (2, 4) also exercises the padded tail: a full chunk
    of 4 streams through the big executable, the leftover 1 pads up to 2."""
    cfg, model, variables = tiny
    path = str(tmp_path / "m.vctaot")
    export_servable(model, variables, ["a", "b", "c", "d"], SHAPE, path,
                    batch_sizes=(2, 4))
    sv = AotServable.load(path)
    assert sv.class_names == ["a", "b", "c", "d"]
    assert sv.input_shape == SHAPE

    # warmup() (the queue worker runs it before binding its PULL port so the
    # first-execution cost — 50-520 s through a tunneled chip, see
    # docs/performance.md "Serving rehearsal" — is paid at startup, not in
    # the first user request) must execute every bucket and leave results
    # unchanged:
    sv.warmup()
    clips = np.random.RandomState(0).rand(5, *SHAPE).astype(np.float32)
    got = sv.classify(clips)
    assert got.shape == (5, 4)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, jnp.asarray(clips)), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-5)
    # empty input short-circuits
    assert sv.classify(np.zeros((0,) + SHAPE, np.float32)).shape == (0, 4)


@pytest.mark.slow  # bucket selection also covered (inverted order) above
def test_classify_pads_to_buckets(tiny, tmp_path):
    """N=5 with buckets (2, 4): a full chunk of 4 streams through the big
    executable, the tail of 1 pads up to the SMALLEST fitting bucket."""
    cfg, model, variables = tiny
    path = str(tmp_path / "m.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(4, 2))
    sv = AotServable.load(path)
    clips = np.random.RandomState(1).rand(5, *SHAPE).astype(np.float32)
    got = sv.classify(clips)
    assert got.shape == (5, 4)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, jnp.asarray(clips)), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # empty input short-circuits
    assert sv.classify(np.zeros((0,) + SHAPE, np.float32)).shape == (0, 4)


def test_wrong_clip_geometry_raises(tiny, tmp_path):
    cfg, model, variables = tiny
    path = str(tmp_path / "m.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(1,))
    sv = AotServable.load(path)
    with pytest.raises(ValueError, match="expected"):
        sv.classify(np.zeros((1, 5, 24, 24, 3), np.float32))


def test_wrong_platform_artifact_raises(tiny, tmp_path, monkeypatch):
    """A tpu-exported artifact loaded on a cpu backend (or vice versa) fails
    at load with a clear message, not deep inside XLA at call time."""
    cfg, model, variables = tiny
    path = str(tmp_path / "m.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(1,))
    import zipfile as zf_mod

    with zf_mod.ZipFile(path) as zf:
        manifest = json.loads(zf.read("manifest.json"))
        blob = zf.read("batch_1.stablehlo")
    manifest["platform"] = "tpu" if jax.default_backend() != "tpu" else "cpu"
    with zf_mod.ZipFile(path, "w") as zf:
        zf.writestr("manifest.json", json.dumps(manifest))
        zf.writestr("batch_1.stablehlo", blob)
    with pytest.raises(ValueError, match="exported for platform"):
        AotServable.load(path)


def test_not_an_artifact_raises(tmp_path):
    path = str(tmp_path / "bogus.vctaot")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("manifest.json", json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="vct-aot"):
        AotServable.load(path)


@pytest.mark.slow  # the manifest contract is fast-covered by
# test_worker_serves_from_artifact (sampling_method="sad" drives the worker)
def test_manifest_records_sampling_method(tiny, tmp_path):
    """The artifact records the training-time frame sampling so serving
    preprocesses identically to the checkpoint path (a ssim-trained model
    sampled uniformly silently changes predictions)."""
    cfg, model, variables = tiny
    path = str(tmp_path / "m.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(1,), sampling_method="ssim")
    sv = AotServable.load(path)
    assert sv.sampling_method == "ssim"
    # absent in older artifacts -> None, not a KeyError
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(1,))
    assert AotServable.load(path).sampling_method is None


@pytest.mark.slow  # dp-artifact machinery stays fast-covered by the cheaper
# test_caption_data_parallel_export_serves_on_mesh (same exporter core)
def test_data_parallel_export_serves_on_mesh(tiny, tmp_path):
    """data_parallel=4: ONE artifact whose executables shard the batch over
    4 devices (suite runs on the virtual 8-device CPU mesh); classify output
    matches the single-device forward, including a padded tail chunk."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    cfg, model, variables = tiny
    path = str(tmp_path / "dp.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(4, 8), data_parallel=4)
    sv = AotServable.load(path)
    assert sv.n_devices == 4
    clips = np.random.RandomState(3).rand(10, *SHAPE).astype(np.float32)
    got = sv.classify(clips)  # 8-chunk + tail of 2 padded to bucket 4
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, jnp.asarray(clips)), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # data_parallel composes with baked-in sampling: raw uint8 + lengths
    # both shard batch-wise over the mesh inside the executable.
    from vct.data.preprocess import device_sample_clips

    spath = str(tmp_path / "dps.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, spath,
                    batch_sizes=(4,), data_parallel=4,
                    device_sampling="uniform", raw_len=6)
    svs = AotServable.load(spath)
    raw = np.random.RandomState(5).randint(
        0, 256, (4, 6) + SHAPE[1:], np.uint8
    )
    lengths = np.asarray([6, 5, 4, 6], np.int32)
    got = svs.classify_raw(raw, lengths)
    x = device_sample_clips(jnp.asarray(raw), SHAPE[0], method="uniform",
                            lengths=jnp.asarray(lengths))
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_data_parallel_bucket_validation(tiny, tmp_path):
    cfg, model, variables = tiny
    path = str(tmp_path / "bad.vctaot")
    with pytest.raises(ValueError, match="multiple of data_parallel"):
        export_servable(model, variables, list("abcd"), SHAPE, path,
                        batch_sizes=(3,), data_parallel=2)
    with pytest.raises(ValueError, match=">= 1"):
        export_servable(model, variables, list("abcd"), SHAPE, path,
                        batch_sizes=(2,), data_parallel=0)


def test_device_sampling_baked_into_artifact(tiny, tmp_path):
    """--device_sampling bakes scoring + top-T selection + /255 + forward
    into ONE executable: classify_raw on ragged raw uint8 clips matches the
    live device_sample_clips -> forward path exactly."""
    from vct.data.preprocess import device_sample_clips

    cfg, model, variables = tiny
    path = str(tmp_path / "s.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, path,
                    batch_sizes=(2,), device_sampling="sad", raw_len=7)
    sv = AotServable.load(path)
    assert sv.device_sampling == "sad" and sv.raw_len == 7
    sv.warmup()  # raw-input-contract warmup: uint8 zeros + in-range lengths

    rng = np.random.RandomState(4)
    raw = rng.randint(0, 256, size=(3, 7) + SHAPE[1:], dtype=np.uint8)
    lengths = np.asarray([7, 5, 4], np.int32)
    for i, ln in enumerate(lengths):
        raw[i, ln:] = raw[i, ln - 1]  # tail padding, masked from selection
    got = sv.classify_raw(raw, lengths)  # full chunk of 2 + padded tail

    x = device_sample_clips(jnp.asarray(raw), SHAPE[0], method="sad",
                            lengths=jnp.asarray(lengths))
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # contract guards: wrong entry point, wrong geometry, bad length VALUES
    # (the executable's gather clamps out-of-range indices, so an unguarded
    # lengths > raw_len would silently classify padding frames)
    with pytest.raises(ValueError, match="classify_raw"):
        sv.classify(np.zeros((1,) + SHAPE, np.float32))
    with pytest.raises(ValueError, match="uint8"):
        sv.classify_raw(raw.astype(np.float32), lengths)
    with pytest.raises(ValueError, match="raw_len"):
        sv.classify_raw(raw, np.asarray([7, 5, 20], np.int32))
    with pytest.raises(ValueError, match="raw_len"):
        sv.classify_raw(raw, np.asarray([7, 0, 4], np.int32))
    # raw_len is a device_sampling knob; raw_len=0 must error, not silently
    # fall back to the 2T default
    with pytest.raises(ValueError, match="raw_len"):
        export_servable(model, variables, list("abcd"), SHAPE,
                        str(tmp_path / "x.vctaot"), batch_sizes=(1,),
                        device_sampling="sad", raw_len=0)
    with pytest.raises(ValueError, match="raw_len"):
        export_servable(model, variables, list("abcd"), SHAPE,
                        str(tmp_path / "x.vctaot"), batch_sizes=(1,),
                        raw_len=7)
    plain = str(tmp_path / "p.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, plain,
                    batch_sizes=(1,))
    with pytest.raises(ValueError, match="no baked-in sampling"):
        AotServable.load(plain).classify_raw(raw, lengths)

    # pre-sampled-clip consumers reject raw-contract artifacts up front
    from vct.core.config import ServeConfig
    from vct.serve.worker import Worker

    with pytest.raises(ValueError, match="classify_raw"):
        Worker(ServeConfig(model_path=path))
    from vct.serve import deployment

    with pytest.raises(SystemExit):
        deployment.main(["--model", path, "--frames", str(tmp_path)])


def test_worker_serves_from_artifact(tiny, tmp_path, monkeypatch):
    """MODEL_PATH pointing at a .vctaot file: the queue worker loads the
    artifact (no model zoo / checkpoint restore), overrides SEQUENCE_LENGTH
    to the artifact's compiled T, classifies via the servable, and deletes
    videos whose result the backend confirmed."""
    cfg, model, variables = tiny
    art = str(tmp_path / "m.vctaot")
    export_servable(model, variables, list("abcd"), SHAPE, art,
                    batch_sizes=(2,), sampling_method="sad")

    from vct.core.config import ServeConfig
    from vct.serve import worker as worker_mod

    vids = tmp_path / "vids"
    vids.mkdir()
    names = ["@u_video_1.mp4", "@u_video_2.mp4"]
    clips = np.random.RandomState(2).rand(2, *SHAPE).astype(np.float32)

    import vct.data.ingest as ingest

    seen_geometry = {}

    def fake_load(video_dir, sampling_method, sequence_length, img_height,
                  img_width, skip=None, **kw):
        seen_geometry.update(T=sequence_length, h=img_height, w=img_width)
        return clips, list(names)

    monkeypatch.setattr(ingest, "load_dataset_inference", fake_load)
    posted_results = []
    monkeypatch.setattr(
        worker_mod, "post_results",
        lambda results, url: (
            posted_results.extend(results),
            {r["video_name"]: True for r in results},
        )[1],
    )
    monkeypatch.setattr(
        worker_mod.Worker, "_already_classified", lambda self: []
    )

    scfg = ServeConfig(model_path=art, video_dir=str(vids),
                       sequence_length=999)  # wrong on purpose
    downloaded = []
    w = worker_mod.Worker(scfg, downloader=lambda url, d: (
        downloaded.append(url),
        [(vids / n).write_bytes(b"x") for n in names],
    ))
    assert w.servable is not None
    assert w.class_names == list("abcd")
    assert w.cfg.sequence_length == SHAPE[0]  # artifact T wins over env
    # No SAMPLING_METHOD env set -> preprocess the way the model trained
    assert w.cfg.sampling_method == "sad"

    w.callback("https://www.tiktok.com/@u/video/1")
    assert downloaded == ["https://www.tiktok.com/@u/video/1"]
    assert seen_geometry == {"T": SHAPE[0], "h": SHAPE[1], "w": SHAPE[2]}
    assert len(posted_results) == 2
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, jnp.asarray(clips)), axis=-1)
    )
    got0 = posted_results[0]
    order = np.argsort(-want[0])
    assert got0["labels"] == [list("abcd")[i] for i in order]
    np.testing.assert_allclose(got0["scores"], want[0][order], atol=1e-5)
    # confirmed results -> videos deleted
    assert sorted(p.name for p in vids.iterdir()) == []


@pytest.mark.slow
def test_cli_export_from_checkpoint_and_deployment_serve(tiny, tmp_path):
    """End to end: save a checkpoint -> `python -m vct.serve.aot` export ->
    deployment.main serves from the artifact file (no model zoo in path)."""
    cv2 = pytest.importorskip("cv2")
    cfg, model, variables = tiny
    from vct.serve import aot, deployment
    from vct.train.checkpoint import save_checkpoint

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(
        ckpt,
        {"params": jax.device_get(variables["params"]),
         **{k: jax.device_get(v) for k, v in variables.items()
            if k != "params"}},
        cfg, ["a", "b", "c", "d"],
    )
    art = str(tmp_path / "m.vctaot")
    assert aot.main(["--model", ckpt, "--out", art, "--batches", "1,2"]) == 0

    vids = tmp_path / "vids"
    vids.mkdir()
    rng = np.random.RandomState(0)
    for name in ("@user_video_1.mp4", "@user_video_2.mp4"):
        w = cv2.VideoWriter(str(vids / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (24, 24))
        for _ in range(6):
            w.write(rng.randint(0, 256, (24, 24, 3), np.uint8))
        w.release()
    rc = deployment.main(["--model", art, "--videos", str(vids)])
    assert rc == 0


# ---------------------------------------------------------------------------
# Captioning artifacts: the whole beam-search pipeline in one executable


@pytest.fixture(scope="module")
def tiny_captioner():
    from vct.caption.train import CaptionTrainer
    from vct.caption.vocab import Vocabulary
    from vct.core.config import CaptionConfig

    v = Vocabulary(1)
    v.build_vocabulary(["a man is cooking", "a dog runs fast"])
    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=16, hidden_size=16,
        num_frames=3, max_caption_len=6, beam_width=2,
    )
    trainer = CaptionTrainer(cfg, v)
    videos = np.random.RandomState(0).rand(2, 3, 24, 24, 3).astype(np.float32)
    caps = np.zeros((2, 6), np.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), videos, caps)
    return trainer, state, v


def test_caption_artifact_matches_live_beam_search(tiny_captioner, tmp_path):
    """export_caption_servable bakes encoder + beam search + vocab into one
    file; CaptionAotServable.caption reproduces the live decode exactly."""
    from vct.caption.beam import beam_search, decode_tokens
    from vct.serve.aot import CaptionAotServable, export_caption_servable

    trainer, state, v = tiny_captioner
    variables = {"params": state.params, **state.extra_vars}
    shape = (3, 24, 24, 3)
    path = str(tmp_path / "c.vctaot")
    export_caption_servable(
        trainer.model, variables, v, shape, path,
        batch_sizes=(2,), beam_width=2, max_len=6,
    )
    sv = CaptionAotServable.load(path)
    assert sv.beam_width == 2 and sv.max_len == 6
    assert len(sv.vocab) == len(v)

    clips = np.random.RandomState(1).rand(3, *shape).astype(np.float32)
    tokens, scores = sv.decode(clips)  # full bucket of 2 + padded tail of 1
    want_t, want_s = beam_search(
        trainer.model, variables, jnp.asarray(clips), beam_width=2, max_len=6
    )
    np.testing.assert_array_equal(tokens, np.asarray(want_t))
    np.testing.assert_allclose(scores, np.asarray(want_s), atol=1e-5)
    assert sv.caption(clips) == [
        decode_tokens(row, v) for row in np.asarray(want_t)
    ]
    sv.warmup()  # caption-contract warmup path (zeros through beam search)
    np.testing.assert_array_equal(sv.decode(clips)[0], np.asarray(want_t))

    # cross-format guards both ways
    from vct.serve.aot import AotServable

    with pytest.raises(ValueError, match="CaptionAotServable"):
        AotServable.load(path)
    with pytest.raises(ValueError, match="geometry|expected"):
        sv.decode(clips[:, :2])


@pytest.mark.slow  # caption-checkpoint CLI auto-detect is fast-covered by
# test_caption_raw_export_cli; artifact==live by ..._matches_live_beam_search
def test_caption_checkpoint_export_cli(tiny_captioner, tmp_path, capsys):
    """python -m vct.serve.aot auto-detects a caption checkpoint (manifest
    carries the vocab + config) and exports a captioning artifact."""
    from vct.serve.aot import AotServable, CaptionAotServable, main

    trainer, state, v = tiny_captioner
    ckpt = str(tmp_path / "ck")
    trainer.save_checkpoint(ckpt, state, epoch=0, loss=1.0)
    art = str(tmp_path / "ck.vctaot")
    rc = main([
        "--model", ckpt, "--out", art, "--batches", "1",
        "--height", "24", "--width", "24",
    ])
    assert rc == 0
    assert "caption" in capsys.readouterr().out
    sv = CaptionAotServable.load(art)
    assert sv.input_shape == (3, 24, 24, 3)
    assert sv.beam_width == trainer.cfg.beam_width
    hyp = sv.caption(np.random.RandomState(2).rand(1, 3, 24, 24, 3)
                     .astype(np.float32))
    # the artifact path and the restored-checkpoint live path agree
    want = trainer.caption_videos(
        state,
        np.random.RandomState(2).rand(1, 3, 24, 24, 3).astype(np.float32),
    )
    assert hyp == want

    # classifier loader rejects it with a pointer to the right class
    with pytest.raises(ValueError, match="CaptionAotServable"):
        AotServable.load(art)


def test_caption_raw_artifact_device_interval_sampling(tiny_captioner, tmp_path):
    """device_sampling bakes the caption pipeline's interval selection
    (stride true_len//T, LAST-frame padding — s2vt/beam_search.py:143-180)
    into the executable: caption_raw(raw, lengths) == the live beam search
    over host-interval-sampled clips."""
    from vct.caption.beam import beam_search, decode_tokens
    from vct.serve.aot import CaptionAotServable, export_caption_servable

    trainer, state, v = tiny_captioner
    variables = {"params": state.params, **state.extra_vars}
    T = 3
    shape = (T, 24, 24, 3)
    path = str(tmp_path / "raw.vctaot")
    export_caption_servable(
        trainer.model, variables, v, shape, path,
        batch_sizes=(3,), beam_width=2, max_len=6,
        device_sampling=True, raw_len=8,
    )
    sv = CaptionAotServable.load(path)
    assert sv.device_sampling and sv.raw_len == 8

    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, (3, 8, 24, 24, 3), np.uint8)
    lengths = np.asarray([8, 5, 2], np.int32)  # long / mid / shorter than T
    got = sv.caption_raw(raw, lengths)

    # host model of extract_frames_interval: stride total//T when long,
    # last-frame padding when short
    clips = []
    for clip, n in zip(raw, lengths):
        idx = ((n // T) * np.arange(T) if n >= T
               else np.minimum(np.arange(T), n - 1))
        clips.append(clip[idx].astype(np.float32) / 255.0)
    want_t, _ = beam_search(
        trainer.model, variables, jnp.asarray(np.stack(clips)),
        beam_width=2, max_len=6,
    )
    assert got == [decode_tokens(row, v) for row in np.asarray(want_t)]

    # contract guards both ways + value validation
    with pytest.raises(ValueError, match="caption_raw"):
        sv.decode(np.stack(clips))
    with pytest.raises(ValueError, match="raw_len"):
        sv.caption_raw(raw, np.asarray([8, 9, 2], np.int32))
    with pytest.raises(ValueError, match="uint8"):
        sv.caption_raw(raw.astype(np.float32), lengths)
    plain = str(tmp_path / "plain.vctaot")
    export_caption_servable(
        trainer.model, variables, v, shape, plain,
        batch_sizes=(1,), beam_width=2, max_len=6,
    )
    with pytest.raises(ValueError, match="decode/caption"):
        CaptionAotServable.load(plain).caption_raw(raw, lengths)
    # raw_len knob validation mirrors the classifier exporter
    with pytest.raises(ValueError, match="raw_len"):
        export_caption_servable(
            trainer.model, variables, v, shape, str(tmp_path / "x.vctaot"),
            batch_sizes=(1,), beam_width=2, max_len=6, raw_len=8,
        )
    with pytest.raises(ValueError, match="raw_len"):
        export_caption_servable(
            trainer.model, variables, v, shape, str(tmp_path / "x.vctaot"),
            batch_sizes=(1,), beam_width=2, max_len=6,
            device_sampling=True, raw_len=T,
        )


def test_caption_raw_export_cli(tiny_captioner, tmp_path, capsys):
    """--device_sampling interval on a caption checkpoint bakes the raw
    contract in; classifier-only selection methods are rejected."""
    from vct.serve.aot import CaptionAotServable, main

    trainer, state, v = tiny_captioner
    ckpt = str(tmp_path / "ck")
    trainer.save_checkpoint(ckpt, state, epoch=0, loss=1.0)
    art = str(tmp_path / "raw.vctaot")
    rc = main([
        "--model", ckpt, "--out", art, "--batches", "1",
        "--height", "24", "--width", "24",
        "--device_sampling", "interval", "--raw_len", "7",
    ])
    assert rc == 0
    assert "device_sampling=interval raw_len=7" in capsys.readouterr().out
    sv = CaptionAotServable.load(art)
    assert sv.device_sampling and sv.raw_len == 7

    with pytest.raises(SystemExit):
        main(["--model", ckpt, "--out", art, "--batches", "1",
              "--device_sampling", "sad"])
    err = capsys.readouterr().err
    assert "interval only" in err


def test_caption_data_parallel_export_serves_on_mesh(tiny_captioner, tmp_path):
    """data_parallel=4 caption artifact: CNN + encoder + the whole beam
    search shard batch-wise over the virtual mesh (suite runs on 8 CPU
    devices); decode matches the single-device live beam search, including
    a padded tail chunk. Mirrors the classifier artifact's contract."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from vct.caption.beam import beam_search
    from vct.serve.aot import CaptionAotServable, export_caption_servable

    trainer, state, v = tiny_captioner
    variables = {"params": state.params, **state.extra_vars}
    shape = (3, 24, 24, 3)
    path = str(tmp_path / "cdp.vctaot")
    export_caption_servable(
        trainer.model, variables, v, shape, path,
        batch_sizes=(4,), beam_width=2, max_len=6, data_parallel=4,
    )
    sv = CaptionAotServable.load(path)
    assert sv.n_devices == 4
    clips = np.random.RandomState(7).rand(6, *shape).astype(np.float32)
    tokens, scores = sv.decode(clips)  # bucket of 4 + tail of 2, padded
    want_t, want_s = beam_search(
        trainer.model, variables, jnp.asarray(clips), beam_width=2, max_len=6
    )
    np.testing.assert_array_equal(tokens, np.asarray(want_t))
    np.testing.assert_allclose(scores, np.asarray(want_s), atol=1e-5)

    # composes with the baked-in interval selection: raw uint8 clips and
    # their lengths both shard batch-wise inside the executable.
    from vct.data.preprocess import device_sample_clips

    rpath = str(tmp_path / "cdps.vctaot")
    export_caption_servable(
        trainer.model, variables, v, shape, rpath,
        batch_sizes=(4,), beam_width=2, max_len=6,
        device_sampling=True, raw_len=6, data_parallel=4,
    )
    svr = CaptionAotServable.load(rpath)
    assert svr.n_devices == 4 and svr.device_sampling
    raw = np.random.RandomState(8).randint(0, 256, (4, 6) + shape[1:], np.uint8)
    lengths = np.asarray([6, 5, 3, 4], np.int32)
    rt, rs = svr.decode_raw(raw, lengths)
    x = device_sample_clips(jnp.asarray(raw), shape[0], method="uniform",
                            lengths=jnp.asarray(lengths), short_pad="last")
    wt, ws = beam_search(trainer.model, variables, x, beam_width=2, max_len=6)
    np.testing.assert_array_equal(rt, np.asarray(wt))
    np.testing.assert_allclose(rs, np.asarray(ws), atol=1e-5)

    # same bucket/count validation as the classifier artifact
    with pytest.raises(ValueError, match="multiple of data_parallel"):
        export_caption_servable(
            trainer.model, variables, v, shape, str(tmp_path / "bad.vctaot"),
            batch_sizes=(3,), beam_width=2, max_len=6, data_parallel=2,
        )
    with pytest.raises(ValueError, match=">= 1"):
        export_caption_servable(
            trainer.model, variables, v, shape, str(tmp_path / "bad.vctaot"),
            batch_sizes=(2,), beam_width=2, max_len=6, data_parallel=0,
        )
