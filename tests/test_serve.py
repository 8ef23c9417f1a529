"""Serving stack: result store, socket queue, REST backend (live HTTP),
deployment pipeline, TikTok client parsing, crawler link extraction."""

import json
import socket
import threading
import time

import numpy as np
import pytest

from vct.core.config import ServeConfig
from vct.serve.deployment import construct_url
from vct.serve.queue import QueuePull, QueuePush
from vct.serve.store import ResultStore


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestStore:
    def test_insert_find(self, tmp_path):
        store = ResultStore(str(tmp_path / "r.db"))
        assert store.find_one("u1") is None
        store.insert("u1", ["harmful", "safe"], [0.9, 0.1], "2024-01-01T00:00:00")
        doc = store.find_one("u1")
        assert doc["labels"] == ["harmful", "safe"]
        assert doc["scores"] == [0.9, 0.1]
        store.insert("u1", ["safe"])  # upsert
        assert store.find_one("u1")["labels"] == ["safe"]
        assert len(store.all()) == 1

    def test_threaded_access(self, tmp_path):
        store = ResultStore(str(tmp_path / "r.db"))

        def writer(i):
            store.insert(f"u{i}", [str(i)])

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert len(store.all()) == 8


class TestQueue:
    def test_push_pull_roundtrip(self):
        port = _free_port()
        pull = QueuePull(host="127.0.0.1", port=port)
        pull.bind()
        received = []

        def consume():
            for msg in pull.messages():
                received.append(msg)
                if len(received) >= 2:
                    pull.close()

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        push = QueuePush(host="127.0.0.1", port=port)
        push.send("https://example.com/v/1")
        push.send({"url": "https://example.com/v/2"})
        t.join(timeout=10)
        assert received[0] == "https://example.com/v/1"
        assert json.loads(received[1])["url"] == "https://example.com/v/2"

    def test_consume_swallows_errors(self):
        port = _free_port()
        pull = QueuePull(host="127.0.0.1", port=port)
        pull.bind()
        seen = []

        def cb(msg):
            seen.append(msg)
            if msg == "bad":
                raise ValueError("boom")
            if len(seen) >= 2:
                pull.close()

        t = threading.Thread(target=pull.consume, args=(cb,), daemon=True)
        t.start()
        push = QueuePush(host="127.0.0.1", port=port)
        push.send("bad")
        push.send("good")
        t.join(timeout=10)
        assert seen == ["bad", "good"]


@pytest.fixture
def backend(tmp_path):
    import requests

    from vct.serve.backend import make_server

    port = _free_port()
    cfg = ServeConfig(backend_host="127.0.0.1", backend_port=port,
                      db_path=str(tmp_path / "b.db"))
    store = ResultStore(cfg.db_path)
    server = make_server(cfg, store=store, with_queue=False)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", store, requests
    server.shutdown()


class TestBackend:
    def test_classify_and_lookup(self, backend):
        base, store, requests = backend
        r = requests.post(f"{base}/classify", json={
            "url": "https://t/v/1", "labels": ["safe"], "scores": [0.9],
            "timestamp": "now",
        })
        assert r.status_code == 200
        r = requests.get(f"{base}/video_labels", params={"url": "https://t/v/1"})
        assert r.status_code == 200
        assert r.json() == {"url": "https://t/v/1", "labels": ["safe"]}

    def test_missing_url_404(self, backend):
        base, _, requests = backend
        r = requests.get(f"{base}/video_labels", params={"url": "nope"})
        assert r.status_code == 404

    def test_validation(self, backend):
        base, _, requests = backend
        assert requests.post(f"{base}/classify", json={}).status_code == 400
        assert requests.post(f"{base}/classify", data="{bad").status_code == 400
        assert requests.get(f"{base}/video_labels").status_code == 400
        assert requests.get(f"{base}/unknown").status_code == 404

    def test_get_labels_hit(self, backend):
        base, store, requests = backend
        store.insert("https://t/v/2", ["harmful"])
        r = requests.get(f"{base}/get_labels", params={"url": "https://t/v/2"})
        assert r.status_code == 200
        assert r.json()["labels"] == ["harmful"]


def test_get_labels_enqueues_and_waits(tmp_path):
    """Full backend->queue->(fake worker)->store->response loop."""
    import requests

    from vct.serve.backend import make_handler
    from http.server import ThreadingHTTPServer

    qport = _free_port()
    hport = _free_port()
    store = ResultStore(str(tmp_path / "q.db"))
    push = QueuePush(host="127.0.0.1", port=qport)
    server = ThreadingHTTPServer(
        ("127.0.0.1", hport), make_handler(store, push, poll_timeout=10.0)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()

    pull = QueuePull(host="127.0.0.1", port=qport)
    pull.bind()

    def worker():
        for msg in pull.messages():
            time.sleep(0.2)  # simulate inference
            store.insert(msg, ["mock_label"])
            pull.close()

    threading.Thread(target=worker, daemon=True).start()
    r = requests.get(
        f"http://127.0.0.1:{hport}/get_labels",
        params={"url": "https://t/v/9"}, timeout=15,
    )
    server.shutdown()
    assert r.status_code == 200
    assert r.json() == {"url": "https://t/v/9", "labels": ["mock_label"]}


class TestDeployment:
    def test_construct_url(self):
        assert construct_url("@someuser_video_12345.mp4") == (
            "https://www.tiktok.com/@someuser/video/12345"
        )
        assert construct_url("random.mp4") is None

    def test_infer_cache_releases_dropped_models(self):
        """The per-model jit cache must actually evict: the compiled fn
        holds the model by weakref, so dropping the model releases the
        WeakKeyDictionary entry (a value closing strongly over its key
        would pin the entry forever — the leak the cache exists to fix)."""
        import gc

        import jax

        from vct.core.config import ModelConfig
        from vct.models import build_model
        from vct.serve.deployment import _infer_cache, _jitted_infer

        cfg = ModelConfig(num_classes=2, cnn_backbone="resnet18",
                          rnn_type="gru", rnn_input_size=8, rnn_layer=1)
        model = build_model(cfg, 2)
        x = np.random.RandomState(0).rand(1, 2, 16, 16, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        before = len(_infer_cache)
        fn = _jitted_infer(model)
        probs = np.asarray(fn(variables, x))
        assert probs.shape == (1, 2)
        assert _jitted_infer(model) is fn  # cached, no re-trace
        assert len(_infer_cache) == before + 1
        del model, fn
        gc.collect()
        assert len(_infer_cache) == before

    def test_classify_and_display_contract(self, capsys):
        import jax

        from vct.core.config import ModelConfig
        from vct.models import build_model
        from vct.serve.deployment import classify_and_display

        cfg = ModelConfig(num_classes=3, cnn_backbone="resnet18",
                          rnn_type="lstm", rnn_input_size=8, rnn_layer=1)
        model = build_model(cfg, 4)
        clips = np.random.RandomState(0).rand(2, 4, 32, 32, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), clips)
        results = classify_and_display(
            model, variables, clips, ["a.mp4", "b.mp4"], ["x", "y", "z"]
        )
        out = capsys.readouterr().out
        assert len(results) == 2
        assert set(results[0]["labels"]) == {"x", "y", "z"}
        assert results[0]["scores"] == sorted(results[0]["scores"], reverse=True)
        assert abs(sum(results[0]["scores"]) - 1.0) < 1e-5
        assert "Label Counts:" in out
        assert "Processed a.mp4:" in out


SIGI_HTML = """<html><body>
<script id="SIGI_STATE" type="application/json">
{"ItemModule": {"7001": {"id": "7001", "desc": "test video", "createTime": "1700000000",
 "video": {"duration": 15, "downloadAddr": "https://cdn.example/v.mp4"},
 "stats": {"diggCount": 10, "shareCount": 2, "commentCount": 3, "playCount": 99},
 "author": "someuser", "isAd": false}},
 "UserModule": {"users": {"someuser": {"verified": true}}}}
</script></body></html>"""

UNIVERSAL_HTML = """<html><body>
<script id="__UNIVERSAL_DATA_FOR_REHYDRATION__" type="application/json">
{"__DEFAULT_SCOPE__": {"webapp.video-detail": {"itemInfo": {"itemStruct":
{"id": "7002", "desc": "alt video", "video": {"duration": 9,
 "playAddr": "https://cdn.example/v2.mp4"}, "stats": {"playCount": 5}}}}}}
</script></body></html>"""


class TestTikTok:
    def test_sigi_state_parsing(self):
        from vct.serve.tiktok import _script_json, extract_video_record

        data = _script_json(SIGI_HTML, "SIGI_STATE")
        item = extract_video_record(data)
        assert item["id"] == "7001"
        assert item["video"]["downloadAddr"] == "https://cdn.example/v.mp4"

    def test_universal_fallback_parsing(self):
        from vct.serve.tiktok import _script_json, extract_video_record

        data = _script_json(UNIVERSAL_HTML, "__UNIVERSAL_DATA_FOR_REHYDRATION__")
        item = extract_video_record(data)
        assert item["id"] == "7002"

    def test_generate_data_row(self):
        from vct.serve.tiktok import METADATA_FIELDS, _script_json, extract_video_record, generate_data_row

        item = extract_video_record(_script_json(SIGI_HTML, "SIGI_STATE"))
        row = generate_data_row(item)
        assert set(row) == set(METADATA_FIELDS)
        assert row["video_id"] == "7001"
        assert row["video_playcount"] == 99
        assert row["video_duration"] == 15

    def test_save_tiktok_with_fake_session(self, tmp_path):
        from vct.serve.tiktok import save_tiktok

        class FakeResponse:
            def __init__(self, text=b"", content=b""):
                self.text = text
                self.content = content

        class FakeSession:
            def get(self, url, **kw):
                if "tiktok.com/@" in url:
                    return FakeResponse(text=SIGI_HTML)
                return FakeResponse(content=b"FAKEVIDEO")

        fns = save_tiktok(
            "https://www.tiktok.com/@someuser/video/7001",
            session=FakeSession(), save_dir=str(tmp_path), return_fns=True,
            metadata_fn=str(tmp_path / "meta.csv"),
        )
        assert len(fns) == 1
        assert fns[0].endswith("@someuser_video_7001.mp4")
        assert open(fns[0], "rb").read() == b"FAKEVIDEO"
        meta = open(tmp_path / "meta.csv").read()
        assert "video_id" in meta and "7001" in meta
        # downloaded filename reconstructs to the original URL (the serving
        # loop contract, loader_data.py:546-553)
        import os

        assert construct_url(os.path.basename(fns[0])) == (
            "https://www.tiktok.com/@someuser/video/7001"
        )


class TestCrawler:
    PROFILE_HTML = """<html><body>
    <a href="/@someuser/video/111">v1</a>
    <a href="https://www.tiktok.com/@someuser/video/222">v2</a>
    <a href="/@otheruser/video/333">other</a>
    <a href="/@someuser/video/111">dup</a>
    <script>{"url": "https://www.tiktok.com/@someuser/video/444"}</script>
    </body></html>"""

    def test_extract_video_links(self):
        from vct.serve.crawler import extract_video_links

        links = extract_video_links(self.PROFILE_HTML, "someuser")
        assert links == [
            "https://www.tiktok.com/@someuser/video/111",
            "https://www.tiktok.com/@someuser/video/222",
            "https://www.tiktok.com/@someuser/video/444",
        ]
        all_links = extract_video_links(self.PROFILE_HTML)
        assert "https://www.tiktok.com/@otheruser/video/333" in all_links

    def test_is_url_classified_against_live_backend(self, backend):
        base, store, _ = backend
        from vct.serve.crawler import is_url_classified

        store.insert("https://t/v/7", ["safe"])
        assert is_url_classified("https://t/v/7", f"{base}/video_labels")
        assert not is_url_classified("https://t/v/8", f"{base}/video_labels")


class TestWorkerRetention:
    def test_post_results_reports_per_video_status(self, monkeypatch):
        from vct.serve import deployment

        calls = {}

        class FakeResp:
            def __init__(self, code):
                self.status_code = code
                self.text = "x"

        def fake_post(url, json=None, timeout=None):
            name = json["url"].rsplit("/", 1)[-1]
            calls[name] = True
            return FakeResp(500 if name == "222" else 200)

        import requests

        monkeypatch.setattr(requests, "post", fake_post)
        results = [
            {"video_name": f"@u_video_{i}.mp4", "labels": ["a"],
             "scores": [1.0], "timestamp": "t"}
            for i in (111, 222)
        ] + [{"video_name": "nourl.mp4", "labels": ["a"], "scores": [1.0],
              "timestamp": "t"}]
        posted = deployment.post_results(results, "http://x/classify")
        assert posted == {
            "@u_video_111.mp4": True,
            "@u_video_222.mp4": False,
            "nourl.mp4": False,
        }

    def test_backend_base_url_override(self):
        from vct.core.config import ServeConfig

        cfg = ServeConfig(backend_base_url="http://elsewhere:9000/")
        assert cfg.backend_url == "http://elsewhere:9000/classify"
        assert cfg.backend_checker == "http://elsewhere:9000/video_labels"
        # default derivation still works
        assert "localhost" in ServeConfig().backend_url
        assert "backend_rt" in ServeConfig(app_stage="prod").backend_url


class TestCheckpointAtomicity:
    def test_stale_manifest_without_state_resumes_fresh(self, tmp_path):
        import json as _json

        import jax

        from vct.train.checkpoint import load_train_state

        path = str(tmp_path / "ckpt")
        import os as _os

        _os.makedirs(path)
        with open(_os.path.join(path, "train_manifest.json"), "w") as f:
            _json.dump({"epoch": 3, "config": {}, "class_names": []}, f)
        sentinel = object()
        state, epoch, _ = load_train_state(path, sentinel)
        assert state is sentinel and epoch == 0

    def test_relative_path_train_state_roundtrip(self, tmp_path, monkeypatch):
        """Orbax requires absolute paths: a relative --model_path must still
        save AND resume (an unfixed restore error would be swallowed into
        'starting from epoch 0' — silent retraining instead of resume)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vct.core.config import Config
        from vct.train.checkpoint import load_train_state, save_train_state

        class S:
            def __init__(self):
                self.params = {"w": jnp.ones((2,))}
                self.extra_vars = {}
                self.opt_state = {"m": jnp.zeros((2,))}
                self.rng = jax.random.PRNGKey(3)
                self.step = jnp.asarray(7)

            def replace(self, **kw):
                s = S()
                s.__dict__.update(self.__dict__)
                s.__dict__.update(kw)
                return s

        monkeypatch.chdir(tmp_path)
        s = S()
        s.params = {"w": jnp.asarray([2.5, 3.5])}
        save_train_state("relck", s, Config(), ["a"], epoch=4)
        restored, epoch, _ = load_train_state("relck", S())
        assert epoch == 4
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   [2.5, 3.5])

    def test_save_twice_and_reload(self, tmp_path):
        """Repeated saves swap atomically and leave no tmp/old litter."""
        import os as _os

        import jax
        import jax.numpy as jnp
        import numpy as np

        from vct.core.config import Config
        from vct.train.checkpoint import load_checkpoint, save_checkpoint

        cfg = Config()
        path = str(tmp_path / "m")
        for val in (1.0, 2.0):
            variables = {"params": {"w": np.full(3, val, np.float32)}}
            save_checkpoint(path, variables, cfg, ["a", "b"])
        loaded, _, names, _ = load_checkpoint(path)
        np.testing.assert_array_equal(loaded["params"]["w"], np.full(3, 2.0))
        assert names == ["a", "b"]
        litter = [f for f in _os.listdir(path) if f.endswith((".tmp", ".old"))]
        assert litter == []

    def test_crash_between_renames_recovers(self, tmp_path):
        """final missing + .old/.tmp present (the rename window) recovers."""
        import os as _os
        import shutil

        import numpy as np

        from vct.core.config import Config
        from vct.train.checkpoint import load_checkpoint, save_checkpoint

        cfg = Config()
        path = str(tmp_path / "m")
        save_checkpoint(path, {"params": {"w": np.ones(3, np.float32)}}, cfg, ["a"])
        params_dir = _os.path.join(path, "params")
        # crash state A: only .old survives
        _os.rename(params_dir, params_dir + ".old")
        loaded, _, _, _ = load_checkpoint(path)
        np.testing.assert_array_equal(loaded["params"]["w"], np.ones(3))
        # crash state B: both .old (previous) and .tmp (new, complete)
        save_checkpoint(path, {"params": {"w": np.full(3, 2.0, np.float32)}},
                        cfg, ["a"])
        shutil.copytree(params_dir, params_dir + ".tmp")
        _os.rename(params_dir, params_dir + ".old")
        loaded, _, _, _ = load_checkpoint(path)
        # .tmp (the newer complete save) wins
        np.testing.assert_array_equal(loaded["params"]["w"], np.full(3, 2.0))


@pytest.mark.slow
def test_classify_videos_mesh_sharded():
    """Mesh-sharded batch inference equals the single-device result."""
    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp

    from vct.core.config import Config
    from vct.models import build_model
    from vct.parallel.mesh import make_mesh
    from vct.serve.deployment import classify_videos

    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18", "model.rnn_type": "gru",
        "model.rnn_input_size": "4", "model.rnn_layer": "1",
        "data.sequence_length": "3",
    })
    model = build_model(cfg.model, 3)
    clips = np.random.RandomState(0).rand(10, 3, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clips[:1]))
    variables = jax.tree_util.tree_map(np.asarray, variables)

    single = classify_videos(model, variables, clips, batch_size=4)
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    sharded = classify_videos(model, variables, clips, batch_size=4, mesh=mesh)
    assert sharded.shape == (10, cfg.model.num_classes)
    np.testing.assert_allclose(single, sharded, atol=1e-5, rtol=1e-5)
