"""Golden-fixture network tests: canned TikTok HTML variants served by a
local HTTP stub drive get_tiktok_json / save_tiktok / the crawler end to end
with zero real network (VERDICT r2 directive #7).

Fixture variants mirror the pages the vendored pyktok handles
(``/root/reference/custom_pyktok/pyktok.py:197-236``): a SIGI_STATE page, a
``__UNIVERSAL_DATA_FOR_REHYDRATION__`` fallback page, a slideshow (imagePost)
post, and the "Something went wrong" interstitial the crawler retries
through (``/root/reference/medsos_lrcn/src/crawler.py:89-97``).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

pytest.importorskip("bs4")

FAKE_MP4 = b"\x00\x00\x00\x18ftypmp42FAKEVIDEOBYTES"
FAKE_JPEG = b"\xff\xd8\xff\xe0FAKEJPEGBYTES"


def _item(vid, base, author="user", image_post=False, play_only=False):
    item = {
        "id": vid,
        "createTime": "1700000000",
        "desc": f"video {vid}",
        "locationCreated": "ID",
        "isAd": False,
        "video": {"duration": 15},
        "stats": {"diggCount": 11, "shareCount": 2, "commentCount": 3,
                  "playCount": 400},
        "author": {"uniqueId": author, "nickname": author.title(),
                   "verified": False},
        "authorStats": {"followerCount": 10, "followingCount": 5,
                        "heartCount": 1, "videoCount": 2, "diggCount": 0},
        "stickersOnItem": [{"stickerText": ["hello"]}],
    }
    if image_post:
        item["imagePost"] = {"images": [
            {"imageURL": {"urlList": [f"{base}/dl/slide{i}.jpeg"]}}
            for i in (1, 2)
        ]}
    elif play_only:
        item["video"]["playAddr"] = f"{base}/dl/video{vid}.mp4"
    else:
        item["video"]["downloadAddr"] = f"{base}/dl/video{vid}.mp4"
    return item


def _sigi_page(state):
    return (
        "<html><head><title>t</title></head><body>"
        f'<script id="SIGI_STATE" type="application/json">{json.dumps(state)}'
        "</script></body></html>"
    )


def _universal_page(item):
    state = {"__DEFAULT_SCOPE__": {"webapp.video-detail": {
        "itemInfo": {"itemStruct": item}}}}
    return (
        "<html><body><script id=\"__UNIVERSAL_DATA_FOR_REHYDRATION__\" "
        f'type="application/json">{json.dumps(state)}</script></body></html>'
    )


GRID_PAGE = (
    "<html><body>"
    '<a href="/@user/video/111">v1</a>'
    '<a href="https://www.tiktok.com/@user/video/444">v2</a>'
    '<a href="/@other/video/999">someone else</a>'
    "</body></html>"
)

FLAKY_GRID_PAGE = (
    "<html><body>"
    '<a href="/@flaky/video/555">v1</a>'
    '<a href="https://www.tiktok.com/@flaky/video/556">v2</a>'
    "</body></html>"
)

BLOCK_PAGE = "<html><body>Something went wrong</body></html>"


class _StubHandler(BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _send(self, body, ctype="text/html"):
        data = body.encode() if isinstance(body, str) else body
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        base = f"http://127.0.0.1:{self.server.server_port}"
        parsed = urlparse(self.path)
        path = parsed.path
        if path == "/@user/video/111":
            self._send(_sigi_page({"ItemModule": {
                # a pinned/related item first: extract_video_record must pick
                # the REQUESTED id, not the first key
                "999": _item("999", base, author="other"),
                "111": _item("111", base),
            }}))
        elif path == "/@user2/video/222":
            self._send(_universal_page(_item("222", base, author="user2",
                                             play_only=True)))
        elif path == "/@user3/video/333":
            self._send(_sigi_page({"ItemModule": {
                "333": _item("333", base, author="user3", image_post=True)}}))
        elif path.startswith("/dl/video"):
            self._send(FAKE_MP4, "video/mp4")
        elif path.startswith("/dl/slide"):
            self._send(FAKE_JPEG, "image/jpeg")
        elif path == "/@flaky":
            _StubHandler.flaky_hits += 1
            self._send(BLOCK_PAGE if _StubHandler.flaky_hits <= 2
                       else FLAKY_GRID_PAGE)
        elif path == "/@user":
            self._send(GRID_PAGE)
        elif path == "/video_labels":
            url = parse_qs(parsed.query).get("url", [""])[0]
            if "video/444" in url:
                self._send(json.dumps({"url": url, "labels": "harmful"}),
                           "application/json")
            else:
                self._send(json.dumps({}), "application/json")
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def stub():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    thread.join(timeout=5)


def test_get_tiktok_json_sigi_state(stub):
    from vct.serve.tiktok import extract_video_record, get_tiktok_json

    data = get_tiktok_json(f"{stub}/@user/video/111")
    assert data is not None and "ItemModule" in data
    item = extract_video_record(data, "111")
    assert item["id"] == "111"  # requested id, not the first ("999") key


def test_save_tiktok_sigi_download_and_metadata(stub, tmp_path):
    from vct.serve.tiktok import METADATA_FIELDS, save_tiktok

    meta = str(tmp_path / "meta.csv")
    fns = save_tiktok(f"{stub}/@user/video/111", metadata_fn=meta,
                      save_dir=str(tmp_path), return_fns=True)
    assert fns and fns[0].endswith("@user_video_111.mp4")
    with open(fns[0], "rb") as f:
        assert f.read() == FAKE_MP4
    import csv

    with open(meta) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == METADATA_FIELDS
    assert rows[0]["video_id"] == "111"
    assert rows[0]["author_username"] == "user"
    assert rows[0]["video_diggcount"] == "11"


def test_save_tiktok_universal_fallback(stub, tmp_path, capsys):
    """No SIGI_STATE on the page: save_tiktok falls back to the
    __UNIVERSAL_DATA_FOR_REHYDRATION__ blob (alt_get_tiktok_json) and uses
    playAddr when downloadAddr is absent."""
    from vct.serve.tiktok import save_tiktok

    fns = save_tiktok(f"{stub}/@user2/video/222", save_dir=str(tmp_path),
                      return_fns=True)
    assert fns and fns[0].endswith("@user2_video_222.mp4")
    with open(fns[0], "rb") as f:
        assert f.read() == FAKE_MP4


def test_save_tiktok_slideshow(stub, tmp_path):
    from vct.serve.tiktok import save_tiktok

    fns = save_tiktok(f"{stub}/@user3/video/333", save_dir=str(tmp_path),
                      return_fns=True)
    assert len(fns) == 2
    assert fns[0].endswith("@user3_video_333_slide_1.jpeg")
    assert fns[1].endswith("@user3_video_333_slide_2.jpeg")
    with open(fns[0], "rb") as f:
        assert f.read() == FAKE_JPEG


def test_crawler_retries_block_page(stub, capsys):
    """The "Something went wrong" interstitial is retried through (the
    reference loop, crawler.py:89-97) — two block pages then the real grid."""
    from vct.serve.crawler import scrape_profile

    _StubHandler.flaky_hits = 0
    links = scrape_profile(f"{stub}/@flaky")
    out = capsys.readouterr().out
    assert out.count("Something went wrong page - retrying...") == 2
    assert any("video/555" in l for l in links)
    assert any("video/556" in l for l in links)


def test_crawl_profiles_filters_classified(stub, tmp_path, capsys):
    """Crawl: scrape the grid, ask the backend stub per link, keep only the
    unclassified ones (crawler.py:124-141 + loader_data.py:555-573 logic)."""
    from vct.core.config import ServeConfig
    from vct.serve.crawler import crawl_profiles

    cfg = ServeConfig(video_dir=str(tmp_path / "videos"),
                      backend_base_url=stub)
    todo = crawl_profiles([f"{stub}/@user"], cfg, download=False)
    out = capsys.readouterr().out
    assert "already classified" in out
    # grid had 111 + 444 (classified) + 999 (other user, filtered by name)
    assert [u.rsplit("/", 1)[1] for u in todo] == ["111"]


def test_save_tiktok_multi_urls_loop(stub, tmp_path):
    """The multi-URL download loop (pyktok.py save_tiktok_multi_urls): both
    posts fetched, filenames returned, metadata rows appended in order."""
    from vct.serve.tiktok import save_tiktok_multi_urls

    meta = str(tmp_path / "meta.csv")
    fns = save_tiktok_multi_urls(
        [f"{stub}/@user/video/111", f"{stub}/@user2/video/222"],
        metadata_fn=meta, sleep=0.01, save_dir=str(tmp_path),
    )
    assert [f.rsplit("/", 1)[1] for f in fns] == [
        "@user_video_111.mp4", "@user2_video_222.mp4",
    ]
    import csv

    with open(meta) as f:
        rows = list(csv.DictReader(f))
    assert [r["video_id"] for r in rows] == ["111", "222"]


def test_playwright_flow_with_fake_driver(stub, monkeypatch, capsys):
    """The dynamic-grid path (_scrape_with_playwright) executes end to end
    against a fake playwright module: cookie injection, the block-page retry
    loop (reference crawler.py:89-97), the scroll loop, and link extraction
    from the final DOM — no real browser or network."""
    import sys
    import types

    import requests as _requests

    pages = [BLOCK_PAGE, BLOCK_PAGE, FLAKY_GRID_PAGE]
    calls = {"scrolls": 0, "cookies": None, "gotos": []}

    class FakePage:
        def __init__(self):
            self._html = ""
            self.mouse = types.SimpleNamespace(
                wheel=lambda dx, dy: calls.__setitem__(
                    "scrolls", calls["scrolls"] + 1)
            )

        def goto(self, url, wait_until=None):
            calls["gotos"].append(url)
            # pages[] simulates the grid being re-fetched through the block
            # interstitial; fetch the real stub for URL plausibility too
            _requests.get(url, timeout=5)
            self._html = pages.pop(0) if pages else FLAKY_GRID_PAGE

        def wait_for_timeout(self, ms):
            pass

        def content(self):
            return self._html

    class FakeContext:
        def add_cookies(self, cookies):
            calls["cookies"] = cookies

        def new_page(self):
            return FakePage()

    class FakeBrowser:
        def new_context(self):
            return FakeContext()

        def close(self):
            pass

    class FakePW:
        def __enter__(self):
            return types.SimpleNamespace(
                firefox=types.SimpleNamespace(
                    launch=lambda headless=True: FakeBrowser())
            )

        def __exit__(self, *a):
            return False

    fake_api = types.ModuleType("playwright.sync_api")
    fake_api.sync_playwright = lambda: FakePW()
    fake_root = types.ModuleType("playwright")
    fake_root.sync_api = fake_api
    monkeypatch.setitem(sys.modules, "playwright", fake_root)
    monkeypatch.setitem(sys.modules, "playwright.sync_api", fake_api)

    from vct.serve.crawler import scrape_profile

    links = scrape_profile(f"{stub}/@flaky", scrolls=3,
                           cookies={"sessionid": "abc"})
    out = capsys.readouterr().out
    assert out.count("Something went wrong page - retrying...") == 2
    assert len(calls["gotos"]) == 3  # two block pages + the real grid
    assert calls["scrolls"] == 3
    assert calls["cookies"][0]["name"] == "sessionid"
    assert calls["cookies"][0]["domain"] == ".tiktok.com"
    assert any("video/555" in l for l in links)
    assert any("video/556" in l for l in links)
