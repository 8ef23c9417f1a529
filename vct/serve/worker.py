"""Queue inference worker (C21).

The counterpart of ``medsos_lrcn/src/worker.py:104-155``: bind the PULL
queue, and for each URL message download the video (TikTok downloader),
decode + classify it, and POST the result to the backend. Differences from
the reference, on purpose:

  * the model loads **once** at startup and the forward stays jitted —
    the reference ``torch.load``s the whole model for every message
    (``worker.py:114``), a per-request deserialization of the entire network;
  * no delete-while-iterating of video files (the reference's loader deletes
    already-classified videos during the scan, ``loader_data.py:468-478``);
    processed files are removed only after their result is POSTed, and
    leftovers delete only once the backend confirms it holds their labels.

Configuration via env vars keeps the reference's surface
(``worker.py:24-28``): MODEL_PATH, SAMPLING_METHOD, SEQUENCE_LENGTH,
VIDEO_DIR, plus BACKEND_URL and QUEUE_PORT. MODEL_PATH may be either a
checkpoint directory or a ``.vctaot`` AOT artifact file (``vct.serve.aot``).
"""

from __future__ import annotations

import os
from typing import Optional

from vct.core.config import ServeConfig
from vct.serve.deployment import classify_and_display, load_model, post_results
from vct.serve.queue import QueuePull

__all__ = ["Worker", "run_worker"]


class Worker:
    def __init__(self, cfg: ServeConfig, downloader=None):
        self.cfg = cfg
        self.downloader = downloader  # callable(url, save_dir) -> None
        print(f"Loading model from {cfg.model_path}")
        self.servable = None
        if os.path.isfile(cfg.model_path):
            # MODEL_PATH points at a .vctaot artifact (vct.serve.aot):
            # weights + compiled forward in one file — the worker serves it
            # with no model zoo / config / checkpoint restore in the path,
            # the true analogue of the reference worker's whole-model
            # ``torch.load`` (worker.py:114) minus the per-message reload.
            from vct.serve.aot import AotServable

            self.servable = AotServable.load(cfg.model_path)
            if self.servable.device_sampling:
                raise ValueError(
                    "this artifact bakes on-device sampling in (raw-input "
                    "contract, AotServable.classify_raw); the worker feeds "
                    "pre-sampled clips — export without --device_sampling "
                    "for worker serving"
                )
            self.model = self.variables = self.model_cfg = None
            self.class_names = self.servable.class_names
            art_T = self.servable.input_shape[0]
            if cfg.sequence_length != art_T:
                print(
                    f"SEQUENCE_LENGTH={cfg.sequence_length} overridden to "
                    f"{art_T}: the artifact's executables are compiled for "
                    f"T={art_T}"
                )
                import dataclasses

                self.cfg = cfg = dataclasses.replace(
                    cfg, sequence_length=art_T
                )
            # Warm the executables NOW: the first device execution pays
            # one-time costs that don't belong in the first user request
            # (weights land on the device, the runtime warms up — measured
            # 50 s through a tunneled chip vs 0.1 s steady-state; the
            # reference worker pays torch.load + cold CUDA per message).
            self.servable.warmup()
            if (self.servable.sampling_method
                    and "SAMPLING_METHOD" not in os.environ):
                # No explicit env override: preprocess the way the model
                # was trained (the manifest records it).
                import dataclasses

                self.cfg = cfg = dataclasses.replace(
                    cfg, sampling_method=self.servable.sampling_method
                )
        else:
            self.model, self.variables, self.class_names, self.model_cfg = (
                load_model(cfg.model_path)
            )
        self.pull = QueuePull(port=cfg.queue_port)
        self.mesh = None
        if os.environ.get("VCT_WORKER_MESH") == "1":
            import jax

            from vct.parallel.mesh import make_mesh

            if len(jax.devices()) > 1:
                self.mesh = make_mesh(jax.devices(), model=1)
                print(f"worker sharding inference over {self.mesh.size} devices")

    def callback(self, url: str) -> None:
        print(f"Processing message: {url}")
        os.makedirs(self.cfg.video_dir, exist_ok=True)
        if self.downloader is not None:
            self.downloader(url, self.cfg.video_dir)
        else:
            from vct.serve.tiktok import save_tiktok_multi_urls

            save_tiktok_multi_urls([url], save_video=True,
                                   save_dir=self.cfg.video_dir)

        from vct.data.ingest import load_dataset_inference

        if self.servable is not None:
            img_h, img_w = self.servable.input_shape[1:3]
        else:
            img_h = self.model_cfg.data.img_height
            img_w = self.model_cfg.data.img_width
        clips, names = load_dataset_inference(
            self.cfg.video_dir,
            sampling_method=self.cfg.sampling_method,
            sequence_length=self.cfg.sequence_length,
            img_height=img_h,
            img_width=img_w,
            skip=self._already_classified(),
        )
        if len(names) == 0:
            print("No videos to classify.")
            return
        results = classify_and_display(
            self.model, self.variables, clips, names, self.class_names,
            mesh=self.mesh,
            probs=self.servable.classify(clips)
            if self.servable is not None else None,
        )
        posted = post_results(results, self.cfg.backend_url)
        # Delete videos whose result the backend confirmed. Transient
        # failures (valid URL, backend down/5xx) stay on disk and retry via
        # the _already_classified/leftover path; files whose name can never
        # map back to a URL are unconfirmable — keeping those would re-run
        # inference on them for every future message, so they are removed
        # after their one classification (the reference's behavior).
        from vct.serve.deployment import construct_url

        for name in names:
            if not posted.get(name) and construct_url(name) is not None:
                print(f"Keeping {name} for retry (result not confirmed)")
                continue
            if not posted.get(name):
                print(f"Dropping {name}: no reconstructable URL to confirm")
            path = os.path.join(self.cfg.video_dir, name)
            try:
                os.remove(path)
            except OSError:
                pass

    def _already_classified(self):
        """Video filenames in VIDEO_DIR whose URLs the backend already has
        labels for (the reference's pre-inference filter,
        ``loader_data.py:468-478``). Confirmed-classified leftovers (e.g.
        from a crash between POST and cleanup) are deleted here — AFTER the
        backend confirms it has their labels, not mid-scan like the
        reference — so the dir and the per-message check cost stay bounded."""
        import requests

        from vct.serve.deployment import construct_url

        skip = []
        try:
            for fname in os.listdir(self.cfg.video_dir):
                url = construct_url(fname)
                if not url:
                    continue
                try:
                    r = requests.get(
                        self.cfg.backend_checker, params={"url": url}, timeout=5
                    )
                    if r.status_code == 200 and "labels" in r.json():
                        skip.append(fname)
                        try:
                            os.remove(os.path.join(self.cfg.video_dir, fname))
                            print(f"Deleted already-classified video: {fname}")
                        except OSError:
                            pass
                except Exception:
                    continue
        except FileNotFoundError:
            pass
        return skip

    def run(self) -> None:
        print(f"worker pulling on :{self.cfg.queue_port}")
        self.pull.consume(self.callback)


def run_worker(cfg: Optional[ServeConfig] = None) -> None:
    from vct.utils.compilecache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = cfg or ServeConfig(
        model_path=os.environ.get("MODEL_PATH", ""),
        sampling_method=os.environ.get("SAMPLING_METHOD", "uniform"),
        sequence_length=int(os.environ.get("SEQUENCE_LENGTH", "60")),
        video_dir=os.environ.get("VIDEO_DIR", "/tmp/vct_videos"),
        queue_port=int(os.environ.get("QUEUE_PORT", "54000")),
        app_stage=os.environ.get("APP_STAGE", "devel"),
        backend_base_url=os.environ.get("BACKEND_URL", ""),
    )
    Worker(cfg).run()


if __name__ == "__main__":
    run_worker()
