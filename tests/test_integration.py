"""Cross-layer integration: subprocess sweep mode (the stdout-contract RPC),
warm-start training, device-sampling deployment."""

import os
import sys

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_subprocess_sweep_scrapes_stdout(tmp_path):
    """SweepRunner(use_subprocess=True) launches python -m vct.train and
    extracts metrics with the reference's regexes — the full stdout-RPC
    path the reference automation depends on (runner.py:34-54)."""
    from vct.core.config import Config
    from vct.sweep.runner import SweepRunner
    from vct.sweep.store import SweepStore

    cfg = Config().replace(**{
        "data.synthetic": "true",
        "data.synthetic_samples": "16",
        "data.sequence_length": "3",
        "data.img_height": "24",
        "data.img_width": "24",
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "lstm",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "train.epochs": "1",
        "train.batch_size": "8",
        "train.save_model": "false",
        "sweep.checkpoint_file": str(tmp_path / "ckpt.json"),
        "sweep.best_model_dir": str(tmp_path / "best"),
        "sweep.log_file": str(tmp_path / "log.txt"),
        "sweep.f1_threshold": "-1.0",
    })
    runner = SweepRunner(
        cfg, store=SweepStore(cfg.sweep.checkpoint_file), use_subprocess=True
    )
    f1, _ = runner.run_training({}, test_runs=1)
    assert 0.0 <= f1 <= 1.0
    results = runner.store.load()
    assert len(results) == 1
    assert "training_duration" in results[0]["metrics"]
    log = open(cfg.sweep.log_file).read()
    assert "Overall Accuracy:" in log  # child stdout captured to the log


@pytest.mark.slow
def test_warm_start_init_from(tmp_path):
    from vct.core.config import Config
    from vct.data.synthetic import generate_dummy_data
    from vct.train.checkpoint import save_checkpoint
    from vct.train.engine import Trainer

    base = {
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "1", "train.save_model": "false",
    }
    cfg = Config().replace(**base)
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state, _ = tr.fit(state, x, y, log=False)
    ckpt = str(tmp_path / "warm")
    save_checkpoint(
        ckpt,
        {"params": jax.device_get(state.params), **jax.device_get(state.extra_vars)},
        cfg, names,
    )

    cfg2 = Config().replace(**{**base, "train.init_from": ckpt})
    tr2 = Trainer(cfg2, names)
    state2 = tr2.init_state(jax.random.PRNGKey(123), x)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(state2.params)),
    ):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_remat_backbone_identical_loss():
    """finetune + remat_backbone must change memory, not math."""
    from vct.core.config import Config
    from vct.data.synthetic import generate_dummy_data
    from vct.train.engine import Trainer

    base = {
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "model.finetune": "true",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "1", "train.save_model": "false",
    }
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    losses = {}
    for remat in ("false", "true"):
        cfg = Config().replace(**{**base, "model.remat_backbone": remat})
        tr = Trainer(cfg, names)
        state = tr.init_state(jax.random.PRNGKey(0), x)
        _, run = tr.fit(state, x, y, log=False)
        losses[remat] = run.epoch_losses[0]
    assert losses["false"] == pytest.approx(losses["true"], abs=1e-5)


def test_process_shard_partitions():
    from vct.parallel.multihost import process_shard

    parts = [process_shard(11, i, 4).tolist() for i in range(4)]
    flat = sum(parts, [])
    assert sorted(flat) == list(range(11))
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


@pytest.mark.slow
def test_epoch_resume_after_crash(tmp_path):
    """Train 1 of 3 epochs, 'crash', resume: continues at epoch 2 with the
    optimizer state intact and matches an uninterrupted 3-epoch run."""
    from vct.core.config import Config
    from vct.data.synthetic import generate_dummy_data
    from vct.train.engine import Trainer

    base = {
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.save_model": "false", "train.resume": "true",
        "train.model_path": str(tmp_path / "resume"),
        "mesh.donate": "false",
    }
    x, y, names = generate_dummy_data(16, 4, 32, 32, 4)

    # uninterrupted 3-epoch reference run (no resume side effects)
    cfg_ref = Config().replace(**{**base, "train.epochs": "3",
                                  "train.resume": "false"})
    tr_ref = Trainer(cfg_ref, names)
    s_ref = tr_ref.init_state(jax.random.PRNGKey(0), x)
    _, run_ref = tr_ref.fit(s_ref, x, y, log=False)

    # epoch 1, then crash
    cfg1 = Config().replace(**{**base, "train.epochs": "1"})
    tr1 = Trainer(cfg1, names)
    s1 = tr1.init_state(jax.random.PRNGKey(0), x)
    _, run1 = tr1.fit(s1, x, y, log=False)

    # fresh process: resume to 3 epochs
    cfg2 = Config().replace(**{**base, "train.epochs": "3"})
    tr2 = Trainer(cfg2, names)
    s2 = tr2.init_state(jax.random.PRNGKey(0), x)
    _, run2 = tr2.fit(s2, x, y, log=False)
    # The resumed run restores the pre-crash epoch history from the
    # checkpoint, so its RunMetrics cover the whole 3-epoch run.
    assert len(run2.epoch_losses) == 3
    assert run2.epoch_losses[0] == run1.epoch_losses[0]
    np.testing.assert_allclose(run2.epoch_losses, run_ref.epoch_losses,
                               rtol=1e-4)


@pytest.mark.slow
def test_dryrun_multichip_contract():
    """The driver's multichip dry run compiles + executes on this mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """dryrun_multichip must pass in the DEFAULT machine env (no cpu mesh
    pre-provisioned): it re-execs itself onto a scrubbed virtual-CPU child.

    Round-1 driver run failed exactly here (MULTICHIP_r01.json rc=1): the
    entry assumed the caller had already set up an 8-device backend."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Simulate the driver's default env: no cpu platform pin, no virtual
    # device count, no test-harness markers.
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "VCT_TEST_REEXEC", "VCT_TEST_TPU"):
        env.pop(k, None)
    env["PYTHONPATH"] = repo
    p = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "dryrun_multichip ok" in p.stdout


@pytest.mark.slow
def test_dryrun_multihost_two_ranks():
    """The multi-PROCESS path actually executes: 2 jax.distributed ranks
    (Gloo over localhost) x 4 virtual CPU devices run one sharded train step
    through put_sharded's make_array_from_process_local_data branch
    (vct/parallel/mesh.py), process_shard disjoint data loading, and the
    collective checkpoint save with is_primary-gated fs writes."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "VCT_TEST_REEXEC", "VCT_TEST_TPU"):
        env.pop(k, None)
    env["PYTHONPATH"] = repo
    p = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multihost(2, 4)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "dryrun_multihost ok" in p.stdout


def test_device_sampling_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from vct.serve.deployment import _load_with_device_sampling

    d = tmp_path / "vids"
    d.mkdir()
    rng = np.random.RandomState(0)
    for name, frames in (("long.mp4", 20), ("short.mp4", 3)):
        w = cv2.VideoWriter(str(d / name), cv2.VideoWriter_fourcc(*"mp4v"),
                            10.0, (32, 32))
        for _ in range(frames):
            w.write(rng.randint(0, 256, (32, 32, 3), np.uint8))
        w.release()
    clips, names = _load_with_device_sampling(str(d), "ssim", 6, 32, 32)
    assert names == ["long.mp4", "short.mp4"]
    assert clips.shape == (2, 6, 32, 32, 3)
    assert clips.dtype == np.float32
    assert float(clips.max()) <= 1.0


@pytest.mark.slow
def test_seq_shard_parity():
    """dp+tp+sp sharded step equals the unsharded loss (4x2 mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp

    from vct.core.config import Config
    from vct.data.synthetic import generate_dummy_data
    from vct.parallel.mesh import make_mesh, shard_batch
    from vct.train.engine import Trainer

    base = {
        "model.cnn_backbone": "resnet18", "model.rnn_type": "mamba",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "mesh.donate": "false",
    }
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    losses = {}
    for ss in ("false", "true"):
        cfg = Config().replace(**{**base, "model.seq_shard": ss})
        tr = Trainer(cfg, names, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0), x)
        step = tr._build_train_step()
        xb, yb, mb = shard_batch(
            (jnp.asarray(x), jnp.asarray(y), jnp.ones(8, jnp.float32)), mesh
        )
        _, loss, _, _ = step(state, xb, yb, mb)
        losses[ss] = float(loss)
    assert losses["false"] == pytest.approx(losses["true"], abs=1e-4)
