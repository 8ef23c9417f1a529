"""Transformer captioner (the S2VT v1 variant) + frames-dir ingest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.caption.transformer import TransformerCaptioner
from vct.caption.vocab import Vocabulary


@pytest.fixture(scope="module")
def tformer():
    v = Vocabulary()
    v.build_vocabulary(["a man is cooking", "a dog runs"])
    model = TransformerCaptioner(
        vocab_size=len(v), cnn_backbone="resnet18", cnn_output_size=16,
        hidden_size=16, num_heads=2, num_layers=1, max_len=6,
    )
    videos = np.random.RandomState(0).rand(2, 3, 32, 32, 3).astype(np.float32)
    targets = np.array([[1, 4, 5, 6, 2, 0], [1, 4, 8, 9, 2, 0]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(videos),
                           jnp.asarray(targets))
    return model, variables, videos, targets, v


def test_teacher_forced_shapes(tformer):
    model, variables, videos, targets, v = tformer
    logp = model.apply(variables, jnp.asarray(videos), jnp.asarray(targets))
    assert logp.shape == (2, 6, len(v))
    np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4)


def test_causality(tformer):
    """Changing a later target token must not change earlier predictions."""
    model, variables, videos, targets, _ = tformer
    logp_a = model.apply(variables, jnp.asarray(videos), jnp.asarray(targets))
    targets_b = targets.copy()
    targets_b[:, 4] = 3  # perturb a late input token
    logp_b = model.apply(variables, jnp.asarray(videos), jnp.asarray(targets_b))
    # positions 0..4 consume inputs up to index 4 -> first 5 outputs depend
    # only on inputs [start, t0..t3], unchanged
    np.testing.assert_allclose(
        np.asarray(logp_a[:, :5]), np.asarray(logp_b[:, :5]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logp_a[:, 5]), np.asarray(logp_b[:, 5]))


def test_greedy_caption(tformer):
    model, variables, videos, _, _ = tformer
    tokens = model.apply(variables, jnp.asarray(videos), method=model.greedy_caption)
    assert tokens.shape == (2, 6)
    assert np.all(np.asarray(tokens)[:, 0] == 1)  # starts with <start>


@pytest.mark.slow
def test_transformer_trains():
    v = Vocabulary()
    v.build_vocabulary(["a man is cooking"])
    model = TransformerCaptioner(
        vocab_size=len(v), cnn_backbone="resnet18", cnn_output_size=16,
        hidden_size=16, num_heads=2, num_layers=1, max_len=5,
    )
    videos = np.random.RandomState(0).rand(2, 2, 32, 32, 3).astype(np.float32)
    targets = np.array([[1, 4, 5, 2, 0], [1, 4, 6, 2, 0]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(videos),
                           jnp.asarray(targets))
    import optax

    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])

    def loss_fn(params):
        logp = model.apply({**variables, "params": params},
                           jnp.asarray(videos), jnp.asarray(targets))
        tgt = jnp.asarray(targets)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = (tgt != 0).astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.sum(mask)

    params = variables["params"]
    losses = []
    step = jax.jit(lambda p, o: _update(p, o))

    def _update(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


class TestFramesIngest:
    @pytest.fixture(scope="class")
    def frames_dataset(self, tmp_path_factory):
        cv2 = pytest.importorskip("cv2")
        root = tmp_path_factory.mktemp("frames")
        rng = np.random.RandomState(0)
        for cls in ("Normal", "Theft"):
            d = root / cls
            d.mkdir()
            for vid in range(2):
                for fr in range(6):
                    img = rng.randint(0, 256, (24, 24, 3), np.uint8)
                    # reference naming: first two '_' tokens identify the
                    # video (e.g. Abuse001_x264_30.png -> "Abuse001_x264")
                    cv2.imwrite(str(d / f"video{vid}_x264_{fr}.png"), img)
        return str(root)

    def test_load_frames_dataset(self, frames_dataset):
        from vct.data.frames import load_frames_dataset

        x, y, classes = load_frames_dataset(
            frames_dataset, sequence_length=4, img_height=16, img_width=16
        )
        assert x.shape == (4, 4, 16, 16, 3)
        assert sorted(classes) == ["Normal", "Theft"]
        assert set(y.tolist()) == {0, 1}

    def test_zero_padding_short_videos(self, frames_dataset):
        from vct.data.frames import load_frames_dataset

        x, _, _ = load_frames_dataset(
            frames_dataset, sequence_length=10, img_height=16, img_width=16
        )
        # 6 real frames + 4 zero frames per clip (rgb_lrcn zero-pad semantics)
        assert x.shape[1] == 10
        assert np.allclose(x[0, 6:], 0.0)

    def test_preprocess_frames_dir(self, frames_dataset):
        import os

        from vct.data.frames import preprocess_frames_dir

        d = os.path.join(frames_dataset, "Normal")
        clip = preprocess_frames_dir(d, sequence_length=8, img_height=16, img_width=16)
        assert clip.shape == (1, 8, 16, 16, 3)

    def test_natural_sort(self):
        from vct.data.frames import natural_sort_key

        names = ["f_10.png", "f_2.png", "f_1.png"]
        assert sorted(names, key=natural_sort_key) == ["f_1.png", "f_2.png", "f_10.png"]
