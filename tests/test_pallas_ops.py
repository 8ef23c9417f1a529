"""Pallas kernel tests (run in interpret mode on CPU; compiled on TPU with
VCT_TEST_TPU=1). Golden reference = the XLA implementations that are
themselves golden-tested against torch / numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct.models.ssm import selective_scan
from vct.ops.lstm_pallas import (
    gru_scan_pallas,
    gru_stack_pallas,
    lstm_scan_pallas,
    lstm_stack_pallas,
    _gru_ref,
    _gru_stack_ref,
    _lstm_ref,
    _lstm_stack_ref,
)
from vct.ops.preprocess_pallas import normalize_frames_pallas


def _ssm_inputs(B=2, L=12, D=8, N=4, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, L, D), jnp.float32),
        jnp.asarray(np.abs(rng.randn(B, L, D)) * 0.5, jnp.float32),
        jnp.asarray(-np.abs(rng.randn(D, N)), jnp.float32),
        jnp.asarray(rng.randn(B, L, N), jnp.float32),
        jnp.asarray(rng.randn(B, L, N), jnp.float32),
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_selective_scan_pallas_matches_associative(reverse):
    args = _ssm_inputs()
    want = selective_scan(*args, reverse=reverse, impl="associative")
    got = selective_scan(*args, reverse=reverse, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_selective_scan_pallas_grad():
    args = _ssm_inputs(B=1, L=6, D=4, N=3)

    def loss(impl):
        def f(u, delta, A, B, C):
            return jnp.sum(selective_scan(u, delta, A, B, C, impl=impl) ** 2)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    for gp, ga in zip(loss("pallas"), loss("associative")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ga), atol=1e-3, rtol=1e-3)


def test_lrcn_mamba_pallas_impl_matches():
    from vct.core.config import ModelConfig
    from vct.models import build_model

    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 32, 3), jnp.float32)
    outs = {}
    for impl in ("associative", "pallas"):
        cfg = ModelConfig(
            num_classes=4, cnn_backbone="resnet18", rnn_type="mamba",
            rnn_input_size=8, rnn_layer=2, scan_impl=impl,
        )
        model = build_model(cfg, 4)
        variables = model.init(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(outs["pallas"], outs["associative"], atol=1e-4)


@pytest.mark.parametrize("op,ref,gates", [
    (lstm_scan_pallas, _lstm_ref, 4),
    (gru_scan_pallas, _gru_ref, 3),
])
def test_rnn_pallas_matches_ref(op, ref, gates):
    B, T, H = 2, 9, 6
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(B, T, gates * H), jnp.float32)
    w_hh = jnp.asarray(rng.randn(H, gates * H) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.randn(gates * H) * 0.1, jnp.float32)
    got = op(xp, w_hh, b_hh)
    want = ref(xp, w_hh, b_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    # gradients flow through the custom_vjp
    g = jax.grad(lambda *a: jnp.sum(op(*a) ** 2), argnums=(0, 1, 2))(xp, w_hh, b_hh)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(xp, w_hh, b_hh)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_lstm_module_pallas_impl_matches_torch_layout():
    """The flax LSTM with scan_impl=pallas equals the lax.scan path."""
    from vct.models.recurrent import LSTM

    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, 5), jnp.float32)
    m_scan = LSTM(hidden_size=6, num_layers=2, bidirectional=True, scan_impl="scan")
    params = m_scan.init(jax.random.PRNGKey(0), x)
    m_pal = LSTM(hidden_size=6, num_layers=2, bidirectional=True, scan_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(m_pal.apply(params, x)),
        np.asarray(m_scan.apply(params, x)),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("op,ref,gates", [
    (lstm_stack_pallas, _lstm_stack_ref, 4),
    (gru_stack_pallas, _gru_stack_ref, 3),
])
@pytest.mark.slow
def test_rnn_stack_pallas_matches_ref(op, ref, gates):
    B, T, H, L = 2, 9, 6, 3
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.randn(B, T, gates * H), jnp.float32),
        jnp.asarray(rng.randn(L, H, gates * H) * 0.3, jnp.float32),
        jnp.asarray(rng.randn(L, gates * H) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(L - 1, H, gates * H) * 0.3, jnp.float32),
        jnp.asarray(rng.randn(L - 1, gates * H) * 0.1, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(op(*args)), np.asarray(ref(*args)), atol=1e-5, rtol=1e-5
    )
    g = jax.grad(lambda *a: jnp.sum(op(*a) ** 2), argnums=tuple(range(5)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(5)))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cls_name", ["LSTM", "GRU"])
@pytest.mark.slow
def test_rnn_module_fused_stack_matches_scan(cls_name):
    """Unidirectional multi-layer scan_impl=pallas takes the single-launch
    fused-stack kernel; same params (identical names/shapes) -> same output."""
    from vct.models import recurrent

    cls = getattr(recurrent, cls_name)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, 5), jnp.float32)
    m_scan = cls(hidden_size=6, num_layers=3, scan_impl="scan")
    params = m_scan.init(jax.random.PRNGKey(0), x)
    m_pal = cls(hidden_size=6, num_layers=3, scan_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(m_pal.apply(params, x)),
        np.asarray(m_scan.apply(params, x)),
        atol=1e-5, rtol=1e-5,
    )
    # gradients flow (custom_vjp remat path) and match the scan path
    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g_pal = jax.grad(loss(m_pal))(params)
    g_scan = jax.grad(loss(m_scan))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        ),
        g_pal, g_scan,
    )


def test_normalize_frames_pallas():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (2, 3, 8, 8, 3), np.uint8)
    out = normalize_frames_pallas(jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(out), raw / 255.0, atol=1e-6)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out2 = normalize_frames_pallas(jnp.asarray(raw), mean, std)
    np.testing.assert_allclose(
        np.asarray(out2), (raw / 255.0 - mean) / std, atol=1e-5
    )


def test_ssim_pair_scores_matches_xla():
    """The one-pass Pallas SSIM scorer vs the XLA `_device_ssim` reference
    (itself skimage-golden-tested in test_data.py) — values to ~1e-6 and
    identical rankings, including non-tile-aligned frame sizes, for BOTH
    kernel layouts (chunked whole-clip default; per-pair big-clip fallback
    via a tiny _CLIP_VMEM_BYTES monkeypatch). The same matrix (plus odd-H /
    sub-vreg-width shapes) holds COMPILED on the real chip against an
    f32-precision reference — on TPU the XLA reference's default conv
    precision is bf16-class, so kernel-vs-XLA deltas there are the
    reference degrading, not the kernel."""
    from vct.data.samplers import _device_ssim
    from vct.ops import ssim_pallas

    rng = np.random.RandomState(0)
    old = ssim_pallas._CLIP_VMEM_BYTES
    for budget in (old, 0):
        ssim_pallas._CLIP_VMEM_BYTES = budget
        # the layout choice is baked in at trace time — retrace per budget
        ssim_pallas.ssim_pair_scores.clear_cache()
        try:
            for shape in ((2, 11, 16, 43, 3), (1, 5, 9, 11, 3),
                          (3, 4, 8, 128, 1), (2, 6, 8, 8, 3)):
                clips = rng.randint(0, 256, shape, np.uint8)
                got = np.asarray(ssim_pallas.ssim_pair_scores(jnp.asarray(clips)))
                # pin the REFERENCE to f32: on the VCT_TEST_TPU=1 lane the
                # XLA conv default is bf16-class and the reference (not the
                # exact kernel) would be the side off by ~1e-3
                with jax.default_matmul_precision("float32"):
                    want = np.stack([
                        np.asarray(_device_ssim(
                            jnp.asarray(c[:-1], jnp.float32),
                            jnp.asarray(c[1:], jnp.float32),
                        ))
                        for c in clips
                    ])
                np.testing.assert_allclose(
                    got, want, atol=2e-6, err_msg=f"{shape} budget={budget}"
                )
                for g, w in zip(got, want):
                    np.testing.assert_array_equal(np.argsort(g), np.argsort(w))
        finally:
            ssim_pallas._CLIP_VMEM_BYTES = old


def test_pair_scores_matches_xla():
    """The chunked Pallas SAD/flow scorer vs the XLA `device_frame_scores`
    reference (itself host-golden-tested in test_data.py): sad bit-exact
    (integer accumulation), flow to 1e-6 (f32 accumulation, different
    order). Shapes cover both kernel layouts — the whole-clip layout and,
    via a tiny _CLIP_VMEM_BYTES monkeypatch, the blocked two-view layout
    with a ragged final block — plus L<2 and chunk-boundary L values."""
    from vct.data.samplers import device_frame_scores
    from vct.ops import pair_scores_pallas

    rng = np.random.RandomState(1)
    for shape in ((2, 7, 16, 16, 3), (1, 18, 9, 11, 3), (3, 17, 8, 8, 1)):
        clips = rng.randint(0, 256, shape, np.uint8)
        for method in ("sad", "flow"):
            got = np.asarray(
                pair_scores_pallas.pair_scores(jnp.asarray(clips), method)
            )
            want = np.stack([
                np.asarray(device_frame_scores(jnp.asarray(c), method))
                for c in clips
            ])
            if method == "sad":
                np.testing.assert_array_equal(got, want, err_msg=str(shape))
            else:
                np.testing.assert_allclose(
                    got, want, rtol=1e-6, err_msg=str(shape)
                )
    assert pair_scores_pallas.pair_scores(
        jnp.zeros((2, 1, 4, 4, 3), jnp.uint8)).shape == (2, 0)
    with pytest.raises(TypeError, match="integer"):
        pair_scores_pallas.pair_scores(jnp.zeros((1, 3, 4, 4, 3)))

    from vct.ops.ssim_pallas import ssim_pair_scores

    with pytest.raises(TypeError, match="integer"):
        ssim_pair_scores(jnp.zeros((1, 3, 4, 4, 3)))

    # blocked layout (big-clip fallback), incl. the ragged final block
    old = pair_scores_pallas._CLIP_VMEM_BYTES
    pair_scores_pallas._CLIP_VMEM_BYTES = 0
    try:
        clips = rng.randint(0, 256, (2, 20, 12, 10, 3), np.uint8)
        for method in ("sad", "flow"):
            got = np.asarray(
                pair_scores_pallas.pair_scores(jnp.asarray(clips), method)
            )
            want = np.stack([
                np.asarray(device_frame_scores(jnp.asarray(c), method))
                for c in clips
            ])
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=method)
    finally:
        pair_scores_pallas._CLIP_VMEM_BYTES = old


def test_device_sample_clips_float_frames_route_to_xla():
    """[0,1]-scaled FLOAT frames must select the same frames the XLA scorer
    would: the Pallas kernels widen through int32, which floors non-integer
    values (a [0,1] frame would score near zero and select garbage), so
    device_sample_clips routes non-integer dtypes to the XLA path.
    Regression for a round-5 review finding."""
    from vct.data.preprocess import device_sample_clips, preprocess_clips
    from vct.data.samplers import device_frame_scores, device_topk_indices

    rng = np.random.RandomState(3)
    raw8 = rng.randint(0, 256, (2, 10, 12, 12, 3), np.uint8)
    rawf = jnp.asarray(raw8, jnp.float32) / 255.0  # non-integer values
    T = 4
    for method, style in (("sad", "script"), ("flow", "script"),
                          ("ssim", "canonical")):
        got = device_sample_clips(rawf, T, method=method)
        scores = jax.vmap(lambda c: device_frame_scores(c, method))(rawf)
        idx = jax.vmap(lambda s: device_topk_indices(s, T, style))(scores)
        want = preprocess_clips(
            jnp.take_along_axis(rawf, idx[:, :, None, None, None], axis=1)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6, err_msg=method
        )
