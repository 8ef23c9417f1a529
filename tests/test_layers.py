import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct.models.layers import (
    AdaptDSL,
    CanonicalAdapter,
    MultiBinaryHead,
    MulticlassHead,
    RMSNorm,
    parse_adapt_mode,
)


def test_rmsnorm_math():
    x = np.random.RandomState(0).randn(2, 5, 8).astype(np.float32)
    m = RMSNorm(8)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_parse_adapt_modes():
    assert parse_adapt_mode("lnsd3") == ("lnsd", 3)
    assert parse_adapt_mode("lsnd4") == ("lsnd", 4)
    assert parse_adapt_mode("lgn") == ("lgn", 3)
    with pytest.raises(ValueError):
        parse_adapt_mode("lxz3")
    with pytest.raises(ValueError):
        parse_adapt_mode("nsd3")  # no linear


@pytest.mark.parametrize("mode", ["lnsd3", "lsnd3", "lnsd4", "lsnd4", "lgn2"])
def test_adapt_dsl_shapes(mode):
    x = jnp.ones((2, 4, 128))
    m = AdaptDSL(out_size=8, mode=mode)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(variables, x).shape == (2, 4, 8)


def test_canonical_adapter_shapes_and_halving():
    x = jnp.ones((2, 4, 512))
    m = CanonicalAdapter(out_size=8)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(variables, x).shape == (2, 4, 8)
    p = variables["params"]
    assert p["adapt1"]["kernel"].shape == (512, 256)
    assert p["adapt2"]["kernel"].shape == (256, 128)
    assert p["adapt3"]["kernel"].shape == (128, 8)


def test_heads():
    x = jnp.ones((2, 64))
    mc = MulticlassHead(num_classes=4)
    v = mc.init(jax.random.PRNGKey(0), x)
    assert mc.apply(v, x).shape == (2, 4)
    mb = MultiBinaryHead(num_classes=4)
    v = mb.init(jax.random.PRNGKey(0), x)
    assert mb.apply(v, x).shape == (2, 4)


def test_dropout_deterministic_vs_train():
    x = jnp.ones((2, 4, 64))
    m = CanonicalAdapter(out_size=8, dropout=0.5)
    variables = m.init(jax.random.PRNGKey(0), x)
    a = m.apply(variables, x, deterministic=True)
    b = m.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = m.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(a), np.asarray(c))
