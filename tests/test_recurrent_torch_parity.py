"""Golden-value tests: our fused LSTM/GRU scans must match torch.nn.LSTM/GRU
(the reference's temporal heads, ``medsos_lrcn/src/models.py:155-170``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vct.models.recurrent import GRU, LSTM  # noqa: E402


def _port_torch_rnn(t_rnn, num_layers, bidirectional):
    """Map torch LSTM/GRU weights into our param dict (transposed layout)."""
    params = {}
    for layer in range(num_layers):
        for suffix in ([""] if not bidirectional else ["", "_reverse"]):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                t = getattr(t_rnn, f"{kind}_l{layer}{suffix}").detach().numpy()
                if kind.startswith("weight"):
                    t = t.T  # torch (G*H, in) -> ours (in, G*H)
                params[f"{kind}_l{layer}{suffix}"] = jnp.asarray(t)
    return {"params": params}


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 3])
def test_lstm_matches_torch(num_layers, bidirectional):
    B, T, IN, H = 2, 7, 5, 6
    torch.manual_seed(0)
    t_rnn = torch.nn.LSTM(IN, H, num_layers=num_layers,
                          bidirectional=bidirectional, batch_first=True)
    x = np.random.RandomState(1).randn(B, T, IN).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))

    ours = LSTM(hidden_size=H, num_layers=num_layers, bidirectional=bidirectional)
    out = ours.apply(_port_torch_rnn(t_rnn, num_layers, bidirectional), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 3])
def test_gru_matches_torch(num_layers, bidirectional):
    B, T, IN, H = 2, 7, 5, 6
    torch.manual_seed(0)
    t_rnn = torch.nn.GRU(IN, H, num_layers=num_layers,
                         bidirectional=bidirectional, batch_first=True)
    x = np.random.RandomState(1).randn(B, T, IN).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))

    ours = GRU(hidden_size=H, num_layers=num_layers, bidirectional=bidirectional)
    out = ours.apply(_port_torch_rnn(t_rnn, num_layers, bidirectional), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5, rtol=1e-5)


def test_lstm_grad_flows():
    B, T, IN, H = 2, 5, 4, 3
    model = LSTM(hidden_size=H, num_layers=1)
    x = jnp.ones((B, T, IN))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in flat)
    assert any(jnp.any(leaf != 0) for leaf in flat)
