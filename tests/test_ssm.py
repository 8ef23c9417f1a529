"""Selective-scan SSM tests.

The golden reference is an independent numpy implementation of the recurrence
documented for ``ParallelMamba`` (``medsos_lrcn/src/models.py:47-71``):

    h_t = exp(Δ_t ⊗ A) ⊙ h_{t-1} + (Δ_t ⊙ u_t) ⊗ B_t,   y_t = ⟨h_t, C_t⟩

plus a full-mixer parity test against a torch module built from the same
documented equations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct.models.ssm import ParallelMamba, causal_depthwise_conv1d, selective_scan

torch = pytest.importorskip("torch")


def numpy_selective_scan(u, delta, A, B, C, reverse=False):
    u, delta, B, C = [np.asarray(v, np.float64) for v in (u, delta, B, C)]
    A = np.asarray(A, np.float64)
    if reverse:
        # Reference backward-direction semantics (models.py:51-53): flip
        # ONLY u and delta; B and C stay in forward time order.
        u, delta = u[:, ::-1], delta[:, ::-1]
    Bb, L, D = u.shape
    N = A.shape[1]
    dA = np.exp(delta[..., None] * A[None, None])  # (B,L,D,N)
    dBu = delta[..., None] * B[:, :, None, :] * u[..., None]
    h = np.zeros((Bb, D, N))
    ys = []
    for t in range(L):
        h = dA[:, t] * h + dBu[:, t]
        ys.append(np.einsum("bdn,bn->bd", h, C[:, t]))
    y = np.stack(ys, axis=1)
    return y[:, ::-1] if reverse else y


def _rand_inputs(B=2, L=9, D=6, N=4, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randn(B, L, D).astype(np.float32)
    delta = np.abs(rng.randn(B, L, D)).astype(np.float32) * 0.5
    A = -np.abs(rng.randn(D, N)).astype(np.float32)
    Bm = rng.randn(B, L, N).astype(np.float32)
    C = rng.randn(B, L, N).astype(np.float32)
    return u, delta, A, Bm, C


@pytest.mark.parametrize("impl", ["associative", "scan"])
@pytest.mark.parametrize("reverse", [False, True])
def test_selective_scan_matches_numpy(impl, reverse):
    u, delta, A, B, C = _rand_inputs()
    want = numpy_selective_scan(u, delta, A, B, C, reverse=reverse)
    got = selective_scan(
        *map(jnp.asarray, (u, delta, A, B, C)), reverse=reverse, impl=impl
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_associative_equals_sequential_long():
    u, delta, A, B, C = _rand_inputs(B=1, L=257, D=4, N=3, seed=3)
    a = selective_scan(*map(jnp.asarray, (u, delta, A, B, C)), impl="associative")
    s = selective_scan(*map(jnp.asarray, (u, delta, A, B, C)), impl="scan")
    np.testing.assert_allclose(np.asarray(a), np.asarray(s), atol=1e-4, rtol=1e-4)


def test_causal_conv_matches_torch():
    B, L, D, K = 2, 11, 5, 3
    rng = np.random.RandomState(0)
    x = rng.randn(B, L, D).astype(np.float32)
    w = rng.randn(D, 1, K).astype(np.float32)  # torch conv1d layout
    b = rng.randn(D).astype(np.float32)

    conv = torch.nn.Conv1d(D, D, K, groups=D, padding=K - 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        # reference truncates to L after padded conv (models.py:83-85)
        t_out = conv(torch.from_numpy(x).permute(0, 2, 1))[:, :, :L].permute(0, 2, 1)

    ours = causal_depthwise_conv1d(
        jnp.asarray(x), jnp.asarray(w[:, 0, :].T), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(ours), t_out.numpy(), atol=1e-5, rtol=1e-5)


class TorchMambaMixer(torch.nn.Module):
    """Independent torch build of the documented mixer equations
    (in_proj → causal depthwise conv → SiLU → (Δ,B,C) → scan → gate → out)."""

    def __init__(self, d_model, d_inner, n_state, dt_rank, k=3, bidirectional=False):
        super().__init__()
        self.d_inner, self.n_state, self.dt_rank = d_inner, n_state, dt_rank
        self.bidirectional = bidirectional
        self.A_log = torch.nn.Parameter(torch.randn(d_inner, n_state))
        self.in_proj = torch.nn.Linear(d_model, 2 * d_inner)
        self.conv = torch.nn.Conv1d(d_inner, d_inner, k, groups=d_inner, padding=k - 1)
        self.x_proj = torch.nn.Linear(d_inner, dt_rank + 2 * n_state, bias=False)
        self.dt_proj = torch.nn.Linear(dt_rank, d_inner)
        self.out_proj = torch.nn.Linear(d_inner * (2 if bidirectional else 1), d_model)

    def scan(self, u, delta, A, B, C, reverse):
        idx = torch.arange(u.shape[1] - 1, -1, -1)
        if reverse:
            # models.py:51-53: only u and delta flip for the backward pass.
            u, delta = u[:, idx], delta[:, idx]
        dA = torch.exp(delta.unsqueeze(-1) * A)
        dBu = delta.unsqueeze(-1) * B.unsqueeze(2) * u.unsqueeze(-1)
        h = torch.zeros(u.shape[0], u.shape[2], A.shape[1])
        ys = []
        for t in range(u.shape[1]):
            h = dA[:, t] * h + dBu[:, t]
            ys.append(torch.einsum("bdn,bn->bd", h, C[:, t]))
        y = torch.stack(ys, dim=1)
        return y[:, idx] if reverse else y

    def forward(self, x):
        L = x.shape[1]
        u, res = self.in_proj(x).split(self.d_inner, dim=-1)
        u = self.conv(u.permute(0, 2, 1))[:, :, :L].permute(0, 2, 1)
        u = torch.nn.functional.silu(u)
        dbc = self.x_proj(u)
        dt, B, C = dbc.split([self.dt_rank, self.n_state, self.n_state], dim=-1)
        delta = torch.nn.functional.softplus(self.dt_proj(dt))
        A = -torch.exp(self.A_log)
        y = self.scan(u, delta, A, B, C, reverse=False)
        if self.bidirectional:
            y = torch.cat([y, self.scan(u, delta, A, B, C, reverse=True)], dim=-1)
            res = torch.cat([res, res], dim=-1)
        return self.out_proj(y * torch.nn.functional.silu(res))


def _port_mixer(t):
    return {
        "A_log": t.A_log.detach().numpy(),
        "D": np.zeros(t.d_inner, np.float32),  # unused in compute
        "in_proj": {"kernel": t.in_proj.weight.detach().numpy().T,
                    "bias": t.in_proj.bias.detach().numpy()},
        "conv_kernel": t.conv.weight.detach().numpy()[:, 0, :].T,
        "conv_bias": t.conv.bias.detach().numpy(),
        "x_proj": {"kernel": t.x_proj.weight.detach().numpy().T},
        "dt_proj": {"kernel": t.dt_proj.weight.detach().numpy().T,
                    "bias": t.dt_proj.bias.detach().numpy()},
        "out_proj": {"kernel": t.out_proj.weight.detach().numpy().T,
                     "bias": t.out_proj.bias.detach().numpy()},
    }


@pytest.mark.parametrize("bidirectional", [False, True])
def test_full_mixer_matches_torch(bidirectional):
    D_MODEL, D_INNER, N, R, B, L = 8, 16, 4, 4, 2, 10
    torch.manual_seed(0)
    t_mod = TorchMambaMixer(D_MODEL, D_INNER, N, R, bidirectional=bidirectional)
    x = np.random.RandomState(1).randn(B, L, D_MODEL).astype(np.float32)
    with torch.no_grad():
        want = t_mod(torch.from_numpy(x)).numpy()

    ours = ParallelMamba(
        d_model=D_MODEL, d_inner=D_INNER, n_state=N, dt_rank=R,
        bidirectional=bidirectional,
    )
    params = jax.tree_util.tree_map(jnp.asarray, _port_mixer(t_mod))
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)
