"""LSTM / GRU temporal heads — TPU-native fused scan.

Matches torch ``nn.LSTM`` / ``nn.GRU`` semantics as used by the reference's
LRCN (``medsos_lrcn/src/models.py:155-170``): batch-first, multi-layer,
optionally bidirectional, gate orders [i, f, g, o] (LSTM) and [r, z, n] (GRU),
two bias vectors per layer (torch layout, kept so torch state_dicts can be
ported 1:1).

TPU design: the input projection for *all* timesteps is hoisted out of the
recurrence into one large (B·T, in) x (in, G·H) matmul that XLA tiles onto the
MXU; the ``lax.scan`` body then carries only the hidden-state matmul and the
element-wise gate math (VPU). A fully fused Pallas variant that keeps h/c
resident in VMEM across timesteps lives in ``vct.ops.lstm_pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LSTM", "GRU", "RNNStack"]


def _lstm_scan(x_proj, w_hh, b_hh, h0, c0, reverse=False):
    """x_proj: (B, T, 4H) precomputed input contribution; returns (B, T, H)."""
    H = h0.shape[-1]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.moveaxis(x_proj, 1, 0)  # (T, B, 4H)
    (_, _), ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    del H
    return jnp.moveaxis(ys, 0, 1)


def _gru_scan(x_proj, w_hh, b_hh, h0, reverse=False):
    """x_proj: (B, T, 3H); torch GRU: n = tanh(xn + r*(W_hn h + b_hn))."""

    def step(h, xp_t):
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(h @ w_hh + b_hh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    xs = jnp.moveaxis(x_proj, 1, 0)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.moveaxis(ys, 0, 1)


class _RecurrentBase(nn.Module):
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    scan_impl: str = "scan"  # scan | pallas

    n_gates: int = 0  # overridden

    def _param(self, name, layer, suffix, shape):
        """torch-convention param: ``{name}_l{layer}{suffix}`` with the
        U(-1/sqrt(H), 1/sqrt(H)) init — the ONE place both the layered and
        fused paths get their (checkpoint-interchangeable) parameters."""
        k = float(self.hidden_size) ** -0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        return self.param(f"{name}_l{layer}{suffix}", init, shape)

    def _direction(self, x, layer, suffix, reverse):
        """One direction of one layer. x: (B, T, in)."""
        in_size = x.shape[-1]
        H, G = self.hidden_size, self.n_gates

        def p(name, shape):
            return self._param(name, layer, suffix, shape)

        w_ih = p("weight_ih", (in_size, G * H))
        w_hh = p("weight_hh", (H, G * H))
        b_ih = p("bias_ih", (G * H,))
        b_hh = p("bias_hh", (G * H,))

        x_proj = x @ w_ih + b_ih  # (B, T, G*H) — single MXU matmul over B·T
        B = x.shape[0]
        if self.scan_impl == "pallas":
            from vct.ops.lstm_pallas import gru_scan_pallas, lstm_scan_pallas

            xp = jnp.flip(x_proj, axis=1) if reverse else x_proj
            op = lstm_scan_pallas if self.n_gates == 4 else gru_scan_pallas
            y = op(xp, w_hh, b_hh)
            return jnp.flip(y, axis=1) if reverse else y
        # Carry dtype must match the step's promoted dtype (f32 params
        # promote bf16 inputs), or lax.scan rejects the carry.
        h0 = jnp.zeros((B, H), dtype=x_proj.dtype)
        if self.n_gates == 4:
            c0 = jnp.zeros((B, H), dtype=x_proj.dtype)
            return _lstm_scan(x_proj, w_hh, b_hh, h0, c0, reverse=reverse)
        return _gru_scan(x_proj, w_hh, b_hh, h0, reverse=reverse)

    def _fused_stack(self, x):
        """The whole unidirectional stack in ONE Pallas launch: layer-0 input
        projection hoisted to a single MXU matmul, every inter-layer hop a
        VMEM-resident matmul inside the kernel (``vct.ops.lstm_pallas``
        stack kernels). Parameter names/shapes are identical to the layered
        path, so checkpoints are interchangeable between the two."""
        from vct.ops.lstm_pallas import gru_stack_pallas, lstm_stack_pallas

        in_size = x.shape[-1]
        H, G = self.hidden_size, self.n_gates

        def p(name, layer, shape):
            return self._param(name, layer, "", shape)

        w_ih0 = p("weight_ih", 0, (in_size, G * H))
        b_ih0 = p("bias_ih", 0, (G * H,))
        w_hh = [p("weight_hh", 0, (H, G * H))]
        b_hh = [p("bias_hh", 0, (G * H,))]
        w_ih, b_ih = [], []
        for layer in range(1, self.num_layers):
            w_ih.append(p("weight_ih", layer, (H, G * H)))
            b_ih.append(p("bias_ih", layer, (G * H,)))
            w_hh.append(p("weight_hh", layer, (H, G * H)))
            b_hh.append(p("bias_hh", layer, (G * H,)))

        xp0 = x @ w_ih0 + b_ih0  # (B, T, G*H) — one MXU matmul over B·T
        op = lstm_stack_pallas if self.n_gates == 4 else gru_stack_pallas
        # No cast back to x.dtype: every scan_impl/num_layers path returns
        # the kernel's float32, so output dtype never depends on dispatch.
        return op(
            xp0,
            jnp.stack(w_hh),
            jnp.stack(b_hh),
            jnp.stack(w_ih),
            jnp.stack(b_ih),
        )

    @nn.compact
    def __call__(self, x, return_final: bool = False):
        """x (B, T, in) -> outputs (B, T, H[*2 if bidir]).

        ``return_final=True`` additionally returns the per-layer final
        hidden states (B, num_layers, H) — torch's ``h_n`` with the layer
        axis moved behind batch (for GRU, layer l's final hidden IS its
        last output; for LSTM this is h, not the cell state c).
        Unidirectional only (the caption encoders that need it are)."""
        if return_final and self.bidirectional:
            raise ValueError("return_final supports unidirectional RNNs only")
        if (
            self.scan_impl == "pallas"
            and not self.bidirectional
            and self.num_layers >= 2
            and not return_final
        ):
            return self._fused_stack(x)
        finals = []
        for layer in range(self.num_layers):
            fwd = self._direction(x, layer, "", reverse=False)
            if self.bidirectional:
                bwd = self._direction(x, layer, "_reverse", reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            finals.append(x[:, -1, :])
        if return_final:
            return x, jnp.stack(finals, axis=1)  # (B, L, H)
        return x


class LSTM(_RecurrentBase):
    n_gates: int = 4


class GRU(_RecurrentBase):
    n_gates: int = 3


class RNNStack(nn.Module):
    """String-dispatched temporal head: lstm | gru (models.py:155-170)."""

    rnn_type: str
    hidden_size: int
    num_layers: int
    bidirectional: bool = False
    scan_impl: str = "scan"

    @nn.compact
    def __call__(self, x):
        cls = {"lstm": LSTM, "gru": GRU}[self.rnn_type]
        return cls(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            scan_impl=self.scan_impl,
            name=self.rnn_type,
        )(x)
