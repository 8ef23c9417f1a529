"""Fused LSTM / GRU recurrence Pallas TPU kernels.

The temporal-head hot path of the LRCN family (``models.py:155-170``). The
input projection x @ W_ih for all timesteps is a single large MXU matmul and
stays *outside* the kernel (see ``vct.models.recurrent``); what the kernel
fuses is the sequential part — per-step hidden matmul + gate math — with the
carried state (h, c) resident in VMEM across all T steps, so the recurrence
touches HBM only to read the precomputed x-projection and write y:

    per step (kernel):  gates = x_proj[t] + h @ W_hh + b_hh     (MXU + VPU)
                        i,f,g,o -> c,h update                    (VPU)

Gate orders match torch ([i,f,g,o] LSTM / [r,z,n] GRU), so the same ported
weights drive either implementation bit-for-bit (within fp tolerance).

Backward: custom_vjp rematerializes with the ``lax.scan`` reference
implementation.

Measured on v5e at the reference's UCF50 config (B=32, T=40, H=56) the
``lax.scan`` path is ~2x faster than this kernel — the per-step hidden matmul
is far below MXU tile size and XLA's fused while-loop wins; the kernel pays
128-lane padding on H=56. It therefore defaults OFF (``scan_impl='scan'``);
it exists for large-H configs and as the substrate for a future multi-layer
fused variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_scan_pallas", "gru_scan_pallas"]


def _lstm_kernel(xp_ref, whh_ref, bhh_ref, y_ref, h_scr, c_scr):
    """xp (TB, T, 4H), whh (H, 4H), bhh (1, 4H), y (TB, T, H)."""
    T = xp_ref.shape[1]
    H = whh_ref.shape[0]

    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)

    def body(t, _):
        gates = (
            xp_ref[:, t, :]
            + jnp.dot(h_scr[:], whh_ref[:], preferred_element_type=jnp.float32)
            + bhh_ref[0, :]
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        c_scr[:] = c
        h_scr[:] = h
        y_ref[:, t, :] = h
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _gru_kernel(xp_ref, whh_ref, bhh_ref, y_ref, h_scr):
    """xp (TB, T, 3H), whh (H, 3H), bhh (1, 3H), y (TB, T, H).

    torch GRU: n = tanh(xn + r * (h @ W_hn + b_hn)).
    """
    T = xp_ref.shape[1]
    H = whh_ref.shape[0]

    h_scr[:] = jnp.zeros_like(h_scr)

    def body(t, _):
        hh = (
            jnp.dot(h_scr[:], whh_ref[:], preferred_element_type=jnp.float32)
            + bhh_ref[0, :]
        )
        xp = xp_ref[:, t, :]
        r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xp[:, H : 2 * H] + hh[:, H : 2 * H])
        n = jnp.tanh(xp[:, 2 * H :] + r * hh[:, 2 * H :])
        h = (1.0 - z) * n + z * h_scr[:]
        h_scr[:] = h
        y_ref[:, t, :] = h
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _run(kernel, n_gates, xp, w_hh, b_hh):
    B, T, GH = xp.shape
    H = GH // n_gates
    scratches = [pltpu.VMEM((B, H), jnp.float32)]
    if n_gates == 4:
        scratches.append(pltpu.VMEM((B, H), jnp.float32))
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H), jnp.float32),
        scratch_shapes=scratches,
        interpret=jax.default_backend() != "tpu",
    )(
        xp.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.reshape(1, -1).astype(jnp.float32),
    )


# ----------------------------------------------------------------------
# Reference scans for the rematerialized backward


def _lstm_ref(xp, w_hh, b_hh):
    H = w_hh.shape[0]
    B = xp.shape[0]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), xp.dtype), jnp.zeros((B, H), xp.dtype))
    _, ys = jax.lax.scan(step, init, jnp.moveaxis(xp, 1, 0))
    return jnp.moveaxis(ys, 0, 1)


def _gru_ref(xp, w_hh, b_hh):
    H = w_hh.shape[0]
    B = xp.shape[0]

    def step(h, xp_t):
        hh = h @ w_hh + b_hh
        r = jax.nn.sigmoid(xp_t[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xp_t[:, H : 2 * H] + hh[:, H : 2 * H])
        n = jnp.tanh(xp_t[:, 2 * H :] + r * hh[:, 2 * H :])
        h = (1.0 - z) * n + z * h
        return h, h

    _, ys = jax.lax.scan(step, jnp.zeros((B, H), xp.dtype), jnp.moveaxis(xp, 1, 0))
    return jnp.moveaxis(ys, 0, 1)


def _make_op(kernel, ref, n_gates):
    @jax.custom_vjp
    def op(xp, w_hh, b_hh):
        return _run(kernel, n_gates, xp, w_hh, b_hh)

    def fwd(xp, w_hh, b_hh):
        return op(xp, w_hh, b_hh), (xp, w_hh, b_hh)

    def bwd(res, g):
        xp, w_hh, b_hh = res
        _, vjp = jax.vjp(ref, xp, w_hh, b_hh)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


lstm_scan_pallas = _make_op(_lstm_kernel, _lstm_ref, 4)
gru_scan_pallas = _make_op(_gru_kernel, _gru_ref, 3)
