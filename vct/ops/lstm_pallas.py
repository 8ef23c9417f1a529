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
``lax.scan`` path is ~2x faster than the per-layer kernel — the per-step
hidden matmul is far below MXU tile size and XLA's fused while-loop wins;
the kernel pays 128-lane padding on H=56.

``lstm_stack_pallas`` / ``gru_stack_pallas`` fuse the WHOLE multi-layer
stack into one launch: the running input-projection buffer and each layer's
output sequence stay in VMEM scratch, and the inter-layer input projection
is one MXU matmul inside the kernel — HBM sees exactly one read (hoisted
layer-0 projection) and one write (final layer's output) for the entire
stack. ``scan_impl='pallas'`` on a unidirectional multi-layer LSTM/GRU takes
this path (see ``vct.models.recurrent``); measured numbers live in
docs/performance.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lstm_scan_pallas",
    "gru_scan_pallas",
    "lstm_stack_pallas",
    "gru_stack_pallas",
]


# The ONE copy of the torch-semantics cell math, shared by the per-layer and
# fused-stack kernels (a gate-order or precision fix lands everywhere).


def _lstm_cell(xp_t, whh, bhh, h, c, H):
    """One LSTM step on gate pre-activations xp_t (B, 4H); returns (h, c)."""
    gates = (
        xp_t + jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c + i * g
    return o * jnp.tanh(c), c


def _gru_cell(xp_t, whh, bhh, h, H):
    """One GRU step; torch semantics: n = tanh(xn + r * (h @ W_hn + b_hn))."""
    hh = jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
    r = jax.nn.sigmoid(xp_t[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xp_t[:, H : 2 * H] + hh[:, H : 2 * H])
    n = jnp.tanh(xp_t[:, 2 * H :] + r * hh[:, 2 * H :])
    return (1.0 - z) * n + z * h


def _lstm_kernel(xp_ref, whh_ref, bhh_ref, y_ref, h_scr, c_scr):
    """xp (TB, T, 4H), whh (H, 4H), bhh (1, 4H), y (TB, T, H)."""
    T = xp_ref.shape[1]
    H = whh_ref.shape[0]

    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)

    def body(t, _):
        h, c = _lstm_cell(
            xp_ref[:, t, :], whh_ref[:], bhh_ref[0, :], h_scr[:], c_scr[:], H
        )
        c_scr[:] = c
        h_scr[:] = h
        y_ref[:, t, :] = h
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _gru_kernel(xp_ref, whh_ref, bhh_ref, y_ref, h_scr):
    """xp (TB, T, 3H), whh (H, 3H), bhh (1, 3H), y (TB, T, H)."""
    T = xp_ref.shape[1]
    H = whh_ref.shape[0]

    h_scr[:] = jnp.zeros_like(h_scr)

    def body(t, _):
        h = _gru_cell(xp_ref[:, t, :], whh_ref[:], bhh_ref[0, :], h_scr[:], H)
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
    # All buffers are VMEM-resident (no grid); size the scoped-vmem limit to
    # the real footprint so large-H configs don't trip the 16 MB default
    # (same fix as _run_stack below).
    vmem_bytes = 4 * (B * T * GH + B * T * H + (H + 1) * GH + (n_gates - 2) * B * H)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * vmem_bytes + (1 << 22), 100 << 20),
        ),
    )(
        xp.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.reshape(1, -1).astype(jnp.float32),
    )


# ----------------------------------------------------------------------
# Fused multi-layer stack: the WHOLE recurrent stack in one kernel launch.
#
# The per-layer kernels above still round-trip each layer's output through
# HBM (L launches, plus XLA-side inter-layer input projections). Here the
# running (B, T, GH) input-projection buffer and the (B, T, H) layer output
# live in VMEM scratch for the whole stack: layer l runs its T sequential
# steps, then one in-kernel MXU matmul projects its output sequence into
# layer l+1's gate pre-activations. HBM traffic is exactly one read of the
# hoisted layer-0 projection and one write of the final layer's output.
# VMEM bound: ~B*T*(G+1)*H*4 bytes of scratch — the reference-scale heads
# (H<=512, B*T<=2k) use a few MB of the ~100 MB budget.


def _project_next_layer(y_scr, wih_ref, bih_ref, l, buf_scr):
    """buf <- y @ W_ih[l+1] + b_ih[l+1]: one MXU matmul over the whole
    sequence, entirely in VMEM (the inter-layer hop never touches HBM)."""
    buf_scr[:] = (
        jax.lax.dot_general(
            y_scr[:],
            wih_ref[l],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bih_ref[l, 0, :]
    )


def _lstm_stack_kernel(xp0_ref, whh_ref, bhh_ref, wih_ref, bih_ref, y_ref,
                       buf_scr, y_scr, h_scr, c_scr):
    """xp0 (B,T,4H); whh (L,H,4H); bhh (L,1,4H); wih (L-1,H,4H);
    bih (L-1,1,4H); y (B,T,H)."""
    L = whh_ref.shape[0]
    T = xp0_ref.shape[1]
    H = whh_ref.shape[1]

    buf_scr[:] = xp0_ref[:]
    for l in range(L):  # static unroll: L is a compile-time constant
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        whh = whh_ref[l]
        bhh = bhh_ref[l, 0, :]

        def body(t, _):
            h, c = _lstm_cell(buf_scr[:, t, :], whh, bhh, h_scr[:], c_scr[:], H)
            h_scr[:] = h
            c_scr[:] = c
            y_scr[:, t, :] = h
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        if l < L - 1:
            _project_next_layer(y_scr, wih_ref, bih_ref, l, buf_scr)
    y_ref[:] = y_scr[:]


def _gru_stack_kernel(xp0_ref, whh_ref, bhh_ref, wih_ref, bih_ref, y_ref,
                      buf_scr, y_scr, h_scr):
    L = whh_ref.shape[0]
    T = xp0_ref.shape[1]
    H = whh_ref.shape[1]

    buf_scr[:] = xp0_ref[:]
    for l in range(L):
        h_scr[:] = jnp.zeros_like(h_scr)
        whh = whh_ref[l]
        bhh = bhh_ref[l, 0, :]

        def body(t, _):
            h = _gru_cell(buf_scr[:, t, :], whh, bhh, h_scr[:], H)
            h_scr[:] = h
            y_scr[:, t, :] = h
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        if l < L - 1:
            _project_next_layer(y_scr, wih_ref, bih_ref, l, buf_scr)
    y_ref[:] = y_scr[:]


def _run_stack(kernel, n_gates, xp0, w_hh, b_hh, w_ih, b_ih):
    L, H, GH = w_hh.shape
    B, T, _ = xp0.shape
    f32 = jnp.float32
    scratches = [
        pltpu.VMEM((B, T, GH), f32),  # running input-projection buffer
        pltpu.VMEM((B, T, H), f32),  # current layer's output sequence
        pltpu.VMEM((B, H), f32),  # h
    ]
    if n_gates == 4:
        scratches.append(pltpu.VMEM((B, H), f32))  # c
    # Everything (weights + both sequence buffers) is VMEM-resident, so the
    # default 16 MB scoped-vmem budget overflows past H~128; size the limit
    # to the actual footprint (inputs + output + scratch, padded headroom).
    vmem_bytes = 4 * (
        2 * B * T * GH  # xp0 input + running buffer scratch
        + 2 * B * T * H  # y output + y scratch
        + (2 * L - 1) * (H + 1) * GH  # stacked weights + biases
        + (n_gates - 2) * B * H  # h (+ c) scratch
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H), f32),
        scratch_shapes=scratches,
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * vmem_bytes + (1 << 22), 100 << 20),
        ),
    )(
        xp0.astype(f32),
        w_hh.astype(f32),
        b_hh.reshape(L, 1, GH).astype(f32),
        w_ih.astype(f32),
        b_ih.reshape(L - 1, 1, GH).astype(f32),
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


def _stack_ref(layer_ref, xp0, w_hh, b_hh, w_ih, b_ih):
    """Layer-by-layer lax.scan reference for the fused stack kernels (also
    the rematerialized backward)."""
    L = w_hh.shape[0]
    buf = xp0
    for l in range(L):
        buf = layer_ref(buf, w_hh[l], b_hh[l])
        if l < L - 1:
            buf = buf @ w_ih[l] + b_ih[l]
    return buf


_lstm_stack_ref = partial(_stack_ref, _lstm_ref)
_gru_stack_ref = partial(_stack_ref, _gru_ref)


def _make_stack_op(kernel, ref, n_gates):
    @jax.custom_vjp
    def op(xp0, w_hh, b_hh, w_ih, b_ih):
        if w_hh.shape[0] < 2:
            raise ValueError("stack op needs num_layers >= 2; use the "
                             "single-layer op for one layer")
        return _run_stack(kernel, n_gates, xp0, w_hh, b_hh, w_ih, b_ih)

    def fwd(xp0, w_hh, b_hh, w_ih, b_ih):
        return op(xp0, w_hh, b_hh, w_ih, b_ih), (xp0, w_hh, b_hh, w_ih, b_ih)

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


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
lstm_stack_pallas = _make_stack_op(_lstm_stack_kernel, _lstm_stack_ref, 4)
gru_stack_pallas = _make_stack_op(_gru_stack_kernel, _gru_stack_ref, 3)
