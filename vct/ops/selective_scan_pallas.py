"""Fused selective-scan (Mamba) Pallas TPU kernel.

Computes the diagonal SSM recurrence of ``ParallelMamba``
(``medsos_lrcn/src/models.py:47-71``):

    h_t = exp(Δ_t ⊗ A) ⊙ h_{t-1} + (Δ_t ⊙ u_t) ⊗ B_t,   y_t = ⟨h_t, C_t⟩

entirely in VMEM. The XLA formulations (``vct.models.ssm.selective_scan``)
materialize the discretized tensors ``deltaA`` / ``deltaB_u`` of shape
(B, L, D, N) in HBM — N times the traffic of the inputs. This kernel keeps
the running state h as an (N, D) VMEM block per batch element, computes the
discretization on the fly on the VPU, and writes only the (L, D) output:
HBM traffic drops from O(B·L·D·N) to O(B·L·(D+N)).

Layout: D rides the 128-wide lane dimension (D is 2·rnn_input for LRCN and
2048 for VideoMamba), N the sublanes — state tiles cleanly for N ≥ 8.

Training: a ``jax.custom_vjp`` recomputes the forward with the associative
formulation in the backward pass (rematerialization — trade FLOPs for the
HBM the kernel saved).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selective_scan_pallas"]


def _scan_kernel(u_ref, delta_ref, b_ref, c_ref, a_ref, y_ref, h_scratch):
    """One batch element: u/delta (1, L, D), b/c (1, L, N), a (N, D)."""
    L = u_ref.shape[1]

    h_scratch[:] = jnp.zeros_like(h_scratch)

    def body(t, _):
        delta_t = delta_ref[0, t, :].reshape(1, -1)  # (1, D)
        u_t = u_ref[0, t, :].reshape(1, -1)  # (1, D)
        b_t = b_ref[0, t, :].reshape(-1, 1)  # (N, 1)
        c_t = c_ref[0, t, :].reshape(-1, 1)  # (N, 1)
        dA = jnp.exp(delta_t * a_ref[:])  # (N, D) VPU
        dBu = (delta_t * u_t) * b_t  # (N, D)
        h = dA * h_scratch[:] + dBu
        h_scratch[:] = h
        y_ref[0, t, :] = jnp.sum(h * c_t, axis=0)  # reduce N -> (D,)
        return 0

    jax.lax.fori_loop(0, L, body, 0)


def _forward(u, delta, A, B, C):
    batch, L, D = u.shape
    N = A.shape[1]
    a_t = A.T.astype(jnp.float32)  # (N, D): D on lanes

    return pl.pallas_call(
        _scan_kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(
        u.astype(jnp.float32),
        delta.astype(jnp.float32),
        B.astype(jnp.float32),
        C.astype(jnp.float32),
        a_t,
    )


def _reference_scan(u, delta, A, B, C):
    """Rematerialization reference = the canonical associative-scan impl in
    ``vct.models.ssm`` (one copy of the semantics; lazy import breaks the
    module cycle — ssm.py imports this module for impl='pallas')."""
    from vct.models.ssm import selective_scan

    return selective_scan(u, delta, A, B, C, reverse=False, impl="associative")


@jax.custom_vjp
def _scan_op(u, delta, A, B, C):
    return _forward(u, delta, A, B, C)


def _scan_fwd(u, delta, A, B, C):
    return _forward(u, delta, A, B, C), (u, delta, A, B, C)


def _scan_bwd(res, g):
    u, delta, A, B, C = res
    _, vjp = jax.vjp(_reference_scan, u, delta, A, B, C)
    return vjp(g)


_scan_op.defvjp(_scan_fwd, _scan_bwd)


def selective_scan_pallas(u, delta, A, B, C, reverse: bool = False):
    """Drop-in for ``vct.models.ssm.selective_scan`` (impl='pallas')."""
    if reverse:
        # Mirror the reference's backward-direction quirk exactly: flip ONLY
        # u and delta; B and C stay forward-ordered (models.py:51-53; see
        # vct/models/ssm.py for the full note).
        u = jnp.flip(u, axis=1)
        delta = jnp.flip(delta, axis=1)
    y = _scan_op(u, delta, A, B, C)
    if reverse:
        y = jnp.flip(y, axis=1)
    return y
