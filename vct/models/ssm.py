"""Selective-scan SSM (Mamba) — TPU-native.

Computes the same math as the reference's ``ParallelMamba``
(``medsos_lrcn/src/models.py:20-106``): input projection, depthwise causal
conv, SiLU, (Δ, B, C) projection, Δ-discretisation, the diagonal first-order
recurrence

    h_t = exp(Δ_t ⊗ A) ⊙ h_{t-1} + (Δ_t ⊙ u_t) ⊗ B_t
    y_t = ⟨h_t, C_t⟩

and the SiLU-gated output projection — including the bidirectional variant
(flip-scan backward + concat, ``models.py:51-53,68-69,98-103``).

The reference's "parallel_scan" is a *sequential Python loop over timesteps*
(``models.py:58-66``). Here the recurrence is a first-order linear scan, so we
evaluate it in log-depth with ``jax.lax.associative_scan`` (the natural TPU
formulation — XLA maps each combine step onto the VPU in bulk), with a
``lax.scan`` sequential fallback for numerics testing and a Pallas kernel
(``vct.ops.selective_scan_pallas``) for the fused hot path.

The reference declares a ``D`` skip-connection parameter but never applies it
in ``forward`` (``models.py:31`` vs ``73-106``); we keep the parameter for
state/param parity and likewise leave it out of the compute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.models.layers import RMSNorm

__all__ = ["selective_scan", "ParallelMamba", "MambaResidualBlock"]


def _combine(left, right):
    """Associative combine for h_t = a_t * h_{t-1} + b_t segments."""
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, b_l * a_r + b_r


def selective_scan(
    u: jax.Array,  # (B, L, D) conv+SiLU activations
    delta: jax.Array,  # (B, L, D) positive step sizes
    A: jax.Array,  # (D, N) negative state matrix
    B: jax.Array,  # (B, L, N)
    C: jax.Array,  # (B, L, N)
    reverse: bool = False,
    impl: str = "associative",
) -> jax.Array:
    """Diagonal selective scan; returns y of shape (B, L, D).

    ``impl``: "associative" (log-depth, default), "scan" (sequential
    lax.scan), or "pallas" (fused kernel).
    """
    if impl == "pallas":
        from vct.ops.selective_scan_pallas import selective_scan_pallas

        return selective_scan_pallas(u, delta, A, B, C, reverse=reverse)

    if reverse:
        # Reference quirk, replicated exactly (models.py:51-53): the backward
        # direction flips ONLY u and delta — B and C stay in forward time
        # order, so backward step t pairs flipped u/delta with UNFLIPPED
        # B[:, t] / C[:, t]. Checkpoints were trained with these semantics;
        # the 1e-3 logit-parity contract requires them.
        u = jnp.flip(u, axis=1)
        delta = jnp.flip(delta, axis=1)

    # Discretise: deltaA (B,L,D,N), deltaB_u (B,L,D,N) — models.py:55-56.
    deltaA = jnp.exp(jnp.einsum("bld,dn->bldn", delta, A))
    deltaB_u = jnp.einsum("bld,bln,bld->bldn", delta, B, u)

    if impl == "associative":
        _, h = jax.lax.associative_scan(_combine, (deltaA, deltaB_u), axis=1)
        y = jnp.einsum("bldn,bln->bld", h, C)
    elif impl == "scan":

        def step(h, inputs):
            dA_t, dBu_t, C_t = inputs
            h = dA_t * h + dBu_t
            y_t = jnp.einsum("bdn,bn->bd", h, C_t)
            return h, y_t

        B_, L, D = u.shape
        N = A.shape[1]
        h0 = jnp.zeros((B_, D, N), dtype=deltaA.dtype)
        _, ys = jax.lax.scan(
            step,
            h0,
            (
                jnp.moveaxis(deltaA, 1, 0),
                jnp.moveaxis(deltaB_u, 1, 0),
                jnp.moveaxis(C, 1, 0),
            ),
        )
        y = jnp.moveaxis(ys, 0, 1)
    else:
        raise ValueError(f"Unknown selective_scan impl: {impl}")

    if reverse:
        y = jnp.flip(y, axis=1)
    return y


def causal_depthwise_conv1d(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array]):
    """Depthwise causal conv over the time axis.

    Matches torch ``Conv1d(groups=D, padding=k-1)`` followed by truncation to
    the original length (models.py:35-42,83-85): left-pad k-1 zeros so
    y[t] = sum_j w[j] * x[t - (k-1) + j].

    x: (B, L, D); kernel: (k, D); bias: (D,) or None.
    """
    k = kernel.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :],  # (k, in_per_group=1, out=D)
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
        # Depthwise = k multiply-adds per output, nothing for the MXU to
        # tile — full f32 costs nothing here and keeps the op exact on TPU
        # (the default bf16-class conv precision fails the 1e-5 torch
        # golden on hardware).
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias
    return y


class ParallelMamba(nn.Module):
    """One selective-scan mixer (models.py:20-106)."""

    d_model: int
    d_inner: int
    n_state: int
    dt_rank: int
    bias: bool = True
    conv_bias: bool = True
    kernel_size: int = 3
    bidirectional: bool = False
    scan_impl: str = "associative"

    @nn.compact
    def __call__(self, x):
        L = x.shape[1]
        del L  # static under jit

        A_log = self.param(
            "A_log", nn.initializers.normal(1.0), (self.d_inner, self.n_state)
        )
        # Declared-but-unused skip parameter, kept for parity (models.py:31).
        self.param("D", nn.initializers.normal(1.0), (self.d_inner,))

        xz = nn.Dense(self.d_inner * 2, use_bias=self.bias, name="in_proj")(x)
        u, res = jnp.split(xz, 2, axis=-1)

        conv_kernel = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.d_inner),
        )
        conv_b = (
            self.param("conv_bias", nn.initializers.zeros, (self.d_inner,))
            if self.conv_bias
            else None
        )
        u = causal_depthwise_conv1d(u, conv_kernel, conv_b)
        u = nn.silu(u)

        dbc = nn.Dense(
            self.dt_rank + 2 * self.n_state, use_bias=False, name="x_proj"
        )(u)
        dt, B, C = jnp.split(dbc, [self.dt_rank, self.dt_rank + self.n_state], axis=-1)
        delta = nn.softplus(nn.Dense(self.d_inner, use_bias=True, name="dt_proj")(dt))

        A = -jnp.exp(A_log)

        y = selective_scan(u, delta, A, B, C, reverse=False, impl=self.scan_impl)
        if self.bidirectional:
            y_bwd = selective_scan(u, delta, A, B, C, reverse=True, impl=self.scan_impl)
            y = jnp.concatenate([y, y_bwd], axis=-1)
            res = jnp.concatenate([res, res], axis=-1)

        y = y * nn.silu(res)
        return nn.Dense(self.d_model, use_bias=self.bias, name="out_proj")(y)


class MambaResidualBlock(nn.Module):
    """Pre-RMSNorm residual wrapper (models.py:109-117)."""

    d_model: int
    d_inner: int
    n_state: int
    dt_rank: int
    bias: bool = True
    conv_bias: bool = True
    kernel_size: int = 3
    bidirectional: bool = False
    scan_impl: str = "associative"

    @nn.compact
    def __call__(self, x):
        mixed = ParallelMamba(
            d_model=self.d_model,
            d_inner=self.d_inner,
            n_state=self.n_state,
            dt_rank=self.dt_rank,
            bias=self.bias,
            conv_bias=self.conv_bias,
            kernel_size=self.kernel_size,
            bidirectional=self.bidirectional,
            scan_impl=self.scan_impl,
            name="mixer",
        )(RMSNorm(self.d_model, name="norm")(x))
        return mixed + x
