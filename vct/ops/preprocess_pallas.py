"""Fused frame-preprocessing Pallas TPU kernel.

The device tail of the ingest path (``vct.data.preprocess``): uint8 frames ->
float32, /255 normalize, optional per-channel mean/std standardization — one
VMEM pass per frame block instead of separate convert/scale/subtract HLOs.
This is a bandwidth-bound op; the kernel's value is guaranteeing a single
HBM read of the uint8 input and a single f32 write, with the grid streaming
(B·T) frame blocks through VMEM.

Resize and content-aware frame selection stay in the XLA path
(``preprocess_clips`` / ``device_sample_clips``) where the gather/resize
primitives already lower well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["normalize_frames_pallas"]


def _norm_kernel(raw_ref, mean_ref, inv_std_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; widen through int32 first.
    x = raw_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[:] = (x - mean_ref[0, :]) * inv_std_ref[0, :]


@partial(jax.jit, static_argnames=())
def normalize_frames_pallas(raw, mean=None, std=None):
    """uint8 (..., H, W, 3) -> float32 normalized, fused on device.

    mean/std: optional per-channel (3,) arrays applied after /255
    (identity by default — the reference normalizes with /255 only,
    ``loader_data.py:182``).
    """
    shape = raw.shape
    n = 1
    for s in shape[:-3]:
        n *= s
    H, W, C = shape[-3:]
    flat = raw.reshape(n, H, W, C)
    mean = jnp.zeros((1, C), jnp.float32) if mean is None else jnp.asarray(
        mean, jnp.float32
    ).reshape(1, C)
    inv_std = (
        jnp.ones((1, C), jnp.float32)
        if std is None
        else 1.0 / jnp.asarray(std, jnp.float32).reshape(1, C)
    )

    out = pl.pallas_call(
        _norm_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, H, W, C), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(flat, mean, inv_std)
    return out.reshape(shape)
