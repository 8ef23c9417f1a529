"""Shared layers: RMSNorm, the Adapt MLP (hardcoded + DSL forms), classifier heads.

Reference behavior being matched:
  * RMSNorm — ``medsos_lrcn/src/models.py:9-17``
  * canonical 3-stage adapter — ``models.py:147-153,200-202``
  * Adapt DSL ("lnsd3" style) — ``medsos_lrcn/src/adapt.py:6-60`` and
    ``models_bidir.py:119-155``
  * multiclass MLP head / per-class binary head — ``models.py:172-186,221-232``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# All LayerNorms use epsilon=1e-5: torch.nn.LayerNorm's default, required for
# logit parity with the reference (flax defaults to 1e-6).

__all__ = [
    "RMSNorm",
    "CanonicalAdapter",
    "AdaptDSL",
    "MulticlassHead",
    "MultiBinaryHead",
]


class RMSNorm(nn.Module):
    """x * rsqrt(mean(x^2) + eps) * w   (models.py:9-17)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return normed * weight


class CanonicalAdapter(nn.Module):
    """The canonical LRCN adapter (models.py:147-153, forward 200-202):

        x = drop(LN(gelu(W1 x)));  x = drop(LN(gelu(W2 x)));  x = LN(gelu(W3 x))

    with W1: F -> F/2, W2: F/2 -> F/4, W3: F/4 -> rnn_input_size.
    """

    out_size: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = x.shape[-1]
        x = nn.Dense(f // 2, name="adapt1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="bn1")(nn.gelu(x, approximate=False))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(f // 4, name="adapt2")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="bn2")(nn.gelu(x, approximate=False))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.out_size, name="adapt3")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="bn3")(nn.gelu(x, approximate=False))
        return x


_ACTS = {
    "g": lambda x: nn.gelu(x, approximate=False),
    "s": nn.silu,
    "r": nn.relu,
}


def parse_adapt_mode(mode: str) -> tuple[str, int]:
    """Split an ADAPT config string like "lnsd3" into (ops, depth).

    The reference's DSL interpreter (adapt.py:6-29, models_bidir.py:119-152)
    consumes mode char-by-char and would actually *raise* on the trailing
    depth digit of the configured values ("lnsd3" — all_config.py:26); the
    intended meaning per the option names is <per-block ops><depth>. We
    implement the intended grammar: trailing digits are the depth, the letters
    are the per-block op sequence (l=Linear, n=LayerNorm, g=GELU, s=SiLU,
    r=ReLU, d=Dropout).
    """
    digits = ""
    while mode and mode[-1].isdigit():
        digits = mode[-1] + digits
        mode = mode[:-1]
    depth = int(digits) if digits else 3
    for ch in mode:
        if ch not in "lngsrd":
            raise ValueError(f"Undefined layer type: {ch}")
    if "l" not in mode:
        raise ValueError(f"Adapt mode must contain a linear ('l'): {mode!r}")
    return mode, depth


class AdaptDSL(nn.Module):
    """Configurable adapter MLP from the string DSL (adapt.py:32-60).

    Sizes halve per block (``factor``) from in_size down, with the final
    linear mapping to ``out_size`` (adapt.py:42-47).
    """

    out_size: int
    mode: str = "lnsd3"
    dropout: float = 0.25
    factor: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ops, depth = parse_adapt_mode(self.mode)
        sizes = [x.shape[-1]]
        for _ in range(1, depth):
            sizes.append(sizes[-1] // self.factor)
        sizes.append(self.out_size)
        for i in range(len(sizes) - 1):
            for ch in ops:
                if ch == "l":
                    x = nn.Dense(sizes[i + 1], name=f"cell{i}_linear")(x)
                elif ch == "n":
                    x = nn.LayerNorm(epsilon=1e-5, name=f"cell{i}_norm")(x)
                elif ch == "d":
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
                else:
                    x = _ACTS[ch](x)
        return x


class MulticlassHead(nn.Module):
    """3-layer LayerNorm/GELU MLP head (models.py:176-182, forward 221-226):

        out = LN0(x); out = LNa(gelu(fc(out))); out = LNb(gelu(fca(out)));
        out = drop(out); logits = fcb(out)
    """

    num_classes: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, name="bn0")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="bna")(nn.gelu(nn.Dense(f // 2, name="fc")(x), approximate=False))
        x = nn.LayerNorm(epsilon=1e-5, name="bnb")(nn.gelu(nn.Dense(f // 4, name="fca")(x), approximate=False))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, name="fcb")(x)


class MultiBinaryHead(nn.Module):
    """Per-class binary logits (models.py:186,232): one Dense(F->1) per class,
    concatenated. Implemented as a single Dense(F->num_classes) — numerically
    identical to the concat of per-class linears, but one MXU matmul."""

    num_classes: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        return nn.Dense(self.num_classes, name="binary_heads")(x)
