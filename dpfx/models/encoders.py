"""Posterior encoders (SURVEY.md §2 C5 point encoder, C8 SVR image encoder).

`PointNetEncoder`: permutation-invariant q(z|X) — shared per-point MLP,
max-pool over the points axis, FC heads -> (mu, logvar) of a diagonal
Gaussian (arXiv:2007.10170; SURVEY.md §7 "Posterior").

`ImageEncoder`: small conv ResNet mapping a rendered view to the same
(mu, logvar), slotting in for the point encoder in SVR (SURVEY.md §3.5).
Backbone choice in the reference is LOW-confidence (SURVEY.md §9.6); this
is an idiomatic stand-in with matching output contract.

TPU notes: the per-point MLP is a chain of [B*N, W] x [W, W'] matmuls —
what the reference does with 1-D convs maps directly onto Dense layers on
the MXU here; max-pool over points is a single VPU reduction.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class PointNetEncoder(nn.Module):
    dz: int
    point_widths: Sequence[int] = (128, 128, 256, 512)
    head_widths: Sequence[int] = (256,)
    dtype: jnp.dtype = jnp.float32
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        """x: [B, N, 3] -> (mu, logvar), each [B, dz]."""
        from dpfx.models.coupling import ACTIVATIONS

        act = ACTIVATIONS[self.activation]
        h = x.astype(self.dtype)
        for i, w in enumerate(self.point_widths):
            h = nn.Dense(w, dtype=self.dtype, name=f"point_{i}")(h)
            h = act(h)
        g = jnp.max(h, axis=-2)  # permutation-invariant pool over points
        for i, w in enumerate(self.head_widths):
            g = nn.Dense(w, dtype=self.dtype, name=f"head_{i}")(g)
            g = act(g)
        out = nn.Dense(2 * self.dz, dtype=self.dtype, name="gauss")(g)
        out = out.astype(jnp.float32)
        mu, logvar = jnp.split(out, 2, axis=-1)
        # bound logvar for a stable KL early in training
        logvar = jnp.clip(logvar, -10.0, 10.0)
        return mu, logvar


class ResBlock(nn.Module):
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype)(h)
        if x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1), dtype=self.dtype)(x)
        return x + h


class ConvImageEncoder(nn.Module):
    """ResNet-ish conv backbone (closest to the reference's expected SVR
    encoder, SURVEY.md §9.6); the `experiment=svr` default. A round-1
    remote-compiler pathology (minutes per block) made `MixerImageEncoder`
    the default then; round 2 re-measured ~145 s total compile + 16 ms/step
    on the chip — normal — so conv is default again (BASELINE.md)."""

    dz: int
    widths: Sequence[int] = (32, 64, 128, 256)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: Array) -> Tuple[Array, Array]:
        """img: [B, H, W, C] -> (mu, logvar), each [B, dz]."""
        h = nn.Conv(self.widths[0], (3, 3), dtype=self.dtype)(img.astype(self.dtype))
        for stage, w in enumerate(self.widths):
            for b in range(self.blocks_per_stage):
                h = ResBlock(width=w, dtype=self.dtype, name=f"s{stage}_b{b}")(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = jnp.mean(h, axis=(-3, -2))  # global average pool
        h = nn.Dense(2 * self.widths[-1], dtype=self.dtype)(h)
        h = nn.gelu(h)
        out = nn.Dense(2 * self.dz, dtype=self.dtype, name="gauss")(h)
        out = out.astype(jnp.float32)
        mu, logvar = jnp.split(out, 2, axis=-1)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        return mu, logvar


class MixerImageEncoder(nn.Module):
    """TPU-native image encoder: non-overlapping patch embedding followed by
    MLP-Mixer blocks (token-mix + channel-mix) — pure matmuls, so it maps
    straight onto the MXU and compiles in seconds where conv grads take
    minutes on this box. Fills the same q(z|view) contract as the conv
    backbone (SURVEY.md §2 C8); default for experiment=svr."""

    dz: int
    patch: int = 8
    width: int = 256
    depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: Array) -> Tuple[Array, Array]:
        b, h, w, c = img.shape
        p = self.patch
        if h % p or w % p:
            raise ValueError(f"image size {h}x{w} not divisible by patch {p}")
        x = img.astype(self.dtype).reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        x = nn.Dense(self.width, dtype=self.dtype, name="embed")(x)  # [B, T, W]
        t = x.shape[1]
        for i in range(self.depth):
            # token mixing
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln_t_{i}")(x)
            y = jnp.swapaxes(y, 1, 2)                                # [B, W, T]
            y = nn.Dense(t * 2, dtype=self.dtype, name=f"tok_in_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(t, dtype=self.dtype, name=f"tok_out_{i}")(y)
            x = x + jnp.swapaxes(y, 1, 2)
            # channel mixing
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln_c_{i}")(x)
            y = nn.Dense(self.width * 2, dtype=self.dtype, name=f"ch_in_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.width, dtype=self.dtype, name=f"ch_out_{i}")(y)
            x = x + y
        g = jnp.mean(x, axis=1)
        g = nn.gelu(nn.Dense(self.width, dtype=self.dtype, name="head")(g))
        out = nn.Dense(2 * self.dz, dtype=self.dtype, name="gauss")(g)
        out = out.astype(jnp.float32)
        mu, logvar = jnp.split(out, 2, axis=-1)
        return mu, jnp.clip(logvar, -10.0, 10.0)


# default alias (kept for backwards compat in imports)
ImageEncoder = ConvImageEncoder
