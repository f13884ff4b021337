"""Discrete affine-coupling flows (SURVEY.md §7 model math; §2 C6/C7).

A `CouplingFlow` is a stack of K mask-based conditional affine coupling
layers over the last axis of ``x``:

    y = mask * x + (1-mask) * (x * exp(s(m*x, z)) + t(m*x, z))
    log|det J| = sum over transformed coords of s

with the conditioner ``(s, t)`` a small MLP whose final layer is zero-init,
so every layer is the identity at initialization (stable ELBO training from
step 0). The inverse is closed-form:

    x = mask * y + (1-mask) * (y - t) * exp(-s)

so sampling is a feed-forward pass of K inverted layers — no ODE solver;
this is the paper's headline efficiency claim (arXiv:2007.10170) and the
throughput path BASELINE.json targets.

TPU-first design notes:
  * The conditioner's first layer is computed as ``W_x (m*x) + W_z z`` with
    the z-projection done once per cloud and broadcast over the points axis,
    so the per-point work is a chain of [B*N, H] x [H, H] matmuls — large,
    batched, MXU-shaped (SURVEY.md §8 step 7).
  * K is static and the layer stack is a Python loop: XLA unrolls and fuses
    the K tiny MLPs into one program; no data-dependent control flow.
  * Compute dtype is configurable: conditioner matmuls may run bf16 on the
    MXU while the coupling arithmetic (exp / mul / add and log-det) stays
    f32 so invertibility holds to float32 tolerance.

Reference parity: the reference implements the same math as torch
``nn.Module``s (SURVEY.md §2 C6/C7 — file:line cites pending the empty
mount, SURVEY.md §0/§9.3).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# conditioner activation registry (FlowConfig.activation). relu is the
# default: gelu's tanh chain is pure VPU time on TPU (measured +60% on the
# flagship train step) and relu is the plausible reference-era choice —
# VERIFY-vs-reference (SURVEY.md §9.3).
ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
}


def make_masks(dim: int, n_layers: int) -> np.ndarray:
    """Static binary masks, one per layer; 1 = pass-through coords (the
    conditioning set a), 0 = transformed coords (b).

    For ``dim == 3`` (point flow) the masks cycle through all six 1|2
    partitions of the coordinates so each coordinate is transformed under
    both partition sizes (SURVEY.md §7: "alternating 1|2 partitions /
    permutations"; exact reference scheme is §9.3 VERIFY).

    For larger dims (latent flow) masks alternate even/odd coordinate
    parity, the classic RealNVP checkerboard over a vector.
    """
    if dim < 2:
        raise ValueError("coupling needs dim >= 2")
    masks = np.zeros((n_layers, dim), dtype=np.float32)
    if dim == 3:
        cycle = [
            (1, 0, 0),
            (0, 1, 0),
            (0, 0, 1),
            (1, 1, 0),
            (0, 1, 1),
            (1, 0, 1),
        ]
        for k in range(n_layers):
            masks[k] = cycle[k % len(cycle)]
    else:
        even = np.arange(dim) % 2 == 0
        half = np.arange(dim) < dim // 2
        cycle2 = [even, ~even, half, ~half]
        for k in range(n_layers):
            masks[k] = cycle2[k % len(cycle2)].astype(np.float32)
    return masks


class DenseT(nn.Module):
    """Dense layer applied on the CHANNEL-FIRST axis: [.., in, N] -> [.., out, N].

    Parameter names and shapes are identical to flax nn.Dense (kernel
    [in, out], bias [out]) so checkpoints, the torch converter, and the
    fused-sampler weight stacking are layout-agnostic.

    Why channel-first: the point flow's coordinate space is R^3; with the
    conventional feature-last layout every coupling-space tensor is
    [B, N, 3] — 3 of 128 TPU lanes used — and the training step was
    measured 150x off its flop bound. Keeping points on the lane axis
    ([B, C, N]) makes every elementwise op and its gradient full-width.
    """

    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-2]
        kernel = self.param("kernel", self.kernel_init, (in_dim, self.features))
        y = jnp.einsum(
            "io,...in->...on", kernel.astype(self.dtype), x.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)[..., :, None]
        return y


class Conditioner(nn.Module):
    """MLP producing (s, t) for one coupling layer.

    Input is the masked coordinates (zeros at transformed positions) plus an
    optional conditioning vector ``cond`` (the latent shape code z) injected
    additively after the first projection — computed once per cloud and
    broadcast over points, which keeps the per-point matmul chain dense and
    MXU-friendly.

    ``channels_first=True`` (point flow over [.., 3, N]) routes through
    DenseT; parameters are identical either way.
    """

    dim: int
    hidden: int
    n_hidden: int
    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, x_masked: Array, cond: Optional[Array]) -> Tuple[Array, Array]:
        act = ACTIVATIONS[self.activation]
        if self.channels_first:
            dense = lambda feats, name, **kw: DenseT(feats, dtype=self.dtype, name=name, **kw)
            split_axis = -2
        else:
            dense = lambda feats, name, **kw: nn.Dense(feats, dtype=self.dtype, name=name, **kw)
            split_axis = -1
        h = dense(self.hidden, "in_x")(x_masked)
        if cond is not None:
            hz = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="in_z")(cond)
            if self.channels_first:
                hz = hz[..., :, None]   # [.., H] -> broadcast over points (lanes)
            elif hz.ndim == h.ndim - 1:
                hz = hz[..., None, :]   # broadcast z over the points axis
            h = h + hz
        h = act(h)
        for i in range(self.n_hidden - 1):
            h = dense(self.hidden, f"hidden_{i}")(h)
            h = act(h)
        out = dense(
            2 * self.dim, "out",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        out = out.astype(jnp.float32)  # coupling math stays f32
        s, t = jnp.split(out, 2, axis=split_axis)
        return s, t


class ActNorm(nn.Module):
    """Per-coordinate affine normalization with exact log-det
    (optional; reference presence unverified, SURVEY.md §9.3)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array, inverse: bool = False) -> Tuple[Array, Array]:
        log_scale = self.param("log_scale", nn.initializers.zeros, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if inverse:
            y = (x - bias) * jnp.exp(-log_scale)
            logdet = -jnp.sum(log_scale) * jnp.ones(x.shape[:-1], x.dtype)
        else:
            y = x * jnp.exp(log_scale) + bias
            logdet = jnp.sum(log_scale) * jnp.ones(x.shape[:-1], x.dtype)
        return y, logdet


class AffineCoupling(nn.Module):
    """One mask-based conditional affine coupling layer (SURVEY.md §7).

    ``channels_first`` operates on [.., dim, N] (dim on the sublane axis,
    points on lanes) — the TPU-efficient layout for tiny dim (see DenseT)."""

    dim: int
    mask: Tuple[float, ...]  # static; 1 = pass-through
    hidden: int
    n_hidden: int
    scale_cap: float = 8.0
    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False
    activation: str = "relu"

    def setup(self):
        self.cond_net = Conditioner(
            dim=self.dim, hidden=self.hidden, n_hidden=self.n_hidden,
            dtype=self.dtype, channels_first=self.channels_first,
            activation=self.activation,
        )

    def _mask(self, dtype) -> Array:
        m = jnp.asarray(self.mask, dtype=dtype)
        return m[:, None] if self.channels_first else m

    def _st(self, x: Array, cond: Optional[Array]) -> Tuple[Array, Array]:
        m = self._mask(x.dtype)
        s, t = self.cond_net(x * m, cond)
        # soft-cap the log-scale for numerical stability of exp/inverse
        s = self.scale_cap * jnp.tanh(s / self.scale_cap)
        inv_m = 1.0 - m
        return s * inv_m, t * inv_m

    def forward(self, x: Array, cond: Optional[Array]) -> Tuple[Array, Array]:
        """x -> y; returns (y, logdet) with logdet shaped like the points axes."""
        s, t = self._st(x, cond)
        m = self._mask(x.dtype)
        y = jnp.where(m > 0, x, x * jnp.exp(s) + t)
        return y, jnp.sum(s, axis=-2 if self.channels_first else -1)

    def inverse(self, y: Array, cond: Optional[Array]) -> Tuple[Array, Array]:
        """y -> x (closed form); returns (x, logdet of the inverse map)."""
        s, t = self._st(y, cond)  # masked coords identical in x and y
        m = self._mask(y.dtype)
        x = jnp.where(m > 0, y, (y - t) * jnp.exp(-s))
        return x, -jnp.sum(s, axis=-2 if self.channels_first else -1)


class CouplingFlow(nn.Module):
    """Stack of K affine couplings (+ optional actnorm between layers).

    ``forward`` maps data -> base-noise (with log-det, for log-likelihood);
    ``inverse`` maps base-noise -> data (sampling). Used both as the
    conditional point flow f(.; z): R^3 -> R^3 (SURVEY.md §2 C6) and the
    unconditional latent prior flow g: R^dz -> R^dz (C7).
    """

    dim: int
    n_layers: int
    hidden: int
    n_hidden: int
    use_actnorm: bool = False
    scale_cap: float = 8.0
    dtype: jnp.dtype = jnp.float32
    activation: str = "relu"

    def setup(self):
        # small coordinate spaces (the R^3 point flow) compute channel-first
        # internally: [.., N, dim] would waste 125/128 TPU lanes on every
        # coupling-space op (and its gradient) — measured 150x off the flop
        # bound in training. Parameters are identical in both layouts.
        self.channels_first = self.dim <= 16
        masks = make_masks(self.dim, self.n_layers)
        self.couplings = [
            AffineCoupling(
                dim=self.dim,
                mask=tuple(masks[k].tolist()),
                hidden=self.hidden,
                n_hidden=self.n_hidden,
                scale_cap=self.scale_cap,
                dtype=self.dtype,
                channels_first=self.channels_first,
                activation=self.activation,
                name=f"coupling_{k}",
            )
            for k in range(self.n_layers)
        ]
        if self.use_actnorm:
            self.actnorms = [
                ActNorm(dim=self.dim, name=f"actnorm_{k}") for k in range(self.n_layers)
            ]

    def _to_internal(self, x: Array) -> Tuple[Array, str]:
        """Public layout is feature-last ([.., N, dim] or [.., dim]). The
        channel-first internal layout moves dim to the sublane axis:
        'swap' for inputs with a points axis, 'expand' promotes 2-D latent
        inputs to [.., dim, 1]."""
        if not self.channels_first:
            return x, "none"
        if x.ndim >= 3:
            return jnp.swapaxes(x, -1, -2), "swap"
        return x[..., None], "expand"

    def _from_internal(self, x: Array, mode: str) -> Array:
        if mode == "swap":
            return jnp.swapaxes(x, -1, -2)
        if mode == "expand":
            return x[..., 0]
        return x

    def _logdet_out(self, ld: Array, mode: str) -> Array:
        return ld[..., 0] if mode == "expand" else ld

    def forward(self, x: Array, cond: Optional[Array] = None) -> Tuple[Array, Array]:
        x, mode = self._to_internal(x)
        logdet = jnp.zeros(x.shape[:-2] + (x.shape[-1],) if mode != "none" else x.shape[:-1],
                           jnp.float32)
        for k in range(self.n_layers):
            if self.use_actnorm:
                xs = self._from_internal(x, mode)
                xs, ld = self.actnorms[k](xs, inverse=False)
                x, _ = self._to_internal(xs)
                logdet = logdet + (ld[..., None] if mode == "expand" else ld)
            x, ld = self.couplings[k].forward(x, cond)
            logdet = logdet + ld
        return self._from_internal(x, mode), self._logdet_out(logdet, mode)

    def inverse(self, u: Array, cond: Optional[Array] = None) -> Tuple[Array, Array]:
        u, mode = self._to_internal(u)
        logdet = jnp.zeros(u.shape[:-2] + (u.shape[-1],) if mode != "none" else u.shape[:-1],
                           jnp.float32)
        for k in reversed(range(self.n_layers)):
            u, ld = self.couplings[k].inverse(u, cond)
            logdet = logdet + ld
            if self.use_actnorm:
                us = self._from_internal(u, mode)
                us, ld = self.actnorms[k](us, inverse=True)
                u, _ = self._to_internal(us)
                logdet = logdet + (ld[..., None] if mode == "expand" else ld)
        return self._from_internal(u, mode), self._logdet_out(logdet, mode)

    def log_prob(self, x: Array, cond: Optional[Array] = None) -> Array:
        """Exact log density under the flow with a standard-normal base:
        log p(x) = log N(f(x); 0, I) + log|det J_f| (SURVEY.md §7)."""
        u, logdet = self.forward(x, cond)
        log_base = -0.5 * jnp.sum(u * u + jnp.log(2.0 * jnp.pi), axis=-1)
        return log_base + logdet

    def __call__(self, x: Array, cond: Optional[Array] = None) -> Array:
        # default apply path (used for init)
        return self.log_prob(x, cond)
