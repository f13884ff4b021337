"""The full DPF-Nets model (SURVEY.md §7 — the actual blueprint).

Density model over clouds X = {x_i}, x_i in R^3, latent z in R^dz:

    p(X) = ∫ p(z) * prod_i p(x_i | z) dz

with p(x|z) a conditional discrete point flow (C6), p(z) a discrete latent
flow prior (C7), and q(z|X) a PointNet Gaussian posterior (C5) — or an
image-encoder posterior q(z|view) for SVR (C8, SURVEY.md §3.5).

ELBO (maximized; one reparameterized z per cloud per step):

    ELBO(X) = E_q [ sum_i log p(x_i|z) + log p(z) - log q(z|X) ]

Sampling (SURVEY.md §3.2, the throughput north star): z = g^-1(eps),
x_i = f^-1(u_i; z) — two feed-forward inverse-flow stacks, compiled
end-to-end in one jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dpfx.config import Config
from dpfx.models.coupling import CouplingFlow
from dpfx.models.encoders import ImageEncoder, PointNetEncoder

Array = jax.Array


def gaussian_logprob(x: Array, mu: Array, logvar: Array) -> Array:
    """Diagonal-Gaussian log density, summed over the last axis."""
    return -0.5 * jnp.sum(
        logvar + jnp.log(2.0 * jnp.pi) + (x - mu) ** 2 * jnp.exp(-logvar), axis=-1
    )


def standard_normal_logprob(x: Array) -> Array:
    return -0.5 * jnp.sum(x * x + jnp.log(2.0 * jnp.pi), axis=-1)


class DPF(nn.Module):
    """Discrete Point Flow network.

    ``encoder_kind`` selects the posterior input modality: "point" for
    AE/generative training, "image" for single-view reconstruction. The
    decoder (point flow) and prior (latent flow) are identical across tasks
    (SURVEY.md §3.5).
    """

    config: Config

    def setup(self):
        m = self.config.model
        self.point_flow = CouplingFlow(
            dim=3,
            n_layers=m.point_flow.n_layers,
            hidden=m.point_flow.hidden,
            n_hidden=m.point_flow.n_hidden,
            use_actnorm=m.point_flow.use_actnorm,
            scale_cap=m.point_flow.scale_cap,
            dtype=jnp.dtype(m.point_flow.compute_dtype),
            activation=m.point_flow.activation,
            name="point_flow",
        )
        self.latent_flow = CouplingFlow(
            dim=m.dz,
            n_layers=m.latent_flow.n_layers,
            hidden=m.latent_flow.hidden,
            n_hidden=m.latent_flow.n_hidden,
            use_actnorm=m.latent_flow.use_actnorm,
            scale_cap=m.latent_flow.scale_cap,
            dtype=jnp.dtype(m.latent_flow.compute_dtype),
            activation=m.latent_flow.activation,
            name="latent_flow",
        )
        self.encoder = PointNetEncoder(
            dz=m.dz,
            point_widths=m.encoder.point_widths,
            head_widths=m.encoder.head_widths,
            activation=m.encoder.activation,
            dtype=jnp.dtype(m.encoder.compute_dtype),
            name="encoder",
        )
        if self.config.experiment == "svr":
            ie = m.image_encoder
            if ie.arch == "conv":
                self.image_encoder = ImageEncoder(
                    dz=m.dz,
                    widths=ie.widths,
                    blocks_per_stage=ie.blocks_per_stage,
                    name="image_encoder",
                )
            else:
                from dpfx.models.encoders import MixerImageEncoder

                self.image_encoder = MixerImageEncoder(
                    dz=m.dz, patch=ie.patch, width=ie.width, depth=ie.depth,
                    name="image_encoder",
                )

    # ---- posterior ----------------------------------------------------

    def posterior(self, x: Array, image: Optional[Array] = None) -> Tuple[Array, Array]:
        if image is not None:
            return self.image_encoder(image)
        return self.encoder(x)

    # ---- ELBO ----------------------------------------------------------

    def elbo_terms(
        self, x: Array, rng: Array, image: Optional[Array] = None,
        eps: Optional[Array] = None,
        posterior: Optional[Tuple[Array, Array]] = None,
    ) -> dict:
        """Per-cloud ELBO pieces. x: [B, N, 3]; returns dict of [B] arrays.

        recon_ll sums log p(x_i|z) over the N points of each cloud
        (SURVEY.md §7; reduction convention is §9.4 VERIFY — controlled at
        the loss level via train.recon_reduction).

        ``eps`` / ``posterior`` optionally supply the reparameterization
        noise and a precomputed (mu, logvar) — used by the shard_map train
        step (global-shape noise stream) and the fused-encoder path
        (dpfx.ops.fused_encoder computes q(z|X) outside apply()).
        """
        mu, logvar = posterior if posterior is not None else self.posterior(x, image)
        if eps is None:
            eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps  # reparameterized sample

        logq = gaussian_logprob(z, mu, logvar)            # [B]
        logp_z = self.latent_flow.log_prob(z)             # [B]
        logp_x = self.point_flow.log_prob(x, z)           # [B, N]
        recon_ll = jnp.sum(logp_x, axis=-1)               # [B]
        return dict(recon_ll=recon_ll, logp_z=logp_z, logq=logq, z=z)

    def elbo_latent_terms(
        self, x: Array, rng: Array, image: Optional[Array] = None,
        eps: Optional[Array] = None,
        posterior: Optional[Tuple[Array, Array]] = None,
        with_logp_z: bool = True,
    ) -> dict:
        """Posterior + latent-prior ELBO pieces WITHOUT the point-flow
        reconstruction term — the fused-train path (dpfx.ops.fused_train)
        computes recon_ll outside apply() through the custom-VJP kernels.

        ``eps`` (optional) supplies the reparameterization noise: the
        shard_map train step draws it OUTSIDE the sharded region with the
        global batch shape, so per-device local shapes don't change the
        random stream vs the single-device step. ``posterior`` optionally
        supplies a precomputed (mu, logvar) — the fused-encoder path.
        ``with_logp_z=False`` skips the prior term — the fused-latent path
        (dpfx.ops.fused_latent) computes it outside apply()."""
        mu, logvar = posterior if posterior is not None else self.posterior(x, image)
        if eps is None:
            eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        out = dict(logq=gaussian_logprob(z, mu, logvar), z=z)
        if with_logp_z:
            out["logp_z"] = self.latent_flow.log_prob(z)
        return out

    def __call__(self, x: Array, rng: Array, image: Optional[Array] = None) -> Array:
        """Negative ELBO per cloud (init/apply default)."""
        t = self.elbo_terms(x, rng, image)
        return -(t["recon_ll"] + t["logp_z"] - t["logq"])

    # ---- sampling (SURVEY.md §3.2) --------------------------------------

    def sample(self, rng: Array, n_clouds: int, n_points: int,
               temperature: float = 1.0,
               latent_temperature: float = 1.0) -> Array:
        """Prior sample. ``temperature`` / ``latent_temperature`` scale the
        point / latent base noise (tau=1 is the unmodified model — see
        dpfx.sampling.make_sampler for the lever's rationale)."""
        rng_z, rng_u = jax.random.split(rng)
        dz = self.config.model.dz
        eps = jax.random.normal(rng_z, (n_clouds, dz))
        if latent_temperature != 1.0:
            eps = eps * latent_temperature
        z, _ = self.latent_flow.inverse(eps)
        u = jax.random.normal(rng_u, (n_clouds, n_points, 3))
        if temperature != 1.0:
            u = u * temperature
        x, _ = self.point_flow.inverse(u, z)
        return x

    def decode(self, z: Array, rng: Array, n_points: int) -> Array:
        """Sample a cloud of n_points from p(x|z). z: [B, dz] -> [B, N, 3]."""
        u = jax.random.normal(rng, (z.shape[0], n_points, 3))
        x, _ = self.point_flow.inverse(u, z)
        return x

    def encode(self, x: Array, image: Optional[Array] = None) -> Tuple[Array, Array]:
        return self.posterior(x, image)

    def reconstruct(
        self, x: Array, rng: Array, n_points: Optional[int] = None,
        image: Optional[Array] = None, use_mean: bool = True,
    ) -> Array:
        """AE eval path (SURVEY.md §3.4): encode, then inverse-flow decode."""
        n_points = n_points or x.shape[-2]
        mu, logvar = self.posterior(x, image)
        if use_mean:
            z = mu
        else:
            rng, rng_z = jax.random.split(rng)
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng_z, mu.shape)
        return self.decode(z, rng, n_points)
