"""ELBO loss (SURVEY.md §2 C9, §7 objective).

loss = -( recon_ll + kl_weight * (logp_z - logq) ) / normalizer

``recon_reduction`` controls the SURVEY.md §9.4 VERIFY point — whether the
per-cloud reconstruction term is summed or averaged over points before the
batch mean (it changes optimizer scaling, not the optimum):

  * "sum_points":  per-cloud nats; loss is mean over batch of per-cloud ELBO
  * "mean_points": per-point nats for the recon term (KL scaled by 1/N too,
    keeping the bound a valid per-point ELBO)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_fused_warned: set = set()


def _warn_once(key, message: str) -> None:
    if key not in _fused_warned:
        _fused_warned.add(key)
        import warnings

        warnings.warn(message, stacklevel=4)


def _warn_fused_unsupported(flow_cfg) -> None:
    _warn_once(
        (flow_cfg.activation, flow_cfg.use_actnorm),
        "dpfx.train: fused_point_flow requested but the flow config "
        f"(activation={flow_cfg.activation!r}, actnorm="
        f"{flow_cfg.use_actnorm}) is outside the fused kernels' "
        "support; using the XLA path",
    )


def _warn_enc_unsupported(enc_cfg, n: int) -> None:
    _warn_once(
        ("enc", enc_cfg.activation, n),
        "dpfx.train: fused_encoder requested but the encoder config "
        f"(activation={enc_cfg.activation!r}, n_points={n}) is outside "
        "the fused kernel's support; using the flax path",
    )


def elbo_loss(
    model,
    params,
    x: Array,
    rng: Array,
    image: Optional[Array] = None,
    kl_weight: float = 1.0,
    recon_reduction: str = "sum_points",
    fused_point_flow: bool = False,
    eps: Optional[Array] = None,
    fused_encoder: bool = False,
    fused_latent_flow: bool = False,
) -> Tuple[Array, dict]:
    """Returns (scalar loss, metrics dict). x: [B, N, 3].

    ``fused_point_flow=True`` routes the reconstruction term through the
    fused forward(+log-det) custom-VJP Pallas kernels
    (dpfx.ops.fused_train) — identical math, VMEM-resident layer chain
    instead of XLA's per-layer HBM streaming. ``fused_encoder=True`` does
    the same for q(z|X) (dpfx.ops.fused_encoder; point modality only).
    Either falls back to the XLA/flax path (with a one-time warning) when
    its configuration is outside the kernel's support."""
    posterior = None
    if fused_encoder and image is None:
        from dpfx.ops.fused_encoder import (
            fused_encoder_supported,
            fused_pointnet_posterior,
        )

        enc_cfg = model.config.model.encoder
        if fused_encoder_supported(enc_cfg, x.shape[-2]):
            posterior = fused_pointnet_posterior(
                params, x, enc_cfg, model.config.model.dz)
        else:
            _warn_enc_unsupported(enc_cfg, x.shape[-2])
    use_fused_lat = False
    if fused_latent_flow:
        from dpfx.ops.fused_latent import fused_latent_supported

        lf_cfg = model.config.model.latent_flow
        use_fused_lat = fused_latent_supported(lf_cfg, model.config.model.dz)
        if not use_fused_lat:
            _warn_once(
                ("lat", lf_cfg.activation, lf_cfg.use_actnorm,
                 model.config.model.dz),
                "dpfx.train: fused_latent_flow requested but the latent-flow "
                "config is outside the fused kernel's support (needs relu, "
                "no actnorm, dz > 16 and dz % 8 == 0); using the XLA path",
            )
    if fused_point_flow or use_fused_lat:
        from dpfx.ops.fused_train import (
            fused_point_flow_recon_ll,
            fused_train_supported,
        )

        flow_cfg = model.config.model.point_flow
        use_fused_pf = fused_point_flow and fused_train_supported(flow_cfg)
        if fused_point_flow and not use_fused_pf:
            _warn_fused_unsupported(flow_cfg)
        if use_fused_pf or use_fused_lat:
            t = dict(model.apply(params, x, rng, image, eps, posterior,
                                 not use_fused_lat,
                                 method=model.elbo_latent_terms))
            if use_fused_pf:
                t["recon_ll"] = fused_point_flow_recon_ll(
                    params, x, t["z"], flow_cfg)
            else:
                t["recon_ll"] = model.apply(
                    params, x, t["z"],
                    method=lambda m, x_, z_: m.point_flow.log_prob(x_, z_),
                ).sum(-1)
            if use_fused_lat:
                from dpfx.ops.fused_latent import fused_latent_log_prob

                t["logp_z"] = fused_latent_log_prob(params, t["z"], lf_cfg)
        else:
            t = model.apply(params, x, rng, image, eps, posterior,
                            method=model.elbo_terms)
    else:
        t = model.apply(params, x, rng, image, eps, posterior,
                        method=model.elbo_terms)
    n = x.shape[-2]
    recon = t["recon_ll"]
    kl = t["logq"] - t["logp_z"]  # MC estimate of KL(q || p) per cloud
    if recon_reduction == "mean_points":
        recon = recon / n
        kl_scaled = kl / n
    elif recon_reduction == "sum_points":
        kl_scaled = kl
    else:
        raise ValueError(f"unknown recon_reduction {recon_reduction!r}")
    neg_elbo = -(recon - kl_weight * kl_scaled)
    loss = jnp.mean(neg_elbo)
    metrics = {
        "loss": loss,
        "neg_elbo_per_point": jnp.mean(-(t["recon_ll"] - kl)) / n,
        "recon_ll_per_point": jnp.mean(t["recon_ll"]) / n,
        "kl": jnp.mean(kl),
        "logp_z": jnp.mean(t["logp_z"]),
    }
    return loss, metrics
