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


def elbo_loss(
    model,
    params,
    x: Array,
    rng: Array,
    image: Optional[Array] = None,
    kl_weight: float = 1.0,
    recon_reduction: str = "sum_points",
) -> Tuple[Array, dict]:
    """Returns (scalar loss, metrics dict). x: [B, N, 3]."""
    t = model.apply(params, x, rng, image, method=model.elbo_terms)
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
