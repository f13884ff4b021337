"""Task-level evaluation protocols (SURVEY.md §2 C13/C14, §3.3/§3.4/§3.5).

  * autoencoding: encode test cloud -> inverse-flow decode N points ->
    per-pair CD (and EMD) -> dataset means (SURVEY.md §3.4)
  * generation: sample a set matching the test set -> full metric suite
    (SURVEY.md §3.3)
  * svr: decode from the image posterior -> per-pair CD/EMD vs GT cloud
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dpfx.config import Config
from dpfx.metrics.generation import compute_all_metrics
from dpfx.models import DPF
from dpfx.ops import chamfer, emd_nograd


def _fetch(x) -> np.ndarray:
    """jax.Array -> host numpy, pod-safe: a multi-process sampler output is
    a GLOBAL array sharded over non-addressable devices, which np.asarray
    refuses; every process gathers the full value over the pod instead."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def evaluate_reconstruction(
    model: DPF,
    params,
    clouds: np.ndarray,
    cfg: Config,
    rng,
    images: Optional[np.ndarray] = None,
    impl: str = "auto",
    labels: Optional[np.ndarray] = None,
    label_names: Optional[Dict[int, str]] = None,
) -> Dict[str, float]:
    """AE / SVR reconstruction eval. clouds: [S, N, 3] test split. With
    ``labels``, per-category means are reported too (SURVEY.md §6)."""
    bsz = cfg.eval.batch_size
    use_emd = "emd" in cfg.eval.metrics
    n_iters = cfg.eval.emd_iters

    from dpfx.sampling import make_decoder

    decode = make_decoder(model, params, clouds.shape[1])

    @jax.jit
    def recon_batch(xb, rngb, imgb=None):
        # encode -> posterior mean -> fused inverse-flow decode (SURVEY §3.4)
        mu, _ = model.apply(params, xb, imgb, method=model.posterior)
        rec = decode(mu, rngb)
        cd = chamfer(rec, xb, impl)
        e = emd_nograd(rec, xb, impl, n_iters) if use_emd else jnp.zeros_like(cd)
        return cd, e

    cds, emds = [], []
    s = clouds.shape[0]
    for i in range(0, s, bsz):
        xb = jnp.asarray(clouds[i : i + bsz])
        imgb = jnp.asarray(images[i : i + bsz]) if images is not None else None
        cd, e = recon_batch(xb, jax.random.fold_in(rng, i), imgb)
        cds.append(np.asarray(cd))
        emds.append(np.asarray(e))
    cds = np.concatenate(cds)
    emds = np.concatenate(emds)
    out: Dict[str, float] = {"recon-cd": float(cds.mean())}
    if use_emd:
        out["recon-emd"] = float(emds.mean())
    if labels is not None and len(np.unique(labels)) > 1:
        per = {}
        for c in np.unique(labels):
            sel = np.asarray(labels) == c
            name = (label_names or {}).get(int(c), f"cat{int(c)}")
            per[name] = {"recon-cd": float(cds[sel].mean())}
            if use_emd:
                per[name]["recon-emd"] = float(emds[sel].mean())
        out["per_category"] = per
    return out


def evaluate_generation(
    model: DPF,
    params,
    ref_clouds: np.ndarray,
    cfg: Config,
    rng,
    mesh: Optional[Mesh] = None,
    impl: str = "auto",
    sample_batch: int = 64,
    labels: Optional[np.ndarray] = None,
    label_names: Optional[Dict[int, str]] = None,
) -> Dict[str, float]:
    """Generation suite: |gen| = |ref| clouds of the ref's point count.

    With a multi-device mesh, sampling shards the cloud axis over it
    (every chip generates, not just one) and the pairwise matrices row-
    shard (SURVEY.md §2.2)."""
    from dpfx.sampling import make_sampler

    s, n = ref_clouds.shape[0], ref_clouds.shape[1]
    nd = mesh.devices.size if mesh is not None else 1
    if nd > 1 and sample_batch % nd:
        sample_batch += (-sample_batch) % nd  # round up to a mesh multiple
    sample_batch_fn = make_sampler(
        model, params, sample_batch, n, mesh=mesh,
        axis_name=cfg.parallel.axis_name,
        temperature=cfg.eval.temperature,
        latent_temperature=cfg.eval.latent_temperature,
    )

    outs = []
    for i in range(0, s, sample_batch):
        outs.append(_fetch(sample_batch_fn(jax.random.fold_in(rng, i))))
    gen = np.concatenate(outs, axis=0)[:s]
    return compute_all_metrics(
        jnp.asarray(gen),
        jnp.asarray(ref_clouds),
        metrics=cfg.eval.metrics,
        impl=impl,
        mesh=mesh,
        jsd_resolution=cfg.eval.jsd_resolution,
        ref_labels=labels,
        label_names=label_names,
        precision=cfg.eval.pairwise_precision or None,
        jsd_frame=cfg.eval.jsd_frame,
    )
