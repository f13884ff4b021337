"""dpfx — TPU-native Discrete Point Flow Networks.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Regenerator/dpf-nets (DPF-Nets, ECCV 2020, arXiv:2007.10170): a
latent-variable generative model of 3-D point clouds whose decoder is a
discrete normalizing flow of conditional affine coupling layers, with a
flow prior over latents and a PointNet-style posterior encoder.

Capability surface (see SURVEY.md §2 component inventory):
  - log-likelihood (ELBO) training of autoencoding / generative / SVR models
  - fast batched inverse-flow sampling, compiled end-to-end on device
  - Chamfer / EMD structural losses as Pallas TPU kernels (reference: CUDA)
  - PointFlow-protocol evaluation suite: CD/EMD, MMD, COV, 1-NNA, JSD
  - data-parallel training over a `jax.sharding.Mesh` (gradient psum on ICI)
  - reference-compatible YAML configs and torch->orbax checkpoint import

NOTE on citations: the reference mount (/root/reference) was empty in every
session so far (SURVEY.md §0), so docstrings cite SURVEY.md sections and the
paper instead of reference file:line. Replace with real cites when the mount
appears (SURVEY.md §9 checklist).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (kept lazy so `import dpfx` stays cheap and
    jax is not initialized before callers can set platforms)."""
    if name in ("Config", "load_config", "config_from_dict"):
        import dpfx.config as m
        return getattr(m, name)
    if name in ("DPF", "CouplingFlow", "PointNetEncoder"):
        import dpfx.models as m
        return getattr(m, name)
    if name in ("Trainer", "restore_for_eval"):
        import dpfx.train as m
        return getattr(m, name)
    if name in ("make_sampler", "make_decoder"):
        import dpfx.sampling as m
        return getattr(m, name)
    if name in ("chamfer", "emd", "chamfer_pairwise", "emd_pairwise"):
        import dpfx.ops as m
        return getattr(m, name)
    if name == "compute_all_metrics":
        import dpfx.metrics as m
        return m.compute_all_metrics
    raise AttributeError(f"module 'dpfx' has no attribute {name!r}")
