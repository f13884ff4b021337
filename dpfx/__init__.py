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
