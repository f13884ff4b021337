from dpfx.models.coupling import ActNorm, AffineCoupling, Conditioner, CouplingFlow, make_masks
from dpfx.models.dpf import DPF, gaussian_logprob, standard_normal_logprob
from dpfx.models.encoders import ImageEncoder, PointNetEncoder

__all__ = [
    "ActNorm",
    "AffineCoupling",
    "Conditioner",
    "CouplingFlow",
    "make_masks",
    "DPF",
    "gaussian_logprob",
    "standard_normal_logprob",
    "ImageEncoder",
    "PointNetEncoder",
]
