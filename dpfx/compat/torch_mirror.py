"""torch-CPU mirror of the DPF model (SURVEY.md §6 fallback protocol).

Purpose (torch is an ORACLE here, never a compute path):
  1. End-to-end converter test: random-init this mirror, torch.save its
     state_dict, run the converter, and require the JAX model to reproduce
     its outputs — so checkpoint import is proven machinery, not dead code,
     even while the reference mount is empty (SURVEY.md §0, §9.8).
  2. Whole-model parity oracle: independent implementation of the flow
     math (same masks / activation / scale-cap conventions).

The module tree intentionally matches dpfx naming one-to-one
(couplings.{k}.cond_net.{in_x,in_z,hidden_i,out}, encoder.point_{i}, ...);
the declarative map in convert.py handles the mechanical differences
(Linear weight transpose, 'weight'->'kernel'). When the real reference
appears, its names go into a map file — a data change (SURVEY.md §8 hard
part 3)."""

from __future__ import annotations

import math
from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F

from dpfx.models.coupling import make_masks


def _act(name: str):
    # flax.linen.gelu default is the tanh approximation
    return {
        "relu": F.relu,
        "gelu": lambda x: F.gelu(x, approximate="tanh"),
        "tanh": torch.tanh,
        "leaky_relu": F.leaky_relu,
    }[name]


class Conditioner(nn.Module):
    def __init__(self, dim: int, hidden: int, n_hidden: int, cond_dim: Optional[int],
                 activation: str = "relu"):
        super().__init__()
        self.act = _act(activation)
        self.in_x = nn.Linear(dim, hidden)
        if cond_dim is not None:
            self.in_z = nn.Linear(cond_dim, hidden, bias=False)
        self.hiddens = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(n_hidden - 1)]
        )
        self.out = nn.Linear(hidden, 2 * dim)
        nn.init.zeros_(self.out.weight)
        nn.init.zeros_(self.out.bias)

    def forward(self, x_masked, cond):
        h = self.in_x(x_masked)
        if cond is not None:
            hz = self.in_z(cond)
            if hz.dim() == h.dim() - 1:
                hz = hz.unsqueeze(-2)
            h = h + hz
        h = self.act(h)
        for lin in self.hiddens:
            h = self.act(lin(h))
        s, t = self.out(h).chunk(2, dim=-1)
        return s, t


class AffineCoupling(nn.Module):
    def __init__(self, dim, mask, hidden, n_hidden, cond_dim, scale_cap=8.0,
                 activation="relu"):
        super().__init__()
        self.register_buffer("mask", torch.tensor(mask, dtype=torch.float32))
        self.cond_net = Conditioner(dim, hidden, n_hidden, cond_dim, activation)
        self.scale_cap = scale_cap

    def _st(self, x, cond):
        s, t = self.cond_net(x * self.mask, cond)
        s = self.scale_cap * torch.tanh(s / self.scale_cap)
        inv = 1.0 - self.mask
        return s * inv, t * inv

    def forward_(self, x, cond):
        s, t = self._st(x, cond)
        y = torch.where(self.mask > 0, x, x * torch.exp(s) + t)
        return y, s.sum(-1)

    def inverse_(self, y, cond):
        s, t = self._st(y, cond)
        x = torch.where(self.mask > 0, y, (y - t) * torch.exp(-s))
        return x, -s.sum(-1)


class CouplingFlow(nn.Module):
    def __init__(self, dim, n_layers, hidden, n_hidden, cond_dim=None, scale_cap=8.0,
                 activation="relu"):
        super().__init__()
        masks = make_masks(dim, n_layers)
        self.couplings = nn.ModuleList(
            [
                AffineCoupling(dim, masks[k].tolist(), hidden, n_hidden, cond_dim,
                               scale_cap, activation)
                for k in range(n_layers)
            ]
        )

    def forward_(self, x, cond=None):
        logdet = torch.zeros(x.shape[:-1])
        for c in self.couplings:
            x, ld = c.forward_(x, cond)
            logdet = logdet + ld
        return x, logdet

    def inverse_(self, u, cond=None):
        logdet = torch.zeros(u.shape[:-1])
        for c in reversed(self.couplings):
            u, ld = c.inverse_(u, cond)
            logdet = logdet + ld
        return u, logdet

    def log_prob(self, x, cond=None):
        u, logdet = self.forward_(x, cond)
        log_base = -0.5 * (u * u + math.log(2 * math.pi)).sum(-1)
        return log_base + logdet


class PointNetEncoder(nn.Module):
    def __init__(self, dz, point_widths=(128, 128, 256, 512), head_widths=(256,),
                 activation="relu"):
        super().__init__()
        self.act = _act(activation)
        last = 3
        for i, w in enumerate(point_widths):
            setattr(self, f"point_{i}", nn.Linear(last, w))
            last = w
        self.n_point = len(point_widths)
        for i, w in enumerate(head_widths):
            setattr(self, f"head_{i}", nn.Linear(last, w))
            last = w
        self.n_head = len(head_widths)
        self.gauss = nn.Linear(last, 2 * dz)

    def forward(self, x):
        h = x
        for i in range(self.n_point):
            h = self.act(getattr(self, f"point_{i}")(h))
        g = h.max(dim=-2).values
        for i in range(self.n_head):
            g = self.act(getattr(self, f"head_{i}")(g))
        mu, logvar = self.gauss(g).chunk(2, dim=-1)
        return mu, torch.clamp(logvar, -10.0, 10.0)


class DPFMirror(nn.Module):
    """Encoder + conditional point flow + latent prior flow (no image
    encoder: SVR checkpoints add one module at the same slot)."""

    def __init__(self, cfg):
        super().__init__()
        m = cfg.model
        self.point_flow = CouplingFlow(
            3, m.point_flow.n_layers, m.point_flow.hidden, m.point_flow.n_hidden,
            cond_dim=m.dz, scale_cap=m.point_flow.scale_cap,
            activation=m.point_flow.activation,
        )
        self.latent_flow = CouplingFlow(
            m.dz, m.latent_flow.n_layers, m.latent_flow.hidden,
            m.latent_flow.n_hidden, cond_dim=None, scale_cap=m.latent_flow.scale_cap,
            activation=m.latent_flow.activation,
        )
        self.encoder = PointNetEncoder(
            m.dz, tuple(m.encoder.point_widths), tuple(m.encoder.head_widths),
            activation=m.encoder.activation,
        )

    @torch.no_grad()
    def randomize_(self, seed: int = 0) -> None:
        """Perturb all params (incl. the zero-init out layers) so converter
        tests exercise non-trivial weights."""
        g = torch.Generator().manual_seed(seed)
        for p in self.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
