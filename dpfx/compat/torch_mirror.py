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


class ResBlockMirror(nn.Module):
    """Mirrors dpfx.models.encoders.ResBlock with flax auto-names as torch
    attribute names (Conv_0/Conv_1 = the 3x3 pair, Conv_2 = 1x1 proj when
    channels change; GroupNorm eps matches flax's 1e-6 default). Runs in
    NCHW; the parent converts from NHWC once at entry."""

    def __init__(self, c_in: int, width: int):
        super().__init__()
        self.GroupNorm_0 = nn.GroupNorm(8, c_in, eps=1e-6)
        self.Conv_0 = nn.Conv2d(c_in, width, 3, padding=1)
        self.GroupNorm_1 = nn.GroupNorm(8, width, eps=1e-6)
        self.Conv_1 = nn.Conv2d(width, width, 3, padding=1)
        self.proj = c_in != width
        if self.proj:
            self.Conv_2 = nn.Conv2d(c_in, width, 1)

    def forward(self, x):
        h = self.Conv_0(F.gelu(self.GroupNorm_0(x), approximate="tanh"))
        h = self.Conv_1(F.gelu(self.GroupNorm_1(h), approximate="tanh"))
        if self.proj:
            x = self.Conv_2(x)
        return x + h


class ConvImageEncoderMirror(nn.Module):
    """torch mirror of ConvImageEncoder (SURVEY.md §2 C8): same flax
    auto-names (Conv_0 stem, s{stage}_b{block} ResBlocks, Dense_0 head,
    gauss) so the converter rules are mechanical regexes."""

    def __init__(self, dz: int, widths=(32, 64, 128, 256), blocks_per_stage: int = 2):
        super().__init__()
        self.Conv_0 = nn.Conv2d(3, widths[0], 3, padding=1)
        last = widths[0]
        self.stages = []
        for stage, w in enumerate(widths):
            for b in range(blocks_per_stage):
                name = f"s{stage}_b{b}"
                setattr(self, name, ResBlockMirror(last, w))
                self.stages.append(name)
                last = w
        self.Dense_0 = nn.Linear(widths[-1], 2 * widths[-1])
        self.gauss = nn.Linear(2 * widths[-1], 2 * dz)
        self.blocks_per_stage = blocks_per_stage

    def forward(self, img):
        """img: [B, H, W, 3] (flax NHWC contract) -> (mu, logvar)."""
        h = img.permute(0, 3, 1, 2)  # NCHW for torch convs
        h = self.Conv_0(h)
        for i, name in enumerate(self.stages):
            h = getattr(self, name)(h)
            if (i + 1) % self.blocks_per_stage == 0:
                h = F.avg_pool2d(h, 2)
        g = h.mean(dim=(-2, -1))  # global average pool
        g = F.gelu(self.Dense_0(g), approximate="tanh")
        mu, logvar = self.gauss(g).chunk(2, dim=-1)
        return mu, torch.clamp(logvar, -10.0, 10.0)


class MixerImageEncoderMirror(nn.Module):
    """torch mirror of MixerImageEncoder: patch embed + token/channel-mix
    blocks, flax names (embed, ln_t_i, tok_in_i, ..., head, gauss);
    LayerNorm eps matches flax's 1e-6."""

    def __init__(self, dz: int, patch: int = 8, width: int = 256, depth: int = 4,
                 image_size: int = 128):
        super().__init__()
        self.patch, self.depth = patch, depth
        t = (image_size // patch) ** 2
        self.embed = nn.Linear(patch * patch * 3, width)
        for i in range(depth):
            setattr(self, f"ln_t_{i}", nn.LayerNorm(width, eps=1e-6))
            setattr(self, f"tok_in_{i}", nn.Linear(t, t * 2))
            setattr(self, f"tok_out_{i}", nn.Linear(t * 2, t))
            setattr(self, f"ln_c_{i}", nn.LayerNorm(width, eps=1e-6))
            setattr(self, f"ch_in_{i}", nn.Linear(width, width * 2))
            setattr(self, f"ch_out_{i}", nn.Linear(width * 2, width))
        self.head = nn.Linear(width, width)
        self.gauss = nn.Linear(width, 2 * dz)

    def forward(self, img):
        b, h, w, c = img.shape
        p = self.patch
        x = img.reshape(b, h // p, p, w // p, p, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        x = self.embed(x)
        gelu = lambda v: F.gelu(v, approximate="tanh")
        for i in range(self.depth):
            y = getattr(self, f"ln_t_{i}")(x).transpose(1, 2)
            y = getattr(self, f"tok_out_{i}")(gelu(getattr(self, f"tok_in_{i}")(y)))
            x = x + y.transpose(1, 2)
            y = getattr(self, f"ln_c_{i}")(x)
            x = x + getattr(self, f"ch_out_{i}")(gelu(getattr(self, f"ch_in_{i}")(y)))
        g = x.mean(dim=1)
        g = gelu(self.head(g))
        mu, logvar = self.gauss(g).chunk(2, dim=-1)
        return mu, torch.clamp(logvar, -10.0, 10.0)


class DPFMirror(nn.Module):
    """Encoder + conditional point flow + latent prior flow; with
    cfg.experiment == "svr", an image encoder (conv or mixer per
    cfg.model.image_encoder.arch) joins at the same slot — so reference
    SVR checkpoints are convertible end-to-end (SURVEY.md §2 C12, §9.8)."""

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
        if cfg.experiment == "svr":
            ie = m.image_encoder
            if ie.arch == "conv":
                self.image_encoder = ConvImageEncoderMirror(
                    m.dz, tuple(ie.widths), ie.blocks_per_stage
                )
            else:
                self.image_encoder = MixerImageEncoderMirror(
                    m.dz, ie.patch, ie.width, ie.depth, ie.image_size
                )

    @torch.no_grad()
    def randomize_(self, seed: int = 0) -> None:
        """Perturb all params (incl. the zero-init out layers) so converter
        tests exercise non-trivial weights."""
        g = torch.Generator().manual_seed(seed)
        for p in self.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))


def gaussian_logprob_torch(x, mu, logvar):
    """torch twin of dpfx.models.dpf.gaussian_logprob (sum over last axis)."""
    return -0.5 * (
        logvar + math.log(2.0 * math.pi) + (x - mu) ** 2 * torch.exp(-logvar)
    ).sum(-1)


def elbo_loss_torch(mirror: "DPFMirror", x, eps, kl_weight: float = 1.0,
                    recon_reduction: str = "sum_points"):
    """torch twin of dpfx.train.loss.elbo_loss (point modality), with the
    reparameterization noise ``eps`` supplied so the JAX and torch
    trajectories share one random stream. Used by the end-to-end
    training-trajectory oracle (round-3 VERDICT item 6): per-module parity
    tests can't catch gradient-convention drift; ~20 identical Adam steps
    on both frameworks can."""
    mu, logvar = mirror.encoder(x)
    z = mu + torch.exp(0.5 * logvar) * eps
    logq = gaussian_logprob_torch(z, mu, logvar)
    logp_z = mirror.latent_flow.log_prob(z)
    recon_ll = mirror.point_flow.log_prob(x, z).sum(-1)
    n = x.shape[-2]
    kl = logq - logp_z
    if recon_reduction == "mean_points":
        recon = recon_ll / n
        kl_scaled = kl / n
    elif recon_reduction == "sum_points":
        recon, kl_scaled = recon_ll, kl
    else:
        raise ValueError(recon_reduction)
    return (-(recon - kl_weight * kl_scaled)).mean()


def train_trajectory_torch(mirror: "DPFMirror", batches, eps_list,
                           lr: float = 1e-3, kl_weight: float = 1.0,
                           recon_reduction: str = "sum_points"):
    """Adam trajectory oracle: one optimizer step per (batch, eps) pair,
    returning the per-step losses. Hyperparameters mirror optax.adam's
    defaults (betas 0.9/0.999, eps 1e-8, no weight decay) — the JAX side
    must be configured with lr_schedule=constant, no warmup, grad_clip=0
    for the comparison to be exact."""
    opt = torch.optim.Adam(mirror.parameters(), lr=lr, betas=(0.9, 0.999),
                           eps=1e-8)
    losses = []
    for x, eps in zip(batches, eps_list):
        opt.zero_grad()
        loss = elbo_loss_torch(mirror, torch.as_tensor(x),
                               torch.as_tensor(eps), kl_weight,
                               recon_reduction)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses
