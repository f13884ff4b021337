"""Fused inverse-point-flow Pallas kernel (SURVEY.md §8 step 7 — "a fused
kernel keeping points resident in VMEM across all K layers is the
speed-of-light play"; BASELINE.json ">10x clouds/sec/chip").

Why XLA alone is not enough: the unfused sampling path streams the
[B*N, hidden] activations through HBM for every one of the K coupling
layers (~13 GB of traffic per 256x2048 batch) — bandwidth-bound at ~28 ms.
This kernel keeps a tile of points and ALL stacked layer weights resident
in VMEM and applies the K inverted couplings in one pass; HBM traffic
drops to reading u and writing x (~12 MB).

Layout: transposed [coords, points] tiles so the coupling arithmetic runs
with points on the 128-lane axis and the conditioner matmuls are
[H, C] x [C, T] MXU contractions. The per-cloud z-projections of every
layer (in_z kernel @ z + in_x bias) are precomputed OUTSIDE the kernel as
one einsum — the kernel never sees z.

Semantics parity: identical math to CouplingFlow.inverse (masked affine
coupling, tanh scale cap, configurable conditioner activation); tested against the flax path
to f32 tolerance. bf16 weight/activation mode doubles MXU throughput; the
coupling arithmetic stays f32 either way.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpfx.models.coupling import ACTIVATIONS, make_masks
from dpfx.ops.chamfer import _interpret, _round_up

Array = jax.Array

# Mosaic's default scoped-vmem limit is 16MB; the grouped-output sample
# kernel's stack (G x [8, tile] out block double-buffered + the unrolled
# 32-layer chain's temps) measured 19.6M at B=256 G>=1 — same fix as the
# fused-train backward (v5e has 128MB physical VMEM).
SAMPLE_VMEM_MB = int(os.environ.get("DPFX_SAMPLE_VMEM_MB", "64"))


class StackedFlowParams(NamedTuple):
    """Per-layer conditioner weights stacked on a leading K axis, transposed
    for [H, C] x [C, T] matmuls, coords padded 3->8."""

    wx: Array      # [K, H, 8]
    wz: Array      # [K, dz, H]   (used outside the kernel for hz)
    bx: Array      # [K, H]
    wh: Array      # [K, n_hidden-1, H, H]  (transposed: out x in)
    bh: Array      # [K, n_hidden-1, H, 1]  (trailing singleton: 2-D in-kernel reads)
    wout: Array    # [K, 8, H]    (rows 0-2 = s, 3-5 = t, 6-7 zero)
    bout: Array    # [K, 8, 1]
    masks: Array   # [K, 8, 1]    (1 = passthrough; padded rows 1)
    scale_cap: float


def stack_point_flow_params(params: Dict[str, Any], scale_cap: float = 8.0) -> StackedFlowParams:
    """Extract + stack the conditional point flow's conditioner weights from
    a DPF params tree ({'params': {'point_flow': {'coupling_k': ...}}})."""
    tree = params["params"]["point_flow"]
    ks = sorted((k for k in tree if k.startswith("coupling_")),
                key=lambda s: int(s.split("_")[1]))
    n_layers = len(ks)
    masks3_np = make_masks(3, n_layers)
    wx, bx, wz, whs, bhs, wout, bout = [], [], [], [], [], [], []
    for ki, k in enumerate(ks):
        cn = tree[k]["cond_net"]
        kin = np.asarray(cn["in_x"]["kernel"])          # [3, H]
        h = kin.shape[1]
        wx_k = np.zeros((h, 8), kin.dtype)
        # fold the layer's input mask into Wx: Wx @ (x*m) == (Wx*m) @ x,
        # saving the per-layer masking multiply inside the kernel
        wx_k[:, :3] = kin.T * masks3_np[ki][None, :]
        wx.append(wx_k)
        bx.append(np.asarray(cn["in_x"]["bias"]))
        wz.append(np.asarray(cn["in_z"]["kernel"]))      # [dz, H]
        hidden_names = sorted((n for n in cn if n.startswith("hidden_")),
                              key=lambda s: int(s.split("_")[1]))
        whs.append(np.stack([np.asarray(cn[n]["kernel"]).T for n in hidden_names])
                   if hidden_names else np.zeros((0, h, h), kin.dtype))
        bhs.append(np.stack([np.asarray(cn[n]["bias"]) for n in hidden_names])
                   if hidden_names else np.zeros((0, h), kin.dtype))
        ko = np.asarray(cn["out"]["kernel"])             # [H, 6]
        wo = np.zeros((8, h), ko.dtype)
        wo[:6, :] = ko.T
        wout.append(wo)
        bo = np.zeros((8,), ko.dtype)
        bo[:6] = np.asarray(cn["out"]["bias"])
        bout.append(bo)
    masks3 = make_masks(3, n_layers)                     # [K, 3], 1 = passthrough
    masks = np.ones((n_layers, 8), np.float32)
    masks[:, :3] = masks3
    return StackedFlowParams(
        wx=jnp.asarray(np.stack(wx)),
        wz=jnp.asarray(np.stack(wz)),
        bx=jnp.asarray(np.stack(bx)),
        wh=jnp.asarray(np.stack(whs)),
        bh=jnp.asarray(np.stack(bhs))[..., None],
        wout=jnp.asarray(np.stack(wout)),
        bout=jnp.asarray(np.stack(bout))[..., None],
        masks=jnp.asarray(masks)[..., None],
        scale_cap=float(scale_cap),
    )


def _fused_inverse_kernel(
    hz_ref, u_ref, wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref, x_ref,
    *, n_layers: int, n_hidden_m1: int, t: int, cap: float, dtype,
    activation: str = "relu", unroll: bool = True,
):
    """One (cloud, point-tile) grid step: apply all K inverted couplings.

    Mosaic discipline: every dynamic-layer read returns a 2-D [C, 1] or
    [C, H] block (bias/mask arrays carry a trailing singleton), and the
    coupling update works on the full [8, T] tile — the t-offset (rows 3-5
    of the conditioner output must align with coordinate rows 0-2) is
    handled with pltpu.roll, so there is no sublane slice/concat anywhere."""
    act = ACTIVATIONS[activation]
    x = u_ref[0].astype(jnp.float32)  # [8, T]; rows 3..7 are zero padding

    def layer(i, x):
        k = n_layers - 1 - i  # inverse order
        mask = masks_ref[k]                             # [8, 1]; padded rows 1
        wxk = wx_ref[k].astype(dtype)                   # [H, 8]; mask pre-folded
        h = jax.lax.dot_general(
            wxk, x.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [H, T]
        h = h + hz_ref[0, k]                            # + (Wz z + bx): [H, 1]
        h = act(h).astype(dtype)

        def hidden(j, h):
            whj = wh_ref[k, j].astype(dtype)            # [H, H]
            hh = jax.lax.dot_general(
                whj, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]                             # [H, 1]
            return act(hh).astype(dtype)

        h = jax.lax.fori_loop(0, n_hidden_m1, hidden, h, unroll=True)

        wo = wout_ref[k].astype(dtype)                  # [8, H]
        st = jax.lax.dot_general(
            wo, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]                                  # [8, T] f32; rows 0-2 = s, 3-5 = t
        s = cap * jnp.tanh(st / cap)                     # rows beyond s unused
        tt = pltpu.roll(st, shift=5, axis=0)             # 8-row roll: row 3 -> row 0 (t rows align with coords)
        # padded/passthrough rows have mask 1 -> untouched
        return jnp.where(mask > 0, x, (x - tt) * jnp.exp(-s))

    # unrolled: static layer indices let Mosaic address each layer's weight
    # slice directly instead of emitting dynamic-index VMEM copies
    # (~8% on-chip, BASELINE.md round 2)
    if unroll:
        for i in range(n_layers):
            x = layer(i, x)
    else:
        x = jax.lax.fori_loop(0, n_layers, layer, x, unroll=False)
    x_ref[0] = x


def fused_point_flow_inverse(
    sp: StackedFlowParams,
    u: Array,
    z: Array,
    tile: int = 2048,
    dtype: jnp.dtype = jnp.bfloat16,
    activation: str = "relu",
    unroll: bool = True,
) -> Array:
    """u: [B, N, 3] base noise, z: [B, dz] -> x: [B, N, 3].

    Equivalent to CouplingFlow.inverse(u, z)[0] for the stacked params."""
    b, n, _ = u.shape
    tile = max(128, tile)
    n_pad = _round_up(n, tile)
    # transposed + padded noise: [B, 8, Np], rows 3..7 zero
    ut = jnp.zeros((b, 8, n_pad), jnp.float32)
    ut = ut.at[:, :3, :n].set(jnp.swapaxes(u, 1, 2).astype(jnp.float32))
    out = fused_inverse_transposed(sp, ut, z, tile=tile, dtype=dtype,
                                   activation=activation, unroll=unroll)
    return jnp.swapaxes(out[:, :3, :n], 1, 2)


def fused_inverse_transposed(
    sp: StackedFlowParams,
    ut: Array,
    z: Array,
    tile: int = 2048,
    dtype: jnp.dtype = jnp.bfloat16,
    activation: str = "relu",
    unroll: bool = True,
) -> Array:
    """Transposed-layout entry: ut [B, 8, Np] (coords in rows 0-2, rows 3+
    zero) -> x [B, 8, Np]. Samplers generate noise directly in this layout —
    XLA's RNG into a [B, N, 3] array is lane-padding-bound (~78 ms for
    256x2048x3 standalone vs 0.6 ms transposed; see BASELINE.md)."""
    tile = max(128, tile)  # Mosaic lane constraint: trailing block dim >= 128
    b, _, n_pad = ut.shape
    k, h, _ = sp.wx.shape
    n_hidden_m1 = sp.wh.shape[1]
    if n_pad % tile:
        raise ValueError(f"ut points axis {n_pad} not a multiple of tile {tile}")
    nt = n_pad // tile

    # per-cloud, per-layer z-projection (+ in_x bias), computed once in XLA
    hz = jnp.einsum("bd,kdh->bkh", z.astype(sp.wz.dtype), sp.wz) + sp.bx  # [B,K,H]
    hz = hz.astype(jnp.float32)[..., None]               # [B, K, H, 1]

    kernel = functools.partial(
        _fused_inverse_kernel,
        n_layers=k, n_hidden_m1=n_hidden_m1, t=tile, cap=sp.scale_cap,
        dtype=dtype, activation=activation, unroll=unroll,
    )
    full = lambda *idx: tuple(0 for _ in idx)  # whole-array weight blocks
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, k, h, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 8), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(n_hidden_m1, 1), h, h), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(n_hidden_m1, 1), h, 1), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, h), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        interpret=_interpret(),
    )(
        hz, ut,
        sp.wx, _ensure_nonempty(sp.wh, (k, 1, h, h)),
        _ensure_nonempty(sp.bh, (k, 1, h, 1)),
        sp.wout, sp.bout, sp.masks,
    )
    return out


def _ensure_nonempty(a: Array, shape) -> Array:
    """n_hidden == 1 stacks are zero-size; give the kernel a dummy block."""
    if a.size == 0:
        return jnp.zeros(shape, a.dtype)
    return a


class QuantizedFlowParams(NamedTuple):
    """StackedFlowParams with the three matmul weight stacks symmetric-
    quantized to int8 + per-(layer, tensor) f32 scales — the round-2
    'int8 weights' idea for the latency-bound serial chain (BASELINE.md
    round-2 campaign), measurable via tools/bench_sample_int8.py. Scales
    live in one [K, 8, 1] block: row 0 = wx, row 1 = wh (shared across the
    layer's hidden matmuls), row 2 = wout."""

    sp: StackedFlowParams          # wx/wh/wout fields hold the int8 stacks
    scales: Array                  # [K, 8] f32 (SMEM block in-kernel)


def quantize_flow_params(sp: StackedFlowParams) -> QuantizedFlowParams:
    """Symmetric per-(layer, tensor) int8 quantization of wx/wh/wout.
    Biases, masks and the z-projection path stay f32 (hz is computed in
    XLA from the ORIGINAL wz)."""
    def q(w, axes):
        amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return wq, scale

    k = sp.wx.shape[0]
    wxq, s_wx = q(sp.wx, (1, 2))                      # [K,1,1]
    whq, s_wh = (q(sp.wh, (1, 2, 3)) if sp.wh.size
                 else (sp.wh.astype(jnp.int8), jnp.ones((k, 1, 1, 1))))
    woq, s_wo = q(sp.wout, (1, 2))
    scales = jnp.zeros((k, 8), jnp.float32)
    scales = scales.at[:, 0].set(s_wx.reshape(k))
    scales = scales.at[:, 1].set(s_wh.reshape(k))
    scales = scales.at[:, 2].set(s_wo.reshape(k))
    return QuantizedFlowParams(
        sp=sp._replace(wx=wxq, wh=whq, wout=woq), scales=scales)


def _box_muller_rows(shape) -> Array:
    """Standard-normal tile from the in-kernel TPU PRNG (Box-Muller).
    Caller must have seeded via pltpu.prng_seed."""
    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    # 24-bit mantissa uniforms in (0, 1]: LOGICAL shift keeps the int32 bits
    # non-negative (arithmetic shift would go negative -> log(neg) = NaN;
    # Mosaic has no uint32->f32 cast, so stay in int32)
    u1 = jax.lax.shift_right_logical(bits1, 8).astype(jnp.float32) * (
        1.0 / (1 << 24)) + 1e-7
    u2 = jax.lax.shift_right_logical(bits2, 8).astype(jnp.float32) * (
        1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _fused_sample_kernel(
    seed_ref, hz_ref, wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref,
    scales_ref, x_ref,
    *, n_layers: int, n_hidden_m1: int, t: int, cap: float, dtype,
    activation: str = "relu", unroll: bool = True, clouds_per_step: int = 1,
    quantized: bool = False, noise_scale: float = 1.0,
):
    """Like _fused_inverse_kernel but generates the base noise u in-kernel
    (XLA's RNG for the noise tensor costs ~30% of end-to-end sampling on
    this chip). Distributionally equivalent, different stream than
    jax.random.

    ``clouds_per_step`` > 1 processes G clouds per grid step (hz/out blocks
    carry a leading G axis): the fixed per-grid-step cost — the measured
    bound on this kernel once weights are resident (ROUND2/3 dual-issue
    probe: per-step overhead dominates at K=32) — amortizes over G clouds
    ("fewer, longer launches", the recorded round-4 serving route)."""
    act = ACTIVATIONS[activation]
    b_ = pl.program_id(0)
    i = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, t), 0)

    def layer(li, x, g):
        k = n_layers - 1 - li
        mask = masks_ref[k]
        # int8-weight mode (round-2 'remaining idea', measured via
        # tools/bench_sample_int8.py): weights dequantize in-VMEM — cast +
        # per-(layer, tensor) scale on the WEIGHT matrix (cheaper than
        # scaling the [H, T] matmul output; s*(Wq@x) == (s*Wq)@x)
        if quantized:
            # scales live in SMEM: scales_ref[k, j] is a true scalar read
            # (a [1]-shaped VMEM read would need a both-axes broadcast,
            # which Mosaic does not implement)
            wxk = (wx_ref[k].astype(jnp.float32)
                   * scales_ref[k, 0]).astype(dtype)
        else:
            wxk = wx_ref[k].astype(dtype)
        h = jax.lax.dot_general(
            wxk, x.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + hz_ref[g, k]
        h = act(h).astype(dtype)

        def hidden(j, h):
            if quantized:
                whj = (wh_ref[k, j].astype(jnp.float32)
                       * scales_ref[k, 1]).astype(dtype)
            else:
                whj = wh_ref[k, j].astype(dtype)
            hh = jax.lax.dot_general(
                whj, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]
            return act(hh).astype(dtype)

        h = jax.lax.fori_loop(0, n_hidden_m1, hidden, h, unroll=True)
        if quantized:
            wok = (wout_ref[k].astype(jnp.float32)
                   * scales_ref[k, 2]).astype(dtype)
        else:
            wok = wout_ref[k].astype(dtype)
        st = jax.lax.dot_general(
            wok, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]
        s = cap * jnp.tanh(st / cap)
        tt = pltpu.roll(st, shift=5, axis=0)
        return jnp.where(mask > 0, x, (x - tt) * jnp.exp(-s))

    for g in range(clouds_per_step):
        # per-cloud stream: global cloud index = b_ * G + g (G=1 reduces to
        # the round-2 formula b_ * nt + i)
        pltpu.prng_seed(
            seed_ref[0] + (b_ * clouds_per_step + g) * pl.num_programs(1) + i)
        u = _box_muller_rows((8, t))
        if noise_scale != 1.0:
            # sampling temperature (u = tau * N(0,I)): same stream, scaled
            # base noise — tau != 1 is a distinct compiled kernel (static)
            u = u * noise_scale
        x = jnp.where(row_ids < 3, u, 0.0)
        if unroll:
            for li in range(n_layers):
                x = layer(li, x, g)
        else:
            x = jax.lax.fori_loop(
                0, n_layers, lambda li, x: layer(li, x, g), x, unroll=False)
        x_ref[g] = x


def fused_sample_points(
    sp: StackedFlowParams,
    z: Array,
    seed: Array,
    n_points: int,
    tile: int = 2048,
    dtype: jnp.dtype = jnp.bfloat16,
    activation: str = "relu",
    unroll: bool = True,
    clouds_per_step: int | None = None,
    quantized: QuantizedFlowParams | None = None,
    noise_scale: float = 1.0,
) -> Array:
    """z [B, dz], scalar int32 seed -> x [B, n_points, 3]: base noise drawn
    by the in-kernel TPU PRNG, then all K inverted couplings applied with
    everything VMEM-resident.

    ``clouds_per_step`` (default: env DPFX_SAMPLE_G, else 1, clamped to a
    divisor of B) groups G clouds into one grid step — the per-cloud noise
    stream is G-invariant (seeded by global cloud index), so results are
    bit-identical across G; only the schedule changes. G=1 is the measured
    winner (see the A/B note in the body).

    ``quantized`` (a QuantizedFlowParams built from the SAME sp) switches
    the kernel to int8 weight stacks dequantized in-VMEM — the measurement
    surface for the round-2 'int8 weights' idea (tools/bench_sample_int8.py);
    ~0.3% coordinate RMS quantization error, see the A/B record.

    ``noise_scale`` is the point-noise sampling temperature tau: base noise
    u = tau * N(0, I3). Static (baked into the kernel); tau=1 compiles the
    identical program as before the knob existed."""
    b = z.shape[0]
    tile = max(128, tile)  # Mosaic lane constraint: trailing block dim >= 128
    if _interpret():
        # pltpu.prng_* has no interpret-mode lowering; draw noise in XLA
        # (CPU/test path — distribution-equivalent, different stream)
        key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.asarray(seed, jnp.int32))
        n_pad = _round_up(n_points, tile)
        un = jax.random.normal(key, (b, 3, n_pad))
        if noise_scale != 1.0:
            un = un * noise_scale
        ut = jnp.zeros((b, 8, n_pad), jnp.float32).at[:, :3, :].set(un)
        out = fused_inverse_transposed(sp, ut, z, tile=tile, dtype=dtype,
                                       activation=activation)
        return jnp.swapaxes(out[:, :3, :n_points], 1, 2)
    k, h, _ = sp.wx.shape
    n_hidden_m1 = sp.wh.shape[1]
    n_pad = _round_up(n_points, tile)
    nt = n_pad // tile

    # Measured on-chip (tools/bench_sample_g.py, B=256 N=2048, v5e,
    # 2026-08-18): G=1 66.98M pts/s, G=2 59.34M, G=4 47.20M, G=8 compile
    # failure — grouping LOSES monotonically. The fixed per-grid-step cost
    # is overlapped pipeline work, not dead time; coarser blocks reduce
    # Mosaic's overlap granularity. This closes the round-3 "fewer, longer
    # launches" route the same way the dual-issue probe closed software
    # pipelining; the knob stays for reproducing the measurement.
    if clouds_per_step is None:
        clouds_per_step = int(os.environ.get("DPFX_SAMPLE_G", "1"))
    g = max(1, min(clouds_per_step, b))
    while b % g:  # clamp to a divisor of B (results are G-invariant)
        g -= 1

    hz = jnp.einsum("bd,kdh->bkh", z.astype(sp.wz.dtype), sp.wz) + sp.bx
    hz = hz.astype(jnp.float32)[..., None]

    if quantized is not None:
        wx_in, wh_in, wout_in = (quantized.sp.wx, quantized.sp.wh,
                                 quantized.sp.wout)
        scales = quantized.scales
    else:
        wx_in, wh_in, wout_in = sp.wx, sp.wh, sp.wout
        scales = jnp.ones((k, 8), jnp.float32)  # resident, unread

    kernel = functools.partial(
        _fused_sample_kernel,
        n_layers=k, n_hidden_m1=n_hidden_m1, t=tile, cap=sp.scale_cap, dtype=dtype,
        activation=activation, unroll=unroll, clouds_per_step=g,
        quantized=quantized is not None, noise_scale=float(noise_scale),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // g, nt),
        in_specs=[
            pl.BlockSpec((g, k, h, 1), lambda b_, i, *_: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 8), lambda b_, i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(n_hidden_m1, 1), h, h), lambda b_, i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(n_hidden_m1, 1), h, 1), lambda b_, i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, h), lambda b_, i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), lambda b_, i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), lambda b_, i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8), lambda b_, i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 8, tile), lambda b_, i, *_: (b_, 0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=SAMPLE_VMEM_MB * 1024 * 1024)}
           if SAMPLE_VMEM_MB and not _interpret() else {}),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        hz, wx_in,
        _ensure_nonempty(wh_in, (k, 1, h, h)),
        _ensure_nonempty(sp.bh, (k, 1, h, 1)),
        wout_in, sp.bout, sp.masks, scales,
    )
    return jnp.swapaxes(out[:, :3, :n_points], 1, 2)
