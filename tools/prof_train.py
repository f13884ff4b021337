#!/usr/bin/env python
"""Ablation profiler for the flagship train step (round-2 VERDICT item 5).

Times pieces of the step with the honest chained-scan protocol (all reps in
one dispatch, carry serializes, scalar fetch closes) to localize device time.
Run on the real chip: `python tools/prof_train.py [piece ...]`.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import os

B = int(os.environ.get("DPFX_PROF_B", "64"))
N = int(os.environ.get("DPFX_PROF_N", "2048"))
REPS = int(os.environ.get("DPFX_PROF_REPS", "20"))


def chain_time(fn, *args):
    """fn(carry, i) -> (carry, scalar); returns ms per call (chain-v2
    protocol; see dpfx.utils.profiling.chain_time_ms)."""
    from dpfx.utils.profiling import chain_time_ms

    return chain_time_ms(fn, args[0], reps=REPS)


def main():
    from __graft_entry__ import _flagship_config
    from dpfx.models import DPF
    from dpfx.train import init_state, make_optimizer, make_train_step
    from dpfx.train.loss import elbo_loss

    which = set(sys.argv[1:]) or {
        "full", "fwd", "fwdbwd", "pf_fwd", "pf_fwdbwd", "enc_fwdbwd", "lf_fwdbwd"
    }
    cfg = _flagship_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(cfg.train)
    state = init_state(model, cfg, rng, tx)
    params = state.params
    step = make_train_step(model, tx, cfg, mesh=None, jit=False)
    x = jax.random.normal(rng, (B, N, 3), jnp.float32)
    z = jax.random.normal(rng, (B, cfg.model.dz), jnp.float32)

    results = {}

    if "full" in which:
        def full(st, i):
            st, m = step(st, {"x": x}, jax.random.fold_in(rng, i))
            return st, m["loss"]
        results["full step (fwd+bwd+adam)"] = chain_time(full, state)

    if "fwd" in which:
        def fwd(c, i):
            loss, _ = elbo_loss(model, params, x + c * 0, jax.random.fold_in(rng, i))
            return c, loss
        results["elbo fwd"] = chain_time(fwd, jnp.zeros(()))

    def gsum(g):
        # consume EVERY gradient leaf: a single-leaf sum lets XLA dead-code
        # half the backward (param-grad einsums of unused layers)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

    if "fwdbwd" in which:
        gfn = jax.grad(lambda p, r: elbo_loss(model, p, x, r)[0])
        def fwdbwd(c, i):
            g = gfn(params, jax.random.fold_in(rng, i))
            return c, gsum(g) + c * 0
        results["elbo fwd+bwd"] = chain_time(fwdbwd, jnp.zeros(()))

    if "nometrics" in which or "full" in which:
        # full step minus the metrics dict / grad_norm reduction
        def loss_only(p, r):
            return elbo_loss(model, p, x, r)[0]

        import optax as _optax

        def bare(st, i):
            g = jax.grad(loss_only)(st.params, jax.random.fold_in(rng, i))
            updates, opt_state = tx.update(g, st.opt_state, st.params)
            p = _optax.apply_updates(st.params, updates)
            st2 = type(st)(step=st.step + 1, params=p, opt_state=opt_state)
            return st2, st.step.astype(jnp.float32)
        results["bare fwd+bwd+adam (no metrics)"] = chain_time(bare, state)

    if "pf_fwd" in which:
        def pf(c, i):
            lp = model.apply(params, x + c * 0, z, method=lambda m, x_, z_: m.point_flow.log_prob(x_, z_))
            return c, jnp.sum(lp)
        results["point_flow log_prob fwd"] = chain_time(pf, jnp.zeros(()))

    if "pf_fwdbwd" in which:
        def pf_loss(p, xx):
            lp = model.apply(p, xx, z, method=lambda m, x_, z_: m.point_flow.log_prob(x_, z_))
            return jnp.sum(lp)
        gpf = jax.grad(pf_loss)
        def pfb(c, i):
            g = gpf(params, x + c * 0)
            return c, gsum(g)
        results["point_flow fwd+bwd"] = chain_time(pfb, jnp.zeros(()))

    if "enc_fwdbwd" in which:
        def enc_loss(p, xx):
            mu, lv = model.apply(p, xx, method=lambda m, x_: m.encoder(x_))
            return jnp.sum(mu) + jnp.sum(lv)
        genc = jax.grad(enc_loss)
        def encb(c, i):
            g = genc(params, x + c * 1e-30)
            return c + 1.0, gsum(g)
        results["encoder fwd+bwd"] = chain_time(encb, jnp.zeros(()))

    if "pf_fused_fwd" in which or "pf_fused_fwdbwd" in which:
        from dpfx.ops.fused_train import fused_point_flow_recon_ll

        def pff_loss(p, xx):
            return jnp.sum(fused_point_flow_recon_ll(
                p, xx, z, cfg.model.point_flow))

        if "pf_fused_fwd" in which:
            def pff(c, i):
                return c, pff_loss(params, x * (1.0 + c * 1e-12)) + c * 0
            results["point_flow FUSED fwd"] = chain_time(pff, jnp.zeros(()))

        if "pf_fused_fwdbwd" in which:
            gpff = jax.grad(pff_loss)
            def pffb(c, i):
                g = gpff(params, x * (1.0 + c * 1e-12))
                return c, gsum(g)
            results["point_flow FUSED fwd+bwd"] = chain_time(pffb, jnp.zeros(()))

    if "enc_fused_fwdbwd" in which:
        from dpfx.ops.fused_encoder import fused_pointnet_posterior

        def fenc_loss(p, xx):
            mu, lv = fused_pointnet_posterior(p, xx, cfg.model.encoder,
                                              cfg.model.dz)
            return jnp.sum(mu) + jnp.sum(lv)
        gfenc = jax.grad(fenc_loss)
        def fencb(c, i):
            g = gfenc(params, x + c * 1e-30)
            return c + 1.0, gsum(g)
        results["encoder FUSED fwd+bwd"] = chain_time(fencb, jnp.zeros(()))

    if "full_fe" in which:
        # full flagship step with fused_encoder on top of fused_point_flow
        import copy as _copy

        cfg_fe = _copy.deepcopy(cfg)
        cfg_fe.train.fused_encoder = True
        step_fe = make_train_step(model, tx, cfg_fe, mesh=None, jit=False)
        state_fe = jax.tree.map(jnp.copy, state)
        def full_fe(st, i):
            st, m = step_fe(st, {"x": x}, jax.random.fold_in(rng, i))
            return st, m["loss"]
        results["full step + fused encoder"] = chain_time(full_fe, state_fe)

    if "lf_fwdbwd" in which:
        def lf_loss(p, zz):
            lp = model.apply(p, zz, method=lambda m, z_: m.latent_flow.log_prob(z_))
            return jnp.sum(lp)
        glf = jax.grad(lf_loss)
        def lfb(c, i):
            g = glf(params, z + c * 0)
            return c, gsum(g)
        results["latent_flow fwd+bwd"] = chain_time(lfb, jnp.zeros(()))

    pts = B * N
    print(f"\nB={B} N={N} reps={REPS} (ms/call, chained single-dispatch)")
    for k, v in results.items():
        print(f"  {k:32s} {v:8.2f} ms   {pts / v * 1000 / 1e6:7.1f}M pts/s")


if __name__ == "__main__":
    main()
