"""torch .pt -> dpfx (flax/orbax) checkpoint converter (SURVEY.md §2 C12,
§5 checkpoint bullet: "the build must preserve reference checkpoints").

Design: a DECLARATIVE name map — an ordered list of (regex, template,
transform) rules rewriting torch state_dict keys into flax param paths —
so adapting to the real reference module tree is a data change, not a code
change (SURVEY.md §8 hard-part 3; fill the real map per §9.8 when the mount
appears). The default rules cover the dpfx-mirror naming convention
(dpfx/compat/torch_mirror.py), which is also the converter's end-to-end
test fixture.

Transforms: torch nn.Linear stores weight [out, in]; flax nn.Dense kernel
is [in, out] -> transpose. Conv weights OIHW -> HWIO when an image encoder
appears in the map.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


Rule = Tuple[str, str, Optional[str]]  # (pattern, replacement-path, transform)

# transforms by name so maps can live in YAML/JSON files
TRANSFORMS: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "linear_w": lambda a: a.T,                      # [out,in] -> [in,out]
    "conv_w": lambda a: np.transpose(a, (2, 3, 1, 0)),  # OIHW -> HWIO
    "none": lambda a: a,
}

# Default rules: dpfx torch-mirror names -> flax tree paths ('/'-joined).
DEFAULT_RULES: List[Rule] = [
    # flow conditioners
    (r"^(point_flow|latent_flow)\.couplings\.(\d+)\.cond_net\.(in_x|in_z|out)\.weight$",
     r"\1/coupling_\2/cond_net/\3/kernel", "linear_w"),
    (r"^(point_flow|latent_flow)\.couplings\.(\d+)\.cond_net\.(in_x|out)\.bias$",
     r"\1/coupling_\2/cond_net/\3/bias", "none"),
    (r"^(point_flow|latent_flow)\.couplings\.(\d+)\.cond_net\.hiddens\.(\d+)\.weight$",
     r"\1/coupling_\2/cond_net/hidden_\3/kernel", "linear_w"),
    (r"^(point_flow|latent_flow)\.couplings\.(\d+)\.cond_net\.hiddens\.(\d+)\.bias$",
     r"\1/coupling_\2/cond_net/hidden_\3/bias", "none"),
    # coupling masks are static buffers, not params
    (r"^(point_flow|latent_flow)\.couplings\.\d+\.mask$", None, None),
    # PointNet encoder
    (r"^encoder\.(point_\d+|head_\d+|gauss)\.weight$", r"encoder/\1/kernel", "linear_w"),
    (r"^encoder\.(point_\d+|head_\d+|gauss)\.bias$", r"encoder/\1/bias", "none"),
    # SVR conv image encoder (ConvImageEncoderMirror naming = flax
    # auto-names: Conv_0 stem, s{stage}_b{block} ResBlocks, Dense_0, gauss)
    (r"^image_encoder\.Conv_0\.weight$", r"image_encoder/Conv_0/kernel", "conv_w"),
    (r"^image_encoder\.Conv_0\.bias$", r"image_encoder/Conv_0/bias", "none"),
    (r"^image_encoder\.(s\d+_b\d+)\.(Conv_\d+)\.weight$",
     r"image_encoder/\1/\2/kernel", "conv_w"),
    (r"^image_encoder\.(s\d+_b\d+)\.(Conv_\d+)\.bias$",
     r"image_encoder/\1/\2/bias", "none"),
    # torch norm 'weight' -> flax 'scale'
    (r"^image_encoder\.(s\d+_b\d+)\.(GroupNorm_\d+)\.weight$",
     r"image_encoder/\1/\2/scale", "none"),
    (r"^image_encoder\.(s\d+_b\d+)\.(GroupNorm_\d+)\.bias$",
     r"image_encoder/\1/\2/bias", "none"),
    (r"^image_encoder\.(Dense_0|gauss)\.weight$", r"image_encoder/\1/kernel", "linear_w"),
    (r"^image_encoder\.(Dense_0|gauss)\.bias$", r"image_encoder/\1/bias", "none"),
    # SVR mixer image encoder (MixerImageEncoderMirror naming)
    (r"^image_encoder\.(embed|tok_in_\d+|tok_out_\d+|ch_in_\d+|ch_out_\d+|head)\.weight$",
     r"image_encoder/\1/kernel", "linear_w"),
    (r"^image_encoder\.(embed|tok_in_\d+|tok_out_\d+|ch_in_\d+|ch_out_\d+|head)\.bias$",
     r"image_encoder/\1/bias", "none"),
    (r"^image_encoder\.(ln_t_\d+|ln_c_\d+)\.weight$", r"image_encoder/\1/scale", "none"),
    (r"^image_encoder\.(ln_t_\d+|ln_c_\d+)\.bias$", r"image_encoder/\1/bias", "none"),
]


def convert_state_dict(
    state_dict: Dict[str, Any],
    rules: Sequence[Rule] = DEFAULT_RULES,
    strict: bool = True,
) -> Dict[str, Any]:
    """torch state_dict -> nested flax params dict ({'params': {...}})."""
    tree: Dict[str, Any] = {}
    unmatched = []
    for key, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        for pattern, template, transform in rules:
            m = re.match(pattern, key)
            if m:
                if template is None:
                    break  # explicitly dropped (buffers)
                path = m.expand(template).split("/")
                arr_t = TRANSFORMS[transform or "none"](arr)
                node = tree
                for p in path[:-1]:
                    node = node.setdefault(p, {})
                node[path[-1]] = arr_t.astype(np.float32)
                break
        else:
            unmatched.append(key)
    if unmatched and strict:
        raise KeyError(
            f"{len(unmatched)} torch keys had no conversion rule (pass "
            f"strict=False to skip): {unmatched[:8]}..."
        )
    return {"params": tree}


def verify_against_template(params, template) -> List[str]:
    """Compare converted tree to a freshly-initialized model's params:
    returns a list of problems (missing/extra paths, shape mismatches)."""
    import jax

    problems = []
    flat_c = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])

    def name(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    for path, leaf in flat_t.items():
        if path not in flat_c:
            problems.append(f"missing: {name(path)}")
        elif tuple(flat_c[path].shape) != tuple(leaf.shape):
            problems.append(
                f"shape mismatch at {name(path)}: "
                f"{flat_c[path].shape} vs {leaf.shape}"
            )
    for path in flat_c:
        if path not in flat_t:
            problems.append(f"extra: {name(path)}")
    return problems


def load_torch_checkpoint(
    path: str,
    cfg=None,
    rules: Sequence[Rule] = DEFAULT_RULES,
    strict: bool = True,
):
    """Deserialize a torch .pt (torch-cpu is available in this env solely as
    an oracle/IO library) and convert. If the file holds a dict with a
    'model'/'state_dict' entry (common torch.save layout), unwrap it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for k in ("state_dict", "model", "model_state", "net"):
            if k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    params = convert_state_dict(obj, rules, strict)
    if cfg is not None:
        import jax
        import jax.numpy as jnp

        from dpfx.models import DPF

        model = DPF(cfg)
        rng = jax.random.PRNGKey(0)
        if cfg.experiment == "svr":
            # trace BOTH posterior paths: reference SVR checkpoints carry the
            # point encoder too (the mirror does), but a plain SVR init only
            # uses the image path, so the template would miss encoder params
            s = cfg.model.image_encoder.image_size
            template = model.init(
                rng, jnp.zeros((2, 16, 3)), rng, jnp.zeros((2, s, s, 3)),
                method=lambda m, x, r, im: (m.elbo_terms(x, r, im), m.encoder(x)),
            )
        else:
            template = model.init(rng, jnp.zeros((2, 16, 3)), rng)
        problems = verify_against_template(params, template)
        if problems:
            raise ValueError(
                "converted checkpoint does not match the model built from "
                f"config:\n  " + "\n  ".join(problems[:20])
            )
    return params


def save_as_orbax(params, directory: str, step: int = 0) -> None:
    """Write converted params in the dpfx CheckpointManager layout (a
    params-only TrainState-shaped tree under a step directory), so the
    converted checkpoint plugs straight into the eval/generate CLIs:

        python evaluate.py cfg.yaml train.ckpt_dir=<parent-of-out> name=<out-leaf>

    (Earlier rounds wrote a bare ``converted_<step>`` StandardCheckpointer
    dir that restore_for_eval could NOT read — the docstring claimed
    otherwise; round-3 review.)"""
    from dpfx.train.trainer import CheckpointManager  # deferred: no cycle at import time

    # max_to_keep=None: the default retention (3) silently garbage-collects
    # EXISTING steps when --out points at a dir that already holds
    # checkpoints — a convert command must never delete training state
    # (round-3 review, reproduced live)
    CheckpointManager(directory, max_to_keep=None).save_params(step, params)


def load_rules_file(path: str) -> List[Rule]:
    """Load a YAML rules file: list of {pattern, path, transform} dicts —
    the hook for the real reference's names (SURVEY.md §9.8)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return [(r["pattern"], r.get("path"), r.get("transform")) for r in raw]
