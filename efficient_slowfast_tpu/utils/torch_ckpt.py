"""PyTorch (.pyth) / Caffe2 checkpoint import.

Reference checkpoints are torch pickles {"model_state": OrderedDict, ...}
(reference: slowfast/utils/checkpoint.py:178-287). This module maps every
parameter of OUR flax tree to its reference torch state_dict name and copies
the tensor with the right layout transpose (utils/torch_import.py).

Name correspondence (our flax path → torch name), by construction of the
model modules:

ResNet/SlowFast/CMDA family — our module names intentionally mirror the
reference's attribute names (s1, s1_fuse, s2, pathway{p}_stem,
pathway{p}_res{i}, branch1/branch2/a/b/c, pathway{p}_nonlocal{i}, head):

  s1/pathway0_stem/conv/conv/kernel      ← s1.pathway0_stem.conv.weight
  s1/pathway0_stem/bn/bn/{scale,bias}    ← s1.pathway0_stem.bn.{weight,bias}
  (batch_stats .../bn/bn/{mean,var})     ← ....bn.{running_mean,running_var}
  s2/pathway0_res0/branch2/a/conv/kernel ← s2.pathway0_res0.branch2.a.weight
  s2/pathway0_res0/branch1/conv/kernel   ← s2.pathway0_res0.branch1.weight
  s2/pathway0_res0/branch1_bn/bn/*       ← s2.pathway0_res0.branch1_bn.*
  s1_fuse/conv_f2s/conv/kernel           ← s1_fuse.conv_f2s.weight
  head/projection/fc/{kernel,bias}       ← head.projection.{weight,bias}
  .../pathway0_nonlocal1/theta/conv/*    ← ....pathway0_nonlocal1.conv_theta.*
  (same for phi, g; out ← conv_out; bn ← bn)

CMDA fusion (FuseFastAndSlow):
  sX_fuse/downsample_c_of_slow/conv      ← sX_fuse.downsample_c_of_slow
  sX_fuse/attention_channel_f2s/conv     ← sX_fuse.attention_channel_f2s.conv (Conv1d)
  sX_fuse/attention_spatial_s2f/query/conv ← ....attention_spatial_s2f.query_conv
  (key → key_conv, value → value_conv, gamma ← gamma)
  sX_fuse/{bn_f2s,bn_s2f}/bn             ← sX_fuse.{bn_f2s,bn_s2f}

Caffe2 zoo checkpoints get their names translated to the torch convention
first (c2_name_to_torch, mirroring the regex rules of the reference's
utils/c2_model_loading.py:9-112), then flow through the same mapper.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import torch_import as ti
from .logging import get_logger

logger = get_logger(__name__)

# flax leaf name → (torch suffix, collection)
_LEAF_MAP = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "gamma": "gamma",
}

# our wrapper-module segments that have no torch counterpart
_WRAPPER_SEGMENTS = {"conv", "bn", "fc"}

# segment renames (our name → torch name)
_SEGMENT_RENAMES = {
    "theta": "conv_theta",
    "phi": "conv_phi",
    "g": "conv_g",
    "out": "conv_out",
    "query": "query_conv",
    "key": "key_conv",
    "value": "value_conv",
}


def flax_path_to_torch_name(path: Tuple[str, ...]) -> Optional[str]:
    """Map a flax tree path (module segments + leaf) to a torch param name."""
    *mods, leaf = path
    if leaf not in _LEAF_MAP:
        return None
    # strip the final wrapper segment (Conv3d→'conv', BatchNorm3d→'bn',
    # Linear→'fc') when it duplicates the layer it wraps
    if mods and mods[-1] in _WRAPPER_SEGMENTS and len(mods) >= 2:
        # keep it only when the torch module genuinely has a .conv/.bn child
        # (stems and ECA do: s1.pathway0_stem.conv). Heuristic: drop when the
        # PARENT segment is itself a layer name (wrapped layer), keep when
        # the parent is a block. We encode this as: drop exactly one wrapper
        # suffix when the parent already names the layer.
        parent = mods[-2]
        if parent in _WRAPPER_SEGMENTS or not _parent_is_block(parent):
            mods = mods[:-1]
    mods = [_SEGMENT_RENAMES.get(m, m) for m in mods]
    return ".".join(mods) + "." + _LEAF_MAP[leaf]


def _parent_is_block(seg: str) -> bool:
    """True when `seg` names a torch container that owns .conv/.bn children
    (stems, attention wrappers) rather than being the layer itself."""
    return (
        seg.endswith("_stem")
        or seg.startswith("attention_")
        or seg in ("se",)
    )


# ---------------------------------------------------------------------------
# Efficient-backbone name tables. The reference builds these models from
# nn.Sequential chains, so torch names carry numeric indices and channel-count
# module names (e.g. "s2.pathway0_channel_224.features.0.banch2.0.weight",
# reference: shufflenetv2_helper.py:222-297). The tables map OUR module-path
# prefixes (leaf wrapper stripped) to the torch layer prefix; leaf suffixes
# (.weight/.bias/.running_*) are appended afterwards.
# ---------------------------------------------------------------------------

def efficient_prefix_table(cfg) -> Dict[str, str]:
    name = cfg.MODEL.MODEL_NAME
    beta = cfg.SLOWFAST.BETA_INV
    wm = float(cfg.SLOWFAST.WIDTH_MULTI)
    t: Dict[str, str] = {}

    if name == "SlowFastShuffleNetV2":
        tables = {0.25: [-1, 24, 32, 64, 128, 1024],
                  0.5: [-1, 24, 48, 96, 192, 1024],
                  1.0: [-1, 24, 116, 240, 464, 1024],
                  1.5: [-1, 24, 176, 352, 704, 1024],
                  2.0: [-1, 24, 224, 496, 976, 2048]}
        slow = tables[wm]
        fast = [c // beta if c > 0 else c for c in slow]
        reps = [4, 8, 4]
        for p in (0, 1):
            t[f"s1/pathway{p}_stem/conv"] = f"s1.pathway{p}_stem.0"
            t[f"s1/pathway{p}_stem/bn"] = f"s1.pathway{p}_stem.1"
            ch = slow if p == 0 else fast
            for si, sname in enumerate(("s2", "s3", "s4")):
                base = f"{sname}.pathway{p}_channel_{ch[si + 2]}.features"
                for i in range(reps[si]):
                    ours = f"{sname}/pathway{p}_block{i}"
                    tm = f"{base}.{i}"
                    if i == 0:
                        t[f"{ours}/banch1_dw/conv"] = f"{tm}.banch1.0"
                        t[f"{ours}/banch1_dw/bn"] = f"{tm}.banch1.1"
                        t[f"{ours}/banch1_pwl/conv"] = f"{tm}.banch1.2"
                        t[f"{ours}/banch1_pwl/bn"] = f"{tm}.banch1.3"
                    t[f"{ours}/banch2_pw/conv"] = f"{tm}.banch2.0"
                    t[f"{ours}/banch2_pw/bn"] = f"{tm}.banch2.1"
                    t[f"{ours}/banch2_dw/conv"] = f"{tm}.banch2.3"
                    t[f"{ours}/banch2_dw/bn"] = f"{tm}.banch2.4"
                    t[f"{ours}/banch2_pwl/conv"] = f"{tm}.banch2.5"
                    t[f"{ours}/banch2_pwl/bn"] = f"{tm}.banch2.6"
            t[f"head/pathway{p}_conv1x1x1/conv"] = f"head.pathway{p}_conv1x1x1.0.0"
            t[f"head/pathway{p}_conv1x1x1/bn"] = f"head.pathway{p}_conv1x1x1.0.1"
        t["head/projection"] = "head.classifier.1"

    elif name == "SlowFastShuffleNet":
        tables = {1: [24, 144, 288, 567], 2: [24, 200, 400, 800],
                  3: [24, 240, 480, 960], 4: [24, 272, 544, 1088],
                  8: [24, 384, 768, 1536]}
        slow = [int(c * wm) for c in tables[cfg.SLOWFAST.GROUPS]]
        fast = [c // beta for c in slow]
        reps = [4, 8, 4]
        for p in (0, 1):
            t[f"s1/pathway{p}_stem/conv"] = f"s1.pathway{p}_stem.0"
            t[f"s1/pathway{p}_stem/bn"] = f"s1.pathway{p}_stem.1"
            ch = slow if p == 0 else fast
            for si, sname in enumerate(("s2", "s3", "s4")):
                base = f"{sname}.pathway{p}_channel_{ch[si + 1]}.features"
                for i in range(reps[si]):
                    ours = f"{sname}/pathway{p}_block{i}"
                    tm = f"{base}.{i}"
                    t[f"{ours}/conv1/conv"] = f"{tm}.conv1"
                    t[f"{ours}/conv1/bn"] = f"{tm}.bn1"
                    t[f"{ours}/conv2/conv"] = f"{tm}.conv2"
                    t[f"{ours}/conv2/bn"] = f"{tm}.bn2"
                    t[f"{ours}/conv3/conv"] = f"{tm}.conv3"
                    t[f"{ours}/conv3/bn"] = f"{tm}.bn3"
                    t[f"{ours}/shortcut_conv"] = f"{tm}.shortcut.0"
        t["head/projection"] = "head.classifier.1"

    elif name == "SlowFastMoibleNetV2":
        settings = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
                    (6, 96, 3), (6, 160, 3), (6, 320, 1)]
        # stage name → list of setting rows (reference forward layout)
        layout = {"s2": settings[0:2], "s4": settings[2:3], "s5": settings[3:4],
                  "s6": settings[4:5], "s7": settings[5:6], "s8": settings[6:]}
        for p in (0, 1):
            t[f"s1/pathway{p}_stem/conv"] = f"s1.pathway{p}_stem.features.0"
            t[f"s1/pathway{p}_stem/bn"] = f"s1.pathway{p}_stem.features.1"
            for sname, rows in layout.items():
                c_raw = rows[0][1]
                base = f"{sname}.pathway{p}_channel_{c_raw}.features"
                j = 0
                for ti_, (texp, c, n) in enumerate(rows):
                    for _ in range(n):
                        ours = f"{sname}/pathway{p}_block{j}"
                        tm = f"{base}.{j}.conv"
                        if texp == 1:
                            t[f"{ours}/dw/conv"] = f"{tm}.0"
                            t[f"{ours}/dw/bn"] = f"{tm}.1"
                            t[f"{ours}/pwl/conv"] = f"{tm}.3"
                            t[f"{ours}/pwl/bn"] = f"{tm}.4"
                        else:
                            t[f"{ours}/pw/conv"] = f"{tm}.0"
                            t[f"{ours}/pw/bn"] = f"{tm}.1"
                            t[f"{ours}/dw/conv"] = f"{tm}.3"
                            t[f"{ours}/dw/bn"] = f"{tm}.4"
                            t[f"{ours}/pwl/conv"] = f"{tm}.6"
                            t[f"{ours}/pwl/bn"] = f"{tm}.7"
                        j += 1
            t[f"head/pathway{p}_conv1x1x1/conv"] = f"head.pathway{p}_conv1x1x1.0"
            t[f"head/pathway{p}_conv1x1x1/bn"] = f"head.pathway{p}_conv1x1x1.1"
        t["head/projection"] = "head.classifier.1"

    elif name == "SlowFastGhostNet":
        from ..models.ghostnet import _GHOST_STAGE_CFGS
        from ..models.common_efficient import make_divisible

        for p in (0, 1):
            scale = wm if p == 0 else wm / beta
            t[f"s0/pathway{p}_stem/conv"] = f"s0.pathway{p}_stem.0"
            t[f"s0/pathway{p}_stem/bn"] = f"s0.pathway{p}_stem.1"
            for si, rows in enumerate(_GHOST_STAGE_CFGS):
                last_c = make_divisible(
                    rows[-1][2] * wm // beta, 4) if p == 1 else make_divisible(
                    rows[-1][2] * wm, 4)
                base = f"s{si + 1}.pathway{p}_channel_{last_c}.features"
                for j in range(len(rows)):
                    ours = f"s{si + 1}/pathway{p}_block{j}"
                    tm = f"{base}.{j}"
                    t[f"{ours}/ghost1/primary/conv"] = f"{tm}.ghost1.primary_conv.0"
                    t[f"{ours}/ghost1/primary/bn"] = f"{tm}.ghost1.primary_conv.1"
                    t[f"{ours}/ghost1/cheap/conv"] = f"{tm}.ghost1.cheap_operation.0"
                    t[f"{ours}/ghost1/cheap/bn"] = f"{tm}.ghost1.cheap_operation.1"
                    t[f"{ours}/conv_dw/conv"] = f"{tm}.conv_dw"
                    t[f"{ours}/conv_dw/bn"] = f"{tm}.bn_dw"
                    t[f"{ours}/se/reduce"] = f"{tm}.se.conv_reduce"
                    t[f"{ours}/se/expand"] = f"{tm}.se.conv_expand"
                    t[f"{ours}/ghost2/primary/conv"] = f"{tm}.ghost2.primary_conv.0"
                    t[f"{ours}/ghost2/primary/bn"] = f"{tm}.ghost2.primary_conv.1"
                    t[f"{ours}/ghost2/cheap/conv"] = f"{tm}.ghost2.cheap_operation.0"
                    t[f"{ours}/ghost2/cheap/bn"] = f"{tm}.ghost2.cheap_operation.1"
                    t[f"{ours}/shortcut_dw/conv"] = f"{tm}.shortcut.0"
                    t[f"{ours}/shortcut_dw/bn"] = f"{tm}.shortcut.1"
                    t[f"{ours}/shortcut_pw/conv"] = f"{tm}.shortcut.2"
                    t[f"{ours}/shortcut_pw/bn"] = f"{tm}.shortcut.3"
            side = "slow" if p == 0 else "fast"
            t[f"head/stage5_conv_{p}/conv"] = f"head.stage5_conv_{side}.conv"
            t[f"head/stage5_conv_{p}/bn"] = f"head.stage5_conv_{side}.bn1"
            t[f"head/conv_head_{p}"] = f"head.conv_head_{side}"
        t["head/projection"] = "head.classifier.1"

    return t


def resolve_torch_name(path: Tuple[str, ...],
                       table: Optional[Dict[str, str]] = None) -> Optional[str]:
    """Torch name for a flax path: table lookup first, general rules second."""
    *mods, leaf = path
    if leaf not in _LEAF_MAP:
        return None
    if table:
        stripped = list(mods)
        if stripped and stripped[-1] in _WRAPPER_SEGMENTS and len(stripped) >= 2:
            stripped = stripped[:-1]
        key = "/".join(stripped)
        if key in table:
            return table[key] + "." + _LEAF_MAP[leaf]
    return flax_path_to_torch_name(path)


def _flatten(tree: Any, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


def _convert_tensor(name: str, leaf: str, our: np.ndarray, theirs: np.ndarray,
                    inflate: bool) -> Optional[np.ndarray]:
    theirs = np.asarray(theirs)
    if leaf == "kernel":
        if theirs.ndim == 5:
            w = ti.conv3d_weight(theirs)
        elif theirs.ndim == 4 and inflate and our.ndim == 5:
            w = ti.conv3d_weight(ti.inflate_2d_to_3d(theirs, our.shape[0]))
        elif theirs.ndim == 3:
            w = ti.conv1d_weight(theirs)
        elif theirs.ndim == 2:
            w = ti.linear_weight(theirs)
        else:
            w = theirs
    else:
        w = theirs
    if tuple(w.shape) != tuple(our.shape):
        return None
    return w.astype(np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file without importing torch CUDA bits."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state" in payload:
        sd = payload["model_state"]
    elif isinstance(payload, dict) and "state_dict" in payload:
        sd = payload["state_dict"]
    else:
        sd = payload
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)  # DDP unwrap (reference :255)
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(cfg, path: str, params, batch_stats,
                          caffe2: bool = False, inflate: bool = False):
    """Fill our (params, batch_stats) trees from a torch/caffe2 checkpoint."""
    if caffe2:
        sd = load_caffe2_state_dict(path)
    else:
        sd = load_torch_state_dict(path)
    table = efficient_prefix_table(cfg) if cfg is not None else {}

    def fill(tree, collection):
        flat = _flatten(tree)
        new = {}
        hit = miss = 0
        for p, v in flat.items():
            name = resolve_torch_name(p, table)
            src = sd.get(name) if name else None
            if src is not None:
                w = _convert_tensor(name, p[-1], np.asarray(v), src, inflate)
                if w is not None:
                    new[p] = w
                    hit += 1
                    continue
                logger.warning("shape mismatch for %s: ours %s theirs %s",
                               name, np.asarray(v).shape, np.asarray(src).shape)
            else:
                logger.debug("no torch weight for %s (→ %s)", "/".join(p), name)
            new[p] = v
            miss += 1
        logger.info("%s: loaded %d/%d tensors from %s",
                    collection, hit, hit + miss, path)
        return _unflatten(new)

    import jax

    new_params = jax.tree_util.tree_map(
        lambda a, b: np.asarray(b, dtype=np.asarray(a).dtype),
        params, fill(params, "params"),
    )
    new_stats = jax.tree_util.tree_map(
        lambda a, b: np.asarray(b, dtype=np.asarray(a).dtype),
        batch_stats, fill(batch_stats, "batch_stats"),
    ) if batch_stats else batch_stats
    return new_params, new_stats


# ---------------------------------------------------------------------------
# Caffe2 model-zoo pickles (reference: utils/c2_model_loading.py:9-112 and
# utils/checkpoint.py:206-261 — regex renames from c2 blob names to the torch
# layer convention)
# ---------------------------------------------------------------------------

def c2_name_to_torch(name: str) -> str:
    pairs = [
        ("^conv1_w$", "s1.pathway0_stem.conv.weight"),
        ("^res_conv1_bn_s$", "s1.pathway0_stem.bn.weight"),
        ("^res_conv1_bn_b$", "s1.pathway0_stem.bn.bias"),
        ("^res_conv1_bn_rm$", "s1.pathway0_stem.bn.running_mean"),
        ("^res_conv1_bn_riv$", "s1.pathway0_stem.bn.running_var"),
        ("^nonlocal_conv([0-9]+)_([0-9]+)_(theta|phi|g|out)_w$",
         lambda m: f"s{int(m.group(1))}.pathway0_nonlocal{int(m.group(2))}"
                   f".conv_{m.group(3)}.weight"),
        ("^nonlocal_conv([0-9]+)_([0-9]+)_(theta|phi|g|out)_b$",
         lambda m: f"s{int(m.group(1))}.pathway0_nonlocal{int(m.group(2))}"
                   f".conv_{m.group(3)}.bias"),
        ("^nonlocal_conv([0-9]+)_([0-9]+)_bn_(s|b|rm|riv)$",
         lambda m: f"s{int(m.group(1))}.pathway0_nonlocal{int(m.group(2))}"
                   f".bn.{_c2_bn(m.group(3))}"),
        # res blocks: res2_0_branch2a_w → s2.pathway0_res0.branch2.a.weight
        ("^res([0-9]+)_([0-9]+)_branch([0-9])([a-c])_w$",
         lambda m: f"s{int(m.group(1))}.pathway0_res{int(m.group(2))}"
                   f".branch{m.group(3)}.{m.group(4)}.weight"),
        ("^res([0-9]+)_([0-9]+)_branch([0-9])([a-c])_bn_(s|b|rm|riv)$",
         lambda m: f"s{int(m.group(1))}.pathway0_res{int(m.group(2))}"
                   f".branch{m.group(3)}.{m.group(4)}_bn.{_c2_bn(m.group(5))}"),
        ("^res([0-9]+)_([0-9]+)_branch1_w$",
         lambda m: f"s{int(m.group(1))}.pathway0_res{int(m.group(2))}"
                   f".branch1.weight"),
        ("^res([0-9]+)_([0-9]+)_branch1_bn_(s|b|rm|riv)$",
         lambda m: f"s{int(m.group(1))}.pathway0_res{int(m.group(2))}"
                   f".branch1_bn.{_c2_bn(m.group(3))}"),
        ("^pred_w$", "head.projection.weight"),
        ("^pred_b$", "head.projection.bias"),
    ]
    for pat, rep in pairs:
        m = re.match(pat, name)
        if m:
            return rep(m) if callable(rep) else rep
    return name


def _c2_bn(suffix: str) -> str:
    return {"s": "weight", "b": "bias", "rm": "running_mean",
            "riv": "running_var"}[suffix]


def load_caffe2_state_dict(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    out = {}
    for k, v in blobs.items():
        if "momentum" in k or k.startswith("__"):
            continue
        out[c2_name_to_torch(k)] = np.asarray(v)
    return out


def export_torch_state_dict(params, batch_stats,
                            cfg=None) -> Dict[str, np.ndarray]:
    """Inverse mapping: our trees → a torch-style state_dict (for round-trip
    tests and for users migrating back to the reference)."""
    table = efficient_prefix_table(cfg) if cfg is not None else {}
    sd: Dict[str, np.ndarray] = {}
    for tree in (params, batch_stats or {}):
        for p, v in _flatten(tree).items():
            name = resolve_torch_name(p, table)
            if name is None:
                continue
            v = np.asarray(v)
            if p[-1] == "kernel":
                if v.ndim == 5:
                    v = np.transpose(v, (4, 3, 0, 1, 2))
                elif v.ndim == 3:
                    v = np.transpose(v, (2, 1, 0))
                elif v.ndim == 2:
                    v = np.transpose(v, (1, 0))
            sd[name] = v
    return sd
