"""Import torch-format pretrained ResNet weights into the encoder.

Functional analog of the reference's pretrained partial load
(torch_resnet_cspn_nyu.py:403-413 + update_model.py:13-31): a torchvision
ResNet state dict is key-mapped onto the Flax encoder tree and merged with
`partial_restore` (only matching paths+shapes are copied; like the reference,
the 4-channel stem and all decoder/head weights stay at their init).

Key mapping (torch -> cspn_tpu):
    conv1.weight                 -> encoder/conv1_1/kernel   (3ch: skipped,
                                    shape mismatch vs the 4ch RGBD stem --
                                    same net effect as the reference, where
                                    the names conv1/conv1_1 don't intersect)
    bn1.*                        -> encoder/bn1
    layer{s}.{b}.conv{j}.weight  -> encoder/layer{s}_{b}/conv{j}/kernel
    layer{s}.{b}.bn{j}.*         -> encoder/layer{s}_{b}/bn{j}
    layer{s}.{b}.downsample.0/1  -> encoder/layer{s}_{b}/ds_conv, ds_bn
    fc.*                         -> dropped
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], leaf: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def convert_resnet_state_dict(sd: dict[str, Any]) -> tuple[dict, dict]:
    """torch state dict -> (params tree, batch_stats tree), both rooted at
    {'encoder': ...} to line up with CSPNUNet's parameter structure."""
    params: dict = {}
    stats: dict = {}

    def to_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)()).astype(np.float32)

    def bn(dst_path: list[str], key_base: str):
        mapping = {
            "weight": (params, "scale"),
            "bias": (params, "bias"),
            "running_mean": (stats, "mean"),
            "running_var": (stats, "var"),
        }
        for suffix, (tree, name) in mapping.items():
            k = f"{key_base}.{suffix}"
            if k in sd:
                # our BatchNorm wrapper nests an inner flax BatchNorm module
                _set(tree, dst_path + ["BatchNorm_0", name], to_np(sd[k]))

    if "conv1.weight" in sd:
        _set(params, ["encoder", "conv1_1", "kernel"], _conv_kernel(to_np(sd["conv1.weight"])))
    bn(["encoder", "bn1"], "bn1")

    layer_re = re.compile(r"^layer(\d)\.(\d+)\.(.+)$")
    seen_blocks = set()
    for key in sd:
        m = layer_re.match(key)
        if not m:
            continue
        s, b = int(m.group(1)), int(m.group(2))
        seen_blocks.add((s, b))
    for s, b in sorted(seen_blocks):
        base = f"layer{s}.{b}"
        dst = ["encoder", f"layer{s}_{b}"]
        for j in (1, 2, 3):
            wk = f"{base}.conv{j}.weight"
            if wk in sd:
                _set(params, dst + [f"conv{j}", "kernel"], _conv_kernel(to_np(sd[wk])))
            if f"{base}.bn{j}.weight" in sd:
                bn(dst + [f"bn{j}"], f"{base}.bn{j}")
        if f"{base}.downsample.0.weight" in sd:
            _set(
                params,
                dst + ["ds_conv", "kernel"],
                _conv_kernel(to_np(sd[f"{base}.downsample.0.weight"])),
            )
            bn(dst + ["ds_bn"], f"{base}.downsample.1")
    return params, stats


_BN_LEAF = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}

# reference modules that the released forward() never calls (constructed at
# torch_resnet_cspn_nyu.py:300-312) plus the frozen all-ones sum conv the
# CSPN layer re-creates inside every forward (cspn.py:44-53)
_SKIP_PREFIXES = ("up_proj_layer", "post_process_layer", "conv3.", "fc.")

# top-level reference modules that live under 'encoder' in CSPNUNet's tree
_ENCODER_TOP = ("conv1_1", "bn1", "conv2", "bn2")

_STAGE_RE = re.compile(r"^layer(\d)$")


def convert_cspn_state_dict(sd: dict[str, Any]) -> tuple[dict, dict]:
    """Full reference-model state dict -> (params, batch_stats) for CSPNUNet.

    Maps every weight of `torch_resnet_cspn_nyu.ResNet` (:278-319) — encoder
    stem/stages/trailing conv2+bn2, the Gudi decoder blocks
    `gud_up_proj_layer1..6` with their conv1/conv1_1/conv2/sc_conv1 + BNs —
    onto the CSPNUNet parameter tree, so a checkpoint trained with the
    reference code evaluates identically in this framework
    (tests/test_torch_oracle.py asserts full-forward agreement).

    Skipped on purpose: the never-called `up_proj_layer*`/`conv3` modules,
    the frozen ones `post_process_layer.sum_conv`, `fc.*`, and BN
    `num_batches_tracked` counters.
    """
    params: dict = {}
    stats: dict = {}

    def to_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)()).astype(np.float32)

    for key, val in sd.items():
        key = key.removeprefix("module.")  # update_model.remove_moudle (:23-31)
        if key.endswith("num_batches_tracked"):
            continue
        if any(key.startswith(p) for p in _SKIP_PREFIXES):
            continue
        *mods, leaf = key.split(".")
        path: list[str] = []
        i = 0
        while i < len(mods):
            m = mods[i]
            stage = _STAGE_RE.match(m)
            if stage and i + 1 < len(mods) and mods[i + 1].isdigit():
                # layer{s}.{b}.* -> layer{s}_{b}/*
                path.append(f"layer{stage.group(1)}_{mods[i + 1]}")
                i += 2
            elif m == "downsample":
                # downsample.0 = conv, downsample.1 = bn (resnet _make_layer)
                path.append("ds_conv" if mods[i + 1] == "0" else "ds_bn")
                i += 2
            else:
                path.append(m)
                i += 1
        if path and (path[0] in _ENCODER_TOP or _STAGE_RE.match(path[0].split("_")[0])):
            path = ["encoder"] + path
        arr = to_np(val)
        if leaf == "weight" and arr.ndim == 4:
            _set(params, path + ["kernel"], _conv_kernel(arr))
        elif leaf in _BN_LEAF:
            tree = stats if leaf.startswith("running") else params
            _set(tree, path + ["BatchNorm_0", _BN_LEAF[leaf]], arr)
        # anything else (no such leaves in the reference model) is dropped
    return params, stats


def load_torch_cspn_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a reference-trained checkpoint (best_model.pth / epoch_NN.pth,
    train.py:229-231,277-280) and convert the FULL model (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_cspn_state_dict(sd)


def load_torch_encoder_params(path: str) -> tuple[dict, dict]:
    """Load a torch .pth checkpoint (CPU) and convert (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # strip DataParallel prefix (reference update_model.remove_moudle, :23-31)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_resnet_state_dict(sd)
