"""Convert torch-format ResNet checkpoints to flax backbone params.

The reference initializes its TSM backbone from torchvision ImageNet weights
(config model.backbone.pretrained, e.g. resnet34-333f7ec4.pth). This module
converts such a checkpoint (torch ``state_dict`` or an .npz of the same keys)
into this framework's {'params', 'batch_stats'} trees.

Key mapping (torchvision -> flax module names used in resnet_tsm.py):
  conv1.weight                  -> params['conv1']['kernel']      (OIHW->HWIO)
  bn1.{weight,bias}             -> params['bn1']{scale,bias}
  bn1.running_{mean,var}        -> batch_stats['bn1']{mean,var}
  layerL.B.convN.weight         -> params[f'layer{L}_{B}'][f'conv{N}']['kernel']
  layerL.B.bnN.*                -> ...[f'bn{N}']
  layerL.B.downsample.0.weight  -> ...['downsample_conv']['kernel']
  layerL.B.downsample.1.*       -> ...['downsample_bn']
  fc.*                          -> dropped (classifier is grown per task)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_resnet_backbone(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Return (params, batch_stats) trees for ``ResNetTSM`` from torch keys."""
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def _set(tree, path, value):
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    for key, value in state_dict.items():
        key = key.replace("backbone.", "", 1) if key.startswith("backbone.") else key
        if key.startswith("fc.") or "num_batches_tracked" in key:
            continue
        arr = _to_numpy(value)
        parts = key.split(".")

        if parts[0].startswith("layer"):
            module = f"{parts[0]}_{parts[1]}"  # layer1.0 -> layer1_0
            sub = parts[2]
            rest = parts[3:]
            if sub == "downsample":
                sub = "downsample_conv" if rest[0] == "0" else "downsample_bn"
                rest = rest[1:]
            leaf = rest[0]
            path_head = (module, sub)
        else:
            module_leaf = parts[0]
            leaf = parts[1]
            path_head = (module_leaf,)

        if leaf == "weight" and arr.ndim == 4:  # conv kernel OIHW -> HWIO
            _set(params, path_head + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "weight":  # bn scale
            _set(params, path_head + ("scale",), arr)
        elif leaf == "bias":
            _set(params, path_head + ("bias",), arr)
        elif leaf == "running_mean":
            _set(batch_stats, path_head + ("mean",), arr)
        elif leaf == "running_var":
            _set(batch_stats, path_head + ("var",), arr)
        else:
            raise KeyError(f"unhandled torch key {key!r}")

    return params, batch_stats


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Read a torch .pth/.pt (via torch, CPU) or .npz checkpoint into a flat
    key->array dict."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    import torch  # optional CPU torch, only for reading reference checkpoints

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def load_reference_cil_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference CIL checkpoint (torch state_dict of
    ``CILRecognizer2D``: mmaction2 ResNetTSM backbone + IncrementalTSMHead)
    into this framework's {'params', 'batch_stats'} variables.

    Key shape of the reference checkpoints (ckpt_task_{t}.pt, cil.py:833-837):
      backbone.conv1.weight / backbone.bn1.* / backbone.layerL.B.convN.net.weight
      (TemporalShift wraps each block's conv1 as ``.net``) /
      backbone.layerL.B.downsample.{0,1}.* /
      cls_head.fc_cls.weights (LSC) or cls_head.fc_cls.{weight,bias} (linear) /
      cls_head.loss_cls.eta (learnable NCA temperature)
    """
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]

    backbone_sd = {}
    head: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        if key.startswith("current_model."):
            key = key[len("current_model.") :]
        if key.startswith("backbone."):
            # strip the TemporalShift wrapper scope: conv1.net.weight -> conv1.weight
            backbone_sd[key[len("backbone.") :].replace(".net.", ".")] = arr
        elif key.startswith("cls_head.fc_cls."):
            leaf = key[len("cls_head.fc_cls.") :]
            if leaf == "weights":  # LSC proxies
                head["fc_weights"] = arr
            elif leaf == "weight":
                head["fc_weight"] = arr
            elif leaf == "bias":
                head["fc_bias"] = arr
        elif key.endswith("loss_cls.eta") or key == "cls_head.loss_cls.eta":
            head["eta"] = arr.reshape(1)
        # prev_model.* and consensus buffers are ignored

    bb_params, bb_stats = load_torch_resnet_backbone(backbone_sd)
    return {
        "params": {"backbone": bb_params, "head": head},
        "batch_stats": {"backbone": bb_stats},
    }


def apply_backbone_weights(variables: Dict, params: Dict, batch_stats: Dict) -> Dict:
    """Merge converted backbone weights into recognizer variables (backbone
    lives under the 'backbone' scope)."""

    def _merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                _merge(dst[k], v)
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(f"shape mismatch for {k}: {dst[k].shape} vs {v.shape}")
                dst[k] = v

    def _deep_copy(d):
        return {k: _deep_copy(v) if isinstance(v, dict) else v for k, v in d.items()}

    out = {
        "params": _deep_copy(variables["params"]),
        "batch_stats": _deep_copy(variables["batch_stats"]),
    }
    _merge(out["params"]["backbone"], params)
    _merge(out["batch_stats"]["backbone"], batch_stats)
    for k, v in variables.items():
        if k not in out:
            out[k] = v
    return out
