"""torch ``.pt`` checkpoint -> flax params converter.

The reference releases checkpoints as ``{state_dict, seed, model_param}``
(reference: utils.py:302-307). This module translates those state dicts into
the flax param tree of `pixelwiseregression_tpu.models` so released weights
can be served/evaluated on TPU and used for the <=0.1 mm parity gate.

Key layout facts:
  * conv weights transpose OIHW -> HWIO,
  * linear weights transpose [out, in] -> [in, out],
  * norm ``weight``/``bias`` map to ``scale``/``bias``,
  * torch ``nn.Sequential`` integer indices map to named flax modules via
    the fixed index tables below (the reference's Sequentials have a fixed
    [conv, norm, relu] rhythm).

Works with numpy-only tensors, so checkpoints can also be consumed without a
torch install via ``torch.load``-free pickles if needed (we accept any mapping
of name -> ndarray).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# ResBlock.conv Sequential (reference: model.py:10-20):
# [norm, relu, conv1x1, norm, relu, convkxk, norm, relu, conv1x1]
_RESBLOCK_IDX = {
    "0": "norm_0",
    "2": "conv_0",
    "3": "norm_1",
    "5": "conv_1",
    "6": "norm_2",
    "8": "conv_2",
}

# PlaneRegression / DepthRegression head Sequential (model.py:54-65, 103-114):
# [conv, norm, relu] * 3 + [conv]
_HEAD_IDX = {
    "0": "conv_0",
    "1": "norm_0",
    "3": "conv_1",
    "4": "norm_1",
    "6": "conv_2",
    "7": "norm_2",
    "9": "conv_3",
}

# FullRegressionBlock.downsampling (model.py:225-235): [conv, norm, relu] * 3
_DOWN_IDX = {
    "0": "down_conv_0",
    "1": "down_norm_0",
    "3": "down_conv_1",
    "4": "down_norm_1",
    "6": "down_conv_2",
    "7": "down_norm_2",
}

# FullRegressionBlock.regression (model.py:237-243): [lin, relu, lin, relu, lin]
_FC_IDX = {"0": "fc_0", "2": "fc_1", "4": "fc_2"}


def _stem_name(idx: int) -> str:
    """Stem Sequential index -> flax name. Pattern: [conv, norm, relu]*n,
    so conv at 3k, norm at 3k+1 (reference: model.py:164-187)."""
    k, r = divmod(idx, 3)
    if r == 0:
        return f"stem_conv_{k}"
    if r == 1:
        return f"stem_norm_{k}"
    raise KeyError(f"stem index {idx} is a ReLU; has no params")


def _set(tree: Dict[str, Any], path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _leaf(kind: str, pname: str, value: np.ndarray):
    """Translate one torch tensor into (flax leaf names, transformed value)."""
    v = np.asarray(value)
    if kind == "conv":
        if pname == "weight":
            return ["conv", "kernel"], np.transpose(v, (2, 3, 1, 0))  # OIHW->HWIO
        return ["conv", "bias"], v
    if kind == "norm":
        if pname == "weight":
            return ["scale"], v
        if pname == "bias":
            return ["bias"], v
        raise KeyError(f"unexpected norm param {pname}")
    if kind == "norm_stats":
        if pname == "running_mean":
            return ["mean"], v
        if pname == "running_var":
            return ["var"], v
        raise KeyError(pname)
    if kind == "linear":
        if pname == "weight":
            return ["dense", "kernel"], np.transpose(v, (1, 0))
        return ["dense", "bias"], v
    raise KeyError(kind)


def convert_state_dict(
    state_dict: Mapping[str, Any], model: str = "pixelwise"
) -> Dict[str, Any]:
    """Convert a reference state_dict to ``{'params': ..., 'batch_stats': ...}``.

    ``model`` is ``'pixelwise'`` or ``'fullregression'``. ``batch_stats`` is
    only populated when the checkpoint contains BatchNorm running stats.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, value in state_dict.items():
        v = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        parts = key.split(".")

        if parts[-1] == "num_batches_tracked":
            continue
        if parts[-1] == "filter":
            # PlaneRegression's registered COM-filter buffer (model.py:71) —
            # a deterministic constant we regenerate via ops.heatmap.com_filter.
            continue
        is_stat = parts[-1] in ("running_mean", "running_var")
        pname = parts[-1]

        path: list = []
        i = 0
        # --- top level ---
        if parts[0] == "conv":  # stem sequential
            flax_name = _stem_name(int(parts[1]))
            kind = "conv" if "conv" in flax_name else "norm"
            path = [flax_name]
            i = 2
        elif parts[0] == "stages":
            path = [f"stage_{parts[1]}"]
            i = 2
            sub = parts[i]
            if sub == "conv" and model == "pixelwise" and parts[i + 1] in ("weight", "bias"):
                # PredictionBlock 1x1 projection (model.py:137)
                path.append("proj")
                kind = "conv"
                i += 1
            elif sub == "conv" and model == "fullregression" and parts[i + 1] in ("weight", "bias"):
                path.append("proj")
                kind = "conv"
                i += 1
            elif sub == "hourglass":
                i += 1
                path.append("hourglass")
                # walk input_conv/inner/output_conv chain
                while parts[i] in ("input_conv", "inner", "output_conv"):
                    path.append(parts[i])
                    i += 1
                # now parts[i] == 'conv' (ResBlock sequential), parts[i+1] = idx
                assert parts[i] == "conv", key
                flax_name = _RESBLOCK_IDX[parts[i + 1]]
                path.append(flax_name)
                kind = "conv" if "conv" in flax_name else "norm"
                i += 2
            elif sub in ("plane_regression", "depth_regression"):
                i += 1
                head = "plane" if sub == "plane_regression" else "depth"
                if parts[i] == "w":
                    # learned softmax temperature lives on the stage module here
                    _set(params, [f"stage_{parts[1]}", "w"], v)
                    continue
                assert parts[i] == "conv", key
                flax_name = _HEAD_IDX[parts[i + 1]]
                path.extend([head, flax_name])
                kind = "conv" if "conv" in flax_name else "norm"
                i += 2
            elif sub == "downsampling":
                flax_name = _DOWN_IDX[parts[i + 1]]
                path.append(flax_name)
                kind = "conv" if "conv" in flax_name else "norm"
                i += 2
            elif sub == "regression":
                flax_name = _FC_IDX[parts[i + 1]]
                path.append(flax_name)
                kind = "linear"
                i += 2
            else:
                raise KeyError(f"unhandled key {key}")
        else:
            raise KeyError(f"unhandled key {key}")

        if is_stat:
            names, tv = _leaf("norm_stats", pname, v)
            _set(batch_stats, path + names, tv)
        else:
            names, tv = _leaf(kind, pname, v)
            _set(params, path + names, tv)

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_torch_checkpoint(path: str, model: str = "pixelwise"):
    """Load a reference ``.pt`` file -> (variables, seed, model_param).

    Requires torch (CPU build is fine) to unpickle.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    variables = convert_state_dict(ckpt["state_dict"], model=model)
    return variables, ckpt.get("seed"), ckpt.get("model_param")
