"""Checkpointing: single-file msgpack checkpoints + best-epoch aliasing.

Mirrors the reference's checkpoint contract (reference: utils.py:302-314,
train.py:313-320): every epoch writes ``Model/<name>_<epoch>.ckpt`` holding
``{params, batch_stats, seed, model_param}``; the best epoch (by last-stage
val mean-mm) is aliased to ``<name>_final.ckpt``.

Improvements over the reference: optional optimizer state for true
resume-from-checkpoint (the reference never saves it — SURVEY.md §5), and
torch ``.pt`` checkpoints load transparently through
`pixelwiseregression_tpu.compat.torch_ckpt`.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import numpy as np

import jax
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    batch_stats=None,
    seed: Optional[int] = None,
    model_param: Optional[Dict[str, Any]] = None,
    opt_state=None,
    step: Optional[int] = None,
):
    payload = {
        "params": serialization.to_bytes(_to_numpy_tree(params)),
        "batch_stats": serialization.to_bytes(_to_numpy_tree(batch_stats or {})),
        "meta": json.dumps(
            {"seed": seed, "model_param": model_param, "step": step}
        ).encode(),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(_to_numpy_tree(opt_state))
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template=None, opt_state_template=None):
    """Load a checkpoint. If ``path`` ends with ``.pt`` it is treated as a
    reference torch checkpoint and converted.

    Returns dict with params, batch_stats, seed, model_param, step, opt_state.
    """
    if path.endswith(".pt"):
        from pixelwiseregression_tpu.compat.torch_ckpt import load_torch_checkpoint

        variables, seed, model_param = load_torch_checkpoint(path)
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "seed": seed,
            "model_param": model_param,
            "step": None,
            "opt_state": None,
        }

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta"].decode())
    params = serialization.from_bytes(params_template, payload["params"])
    batch_stats = serialization.msgpack_restore(payload["batch_stats"])
    opt_state = None
    if "opt_state" in payload and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, payload["opt_state"])
    return {
        "params": params,
        "batch_stats": batch_stats,
        "seed": meta.get("seed"),
        "model_param": meta.get("model_param"),
        "step": meta.get("step"),
        "opt_state": opt_state,
    }


def peek_model_param(path: str) -> Optional[Dict[str, Any]]:
    """Read just the stored model_param from a checkpoint (.ckpt or .pt)."""
    if path.endswith(".pt"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        return ckpt.get("model_param")
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return json.loads(payload["meta"].decode()).get("model_param")


def alias_final(model_dir: str, name_fmt: str, best_epoch: int):
    """Copy the best epoch's checkpoint to the ``final`` alias
    (reference: train.py:320)."""
    src = os.path.join(model_dir, name_fmt.format(best_epoch))
    dst = os.path.join(model_dir, name_fmt.format("final"))
    shutil.copyfile(src, dst)
