"""Inference entry point shared by test.py / test_msra.py /
test_fullregression.py (reference: test.py:12-137, test_msra.py,
test_fullregression.py).

Runs the test split through on-device preprocessing + the model, de-normalizes
uvd with recover_uvd, and writes ``Result/<dataset>_<suffix>.txt`` in the
reference's format (HAND17: xyz + submission-format rewrite). Prints FPS like
test_msra.py:111 (here for every dataset).
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.cli.common import (
    apply_tpu_flags,
    model_kwargs_from_args,
    parse_compiler_opts,
    resolve_num_workers,
)
from pixelwiseregression_tpu.core.camera import recover_uvd
from pixelwiseregression_tpu.data.loader import Loader
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
from pixelwiseregression_tpu.data.sources import get_source
from pixelwiseregression_tpu.models import FullRegression, PixelwiseRegression
from pixelwiseregression_tpu.train.checkpoint import load_checkpoint


def _find_model_file(model_dir: str, base: str) -> str:
    """Prefer native .ckpt; fall back to a reference .pt checkpoint."""
    for ext in (".ckpt", ".pt"):
        p = os.path.join(model_dir, base + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no checkpoint {base}(.ckpt|.pt) under {model_dir}")


def run_inference(args, dataset_name: str, fullregression: bool = False, subject=None):
    apply_tpu_flags(args)
    os.makedirs("Result", exist_ok=True)
    assert os.path.exists("Model"), "Please put the models in ./Model folder"

    source_kw = dict(path=args.data_path, test_only=True)
    if subject is not None:
        source_kw["subject"] = subject
    process_mode = getattr(args, "process_mode", "uvd")
    if process_mode != "uvd":
        source_kw["process_mode"] = process_mode
    testset = get_source(dataset_name, dataset="test", **source_kw)

    joints = testset.joint_number
    spec = testset.spec
    image_size = args.label_size * 2

    pp = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy, halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=image_size, label_size=args.label_size,
        kernel_size=args.kernel_size, sigma=args.sigmoid,
    )

    model_kw = model_kwargs_from_args(args, joints, fullregression=fullregression)
    model = (FullRegression if fullregression else PixelwiseRegression)(**model_kw)

    suffix = args.suffix
    if subject is not None:
        suffix = f"{args.suffix}_subject{subject}"
    base = f"{dataset_name}_{suffix}_{args.seed}"
    ckpt_path = _find_model_file("Model", base)
    sample_inputs = (
        jnp.zeros((1, image_size, image_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
    )
    template = model.init(jax.random.PRNGKey(0), *sample_inputs, train=False)
    ckpt = load_checkpoint(ckpt_path, params_template=template["params"])
    variables = {"params": ckpt["params"]}
    if ckpt["batch_stats"]:
        variables["batch_stats"] = ckpt["batch_stats"]

    copts = parse_compiler_opts(getattr(args, "compiler_opts", None))

    @partial(jax.jit, compiler_options=copts)
    def infer(batch):
        data = preprocess_batch(batch, jax.random.PRNGKey(0), pp, test_only=True)
        results = model.apply(variables, data["img"], data["label_img"], data["mask"], train=False)
        uvd = results[-1] if fullregression else results[-1][2]
        return recover_uvd(
            uvd.astype(jnp.float32),
            data["box_size"],
            data["com"],
            data["cube"],
        )

    loader = Loader(testset, args.batch_size, shuffle=False, drop_last=False,
                    num_workers=resolve_num_workers(args.num_workers),
                    on_error="skip" if getattr(args, "skip_bad_samples", False)
                    else "raise")

    quant = model_kw.get("quant")
    if quant and "static" in quant:
        # static int8 scales: calibrate the quant_scales collection (running
        # per-channel |x| max, see models/layers.py:_Int8Conv2D) over the
        # first --quant_calib_batches batches, then freeze
        n_calib = getattr(args, "quant_calib_batches", 4)

        @jax.jit
        def calib_step(variables, batch):
            data = preprocess_batch(batch, jax.random.PRNGKey(0), pp, test_only=True)
            _, upd = model.apply(variables, data["img"], data["label_img"],
                                 data["mask"], train=False,
                                 mutable=["quant_scales"])
            return upd

        it = iter(loader)
        n_ran = 0
        for _ in range(n_calib):
            try:
                b = next(it)
            except StopIteration:
                break
            b.pop("count", None)
            variables = dict(variables, **calib_step(variables, b))
            n_ran += 1
        # zero calibration batches would leave quant_scales at 0 -> s_a
        # clamped to 1e-12 -> every activation saturates to +-127: silently
        # garbage predictions. Fail loudly instead.
        if n_ran == 0:
            raise RuntimeError(
                "int8 static quantization needs >=1 calibration batch but "
                "none ran (--quant_calib_batches=0 or empty dataset); "
                "refusing to run inference with uncalibrated scales"
            )
        scales = jax.tree_util.tree_leaves(variables.get("quant_scales", {}))
        if not scales or not all(float(jnp.max(s)) > 0 for s in scales):
            raise RuntimeError(
                "int8 static calibration produced empty/zero quant_scales — "
                "check the calibration data"
            )

    print("running on test dataset ......")
    pre_uvd = []
    start = time.time()
    n = 0
    for batch in loader:
        count = int(batch.pop("count"))
        # rows are positional (matched to the test list / HAND17 image names
        # by index), so undecodable samples keep their row as NaN instead of
        # shifting every following prediction onto the wrong frame
        decode_ok = np.asarray(batch.pop("decode_ok", np.ones(count, bool)))[:count]
        out = np.asarray(infer(batch))[:count]
        if dataset_name == "HAND17":
            out = testset.camera.uvd2xyz(out)
        out = out.astype(np.float64)
        out[~decode_ok] = np.nan
        pre_uvd.append(out.reshape(-1, joints * 3))
        n += count
    elapsed = time.time() - start
    print(f"test code runs on {n / elapsed:.2f} FPS")

    pre_uvd = np.concatenate(pre_uvd, axis=0)
    if args.seed == "final":
        result_name = f"Result/{dataset_name}_{suffix}.txt"
    else:
        result_name = f"Result/{dataset_name}_{suffix}_{args.seed}.txt"
    np.savetxt(result_name, pre_uvd, fmt="%.3f")

    if dataset_name == "HAND17":
        # challenge submission format (reference: test.py:126-137)
        with open(result_name) as f:
            rows = f.readlines()
        out_rows = [
            "\t".join(["frame\\images\\image_D%08d.png" % (i + 1)] + r.split())
            for i, r in enumerate(rows)
        ]
        with open(result_name, "w") as f:
            f.write("\n".join(out_rows))

    return result_name, n / elapsed
