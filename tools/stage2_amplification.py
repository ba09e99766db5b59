"""Quantify the stage-2 chained-model noise amplification (VERDICT item 3).

The 2-stage trained-parity gate is looser than single-stage (1.0 vs 0.1 mm)
on the claim that the stage-chaining concat (softmax heatmaps -> stage-2
input, reference model.py:190-208) amplifies backend float noise. This
measures that claim:

  1. train the tiny reference torch model (same recipe as
     tests/test_trained_parity.py), convert to flax;
  2. perturb the input image by eps in {1e-7, 1e-6, 1e-5} and report the
     per-stage uvd output delta for BOTH torch and flax — the gain
     G = ||d_uvd|| / eps of the *function itself*;
  3. report the actual torch-vs-flax parity delta per stage, in mm, under
     matmul_precision in {highest, default};
  4. repeat over training seeds for spread.

Run on CPU: python tools/stage2_amplification.py [--seeds 3]
"""

import argparse
import os
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

LABEL_SIZE = 16


def load_crops(root, n):
    import jax.random as jrandom

    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import SPECS, get_source

    spec = SPECS["NYU"]
    src = get_source("NYU", path=root, dataset="train", test_only=False)
    loader = Loader(src, batch_size=n, num_workers=2)
    batch = next(iter(loader))
    batch.pop("count")
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=2 * LABEL_SIZE, label_size=LABEL_SIZE,
    )
    data = preprocess_batch(batch, jrandom.PRNGKey(0), cfg)
    return {k: np.asarray(v) for k, v in data.items()}


def mm_scale(data, spec):
    """normalized-uv -> mm conversion factors (box at hand depth) and
    d -> mm (cube), per sample — mirrors compat.verify_parity."""
    box = data["box_size"].astype(np.float64)
    com = data["com"].astype(np.float64)
    cube = data["cube"].astype(np.float64)
    fx = spec.camera.fx
    uv_mm = (box - 1) * com[:, 2] / fx  # px -> mm at hand depth
    return uv_mm, cube


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    import model as ref_model

    from pixelwiseregression_tpu.compat.torch_ckpt import convert_state_dict
    from pixelwiseregression_tpu.data.sources import SPECS
    from pixelwiseregression_tpu.models import PixelwiseRegression

    root = tempfile.mkdtemp(prefix="nyu_amp_")
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root, "16", "6"], check=True,
                   capture_output=True)
    data = load_crops(root, 8)
    img = data["img"]
    label = data["label_img"]
    mask = data["mask"]
    uvd_t = data["uvd"]
    uv_mm, cube = mm_scale(data, SPECS["NYU"])

    def to_torch(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy()).float()

    model_param = {
        "stage": 2, "label_size": LABEL_SIZE, "features": 32, "level": 2,
        "norm_method": "instance", "heatmap_method": "softmax",
        "kernel_size": 3,
    }

    for seed in range(args.seeds):
        torch.manual_seed(seed)
        tm = ref_model.PixelwiseRegression(14, **model_param)
        tm.train()
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
        ti, tl, tmk = to_torch(img), to_torch(label), to_torch(mask)
        tu = torch.from_numpy(uvd_t.copy()).float()
        for _ in range(args.steps):
            opt.zero_grad()
            results = tm(ti, tl, tmk)
            loss = sum(((uvd - tu) ** 2).sum(-1).mean() for _, _, uvd in results)
            loss.backward()
            opt.step()
        tm.eval()

        fm = PixelwiseRegression(
            joints=14, stage=2, label_size=LABEL_SIZE, features=32, level=2,
            norm_method="instance", heatmap_method="softmax", decoder="xla",
            dtype=jnp.float32,
        )
        variables = {"params": convert_state_dict(tm.state_dict())["params"]}

        def flax_uvds(im):
            out = fm.apply(variables, jnp.asarray(im), jnp.asarray(label),
                           jnp.asarray(mask), train=False)
            return [np.asarray(r[2]) for r in out]

        def torch_uvds(im):
            with torch.no_grad():
                out = tm(to_torch(im), tl, tmk)
            return [r[2].numpy() for r in out]

        # mm deltas: uv components scale by uv_mm, d by cube
        def to_mm(d_uvd):
            mm = np.empty_like(d_uvd)
            mm[..., 0] = d_uvd[..., 0] * uv_mm[:, None]
            mm[..., 1] = d_uvd[..., 1] * uv_mm[:, None]
            mm[..., 2] = d_uvd[..., 2] * cube[:, None]
            return np.abs(mm).max(axis=(0, 1, 2)) if d_uvd.ndim == 4 else np.abs(mm).max()

        print(f"--- seed {seed} ---", flush=True)
        # 2. intrinsic gain of the function
        for eps in (1e-7, 1e-6, 1e-5):
            pert = img + eps
            for name, fn in (("torch", torch_uvds), ("flax", flax_uvds)):
                base = fn(img)
                per = fn(pert)
                gains = [np.abs(p - b).max() / eps for b, p in zip(base, per)]
                print(f"  eps={eps:.0e} {name}: stage gains "
                      + " ".join(f"{g:9.1f}" for g in gains), flush=True)

        # 3. parity per stage, matmul precision highest vs default
        for prec in ("highest", "default"):
            jax.config.update("jax_default_matmul_precision",
                              None if prec == "default" else prec)
            f = flax_uvds(img)
            t = torch_uvds(img)
            mms = [to_mm(fu - tu_) for fu, tu_ in zip(f, t)]
            print(f"  parity ({prec}): "
                  + " ".join(f"stage{i+1} {m:8.4f} mm" for i, m in enumerate(mms)),
                  flush=True)


if __name__ == "__main__":
    main()
