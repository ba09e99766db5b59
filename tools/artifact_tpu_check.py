"""Validate that a .pwrsrv serving artifact runs on the real TPU.

Round-3 artifacts (`serve_artifact.py`) are lowered for cpu AND tpu, but
during the round the axon tunnel outage meant only the cpu lowering was
ever executed in-session.  This one-shot check closes that gap:

  1. export a small MSRA artifact from the in-tree trained checkpoint
     (weights + full pipeline frozen to StableHLO),
  2. load + predict the same synthetic batch in TWO fresh subprocesses —
     one forced to cpu, one on the default (tpu) backend,
  3. print one JSON line with the tpu/cpu agreement.

Subprocesses because the jax platform is fixed at backend init and the
tunnel plugin ignores env vars (CLAUDE.md "TPU tunnel outages"); each
child applies the override in-process via ``apply_platform_override``.

Usage: python tools/artifact_tpu_check.py [--ckpt ...] [--skip_export]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(args):
    # 'tpu' must ride the DEFAULT backend: the axon tunnel registers as its
    # own PJRT plugin (devices report .platform == 'tpu', but the plugin
    # name is 'axon'), so forcing jax_platforms='tpu' selects the LOCAL
    # libtpu plugin instead — which fails with "No jellyfish device found"
    # on a chipless host (observed in the round-3 queue run). Only non-tpu
    # platforms need the explicit override.
    if args.platform == "tpu":
        os.environ.pop("PWR_PLATFORM", None)
    else:
        os.environ["PWR_PLATFORM"] = args.platform
    sys.path.insert(0, REPO)
    from pixelwiseregression_tpu.cli.common import apply_platform_override

    apply_platform_override()
    import jax

    from pixelwiseregression_tpu.serve_artifact import ServingArtifact
    from pixelwiseregression_tpu.utils.synth import make_synthetic_raw_batch

    platform = jax.devices()[0].platform
    art = ServingArtifact.load(args.artifact)
    raw = make_synthetic_raw_batch(
        args.batch, 240, 320, 21, fx=241.42, fy=241.42, seed=7
    )
    out = art.predict(raw["frame"], raw["com"], raw["cube"])
    np.savez(args.out, uvd=out["uvd"], xyz=out["xyz"], platform=platform)
    print(f"[child {args.platform}] ran on {platform}, "
          f"uvd mean {out['uvd'].reshape(-1, 3).mean(0).round(2).tolist()}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="Model/MSRA_default_subject0_final.ckpt")
    p.add_argument("--artifact", default=None,
                   help="reuse an existing artifact instead of exporting")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--timeout", type=int, default=900)
    # child mode (internal)
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.platform:
        return _child(args)

    tmp = tempfile.mkdtemp(prefix="pwrsrv_check_")
    artifact = args.artifact
    if artifact is None:
        artifact = os.path.join(tmp, "msra_check.pwrsrv")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/export_model.py"),
             "--ckpt", args.ckpt, "--dataset", "MSRA",
             "--output", artifact, "--batch_size", str(args.batch),
             "--platforms", "cpu,tpu"],
            check=True, timeout=args.timeout,
            env={**os.environ, "PWR_PLATFORM": "cpu"},
        )

    outs = {}
    for platform in ("cpu", "tpu"):
        out = os.path.join(tmp, f"{platform}.npz")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--artifact", artifact, "--batch", str(args.batch),
             "--platform", platform, "--out", out],
            check=True, timeout=args.timeout,
        )
        outs[platform] = np.load(out)

    ran_on = str(outs["tpu"]["platform"])
    d_uvd = float(np.abs(outs["tpu"]["uvd"] - outs["cpu"]["uvd"]).max())
    d_xyz = float(np.abs(outs["tpu"]["xyz"] - outs["cpu"]["xyz"]).max())
    m_uvd = float(np.abs(outs["tpu"]["uvd"] - outs["cpu"]["uvd"]).mean())
    # Gate calibration: the artifact serves in bf16 (by design), and the two
    # backends round bf16 intermediates differently (MXU native vs CPU
    # upcast-compute-round). At ~600 mm depth values a single bf16 ULP is
    # ~2.3 mm, and the decode chain amplifies backend float noise 10-30x
    # (tools/stage2_amplification.py). Measured on the real chip
    # (2026-08-18): max 0.584 mm / mean 0.042 mm — so 1.0 mm separates
    # cross-backend bf16 noise from the ~20 mm numerics-bug class this
    # check exists to catch.
    ok = ran_on == "tpu" and d_uvd < 1.0 and np.isfinite(d_uvd)
    print(json.dumps({
        "metric": "artifact_tpu_check", "ok": bool(ok),
        "tpu_ran_on": ran_on, "max_abs_uvd_delta_px_mm": d_uvd,
        "mean_abs_uvd_delta_px_mm": m_uvd,
        "max_abs_xyz_delta_mm": d_xyz, "artifact": artifact,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
