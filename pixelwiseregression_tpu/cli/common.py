"""Shared CLI plumbing: reference-compatible argparse surfaces.

Flag names/defaults mirror the reference scripts exactly
(reference: train.py:14-62, test.py:13-37) so existing invocations keep
working; TPU-specific additions are clearly grouped.
"""

from __future__ import annotations

import argparse
import os


def _bool01(x: str) -> bool:
    return [False, True][int(x)]


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--label_size", type=int, default=64)
    p.add_argument("--kernel_size", type=int, default=7)
    p.add_argument("--sigmoid", type=float, default=1.5)
    p.add_argument("--norm_method", type=str, default="instance_anchored",
                   help="choose from batch, instance_anchored (default: "
                        "calibrated-anchor one-pass stats — one-pass speed "
                        "with two-pass-grade robustness, trained-parity "
                        "gated at <0.01 mm; anchors live in batch_stats "
                        "and torch checkpoints without them fall back to "
                        "exact two-pass), instance (always-exact torch "
                        "two-pass variance) and instance_fast (raw "
                        "one-pass: numerically unsafe on near-constant "
                        "channels — not for parity)")
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)


def add_tpu_args(p: argparse.ArgumentParser, decoder_default: str = "pallas"):
    g = p.add_argument_group("tpu")
    # unified default (round 3): the fused Pallas decoder everywhere —
    # training wins on the fused custom backward, and the bf16
    # fast_boundary path ties the XLA decoder forward-only (10,180 vs
    # 10,194 fps, window noise — PERF.md), so one decoder serves both.
    g.add_argument("--decoder", type=str, default=decoder_default,
                   choices=["xla", "pallas"],
                   help="soft-argmax decoder implementation")
    g.add_argument("--data_path", type=str, default=None,
                   help="dataset root (default Data/<dataset>)")
    g.add_argument("--no_strict_quirks", action="store_true",
                   help="fix reference quirks (honor --using_rotation, working flip)")
    g.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations (TPU mixed precision)")
    g.add_argument("--aug_fallback", type=str, default="clean", choices=["clean", "drop"],
                   help="failed-augmentation policy: 'clean' = reference fallback to the "
                        "unaugmented sample; 'drop' = mask from loss (faster)")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize prediction blocks on backward (less "
                        "activation memory, enables larger per-chip batches)")
    g.add_argument("--no_compile_cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(default dir ~/.cache/pixelwiseregression_tpu/xla; "
                        "also PWR_COMPILE_CACHE=0 / PWR_COMPILE_CACHE_DIR)")
    g.add_argument("--matmul_precision", type=str, default=None,
                   choices=["default", "high", "highest"],
                   help="XLA matmul precision (use 'highest' for checkpoint parity)")
    g.add_argument("--compiler_opts", type=str, default=None, metavar="K=V[,K2=V2]",
                   help="per-jit XLA compiler options forwarded to the "
                        "backend compiler as env_option_overrides — the only "
                        "route for xla_tpu_* knobs under the TPU tunnel "
                        "(client-side XLA_FLAGS aborts on them; see "
                        "tools/xla_flags_ab.py). Example: "
                        "xla_tpu_enable_latency_hiding_scheduler=false")
    g.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of a few training steps into DIR")
    g.add_argument("--resume", type=str, default=None, metavar="CKPT",
                   help="resume training from a .ckpt (restores params, optimizer state, step)")


def make_train_parser(dataset_default: str = "NYU", suffix_default: str = "default",
                      msra: bool = False, fullregression: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--suffix", type=str, default=suffix_default,
                   help="the suffix of model file and log file")
    if msra:
        p.add_argument("--subject", type=int, default=0)
    else:
        p.add_argument("--dataset", type=str, default=dataset_default,
                       help="choose from MSRA, ICVL, NYU, HAND17")
    p.add_argument("--seed", type=int, default=0,
                   help="the random seed used in the training, 0 means do not use fix seed")
    add_model_args(p)
    if not fullregression:
        p.add_argument("--heatmap_method", type=str, default="softmax",
                       help="choose from softmax and sum")
        p.add_argument("--lambda_h", type=float, default=1.0)
        p.add_argument("--lambda_d", type=float, default=0.01)
        p.add_argument("--alpha", type=float, default=1.0)
        p.add_argument("--filter_size", type=int, default=3)
    p.add_argument("--using_rotation", type=_bool01, default=True)
    p.add_argument("--using_scale", type=_bool01, default=True)
    p.add_argument("--using_shift", type=_bool01, default=True)
    p.add_argument("--using_flip", type=_bool01, default=False)
    if not msra:
        p.add_argument("--small", action="store_true")
    p.add_argument("--gpu_id", type=str, default="0",
                   help="kept for reference-CLI compatibility; ignored on TPU")
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--num_workers", type=int, default=9999)
    p.add_argument("--opt", type=str, default="adam", help="choose from adam and sgd")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--weight_decay", type=float, default=0)
    p.add_argument("--mixed_precision", action="store_true",
                   help="mixed precision training (bf16 activations on TPU)")
    p.add_argument("--lr_decay", type=float, default=0.2)
    p.add_argument("--decay_epoch", type=float, default=15)
    add_tpu_args(p)
    return p


def make_test_parser(dataset_default: str = "MSRA", msra: bool = False,
                     fullregression: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--suffix", type=str, default="default" if not fullregression else "full_regression",
                   help="the suffix of model file and log file")
    if msra:
        p.add_argument("--subject", type=int, default=0)
    else:
        p.add_argument("--dataset", type=str, default=dataset_default,
                       help="choose from MSRA, ICVL, NYU, HAND17")
    add_model_args(p)
    if not fullregression:
        p.add_argument("--heatmap_method", type=str, default="softmax",
                       help="choose from softmax and sum")
        p.add_argument("--filter_size", type=int, default=3)
    if not msra and not fullregression:
        p.add_argument("--process_mode", type=str, default="uvd", help="choose from uvd and bb")
    if not fullregression:
        p.add_argument("--quant", type=str, default="none",
                       help="int8 MXU inference quantization (2x bf16 peak on v5e): "
                            "'int8[_static][_all|_heads]' — coverage: stem+heads / "
                            "+hourglass / heads only; '_static' uses per-channel "
                            "scales calibrated over --quant_calib_batches "
                            "(fastest). Same checkpoint serves all modes")
        p.add_argument("--quant_calib_batches", type=int, default=4,
                       help="batches used to calibrate static int8 activation "
                            "scales (running per-channel |x| max)")
    p.add_argument("--gpu_id", type=str, default="0")
    p.add_argument("--num_workers", type=int, default=9999)
    p.add_argument("--seed", type=str, default="final")
    p.add_argument("--skip_bad_samples", action="store_true",
                   help="warn and drop undecodable test samples instead of "
                        "aborting (test lists are never validity-checked)")
    add_tpu_args(p)
    return p


def resolve_num_workers(n: int) -> int:
    return min(n, os.cpu_count() or 1)


def apply_platform_override():
    """Honor ``PWR_PLATFORM`` (e.g. ``cpu``) via ``jax.config.update``.

    The TPU tunnel plugin overrides the ``JAX_PLATFORMS`` env var, so env
    alone cannot force CPU — and initializing the tunnel backend blocks
    forever when the tunnel is down. The config update wins over the
    plugin's selection when applied before first device use; tests and
    offline tooling set ``PWR_PLATFORM=cpu`` to stay tunnel-independent.
    """
    plat = os.environ.get("PWR_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def parse_compiler_opts(s):
    """``'k=v[,k2=v2]'`` → dict for ``jax.jit(compiler_options=...)``.

    Returns None for empty/None input (jit's default). Values stay
    strings — the XLA option parser coerces them server-side.
    """
    if not s:
        return None
    out = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        if not k.strip() or not v.strip():
            raise SystemExit(
                f"bad --compiler_opts entry {part!r} (expected key=value)")
        out[k.strip()] = v.strip()
    return out


def apply_tpu_flags(args):
    import jax

    apply_platform_override()
    if getattr(args, "matmul_precision", None):
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    # persistent compilation cache: repeat invocations of the same config
    # skip the ~3-4 min remote TPU compile (utils/compile_cache.py)
    from pixelwiseregression_tpu.utils.compile_cache import maybe_enable_from_args

    maybe_enable_from_args(args)


def model_kwargs_from_args(args, joints: int, fullregression: bool = False):
    import jax.numpy as jnp

    kw = dict(
        joints=joints,
        stage=args.stages,
        label_size=args.label_size,
        features=args.features,
        level=args.level,
        norm_method=args.norm_method,
        remat=getattr(args, "remat", False),
        dtype=jnp.bfloat16 if (getattr(args, "bf16", False) or getattr(args, "mixed_precision", False)) else jnp.float32,
    )
    if not fullregression:
        quant = getattr(args, "quant", "none")
        kw.update(
            kernel_size=args.filter_size,
            heatmap_method=args.heatmap_method,
            decoder=args.decoder,
            quant=None if quant in (None, "none") else quant,
        )
    return kw
