"""Interleaved A/B: does remat move the train step? (VERDICT r3 item 2)

The round-4 fwd/bwd profile (tools/profile_train_components.py, PERF.md
"Round 4 — train-step fwd/bwd decomposition") shows backward at 66% of
device time with the head-conv backward class at ~32% of the step. remat
(`nn.remat` around each PredictionBlock, the shipped `--remat` flag)
reorders the backward pass — recompute-forward interleaves MXU work with
the gradient convs and shrinks live activations. This measures whether
that scheduling change buys anything, with the measurement discipline the
repo's phantom-10% lesson demands: ONE process, interleaved rounds
(base, remat, base, remat, ...), in-jit lax.scan timing, non-positive
deltas rejected, median-of-positive reported.

Run: python tools/train_remat_ab.py [--batch 128] [--rounds 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_common import run_interleaved


def build_sampler(remat, batch_size, iters, decoder):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.loop import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )
    from pixelwiseregression_tpu.utils.synth import make_synthetic_raw_batch

    fx, fy, fh, fw = 588.03, 587.07, 480, 640
    cfg = PreprocessConfig(
        fx=fx, fy=fy, halfu=fw / 2, halfv=fh / 2,
        image_size=128, label_size=64, kernel_size=7, sigma=1.5,
        using_rotation=True, using_scale=True, using_shift=True,
    )
    model = PixelwiseRegression(
        joints=14, stage=2, label_size=64, features=128, level=4,
        norm_method="instance_anchored", dtype=jnp.bfloat16,
        decoder=decoder, remat=remat,
    )
    tx = make_optimizer(steps_per_epoch=100)
    sample = (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)),
              jnp.zeros((2, 64, 64, 1)))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_raw_batch(batch_size, fh, fw, 14,
                                      fx=fx, fy=fy).items()}
    raw_step = make_train_step(cfg, LossConfig(), augment=True, jit=False)

    def make_scan(n):
        def run(state, batch):
            def body(st, i):
                b2 = dict(batch)
                b2["frame"] = batch["frame"] + i.astype(jnp.float32) * 1e-3
                st, metrics = raw_step(
                    st, b2, jax.random.fold_in(jax.random.PRNGKey(1), i))
                return st, metrics["loss"]
            st, losses = lax.scan(body, state, jnp.arange(n))
            return losses[-1]
        return jax.jit(run)

    run_n, run_1 = make_scan(iters), make_scan(1)
    for f in (run_1, run_n):
        float(f(state, batch))

    def sample_delta():
        t0 = time.perf_counter(); float(run_1(state, batch))
        t1 = time.perf_counter(); float(run_n(state, batch))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (iters - 1)

    return sample_delta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--decoder", type=str, default="pallas")
    args = ap.parse_args()

    import jax
    print(f"platform={jax.devices()[0].platform}", flush=True)

    samplers = {}
    for name, rm in (("base", False), ("remat", True)):
        samplers[name] = build_sampler(rm, args.batch, args.iters,
                                       args.decoder)
        print(f"  compiled {name}", flush=True)

    # bench.py estimator discipline via ab_common (interleaved rounds,
    # per-variant isolation, median-of-positive) — one variant's corrupted
    # window or mid-run exception cannot lose the other's results
    results = run_interleaved(samplers, rounds=args.rounds)
    for name, (med, quality) in results.items():
        if med is None:
            print(f"  {name:6s} unestimable: {quality.get('error')}",
                  flush=True)
            continue
        print(f"  {name:6s} median {med*1e3:7.2f} ms/step  "
              f"({args.batch/med:7.1f} f/s median, {quality['samples']} "
              f"samples, spread {quality['spread_pct']}%)", flush=True)


if __name__ == "__main__":
    main()
