"""Train-step A/B over norm forms, ONE process (measurement discipline:
first-class configs, same chip window, in-jit lax.scan timing — see
bench.py docstring for why naive timing lies through the axon tunnel).

Settles the round-2 "training regressed 1,932 -> 1,236 f/s" question:
how much of the train-step delta is the two-pass instance-norm variance
(the only training-path code change since round 1), and what do the
one-pass and batch-norm forms measure under the SAME methodology?

Run: python tools/train_ab.py [--batch 128] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(norm_method, batch_size, iters, repeat, decoder,
            compiler_options=None):
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
        norm_method=norm_method, dtype=jnp.bfloat16, decoder=decoder,
    )
    tx = make_optimizer(steps_per_epoch=100)
    sample = (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)),
              jnp.zeros((2, 64, 64, 1)))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_raw_batch(batch_size, fh, fw, 14, fx=fx, fy=fy).items()}
    raw_step = make_train_step(cfg, LossConfig(), augment=True, jit=False)

    def make_scan(n):
        def run(state, batch):
            def body(st, i):
                b2 = dict(batch)
                b2["frame"] = batch["frame"] + i.astype(jnp.float32) * 1e-3
                st, metrics = raw_step(st, b2, jax.random.fold_in(jax.random.PRNGKey(1), i))
                return st, metrics["loss"]
            st, losses = lax.scan(body, state, jnp.arange(n))
            return losses[-1]
        # compiler_options go to the SERVER-side TPU compiler (per-jit
        # env_option_overrides) — the axon plugin's client flag parser
        # rejects xla_tpu_* names in XLA_FLAGS, this path doesn't.
        return jax.jit(run, compiler_options=compiler_options)

    run_n, run_1 = make_scan(iters), make_scan(1)
    for f in (run_1, run_n):
        float(f(state, batch))
    per = []
    for _ in range(repeat):
        t0 = time.perf_counter(); float(run_1(state, batch))
        t1 = time.perf_counter(); float(run_n(state, batch))
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (iters - 1))
    dt = min(per)
    return dt * 1e3, batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=str, default=None,
                    help="comma list for a batch-size sweep (one process, "
                         "same window), e.g. 96,128,160,192")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--decoder", type=str, default="pallas")
    ap.add_argument("--decoders", type=str, default=None,
                    help="comma list to A/B decoders, e.g. pallas,xla")
    ap.add_argument("--norms", type=str,
                    default="instance,instance_fast,batch")
    args = ap.parse_args()

    import jax
    batches = [int(x) for x in args.batches.split(",")] if args.batches \
        else [args.batch]
    decoders = args.decoders.split(",") if args.decoders else [args.decoder]
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for b in batches:
        for dec in decoders:
            for nm in args.norms.split(","):
                ms, fps = measure(nm, b, args.iters, args.repeat, dec)
                print(f"  batch={b:4d} decoder={dec:7s} {nm:16s} "
                      f"{ms:7.1f} ms/step  {fps:7.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
