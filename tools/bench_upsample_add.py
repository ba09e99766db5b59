"""A/B the hourglass upsample+skip-add formulations on the real TPU.

The profile (tools/profile_components.py) shows the top-level nearest
upsample materializes as standalone broadcast_in_dim ops (~3.8 us/frame
per stage) before the skip add. Candidate: keep the add in the compact
domain — reshape the skip to [B,H,2,W,2,C] and add the low-res tensor
broadcast over the inserted axes, so XLA can emit ONE fused pass (read
h 0.25MB + x 1MB, write 1MB per frame) instead of broadcast-materialize
(write 1MB) + add (read 2MB, write 1MB).

In-jit lax.scan timing (bench.py methodology — naive timing lies through
the axon tunnel).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=32, help="low-res side (upsamples to 2x)")
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--repeat", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    b, s, c = args.batch, args.size, args.channels
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
    x0 = jnp.asarray(rng.randn(b, 2 * s, 2 * s, c), jnp.bfloat16)

    def up_repeat(h, x):
        h = jnp.repeat(h, 2, axis=1)
        h = jnp.repeat(h, 2, axis=2)
        return h + x

    def up_fused(h, x):
        bb, hh, ww, cc = h.shape
        xr = x.reshape(bb, hh, 2, ww, 2, cc)
        y = xr + h[:, :, None, :, None, :]
        return y.reshape(bb, 2 * hh, 2 * ww, cc)

    # correctness first
    np.testing.assert_array_equal(
        np.asarray(up_repeat(h0, x0), np.float32),
        np.asarray(up_fused(h0, x0), np.float32))

    def make_scan(fn, n):
        @jax.jit
        def run(h, x):
            def body(acc, i):
                y = fn(h + i.astype(h.dtype) * jnp.bfloat16(1e-3), x)
                return acc + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc
        return run

    for name, fn in [("repeat", up_repeat), ("fused", up_fused)]:
        run_n = make_scan(fn, args.iters)
        run_1 = make_scan(fn, 1)

        def timed(r):
            t0 = time.perf_counter()
            float(r(h0, x0))
            return time.perf_counter() - t0

        timed(run_1); timed(run_n)  # compile
        best = min(
            (timed(run_n) - timed(run_1)) / (args.iters - 1)
            for _ in range(args.repeat))
        print(f"{name:8s} {best * 1e6 / b:8.3f} us/frame "
              f"({best * 1e3:.3f} ms/batch-{b})")


if __name__ == "__main__":
    main()
