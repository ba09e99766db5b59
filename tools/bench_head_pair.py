"""A/B head-pairing formulations for the plane+depth regression heads.

Both heads read the SAME hourglass output (reference model.py:141-149 calls
plane_regression and depth_regression on one feature map), and their final
convs emit only J=14 channels each — 14/128 MXU columns. Candidates:

  V0 separate   : today's graph — 2x (conv0,conv1,conv2 Co=128; conv3 Co=14)
  V1 pair0      : conv_0 merged to Co=256 on the shared input (one read),
                  then split and run the rest separately
  V2 grouped    : conv_0 merged; conv_1/2/3 as feature_group_count=2 convs
  V3 blockdiag3 : conv_0 merged; conv_1/2 grouped; conv_3 as ONE dense
                  256->28 conv with a block-diagonal kernel (the MXU rounds
                  Co=14 up to 128 columns anyway, so doubling K at fixed
                  padded-Co costs zero extra MXU passes; the zero blocks
                  contribute exact zeros to the f32 accumulator)
  V4 concat3    : conv_0 merged; conv_1/2 separate; concat + block-diag conv_3

All variants are exact (per-output-channel contractions are unchanged;
grouped convs compute each group independently). In-jit lax.scan timing
(bench.py methodology).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--check", action="store_true", help="verify exactness")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    b, s, c, j = args.batch, args.size, args.features, args.joints
    rng = np.random.RandomState(0)
    f0 = jnp.asarray(rng.randn(b, s, s, c) * 0.1, jnp.bfloat16)

    def kern(ci, co):
        return jnp.asarray(rng.randn(3, 3, ci, co) * (1.0 / np.sqrt(9 * ci)),
                           jnp.bfloat16)

    Wp = [kern(c, c), kern(c, c), kern(c, c), kern(c, j)]
    Wd = [kern(c, c), kern(c, c), kern(c, c), kern(c, j)]

    dn = lax.conv_dimension_numbers((b, s, s, c), (3, 3, c, c),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, groups=1):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def act(x):
        # stand-in for anchored-norm+relu epilogue (elementwise, fuses into
        # the producing conv either way; per-channel so pairing-invariant)
        return jax.nn.relu(x) * jnp.bfloat16(0.98)

    W0m = jnp.concatenate([Wp[0], Wd[0]], axis=-1)          # [3,3,128,256]
    W1g = jnp.concatenate([Wp[1], Wd[1]], axis=-1)          # [3,3,128,256] groups=2
    W2g = jnp.concatenate([Wp[2], Wd[2]], axis=-1)
    W3g = jnp.concatenate([Wp[3], Wd[3]], axis=-1)          # [3,3,128,28] groups=2
    zpad = jnp.zeros((3, 3, c, j), jnp.bfloat16)
    W3bd = jnp.concatenate([
        jnp.concatenate([Wp[3], zpad], axis=-1),            # in 0:128 -> out 0:14
        jnp.concatenate([zpad, Wd[3]], axis=-1),            # in 128:256 -> out 14:28
    ], axis=2)                                              # [3,3,256,28]

    def v0(x):
        hp = act(conv(x, Wp[0]))
        hd = act(conv(x, Wd[0]))
        for i in (1, 2):
            hp = act(conv(hp, Wp[i]))
            hd = act(conv(hd, Wd[i]))
        return conv(hp, Wp[3]), conv(hd, Wd[3])

    def v1(x):
        h = act(conv(x, W0m))
        hp, hd = h[..., :c], h[..., c:]
        for i in (1, 2):
            hp = act(conv(hp, Wp[i]))
            hd = act(conv(hd, Wd[i]))
        return conv(hp, Wp[3]), conv(hd, Wd[3])

    def v2(x):
        h = act(conv(x, W0m))
        h = act(conv(h, W1g, groups=2))
        h = act(conv(h, W2g, groups=2))
        z = conv(h, W3g, groups=2)
        return z[..., :j], z[..., j:]

    def v3(x):
        h = act(conv(x, W0m))
        h = act(conv(h, W1g, groups=2))
        h = act(conv(h, W2g, groups=2))
        z = conv(h, W3bd)
        return z[..., :j], z[..., j:]

    def v4(x):
        h = act(conv(x, W0m))
        hp, hd = h[..., :c], h[..., c:]
        for i in (1, 2):
            hp = act(conv(hp, Wp[i]))
            hd = act(conv(hd, Wd[i]))
        z = conv(jnp.concatenate([hp, hd], axis=-1), W3bd)
        return z[..., :j], z[..., j:]

    variants = [("v0_separate", v0), ("v1_pair0", v1), ("v2_grouped", v2),
                ("v3_blockdiag3", v3), ("v4_concat3", v4)]

    if args.check:
        ref = [np.asarray(t, np.float32) for t in v0(f0)]
        for name, fn in variants[1:]:
            got = [np.asarray(t, np.float32) for t in fn(f0)]
            for r, g in zip(ref, got):
                np.testing.assert_array_equal(r, g, err_msg=name)
            print(f"{name}: exact vs v0")

    def make_scan(fn, n):
        @jax.jit
        def run(x):
            def body(acc, i):
                zp, zd = fn(x + i.astype(x.dtype) * jnp.bfloat16(1e-3))
                return acc + jnp.sum(zp.astype(jnp.float32)) + \
                    jnp.sum(zd.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc
        return run

    for name, fn in variants:
        run_n, run_1 = make_scan(fn, args.iters), make_scan(fn, 1)

        def timed(r):
            t0 = time.perf_counter()
            float(r(f0))
            return time.perf_counter() - t0

        timed(run_1); timed(run_n)
        best = min((timed(run_n) - timed(run_1)) / (args.iters - 1)
                   for _ in range(args.repeat))
        print(f"{name:14s} {best * 1e6 / b:8.3f} us/frame "
              f"({best * 1e3:.3f} ms/batch-{b})")


if __name__ == "__main__":
    main()
