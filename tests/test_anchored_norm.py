"""Calibrated-anchor instance norm (`instance_anchored`): numerics on the
adversarial channels that broke the round-1 one-pass form, anchor
calibration mechanics, torch-checkpoint fallback, and gradients.

The variance identity var = E[(x-c)^2] - (E[x]-c)^2 is exact algebra; the
tests pin down that f32 evaluation with a CALIBRATED c matches float64
ground truth on near-constant channels (where c=0 one-pass loses ~all
significant bits), and that a missing anchor falls back to the exact
two-pass path bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models.layers import InstanceNorm, make_norm


def _adversarial_input():
    rng = np.random.RandomState(0)
    x = np.zeros((4, 8, 8, 4), np.float32)
    x[..., 0] = 5.0 + rng.randn(4, 8, 8) * 1e-4   # near-constant, big mean
    x[..., 1] = rng.randn(4, 8, 8)                # well-conditioned
    x[..., 2] = -3.0                              # exactly constant
    x[..., 3] = 100.0 + rng.randn(4, 8, 8) * 1e-3 # depth-crop-like
    return jnp.asarray(x)


def _ref_f64(x):
    x64 = np.asarray(x, np.float64)
    mean = x64.mean(axis=(1, 2), keepdims=True)
    var = ((x64 - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x64 - mean) / np.sqrt(var + 1e-5)


def _calibrate(m, v, x, steps=20):
    for _ in range(steps):
        _, upd = m.apply(v, x, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    return v


def test_calibrated_anchor_matches_f64_on_adversarial_channels():
    x = _adversarial_input()
    m = InstanceNorm(anchored=True)
    v = m.init(jax.random.PRNGKey(0), x)
    v = _calibrate(m, v, x)
    y = np.asarray(m.apply(v, x), np.float64)
    err = np.abs(y - _ref_f64(x)).max()
    # two-pass itself lands ~1e-4 here (f32 rsqrt + the tiny-var channels);
    # the anchored form must be in the same class, nowhere near the
    # one-pass failure (O(1) error, ~20 mm downstream)
    two = InstanceNorm()
    vt = two.init(jax.random.PRNGKey(0), x)
    err_two = np.abs(np.asarray(two.apply(vt, x), np.float64) - _ref_f64(x)).max()
    assert err <= max(5 * err_two, 1e-3), (err, err_two)


def test_zero_anchor_equals_one_pass_form():
    """Mechanism check: an UNcalibrated anchor (c=0, fresh init) evaluates
    the same expression as the raw one-pass `instance_fast` form — the
    calibration is exactly what separates the two."""
    x = _adversarial_input()
    m = InstanceNorm(anchored=True)
    v = m.init(jax.random.PRNGKey(0), x)  # anchor = zeros, n = 0
    y0 = m.apply(v, x)
    fast = InstanceNorm(fast=True)
    yf = fast.apply({"params": v["params"]}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(yf),
                               rtol=1e-6, atol=1e-6)


def test_anchor_calibration_tracks_channel_means():
    x = _adversarial_input()
    m = InstanceNorm(anchored=True)
    v = m.init(jax.random.PRNGKey(0), x)
    v = _calibrate(m, v, x, steps=50)
    ema = np.asarray(v["batch_stats"]["anchor"], np.float64)
    n = float(v["batch_stats"]["anchor_n"])
    anchor = ema / (1.0 - 0.9 ** n)  # debiased, as the forward consumes it
    true_means = np.asarray(x, np.float64).mean(axis=(0, 1, 2))
    # relative to the channel scale (channel 3 sits at ~100)
    rel = np.abs(anchor - true_means) / np.maximum(np.abs(true_means), 1.0)
    assert rel.max() < 1e-4


def test_missing_anchor_falls_back_to_two_pass_bitexact():
    """Torch-converted checkpoints carry no batch_stats: the anchored
    module must transparently produce the exact two-pass result."""
    x = _adversarial_input()
    m = InstanceNorm(anchored=True)
    v = m.init(jax.random.PRNGKey(0), x)
    y_fallback = m.apply({"params": v["params"]}, x)
    two = InstanceNorm()
    y_two = two.apply({"params": v["params"]}, x)
    assert bool(jnp.all(y_fallback == y_two))


def test_gradients_finite_and_match_two_pass():
    # grads stay finite on the ADVERSARIAL input...
    x_adv = _adversarial_input()
    m = InstanceNorm(anchored=True)
    v = m.init(jax.random.PRNGKey(1), x_adv)
    v = _calibrate(m, v, x_adv)

    def loss(p, mod, extra, x):
        return jnp.sum(mod.apply({"params": p, **extra}, x) ** 2)

    g = jax.grad(loss)(v["params"], m, {"batch_stats": v["batch_stats"]}, x_adv)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))

    # ...and MATCH the two-pass grads on well-conditioned input. (On
    # eps-dominated near-constant channels the per-channel scale grad is
    # hypersensitive to ulp-level var differences in ANY formulation —
    # end-to-end trained parity is gated separately.)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 8, 8, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(1), x)
    v = _calibrate(m, v, x)
    g = jax.grad(loss)(v["params"], m, {"batch_stats": v["batch_stats"]}, x)
    two = InstanceNorm()
    g2 = jax.grad(loss)(v["params"], two, {}, x)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_make_norm_factory():
    mod = make_norm("instance_anchored")()
    assert isinstance(mod, InstanceNorm) and mod.anchored


def test_trained_checkpoint_parity_anchored(tmp_path_factory):
    """THE gate for making instance_anchored a serving default: train the
    actual torch reference, convert, CALIBRATE the anchors on train crops,
    and require trained-checkpoint parity in mm on held-out test crops —
    same bar as tests/test_trained_parity.py (0.1 mm single-stage class;
    the chained 2-stage model gets the measured 0.25 mm gate). The raw
    one-pass form fails this by ~20 mm."""
    import subprocess
    import sys

    torch = pytest.importorskip("torch")
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    sys.path.insert(0, "/root/reference")
    import model as ref_model

    import jax.random as jrandom
    from pixelwiseregression_tpu.compat.torch_ckpt import convert_state_dict
    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import SPECS, get_source
    from pixelwiseregression_tpu.models import PixelwiseRegression

    label_size = 16
    root = str(tmp_path_factory.mktemp("nyu_anch"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root, "16", "6"],
                   check=True, capture_output=True)

    spec = SPECS["NYU"]
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=2 * label_size, label_size=label_size,
    )

    def crops(dataset, n):
        src = get_source("NYU", path=root, dataset=dataset,
                         test_only=(dataset == "test"))
        batch = next(iter(Loader(src, batch_size=n, num_workers=2)))
        batch.pop("count")
        data = preprocess_batch(batch, jrandom.PRNGKey(0), cfg,
                                test_only=(dataset == "test"))
        return {k: np.asarray(v) for k, v in data.items()}

    train = crops("train", 16)
    test = crops("test", 6)

    def tt(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy()).float()

    torch.manual_seed(0)
    tm = ref_model.PixelwiseRegression(
        14, stage=2, label_size=label_size, features=32, level=2,
        norm_method="instance", heatmap_method="softmax", kernel_size=3)
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    ti, tl, tk = tt(train["img"]), tt(train["label_img"]), tt(train["mask"])
    tu = torch.from_numpy(train["uvd"].copy()).float()
    for _ in range(40):
        opt.zero_grad()
        loss = sum(((uvd - tu) ** 2).sum(-1).mean()
                   for _, _, uvd in tm(ti, tl, tk))
        loss.backward()
        opt.step()
    tm.eval()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        fm = PixelwiseRegression(
            joints=14, stage=2, label_size=label_size, features=32, level=2,
            norm_method="instance_anchored", heatmap_method="softmax",
            decoder="xla", dtype=jnp.float32)
        params = convert_state_dict(tm.state_dict())["params"]
        tmpl = fm.init(jax.random.PRNGKey(0),
                       jnp.asarray(train["img"][:1]),
                       jnp.asarray(train["label_img"][:1]),
                       jnp.asarray(train["mask"][:1]), train=False)
        v = {"params": params, "batch_stats": tmpl["batch_stats"]}
        for _ in range(12):  # calibrate anchors on train crops
            _, upd = fm.apply(v, jnp.asarray(train["img"]),
                              jnp.asarray(train["label_img"]),
                              jnp.asarray(train["mask"]), train=False,
                              mutable=["batch_stats"])
            v = {"params": params, "batch_stats": upd["batch_stats"]}

        f_uvd = np.asarray(fm.apply(v, jnp.asarray(test["img"]),
                                    jnp.asarray(test["label_img"]),
                                    jnp.asarray(test["mask"]),
                                    train=False)[-1][2])
        with torch.no_grad():
            t_uvd = tm(tt(test["img"]), tt(test["label_img"]),
                       tt(test["mask"]))[-1][2].numpy()
    finally:
        jax.config.update("jax_default_matmul_precision", None)

    d = f_uvd - t_uvd
    box = test["box_size"].astype(np.float64)
    depth = test["com"][:, 2].astype(np.float64)
    cube = test["cube"].astype(np.float64)
    du = np.abs(d[:, :, 0]) * (box[:, None] - 1) * depth[:, None] / spec.camera.fx
    dv = np.abs(d[:, :, 1]) * (box[:, None] - 1) * depth[:, None] / spec.camera.fy
    dd = np.abs(d[:, :, 2]) * cube[:, None]
    worst = max(du.max(), dv.max(), dd.max())
    print(f"anchored trained 2-stage parity: {worst:.5f} mm")
    assert worst < 0.25, f"anchored trained parity {worst:.4f} mm"


def test_model_level_anchored_apply_and_calibration():
    """Through the full model: init creates anchors for every norm, a
    mutable apply updates them, and inference runs."""
    from pixelwiseregression_tpu.models import PixelwiseRegression

    m = PixelwiseRegression(
        joints=5, stage=1, label_size=16, features=16, level=2,
        norm_method="instance_anchored", heatmap_method="softmax",
        decoder="xla",
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    label = jnp.asarray(rng.rand(2, 16, 16, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(2, 16, 16, 1) > 0.3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), img, label, mask, train=False)
    anchors = jax.tree.leaves(v["batch_stats"])
    assert len(anchors) > 0
    out, upd = m.apply(v, img, label, mask, train=False,
                       mutable=["batch_stats"])
    moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree.leaves(upd["batch_stats"]), anchors)]
    assert max(moved) > 0  # calibration moved at least one anchor
    hm, dm, uvd = out[-1]
    assert np.isfinite(np.asarray(uvd)).all()
