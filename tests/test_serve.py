"""Serving API: checkpoint -> Predictor -> raw frames -> joints."""

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.serve import Predictor
from pixelwiseregression_tpu.train.checkpoint import save_checkpoint


def _blob_frame(cu, cv, z, h=240, w=320):
    frame = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((xx - cu) / 40.0) ** 2 + ((yy - cv) / 40.0) ** 2
    frame[r2 < 1] = z + 30 * (r2[r2 < 1] - 0.5)
    return frame


def test_predictor_end_to_end(tmp_path):
    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_serve_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))

    pred = Predictor.from_checkpoint(
        ckpt, "MSRA", batch_size=4, stages=1, features=16, level=1, label_size=32
    )
    frames = np.stack([_blob_frame(160, 120, 400), _blob_frame(170, 110, 420)])
    coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0]])
    out = pred.predict(frames, coms)
    assert out["uvd"].shape == (2, 21, 3)
    assert out["xyz"].shape == (2, 21, 3)
    assert np.isfinite(out["uvd"]).all()
    # untrained net predicts near the crop center: u ~ com_u, d ~ com_z
    assert np.all(np.abs(out["uvd"][:, :, 0] - coms[:, None, 0]) < 120)
    assert np.all(np.abs(out["uvd"][:, :, 2] - coms[:, None, 2]) < 400)  # depthmap head is unbounded untrained

    # second call with a different request size reuses the same executable
    out1 = pred.predict(frames[:1], coms[:1])
    np.testing.assert_allclose(out1["uvd"][0], out["uvd"][0], rtol=1e-5, atol=1e-5)


def test_predictor_honors_stored_model_param(tmp_path):
    """A checkpoint carrying model_param loads with default from_checkpoint
    args (no manual re-specification of the architecture)."""
    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_mp_final.ckpt")
    save_checkpoint(
        ckpt, params=jax.device_get(v["params"]),
        model_param={"stage": 1, "features": 16, "level": 1, "label_size": 32,
                     "norm_method": "instance", "heatmap_method": "softmax",
                     "kernel_size": 3},
    )
    pred = Predictor.from_checkpoint(ckpt, "MSRA", batch_size=2)  # defaults
    frames = _blob_frame(160, 120, 400)[None]
    out = pred.predict(frames, np.array([[160.0, 120.0, 400.0]]))
    assert out["uvd"].shape == (1, 21, 3)


def test_predictor_static_quant_autocalibrates(tmp_path):
    """quant='int8_static' serving: the first predict() calibrates the
    quant_scales collection transparently; results stay finite and close to
    the f32 predictor's."""
    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_q_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))

    kw = dict(batch_size=4, stages=1, features=16, level=1, label_size=32)
    p0 = Predictor.from_checkpoint(ckpt, "MSRA", **kw)
    pq = Predictor.from_checkpoint(ckpt, "MSRA", quant="int8_static", **kw)
    frames = np.stack([_blob_frame(160, 120, 400), _blob_frame(170, 110, 420)])
    coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0]])
    out0 = p0.predict(frames, coms)
    assert "quant_scales" not in pq.variables
    outq = pq.predict(frames, coms)
    assert "quant_scales" in pq.variables
    assert np.isfinite(outq["uvd"]).all()
    # in-plane coords decode through full-precision softmax: quant noise on
    # an untrained net stays within a few crop pixels
    assert np.all(np.abs(outq["uvd"][..., :2] - out0["uvd"][..., :2]) < 20)
    # second call must reuse the calibrated scales (deterministic)
    outq2 = pq.predict(frames, coms)
    np.testing.assert_allclose(outq2["uvd"], outq["uvd"], rtol=1e-6, atol=1e-6)


def test_predictor_data_parallel_matches_single_chip(tmp_path):
    """data_parallel=True shards each request over the 8-device mesh and must
    produce the single-device results (weights replicated, batch on axis 0)."""
    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_dp_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))

    kw = dict(stages=1, features=16, level=1, label_size=32)
    single = Predictor.from_checkpoint(ckpt, "MSRA", batch_size=8, **kw)
    dp = Predictor.from_checkpoint(ckpt, "MSRA", batch_size=8,
                                   data_parallel=True, **kw)
    assert dp._mesh.devices.size == 8

    rng = np.random.RandomState(1)
    frames = np.stack([
        _blob_frame(150 + rng.randint(0, 30), 110 + rng.randint(0, 20), 390 + i * 5)
        for i in range(5)  # 5 of 8: exercises padding across shards too
    ])
    coms = np.array([[float(np.argmax(frames[i].max(0))), 120.0, 400.0]
                     for i in range(5)])
    coms = np.array([[160.0, 120.0, 400.0]] * 5) + rng.uniform(-5, 5, (5, 3))

    out_s = single.predict(frames, coms)
    out_dp = dp.predict(frames, coms)
    np.testing.assert_allclose(out_dp["uvd"], out_s["uvd"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out_dp["xyz"], out_s["xyz"], atol=1e-3, rtol=1e-4)


def test_artifact_roundtrip_matches_predictor(tmp_path):
    """export_artifact -> ServingArtifact.load: the frozen StableHLO program
    (weights baked in, cpu+tpu lowered) reproduces the live Predictor's uvd
    exactly on the cpu backend, needs no flax/model code to run, and rejects
    corrupt files."""
    from pixelwiseregression_tpu.serve_artifact import ServingArtifact, export_artifact

    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_x_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))
    pred = Predictor.from_checkpoint(
        ckpt, "MSRA", batch_size=4, stages=1, features=16, level=1, label_size=32
    )

    path = str(tmp_path / "msra.pwrsrv")
    header = export_artifact(pred, path)
    assert header["platforms"] == ["cpu", "tpu"]
    assert header["dataset"] == "MSRA" and header["batch_size"] == 4

    art = ServingArtifact.load(path)
    assert art.platforms == ("cpu", "tpu")
    frames = np.stack([_blob_frame(160, 120, 400), _blob_frame(170, 110, 420)])
    coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0]])
    out_live = pred.predict(frames, coms)
    out_art = art.predict(frames, coms)
    np.testing.assert_allclose(out_art["uvd"], out_live["uvd"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(out_art["xyz"], out_live["xyz"], rtol=0, atol=1e-5)

    # partial batch reuses the padded executable like the live path
    out1 = art.predict(frames[:1], coms[:1])
    np.testing.assert_allclose(out1["uvd"][0], out_art["uvd"][0], atol=1e-5)

    # corrupt magic is refused loudly
    bad = tmp_path / "bad.pwrsrv"
    bad.write_bytes(b"NOTANART" + b"\0" * 64)
    try:
        ServingArtifact.load(str(bad))
        raise AssertionError("expected ValueError on bad magic")
    except ValueError as e:
        assert "bad magic" in str(e)


def test_artifact_export_guards(tmp_path):
    """Uncalibrated static-int8 and data_parallel predictors must refuse to
    export (baking zero scales / mesh-sharded programs would be silent
    garbage at serving time)."""
    import pytest

    from pixelwiseregression_tpu.serve_artifact import export_artifact

    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_g_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))
    kw = dict(stages=1, features=16, level=1, label_size=32)

    pq = Predictor.from_checkpoint(ckpt, "MSRA", batch_size=2,
                                   quant="int8_static", **kw)
    with pytest.raises(ValueError, match="calibration batches pending"):
        export_artifact(pq, str(tmp_path / "q.pwrsrv"))
    # after calibration it exports fine
    frames = _blob_frame(160, 120, 400)[None]
    coms = np.array([[160.0, 120.0, 400.0]])
    for _ in range(pq._calib_left):
        pq.predict(frames, coms)
    export_artifact(pq, str(tmp_path / "q.pwrsrv"))

    dp = Predictor.from_checkpoint(ckpt, "MSRA", batch_size=8,
                                   data_parallel=True, **kw)
    with pytest.raises(ValueError, match="data_parallel"):
        export_artifact(dp, str(tmp_path / "dp.pwrsrv"))


def test_artifact_poly_batch(tmp_path):
    """poly_batch=True artifacts carry a symbolic batch dim: any request
    size runs unpadded and matches the fixed-batch artifact's numbers."""
    from pixelwiseregression_tpu.serve_artifact import ServingArtifact, export_artifact

    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_p_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))
    pred = Predictor.from_checkpoint(
        ckpt, "MSRA", batch_size=4, stages=1, features=16, level=1, label_size=32
    )
    path = str(tmp_path / "poly.pwrsrv")
    header = export_artifact(pred, path, poly_batch=True)
    assert header["batch_size"] is None

    art = ServingArtifact.load(path)
    frames = np.stack([_blob_frame(160, 120, 400), _blob_frame(170, 110, 420),
                       _blob_frame(150, 130, 380)])
    coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0],
                     [150.0, 130.0, 380.0]])
    ref = pred.predict(frames, coms)["uvd"]
    # odd size 3 (not the export-template size) and size 1 both run unpadded
    out3 = art.predict(frames, coms)["uvd"]
    out1 = art.predict(frames[1:2], coms[1:2])["uvd"]
    np.testing.assert_allclose(out3, ref, rtol=0, atol=1e-4)
    np.testing.assert_allclose(out1[0], ref[1], rtol=0, atol=1e-4)


def test_predictor_fullregression_family(tmp_path):
    """fullregression=True serves the second model family (reference
    model.py FullRegression) through the same predict/export contract."""
    import pytest

    from pixelwiseregression_tpu.models import FullRegression
    from pixelwiseregression_tpu.serve_artifact import ServingArtifact, export_artifact

    model = FullRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_fr_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))

    kw = dict(batch_size=2, stages=1, features=16, level=1, label_size=32)
    pred = Predictor.from_checkpoint(ckpt, "MSRA", fullregression=True, **kw)
    frames = np.stack([_blob_frame(160, 120, 400), _blob_frame(170, 110, 420)])
    coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0]])
    out = pred.predict(frames, coms)
    assert out["uvd"].shape == (2, 21, 3) and np.isfinite(out["uvd"]).all()

    # the artifact path carries the family too
    path = str(tmp_path / "fr.pwrsrv")
    export_artifact(pred, path)
    art = ServingArtifact.load(path)
    # export lowers a separate program; f32 re-association noise only
    np.testing.assert_allclose(art.predict(frames, coms)["uvd"], out["uvd"],
                               rtol=0, atol=1e-3)

    # int8 quant is PixelwiseRegression-only and must refuse loudly
    with pytest.raises(ValueError, match="PixelwiseRegression-only"):
        Predictor.from_checkpoint(ckpt, "MSRA", fullregression=True,
                                  quant="int8_static", **kw)


def test_artifact_loads_without_flax_or_model_code(tmp_path):
    """The module docstring's deployment claim, enforced: a fresh process
    that BLOCKS imports of flax and the model definitions can still load a
    .pwrsrv artifact and predict (the artifact is the deployable unit)."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = PixelwiseRegression(joints=21, stage=1, label_size=32, features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    ckpt = str(tmp_path / "MSRA_nf_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))
    pred = Predictor.from_checkpoint(
        ckpt, "MSRA", batch_size=2, stages=1, features=16, level=1, label_size=32
    )
    from pixelwiseregression_tpu.serve_artifact import export_artifact

    path = str(tmp_path / "nf.pwrsrv")
    export_artifact(pred, path)
    expect = pred.predict(np.zeros((1, 240, 320)), np.array([[160.0, 120.0, 400.0]]))

    script = f"""
import sys

class _Block:
    BLOCKED = ("flax", "pixelwiseregression_tpu.models",
               "pixelwiseregression_tpu.serve")
    def find_spec(self, name, *a, **k):
        if name in self.BLOCKED or any(name.startswith(b + ".") for b in self.BLOCKED):
            raise ImportError(f"BLOCKED at serving time: {{name}}")
        return None

sys.meta_path.insert(0, _Block())
import jax
jax.config.update("jax_platforms", "cpu")  # tunnel plugin overrides env vars
import numpy as np
from pixelwiseregression_tpu.serve_artifact import ServingArtifact
art = ServingArtifact.load({path!r})
out = art.predict(np.zeros((1, 240, 320)), np.array([[160.0, 120.0, 400.0]]))
print("UVD000", float(out["uvd"][0, 0, 0]))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PWR_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=420, env=env, cwd=repo_root)
    assert r.returncode == 0, r.stderr[-3000:]
    got = float(r.stdout.split("UVD000")[1].strip().split()[0])
    assert abs(got - float(expect["uvd"][0, 0, 0])) < 1e-3
