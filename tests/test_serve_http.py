"""HTTP serving layer: wire contract over a live Predictor AND a frozen
artifact (in-thread server, real sockets, npz round trip)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.serve import Predictor
from pixelwiseregression_tpu.serve_http import make_server
from pixelwiseregression_tpu.train.checkpoint import save_checkpoint


def _blob_frame(cu, cv, z, h=240, w=320):
    frame = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((xx - cu) / 40.0) ** 2 + ((yy - cv) / 40.0) ** 2
    frame[r2 < 1] = z + 30 * (r2[r2 < 1] - 0.5)
    return frame


def _small_predictor(tmp_path, batch_size=2):
    model = PixelwiseRegression(joints=21, stage=1, label_size=32,
                                features=16, level=1)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)), train=False,
    )
    ckpt = str(tmp_path / "MSRA_http_final.ckpt")
    save_checkpoint(ckpt, params=jax.device_get(v["params"]))
    return Predictor.from_checkpoint(
        ckpt, "MSRA", batch_size=batch_size, stages=1, features=16,
        level=1, label_size=32,
    )


def _post_npz(port, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return np.load(io.BytesIO(r.read()))


def _serve(pred, meta, linger_s=0.002):
    meta = dict(meta)
    meta.setdefault("cube_default", 125.0)  # MSRA spec cube
    meta.setdefault("frame_h", 240)  # MSRA raw frame size (as main() sets)
    meta.setdefault("frame_w", 320)
    srv = make_server(pred, meta, host="127.0.0.1", port=0, access_log=False,
                      linger_s=linger_s)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_http_predict_matches_direct_and_chunks(tmp_path):
    pred = _small_predictor(tmp_path, batch_size=2)
    srv, port = _serve(pred, {"dataset": "MSRA", "batch_size": 2,
                              "backend": "live/cpu"})
    try:
        # healthz carries the meta
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["dataset"] == "MSRA" and h["batch_size"] == 2

        # 3 frames > batch_size 2: server chunks internally, result matches
        # direct predict on each chunk
        frames = np.stack([_blob_frame(160, 120, 400),
                           _blob_frame(170, 110, 420),
                           _blob_frame(150, 130, 380)])
        coms = np.array([[160.0, 120.0, 400.0], [170.0, 110.0, 420.0],
                         [150.0, 130.0, 380.0]])
        out = _post_npz(port, frames=frames, coms=coms)
        assert out["uvd"].shape == (3, 21, 3) and out["xyz"].shape == (3, 21, 3)
        direct = np.concatenate([pred.predict(frames[:2], coms[:2])["uvd"],
                                 pred.predict(frames[2:], coms[2:])["uvd"]])
        np.testing.assert_allclose(out["uvd"], direct, rtol=0, atol=1e-4)

        # malformed body -> 400 with an error message, server stays up
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not npz", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "bad npz body" in json.loads(e.read())["error"]
        # wrong shapes -> 400
        try:
            _post_npz(port, frames=frames[0], coms=coms)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # empty request (N=0) -> 400, not a 500 from the batcher
        try:
            _post_npz(port, frames=np.zeros((0, 240, 320)),
                      coms=np.zeros((0, 3)))
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # wrong frame size -> 400 (would otherwise poison the shared
        # device batch and kill the consumer thread)
        try:
            _post_npz(port, frames=np.zeros((1, 64, 64)),
                      coms=np.array([[32.0, 32.0, 400.0]]))
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "frame size" in json.loads(
                e.read())["error"]
        # unknown route -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # server still healthy after the bad requests
        out2 = _post_npz(port, frames=frames[:1], coms=coms[:1])
        np.testing.assert_allclose(out2["uvd"][0], out["uvd"][0], atol=1e-4)
    finally:
        srv.shutdown()
        srv.server_close()
        srv.batcher.stop()


def test_http_serves_frozen_artifact(tmp_path):
    """The same wire contract fronts a .pwrsrv artifact (train -> export ->
    serve, no flax/model code in the serving process's hot path)."""
    from pixelwiseregression_tpu.serve_artifact import (
        ServingArtifact, export_artifact,
    )

    pred = _small_predictor(tmp_path, batch_size=2)
    path = str(tmp_path / "m.pwrsrv")
    export_artifact(pred, path)
    art = ServingArtifact.load(path)
    srv, port = _serve(art, {"dataset": "MSRA", "batch_size": 2,
                             "backend": f"artifact{art.platforms}"})
    try:
        frames = _blob_frame(160, 120, 400)[None]
        coms = np.array([[160.0, 120.0, 400.0]])
        out = _post_npz(port, frames=frames, coms=coms)
        np.testing.assert_allclose(
            out["uvd"], pred.predict(frames, coms)["uvd"], rtol=0, atol=1e-4)
    finally:
        srv.shutdown()
        srv.server_close()


def test_batcher_survives_poison_batches():
    """The single consumer thread must outlive every failure mode: chunks
    of different frame sizes never share a concatenated device batch, and
    a predictor exception fails that group's futures — later submissions
    still serve (a dead consumer would hang every future request)."""
    from pixelwiseregression_tpu.serve_http import _Batcher

    calls = []

    class Stub:
        def predict(self, frames, coms, cubes):
            # a real device batch requires one uniform frame size
            assert len({f.shape for f in frames}) == 1
            calls.append(frames.shape)
            if frames.shape[1] == 13:  # designated poison size
                raise RuntimeError("boom")
            n = len(frames)
            return {"uvd": np.zeros((n, 21, 3)), "xyz": np.zeros((n, 21, 3))}

    b = _Batcher(Stub(), batch_size=4, cube_default=125.0, linger_s=0.2)
    try:
        # two different frame sizes submitted into one linger window must
        # land in separate device calls, both succeeding
        f_a = b.submit(np.zeros((1, 10, 10)), np.zeros((1, 3)), None)
        f_b = b.submit(np.zeros((1, 12, 12)), np.zeros((1, 3)), None)
        assert f_a[0].result(timeout=30)["uvd"].shape == (1, 21, 3)
        assert f_b[0].result(timeout=30)["uvd"].shape == (1, 21, 3)
        assert len(calls) == 2, f"mixed-size chunks shared a batch: {calls}"

        # a predictor exception fails ITS futures but not the thread
        f_bad = b.submit(np.zeros((2, 13, 13)), np.zeros((2, 3)), None)
        try:
            f_bad[0].result(timeout=30)
            raise AssertionError("expected the poison batch to fail")
        except RuntimeError as e:
            assert "boom" in str(e)
        f_ok = b.submit(np.zeros((1, 10, 10)), np.zeros((1, 3)), None)
        assert f_ok[0].result(timeout=30)["uvd"].shape == (1, 21, 3)
        assert b.thread.is_alive()
    finally:
        b.stop()


def test_http_dynamic_batching_coalesces(tmp_path):
    """Concurrent size-1 requests coalesce into shared device calls
    (device_calls < requests in /metrics) and every caller still gets its
    own correct rows."""
    from pixelwiseregression_tpu.serve_http import Client

    pred = _small_predictor(tmp_path, batch_size=4)
    # long linger so the burst reliably lands in one window
    srv, port = _serve(pred, {"dataset": "MSRA", "batch_size": 4,
                              "backend": "live/cpu"}, linger_s=0.25)
    try:
        client = Client(f"http://127.0.0.1:{port}")
        frames = [_blob_frame(150 + 5 * i, 110 + 3 * i, 380 + 10 * i)
                  for i in range(8)]
        direct = pred.predict(np.stack(frames[:4]),
                              np.array([[150.0 + 5 * i, 110.0 + 3 * i,
                                         380.0 + 10 * i] for i in range(4)]))

        results = [None] * 8
        def post(i):
            results[i] = client.predict(
                frames[i][None],
                np.array([[150.0 + 5 * i, 110.0 + 3 * i, 380.0 + 10 * i]]))
        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(4):
            np.testing.assert_allclose(results[i]["uvd"][0], direct["uvd"][i],
                                       rtol=0, atol=1e-4)
        m = client.metrics()
        assert m["requests"] == 8 and m["frames"] == 8
        assert m["device_calls"] < 8, f"no coalescing happened: {m}"
        assert m["batch_fill"] > 1.0
        assert m["latency_ms"]["p50"] > 0
        h = client.healthz()
        assert h["ok"] and h["batch_size"] == 4
    finally:
        srv.shutdown()
        srv.server_close()
        srv.batcher.stop()
