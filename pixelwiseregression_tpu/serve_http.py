"""Minimal production HTTP inference server (stdlib only).

Fronts either a live ``serve.Predictor`` (checkpoint) or a frozen
``serve_artifact.ServingArtifact`` (.pwrsrv) with the same wire contract —
the deployment unit is whichever you hand it. The reference has no serving
story at all (its inference is the test.py batch script); this completes
the deployment path: train → export → serve.

Wire format: npz both ways (exact float round-trip, no JSON float drift,
~4x smaller than JSON for 240x320 frames):

  POST /predict   body = npz{frames[N,H,W] float, coms[N,3],
                            optional cubes[N]}
                  reply = npz{uvd[N,J,3] f32, xyz[N,J,3] f32}
  GET  /healthz   reply = JSON {ok, dataset, batch_size, backend}

Requests of any size are chunked internally to the compiled batch size
(one executable, no recompiles). Device work is serialized by a lock:
JAX dispatch is thread-hostile and int8 predictors mutate calibration
state on early batches; concurrency should come from batching, not from
racing the device.

Run:  python -m pixelwiseregression_tpu.serve_http \
          --artifact nyu.pwrsrv --port 8000
  or  ... --ckpt Model/NYU_default_final.ckpt --dataset NYU
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_MAX_BODY = 256 * 1024 * 1024  # 256 MB: ~870 raw 240x320 f64 frames


class _Handler(BaseHTTPRequestHandler):
    # set by make_server
    predictor = None
    lock: threading.Lock = None
    meta: dict = None

    def log_message(self, fmt, *a):  # route through the server hook, not stderr
        if self.server.access_log:
            super().log_message(fmt, *a)

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj: dict):
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path != "/healthz":
            return self._reply_json(404, {"error": f"no route {self.path}"})
        self._reply_json(200, dict(self.meta, ok=True))

    def do_POST(self):
        if self.path != "/predict":
            return self._reply_json(404, {"error": f"no route {self.path}"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            if not 0 < n <= _MAX_BODY:
                return self._reply_json(
                    413 if n else 400,
                    {"error": f"body size {n} outside (0, {_MAX_BODY}]"})
            data = np.load(io.BytesIO(self.rfile.read(n)))
            frames = data["frames"]
            coms = data["coms"]
            cubes = data["cubes"] if "cubes" in data else None
            if frames.ndim != 3 or coms.shape != (frames.shape[0], 3):
                return self._reply_json(400, {
                    "error": f"want frames[N,H,W] + coms[N,3], got "
                             f"{frames.shape} / {coms.shape}"})
        except Exception as e:  # noqa: BLE001 — malformed body is a 400
            return self._reply_json(400, {"error": f"bad npz body: {e}"})
        try:
            # poly-batch artifacts (batch_size None) take any size in one call
            bs = self.meta["batch_size"] or len(frames)
            uvd, xyz = [], []
            with self.lock:
                for i in range(0, len(frames), bs):
                    out = self.predictor.predict(
                        frames[i:i + bs], coms[i:i + bs],
                        None if cubes is None else cubes[i:i + bs])
                    uvd.append(out["uvd"])
                    xyz.append(out["xyz"])
            buf = io.BytesIO()
            np.savez(buf, uvd=np.concatenate(uvd).astype(np.float32),
                     xyz=np.concatenate(xyz).astype(np.float32))
            self._reply(200, buf.getvalue(), "application/x-npz")
        except Exception as e:  # noqa: BLE001 — surface, don't kill the server
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(predictor, meta: dict, host: str = "0.0.0.0", port: int = 8000,
                access_log: bool = True) -> ThreadingHTTPServer:
    """Build (don't start) the server; ``serve_forever()`` to run.

    ``meta`` must carry dataset/batch_size/backend for /healthz and
    internal chunking."""
    handler = type("BoundHandler", (_Handler,), {
        "predictor": predictor,
        "lock": threading.Lock(),
        "meta": dict(meta),
    })
    srv = ThreadingHTTPServer((host, port), handler)
    srv.access_log = access_log
    return srv


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", help=".pwrsrv from tools/export_model.py")
    src.add_argument("--ckpt", help="live checkpoint (.ckpt or reference .pt)")
    p.add_argument("--dataset", choices=["MSRA", "ICVL", "NYU", "HAND17"],
                   help="required with --ckpt")
    p.add_argument("--batch_size", type=int, default=32,
                   help="compiled batch size for --ckpt (artifacts carry "
                        "their own)")
    p.add_argument("--quant", default="none")
    p.add_argument("--fullregression", action="store_true")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_warmup", dest="warmup", action="store_false",
                   help="skip the startup dummy predict that pre-compiles "
                        "the serving executable (first request pays the "
                        "compile otherwise)")
    args = p.parse_args(argv)

    from pixelwiseregression_tpu.cli.common import apply_platform_override

    apply_platform_override()
    import jax

    if args.artifact:
        from pixelwiseregression_tpu.serve_artifact import ServingArtifact

        pred = ServingArtifact.load(args.artifact)
        meta = {"dataset": pred.header["dataset"],
                "batch_size": pred.header["batch_size"],
                "frame_h": pred.header["frame_h"],
                "frame_w": pred.header["frame_w"],
                "backend": f"artifact{pred.platforms}"}
    else:
        if not args.dataset:
            p.error("--ckpt needs --dataset")
        from pixelwiseregression_tpu.serve import Predictor

        pred = Predictor.from_checkpoint(
            args.ckpt, args.dataset, batch_size=args.batch_size,
            quant=None if args.quant == "none" else args.quant,
            fullregression=args.fullregression)
        meta = {"dataset": args.dataset, "batch_size": args.batch_size,
                "frame_h": pred.spec.frame_h, "frame_w": pred.spec.frame_w,
                "backend": f"live/{jax.devices()[0].platform}"}

    if args.warmup and args.quant == "none":
        # pre-compile the serving executable so the first real request is
        # fast. Skipped for static-int8 live predictors: their first
        # batches CALIBRATE, and an all-zero warmup frame would poison the
        # baked activation scales.
        import numpy as np

        bs = meta["batch_size"] or 1
        pred.predict(np.zeros((bs, meta["frame_h"], meta["frame_w"])),
                     np.tile([[160.0, 120.0, 400.0]], (bs, 1)))
        print("warmup predict done (executable compiled)", flush=True)

    srv = make_server(pred, meta, args.host, args.port)
    print(f"serving {meta} on {args.host}:{srv.server_address[1]}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
