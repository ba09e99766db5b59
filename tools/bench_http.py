"""Client-side load generator for the HTTP serving stack.

Drives a running serve_http instance with concurrent synthetic requests
and reports end-to-end throughput + latency percentiles (client-side) and
the server's own /metrics (device_calls, batch_fill) — the number that
shows dynamic batching working is batch_fill >> request size.

    python -m pixelwiseregression_tpu.serve_http --artifact m.pwrsrv &
    python tools/bench_http.py --url http://127.0.0.1:8000 \\
        --threads 16 --requests 32 --size 1
"""

import argparse
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _blob(h, w, cu, cv, z):
    yy, xx = np.mgrid[0:h, 0:w]
    fr = np.zeros((h, w))
    r2 = ((xx - cu) / 40.0) ** 2 + ((yy - cv) / 40.0) ** 2
    fr[r2 < 1] = z + 30 * (r2[r2 < 1] - 0.5)
    return fr


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32,
                    help="requests per thread")
    ap.add_argument("--size", type=int, default=1, help="frames per request")
    args = ap.parse_args()

    from pixelwiseregression_tpu.serve_http import Client

    client = Client(args.url)
    h = client.healthz()
    print(f"target: {h}")
    fh, fw = h["frame_h"], h["frame_w"]
    frames = np.stack([_blob(fh, fw, fw / 2 + i, fh / 2, 400 + i)
                       for i in range(args.size)])
    coms = np.array([[fw / 2.0 + i, fh / 2.0, 400.0 + i]
                     for i in range(args.size)])

    client.predict(frames, coms)  # warm the path outside the timed window
    m0 = client.metrics()

    lat, errs = [], [0]
    lock = threading.Lock()

    def worker():
        c = Client(args.url)
        for _ in range(args.requests):
            t0 = time.perf_counter()
            try:
                c.predict(frames, coms)
            except Exception:  # noqa: BLE001 — count, keep loading
                with lock:
                    errs[0] += 1
                continue
            with lock:
                lat.append((time.perf_counter() - t0) * 1e3)

    threads = [threading.Thread(target=worker) for _ in range(args.threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    m1 = client.metrics()
    n_req = args.threads * args.requests - errs[0]
    n_frames = n_req * args.size
    lat.sort()
    pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
    calls = m1["device_calls"] - m0["device_calls"]
    served = m1["frames"] - m0["frames"]
    print(f"requests {n_req} ({errs[0]} errors)  wall {wall:.2f} s  "
          f"throughput {n_frames / wall:.1f} frames/s")
    print(f"latency ms: p50 {pct(0.5):.1f}  p90 {pct(0.9):.1f}  "
          f"p99 {pct(0.99):.1f}  mean {statistics.mean(lat):.1f}" if lat
          else "no successful requests")
    print(f"server: device_calls {calls}  batch_fill "
          f"{served / calls if calls else 0:.2f} frames/call")


if __name__ == "__main__":
    main()
