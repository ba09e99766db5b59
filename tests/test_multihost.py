"""REAL multi-process multi-host feed test (round-4 verdict item 4).

tests/test_mesh.py exercises the `make_array_from_process_local_data`
branch by patching `jax.process_index` inside one process; this test
executes the seam for real: 2 OS processes x 4 virtual CPU devices each,
`jax.distributed.initialize` against a local coordinator, process-local
index lines through the real `Loader`, global-batch assembly, and one
fused train step + eval step on the global 8-device mesh — with the
gradient psum crossing an actual process boundary.

Equivalence oracle: the identical construction run single-process on the
suite's 8-virtual-device backend, with the global sample order emulated
exactly as the 2-process assembly produces it (process 0's interleaved
slice rows first, then process 1's).

If the CPU backend cannot do multi-process collectives in this toolchain,
the test SKIPS with the captured error (the documented-blocker path the
verdict allows) rather than failing — but any other worker failure is a
hard fail. The blocker classification happens INSIDE each worker on its
own exception (multihost_worker.BLOCKER_EXIT + a sentinel JSON), never by
grepping the parent-side stderr blob: when a real bug crashes one worker,
the peer dies with grpc UNAVAILABLE/DEADLINE noise that would false-match
any token list (round-5 review finding).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
N_PROC = 2


@pytest.fixture(scope="module")
def msra_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msra_mh"))
    script = os.path.join(
        os.path.dirname(__file__), "fixtures", "make_msra_fixture.py")
    subprocess.run([sys.executable, script, root], check=True,
                   capture_output=True)
    # build the index files once in-parent so the workers (which spawn
    # concurrently) never race the dataset build
    import multihost_worker as mw

    mw.build_parts(root)
    return root


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_feed_two_real_processes(msra_root, tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PWR_PLATFORM")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import multihost_worker as mw

    outs = [str(tmp_path / f"worker{i}.json") for i in range(N_PROC)]
    # stderr goes to FILES, not pipes: an undrained pipe deadlocks a worker
    # whose failure traceback exceeds the ~64KB pipe buffer, turning a fast
    # failure into the 900s timeout (round-5 review finding)
    logs = [str(tmp_path / f"worker{i}.stderr") for i in range(N_PROC)]
    log_fhs = [open(p, "w") for p in logs]
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(port), str(i), str(N_PROC),
                 msra_root, outs[i]],
                env=env, cwd="/root/repo",
                stdout=log_fhs[i], stderr=subprocess.STDOUT,
            )
            for i in range(N_PROC)
        ]
        deadline = time.time() + 900
        try:
            while any(p.poll() is None for p in procs):
                if time.time() > deadline:
                    raise TimeoutError(
                        "multi-host workers did not finish in 900s")
                time.sleep(2)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
    finally:
        for fh in log_fhs:
            fh.close()

    results, blockers, failures = [], [], []
    for i, (p, out) in enumerate(zip(procs, outs)):
        payload = None
        if os.path.exists(out):
            with open(out) as f:
                payload = json.load(f)
        if p.returncode == 0 and payload is not None:
            results.append(payload)
        elif (p.returncode == mw.BLOCKER_EXIT and payload is not None
              and "toolchain_blocker" in payload):
            blockers.append(payload["toolchain_blocker"])
        else:
            with open(logs[i]) as f:
                failures.append(f"worker {i} rc={p.returncode}:\n"
                                + f.read()[-4000:])
    if failures:
        # a worker failed for a reason IT did not classify as a toolchain
        # gap — hard fail even if the peer looks like a blocker (the peer's
        # grpc stall is a symptom, not the cause)
        raise AssertionError("\n\n".join(failures))
    if blockers:
        pytest.skip("multi-process CPU collectives unavailable in this "
                    f"toolchain: {blockers[0][:1000]}")

    for r in results:
        assert r["process_count"] == N_PROC
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
    # both processes fetch the SAME replicated scalars — they must agree
    # with each other essentially exactly
    for key in ("train_loss", "eval_loss", "eval_err_mm", "eval_count"):
        np.testing.assert_allclose(
            results[0][key], results[1][key], rtol=1e-6,
            err_msg=f"workers disagree on replicated metric {key}")

    # single-process 8-device oracle with the emulated global sample order:
    # global rows = process 0's interleaved slice first, then process 1's
    # (1-D mesh over jax.devices(); each process owns a contiguous
    # device range, and make_array_from_process_local_data lays each
    # process's local rows onto its own shards)
    import jax
    import multihost_worker as mw
    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.parallel.mesh import make_mesh, shard_batch

    source, cfg, state = mw.build_parts(msra_root)
    local = mw.GLOBAL_BATCH // N_PROC
    lines = source.lines
    global_lines = lines[0::N_PROC][:local] + lines[1::N_PROC][:local]
    loader = Loader(source, mw.GLOBAL_BATCH, shuffle=False, drop_last=True,
                    num_workers=1, lines=global_lines)
    batch = next(iter(loader))
    batch.pop("count", None)
    batch = shard_batch(batch, make_mesh(jax.devices()))
    ref = mw.run_steps(source, cfg, state, batch)

    # pre-update forward loss on identical replicated params: only the loss
    # psum's reduction order differs between 1 and 2 processes
    np.testing.assert_allclose(
        results[0]["train_loss"], ref["train_loss"], rtol=1e-5,
        err_msg="cross-process train-step loss diverges from the "
                "single-process 8-device run")
    # post-SGD-step eval: the cross-host gradient psum may reassociate
    # f32 sums; gate at the same envelope tests/test_multichip.py measured
    # for mesh-partitioning changes (a real bug — wrong psum, desynced
    # feed — is O(1) here)
    assert results[0]["eval_count"] == ref["eval_count"]
    np.testing.assert_allclose(
        results[0]["eval_loss"], ref["eval_loss"], rtol=1e-3,
        err_msg="post-step eval loss outside the f32 reassociation envelope")
    np.testing.assert_allclose(
        results[0]["eval_err_mm"], ref["eval_err_mm"], rtol=1e-3,
        err_msg="post-step eval mean-mm outside the envelope")
