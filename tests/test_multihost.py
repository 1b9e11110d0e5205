"""REAL 2-process data-parallel run vs single-process ground truth.

The mocked multi-host tests (tests/test_loader.py) validate shard math
with a stubbed process_count; this spawns TWO actual jax.distributed
processes (4 virtual CPU devices each, gloo collectives) and checks the
full jitted train/eval steps and the unaligned eval gather against the
single-process result — catching bugs mocks cannot. It found one:
shard_batch misread a host-local batch as the global one
(parallel/mesh.py now assembles via make_array_from_process_local_data).

Reference counterpart: the torch.distributed spawn/DDP/NCCL stack
(slowfast/utils/multiprocessing.py:9-50, utils/distributed.py), which the
reference can only exercise on real GPUs (SURVEY §4).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_real_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = os.environ.copy()
        # the worker pins its own platform/device count before backend init
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = tmp_path / f"result{pid}.json"
        log = open(tmp_path / f"worker{pid}.log", "w")
        p = subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out)],
            env=env, stdout=log, stderr=log)
        procs.append((pid, p, out, log))

    try:
        for pid, p, out, log in procs:
            rc = p.wait(timeout=900)
            log.close()
            if rc != 0:
                tail = (tmp_path / f"worker{pid}.log").read_text()[-3000:]
                pytest.fail(f"worker {pid} exited rc={rc}:\n{tail}")
    finally:
        for _, p, _, log in procs:
            if p.poll() is None:
                p.kill()
            if not log.closed:
                log.close()

    r0, r1 = (json.loads((tmp_path / f"result{i}.json").read_text())
              for i in range(2))

    # SPMD consistency: both hosts see the identical globally-reduced values
    assert r0["losses"] == pytest.approx(r1["losses"], rel=1e-6)
    assert r0["eval_top1_err"] == pytest.approx(r1["eval_top1_err"],
                                                abs=1e-6)
    assert r0["gather_ok"] and r1["gather_ok"]

    # ground truth: the same global batch on this process's 8 devices
    # (identical per-device shards; only the process layout differs)
    import multihost_worker as mw  # tests/ is on sys.path under pytest

    ref = mw.run_steps(mw.tiny_cfg())
    assert r0["losses"] == pytest.approx(ref["losses"], rel=2e-4)
    assert r0["eval_top1_err"] == pytest.approx(ref["eval_top1_err"],
                                                abs=1e-4)
    # two train steps actually optimized (not a frozen no-op)
    assert ref["losses"][1] != ref["losses"][0]
