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

# real 2-process gloo jobs, ~5-11 min on this host (CLAUDE.md)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers_once(tmp_path, mode, nprocs, attempt):
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = os.environ.copy()
        # the worker pins its own platform/device count before backend init
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = tmp_path / f"result{pid}.json"
        out.unlink(missing_ok=True)
        log = open(tmp_path / f"worker{pid}.a{attempt}.log", "w")
        p = subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             str(out), mode],
            env=env, stdout=log, stderr=log)
        procs.append((pid, p, out, log))

    failures = []
    try:
        for pid, p, out, log in procs:
            rc = p.wait(timeout=900)
            log.close()
            if rc != 0:
                tail = (tmp_path / f"worker{pid}.a{attempt}.log"
                        ).read_text()[-3000:]
                failures.append(f"worker {pid} exited rc={rc}:\n{tail}")
    finally:
        for _, p, _, log in procs:
            if p.poll() is None:
                p.kill()
            if not log.closed:
                log.close()
    if failures:
        return None, "\n".join(failures)
    return [json.loads((tmp_path / f"result{i}.json").read_text())
            for i in range(nprocs)], None


def _run_workers(tmp_path, mode="steps", nprocs=2):
    # One retry: gloo context init hard-caps cross-host skew at ~30 s, and
    # on this 1-core host an asymmetric compile-cache hit (one worker loads
    # a cached program, the other recompiles for minutes) can exceed it on
    # a cold cache. The retry runs with the cache the first attempt wrote,
    # so a second failure is a real bug, not skew.
    results, err = _run_workers_once(tmp_path, mode, nprocs, attempt=0)
    if results is None:
        results, err = _run_workers_once(tmp_path, mode, nprocs, attempt=1)
    if results is None:
        pytest.fail(err)
    return results


def test_real_two_process_dp_matches_single_process(tmp_path):
    r0, r1 = _run_workers(tmp_path, mode="steps")

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


def test_real_two_process_full_train_and_30view_test(tmp_path):
    """The whole engine across two real processes: per-host loader index
    sharding, jitted train epoch, masked eval, master-only checkpoint,
    checkpoint reload in test(), cross-host unaligned eval gather.

    Global-batch composition differs from a single-process epoch (each
    host draws from its own index shard), so the check is cross-host SPMD
    consistency + artifact existence, not equality with a 1-process run.
    """
    r0, r1 = _run_workers(tmp_path, mode="train")

    # 64 synthetic samples / global batch 8 = 8 optimizer steps, same on
    # both hosts (one SPMD program)
    assert r0["step"] == r1["step"] == 8
    # the 30-view ensemble is assembled from cross-host gathers; both
    # hosts must finalize the identical metric
    assert r0["top1_acc"] == pytest.approx(r1["top1_acc"], abs=1e-6)
    assert 0.0 <= r0["top1_acc"] <= 100.0
    # master-only checkpoint write (reference: checkpoint master-only save)
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert any(c.endswith(".jaxckpt") for c in ckpts)


def test_real_two_process_detection_map_matches_single_process(tmp_path):
    """Detection eval across two real processes: per-host loader shard
    (1 keyframe each + wrap-padding), batch-sharded RoI forward row fetch,
    _valid pad drop (without it the wrapped duplicates' boxes double-count),
    cross-host box gather, identical full-dataset mAP on both hosts and vs
    the single-process ground truth. Round-3 review found all three multi-
    host steps missing on this path; this drives them for real."""
    import multihost_worker as mw

    # shared on-disk fixture, built once before the workers spawn
    mw.detection_cfg(str(tmp_path), num_shards=1)

    r0, r1 = _run_workers(tmp_path, mode="detection")
    assert r0["map"] == pytest.approx(r1["map"], abs=1e-6)

    # ground truth: same 2 keyframes on this process's 8 devices (identical
    # global batch shape — 2 real rows + 6 pad vs 2×(1 real + 3 pad))
    ref = mw.run_detection_test(str(tmp_path), num_shards=1)
    assert r0["map"] == pytest.approx(ref["map"], abs=1e-4)
    assert 0.0 <= r0["map"] <= 1.0


def test_real_two_process_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax exercised where its design matters (VERDICT r3 next #6):
    a COLLECTIVE async sharded save from two real processes, drained, then
    restored through the test engine's own checkpoint-selection path.
    Asserts the restored params/batch_stats are BIT-EQUAL to the post-train
    state on both hosts, the cross-host restore checksums agree (a
    divergent restore would raise inside shard_state), and the restored
    run's 30-view metric is identical on both hosts."""
    r0, r1 = _run_workers(tmp_path, mode="orbax")

    # bit-equal round-trip on each host, and the same state on both
    assert r0["trained_crc"] == r0["restored_crc"]
    assert r1["trained_crc"] == r1["restored_crc"]
    assert r0["trained_crc"] == r1["trained_crc"]

    # restored run's metrics match across hosts
    assert r0["step"] == r1["step"] == 8
    assert r0["top1_acc"] == pytest.approx(r1["top1_acc"], abs=1e-6)

    # the artifact really is the orbax sharded-directory format
    assert any(c.endswith(".orbax") for c in r0["checkpoints"]), \
        r0["checkpoints"]
    orbax_dir = [c for c in r0["checkpoints"] if c.endswith(".orbax")][0]
    assert (tmp_path / "checkpoints" / orbax_dir).is_dir()
