"""Two-process multihost smoke test (round-2 VERDICT missing-6).

Actually exercises `jax.distributed.initialize` + the DCN data axis:
two CPU processes (one virtual device each) join via
MVSDET_COORDINATOR, build the global mesh, and take one lock-step
sharded train step on different local scenes.  Both must report the
same pmean'd loss and identical post-step parameters — the functional
proof of the reference's dist_train.sh NNODES path
(ref: tools/dist_train.sh, configs/_base_/default_runtime.py:14).
"""

import json
import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_dist_train_launcher_lockstep():
    """tools/dist_train.sh (the reference's dist launcher analogue)
    spawns N workers that take identical lock-step training steps."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH",
                        "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["MVSDET_PORT"] = str(port)
    res = subprocess.run(
        [os.path.join(REPO, "tools", "dist_train.sh"), "2",
         "--tiny", "--synthetic", "2", "--steps", "2",
         "--data-parallel", "2", "--n-views", "6",
         "--work-dir", "/tmp/dist_launcher_test"],
        env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    # both workers print per-step loss lines; pmean makes them identical
    losses = [l for l in res.stdout.splitlines() if '"loss"' in l]
    assert len(losses) >= 4, res.stdout[-2000:]
    by_step = {}
    for line in losses:
        rec = json.loads(line)
        by_step.setdefault(rec["step"], []).append(rec["loss"])
    for step, vals in by_step.items():
        assert len(vals) == 2, (step, vals)
        assert vals[0] == vals[1], (step, vals)


def test_dist_train_launcher_fail_fast(tmp_path):
    """When one worker dies, the launcher kills the survivors instead of
    letting them hang in collectives until the distributed-service
    timeout (round-4 advisor note).  A 2-worker fake where worker 0
    exits 3 and worker 1 sleeps 60 s must finish in seconds with
    worker 0's code."""
    import shutil
    import time

    tools = tmp_path / "tools"
    tools.mkdir()
    shutil.copy(os.path.join(REPO, "tools", "dist_train.sh"),
                tools / "dist_train.sh")
    (tools / "train.py").write_text(
        "import os, sys, time\n"
        "if os.environ.get('MVSDET_PROCESS_ID') == '0':\n"
        "    sys.exit(3)\n"
        "time.sleep(60)\n")
    t0 = time.time()
    res = subprocess.run([str(tools / "dist_train.sh"), "2"],
                         capture_output=True, text=True, timeout=45)
    elapsed = time.time() - t0
    assert res.returncode == 3, (res.returncode, res.stderr[-500:])
    assert elapsed < 30, f"launcher took {elapsed:.1f}s to fail fast"


def test_two_process_lockstep_train_step():
    port = _free_port()
    # strip the axon TPU plugin (PYTHONPATH sitecustomize): it eagerly
    # touches the backend at interpreter startup, which breaks
    # jax.distributed.initialize in the worker; CPU workers don't need it
    base_env = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH",
                             "PALLAS_AXON_POOL_IPS")}
    procs = []
    for pid in range(2):
        env = {
            **base_env,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "MVSDET_COORDINATOR": f"localhost:{port}",
            "MVSDET_NUM_PROCESSES": "2",
            "MVSDET_PROCESS_ID": str(pid),
        }
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)

    lines = [next(l for l in o.splitlines() if l.startswith("MHOK"))
             for o in outs]
    parsed = [dict(re.findall(r"(\w+)=([-\d.]+)", l)) for l in lines]
    assert parsed[0]["pid"] != parsed[1]["pid"]
    # pmean'd loss and resulting params identical across processes
    assert parsed[0]["loss"] == parsed[1]["loss"], lines
    assert parsed[0]["fp"] == parsed[1]["fp"], lines
