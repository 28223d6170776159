"""Multi-process (multi-host analogue) smoke test over DCN semantics:
two `jax.distributed` CPU processes on localhost, each owning 4 virtual
devices, run the REAL train entry (`scripts/train.py --distributed
--mesh data`) for a few iterations with the env axis sharded over all 8
global devices (SURVEY.md §2.3 / §5.8 — the reference has no distributed
backend at all; this is the new first-class component's external proof)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train(tmp_path):
    port = _free_port()
    procs = []
    logs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
        })
        log = open(tmp_path / f"rank{rank}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "scripts/train.py", "--iterations", "3",
             "--num-envs", "64", "--eval-freq", "1000",
             "--logdir", str(tmp_path / "run"), "--distributed",
             "--terrain", "plane",
             "--mesh", "data"],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))
    try:
        for p in procs:
            assert p.wait(timeout=1200) == 0, \
                (tmp_path / "rank0.log").read_text()[-2000:] + "\n====\n" \
                + (tmp_path / "rank1.log").read_text()[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    out = (tmp_path / "rank0.log").read_text()
    assert "sharding env axis over 8 devices (2 process(es))" in out, out
    assert (tmp_path / "run" / "checkpoints"
            / "train_state_last.pkl").exists()
