"""REAL 2-process jax.distributed execution on the CPU backend.

The reference launches genuine multi-process training through deepspeed
(`--master_addr/--master_port`, script/training.sh:34-37, Readme.md:58);
the TPU-native equivalent is one `jax.distributed.initialize()` call
(parallel/multihost.py).  This test runs that call for real: two
subprocesses handshake with a coordinator, form a process-spanning mesh,
psum across processes, and take one data-parallel gradient step of the
actual model (tests/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys


_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum_and_train_step():
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert "psum ok" in out and "step ok" in out, out
    # The replicated global loss/gnorm must agree bit-for-bit across ranks.
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT ")]
    assert len(results) == nproc and len(set(results)) == 1, results
