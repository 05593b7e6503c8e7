"""Multi-host weak-scaling capture (CPU-mesh proxy for the >=90% target).

Spawns real ``jax.distributed`` clusters of 1, 2 and 4 processes (2 virtual
CPU devices each — the DCN analog this 1-chip box can exercise), runs the
sharded rollout with a fixed per-host batch (256 envs/host), and records
aggregate env-steps/s + host-scaling efficiency to
``artifacts/MULTIHOST_SCALING.json``.

Efficiency here measures the framework's cross-process overhead (psum over
DCN-analog, per-host egress), not ICI bandwidth — the hardware-true number
needs a real pod, but a framework that scales poorly on this proxy would
scale worse there.

Run: python tools/multihost_scaling.py
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DRIVER = REPO / "tests" / "_multihost_driver.py"
OUT = REPO / "artifacts" / "MULTIHOST_SCALING.json"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(nproc: int) -> float:
    port = _free_port()
    env = dict(os.environ, MMT_MULTIHOST_BENCH="1")
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(port), str(i), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO), env=env,
        )
        for i in range(nproc)
    ]
    thr = None
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"nproc={nproc} failed:\n{out}\n{err}"
        for ln in out.splitlines():
            if ln.startswith("THROUGHPUT "):
                thr = float(dict(kv.split("=") for kv in ln.split()[1:])
                            ["steps_s"])
    assert thr is not None, f"no THROUGHPUT line for nproc={nproc}"
    return thr


def main() -> None:
    results = {}
    for n in (1, 2, 4):
        results[n] = run_cluster(n)
        print(f"nproc={n}: {results[n]:.0f} env-steps/s", flush=True)
    base = results[1]
    # All "hosts" share this ONE machine's cores: the single process
    # already saturates the silicon, so the ideal N-host aggregate here is
    # FLAT (1.0x), not N x — anything >= 1.0 means the cross-process
    # collectives + per-host egress add no visible overhead.  (True >= 90%
    # host scaling needs independent hosts — a real pod; this proxy bounds
    # the framework-overhead term of that product.)
    out = {
        "per_host_envs": 256,
        "steps_s": results,
        "aggregate_vs_single_process": {
            str(n): round(results[n] / base, 4) for n in results
        },
        "ideal_on_shared_silicon": 1.0,
        "note": ("weak scaling, real jax.distributed processes on a CPU "
                 "mesh (2 virtual devices/host) sharing one machine's "
                 "cores; >=1.0 aggregate means the DCN-analog psum/egress "
                 "overhead is fully hidden — see tools/multihost_scaling.py"),
    }
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
