"""Launch + verify multi-PROCESS SPMD execution of the mesh SLAM engine.

VERDICT r4 item 1 (the last unexecuted SURVEY axis): run the engine across
≥2 OS processes via the JAX coordination service (2 procs × 4 virtual CPU
devices joined into one 8-device global mesh, collectives over gloo) and
assert the trajectory is BIT-IDENTICAL to the single-process 8-device run
of the same program.

Usage:
    python tools/run_mp_spmd.py [--scans 48] [--out docs/artifacts/...]

Importable: `launch(scans, ...)` returns the comparison dict (used by
tests/test_multiprocess_spmd.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_spmd_worker.py")


def _clean_env() -> dict:
    """Child env without the axon PJRT shim (registers a backend at
    interpreter start, before jax.distributed.initialize could run) and
    without the test harness's XLA_FLAGS device-count override."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)       # /root/.axon_site sitecustomize
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    return env


def launch(scans: int = 48, radius: float = 12.0, port: int = 29531,
           timeout_s: float = 1800, workdir: str | None = None) -> dict:
    import tempfile

    workdir = workdir or tempfile.mkdtemp(prefix="mp_spmd_")
    env = _clean_env()
    outs = {}
    t0 = time.time()

    def worker_cmd(pid, nproc, local, out):
        cmd = [sys.executable, WORKER, "--pid", str(pid),
               "--nproc", str(nproc), "--local-devices", str(local),
               "--coordinator", f"localhost:{port}",
               "--scans", str(scans), "--radius", str(radius),
               "--out", out,
               # per-process cache dirs: concurrent writers on one cache dir
               # have corrupted entries before (memory: segfault on read)
               "--cache-dir", os.path.join(workdir, f"cache_p{pid}")]
        return cmd

    # --- phase A: 2 processes x 4 devices, one global 8-device mesh ------- #
    procs = []
    for pid in range(2):
        out = os.path.join(workdir, f"mp_p{pid}.json")
        outs[f"mp_p{pid}"] = out
        procs.append(subprocess.Popen(
            worker_cmd(pid, 2, 4, out), env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(o)
        if p.returncode != 0:
            raise RuntimeError(
                f"multi-process worker failed rc={p.returncode}:\n" +
                "\n".join(logs))
    mp_wall = time.time() - t0

    # --- phase B: baseline, 1 process x 8 devices, same program ----------- #
    t1 = time.time()
    out1 = os.path.join(workdir, "sp.json")
    outs["sp"] = out1
    r = subprocess.run(worker_cmd(0, 1, 8, out1), env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(f"single-process baseline failed:\n{r.stdout}\n"
                           f"{r.stderr}")
    sp_wall = time.time() - t1

    res = {k: json.load(open(v)) for k, v in outs.items()}
    p0, p1, sp = res["mp_p0"], res["mp_p1"], res["sp"]
    cmp = {
        "scans": scans,
        "radius": radius,
        "mp_topology": p0["topology"],
        "sp_topology": sp["topology"],
        "kf_count": p0["kf_count"],
        "loop_count": p0["loop_count"],
        "procs_agree": (p0["opt_hash"] == p1["opt_hash"]
                        and p0["log_hash"] == p1["log_hash"]),
        "bit_identical_to_single_process": (
            p0["opt_hash"] == sp["opt_hash"]
            and p0["odom_hash"] == sp["odom_hash"]
            and p0["log_hash"] == sp["log_hash"]
            and p0["kf_count"] == sp["kf_count"]
            and p0["loop_count"] == sp["loop_count"]),
        "opt_hash_mp": p0["opt_hash"], "opt_hash_sp": sp["opt_hash"],
        "log_hash_mp": p0["log_hash"], "log_hash_sp": sp["log_hash"],
        "mp_wall_s": round(mp_wall, 1), "sp_wall_s": round(sp_wall, 1),
        "note": ("2 OS processes x 4 virtual CPU devices each form one "
                 "8-device global mesh via jax.distributed (gloo CPU "
                 "collectives); the full device SLAM engine (NDT align, SC "
                 "retrieval, ICP verify, pose-graph solve) runs as ONE SPMD "
                 "program whose collectives cross the process boundary — "
                 "the testable stand-in for multi-host DCN (SURVEY §2d P4, "
                 "§7 step 7)."),
    }
    return cmp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=48)
    ap.add_argument("--radius", type=float, default=12.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--port", type=int, default=29531)
    args = ap.parse_args()
    cmp = launch(scans=args.scans, radius=args.radius, port=args.port)
    js = json.dumps(cmp, indent=2)
    print(js)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(js + "\n")
    if not cmp["bit_identical_to_single_process"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
