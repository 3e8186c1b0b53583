"""N vs 4N scaling benchmark (BASELINE.json criterion: efficiency >= 0.8).

No real cluster exists in this sandbox, so per BASELINE.md the two-cluster
criterion is evidenced by running the IDENTICAL `spark-submit --py-files`
job on the SAME input at two local parallelism levels (local[N] vs
local[4N]), shuffle partitions scaled proportionally, and reporting
triples/sec at both plus efficiency = (thr@4N / thr@N) / 4.

Noise protocol (round 3): the N and 4N legs are run `--reps` times
INTERLEAVED (N, 4N, N, 4N, ...) so slow host-load drift hits both legs
equally, efficiency is computed per interleaved pair, and the artifact of
record is the MEDIAN pair efficiency. The round-2 series showed identical
code spanning 0.36-0.79 on single shots on this shared microVM — a
single-shot artifact is not reproducible.

Usage: python BENCH/run_scaling.py [--n 8] [--convs 4000] [--avg-turns 30]
        [--reps 3]
Writes results into BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "cie_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "cie_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _host_load() -> float:
    """1-minute load average — sampled at leg start so every recorded pair
    carries its own co-tenant evidence (the round-4 discard protocol had to
    infer busy windows from leg drift after the fact)."""
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_once(
    cores: int, convs: int, avg_turns: int, tmp: str, zpath: str,
    shuffle_mult: int = 1,
) -> dict:
    wh = os.path.join(tmp, f"wh_{cores}")
    shutil.rmtree(wh, ignore_errors=True)
    cmd = [
        # pin the whole process tree (JVM + GC threads + python workers) to
        # exactly `cores` CPUs: without this, a local[N] run on a bigger box
        # leaks python-worker/GC work onto idle cores, inflating the N-core
        # baseline and understating true scaling efficiency
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        # driver memory must be set at JVM launch (builder conf is too late
        # under spark-submit); local mode = driver hosts the executors
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "24g"),
        # shuffle partitions scale with cores TIMES a constant multiplier:
        # equal per-task input size on both legs (a partition count equal to
        # the core count makes the 4N leg run 4x-fatter concurrent tasks ->
        # spill; AQE coalesces excess partitions where they are small)
        "--conf", f"spark.sql.shuffle.partitions={cores * shuffle_mult}",
        "--conf", "spark.ui.enabled=false",
        # shuffle spill + warehouse live under `tmp` (tmpfs when available,
        # see main): on one box the shared DISK is fixed bandwidth that does
        # not grow 2->8 cores, while a real 4N-executor cluster brings 4x
        # local disks — tmpfs isolates the compute-scaling signal the
        # criterion is about from that single-node I/O artifact
        "--conf", f"spark.local.dir={os.path.join(tmp, 'sparklocal')}",
        "--py-files", zpath,
        os.path.join(REPO, "cie_spark", "job.py"),
        "--synthetic-convs", str(convs),
        "--avg-turns", str(avg_turns),
        "--warehouse", wh,
        "--full",
        "--shuffle-partitions", str(cores * shuffle_mult),
        # bucket count sized to the benchmark table (~100 MB of triples),
        # IDENTICAL on both legs: 128 near-empty bucket files per commit
        # meant 3 commits × 128 driver-scheduled file tasks of pure serial
        # cost per leg. 32 keeps the 4N leg's writers saturated and is the
        # Iceberg-practice size for this table; a 100-TB table would use
        # thousands of buckets AND thousands of cores.
        "--buckets", "32",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, check=False,
        cwd=tmp,  # ensure imports come from the zip, not the repo checkout
    )
    last = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            last = line
    if last is None:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"no metrics line from local[{cores}] run")
    return json.loads(last)


def main() -> int:
    import statistics

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="base parallelism N (4N also runs)")
    ap.add_argument("--convs", type=int, default=4000)
    ap.add_argument("--avg-turns", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved (N, 4N) pairs; median pair efficiency is the artifact")
    ap.add_argument(
        "--workdir", default=None,
        help="scratch root (default /dev/shm when present — see run_once)",
    )
    ap.add_argument("--shuffle-mult", type=int, default=1,
                    help="shuffle partitions = cores * this")
    ap.add_argument(
        "--gate", action="store_true",
        help="PRE-REGISTERED gate (r5 verdict Next #1): first run one "
             "pinned 8-core probe leg on the same input; if its triples/s "
             "reads >= --gate-bar, run exactly ONE campaign with --reps "
             "pairs and record it UNCONDITIONALLY (no discretionary "
             "selection); otherwise append a refusal line to BASELINE.md "
             "and exit 0 without a campaign.",
    )
    ap.add_argument(
        "--gate-bar", type=float, default=63000.0,
        help="probe triples/s threshold for --gate (the r4/r5 quiet "
             "8-core reference reads 63-71k/s)",
    )
    args = ap.parse_args()

    base_dir = args.workdir or (
        "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
        else None
    )
    tmp = tempfile.mkdtemp(prefix="cie_scaling_", dir=base_dir)
    try:
        zpath = make_zip(tmp)
        if args.gate:
            stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
            probe = run_once(8, args.convs, args.avg_turns, tmp, zpath,
                             args.shuffle_mult)
            tps = probe["triples_per_sec"]
            verdict = "RUN" if tps >= args.gate_bar else "REFUSE"
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.write(
                    f"\n### Gate probe {stamp}: pinned 8-core "
                    f"{args.convs}-conv leg {probe['seconds']:.1f} s "
                    f"({tps:.0f} triples/s) vs bar {args.gate_bar:.0f} "
                    f"-> **{verdict}**\n"
                )
            if verdict == "REFUSE":
                print(json.dumps({
                    "gated": "refused", "probe_triples_per_sec": tps,
                    "gate_bar": args.gate_bar,
                }))
                return 0
        # warm-up is implicit: each run pays identical JVM startup; throughput
        # is computed inside the job over pipeline wall time only.
        pairs = []
        for _ in range(args.reps):
            load_n = _host_load()
            r_n = run_once(args.n, args.convs, args.avg_turns, tmp, zpath,
                           args.shuffle_mult)
            load_4n = _host_load()
            r_4n = run_once(args.n * 4, args.convs, args.avg_turns, tmp, zpath,
                            args.shuffle_mult)
            thr_n, thr_4n = r_n["triples_per_sec"], r_4n["triples_per_sec"]
            pairs.append({
                "seconds_n": round(r_n["seconds"], 2),
                "seconds_4n": round(r_4n["seconds"], 2),
                "triples_per_sec_n": round(thr_n, 1),
                "triples_per_sec_4n": round(thr_4n, 1),
                "efficiency": round((thr_4n / thr_n) / 4, 3) if thr_n else None,
                "load1_at_n": load_n,
                "load1_at_4n": load_4n,
            })
        effs = sorted(p["efficiency"] for p in pairs)
        eff = statistics.median(effs)
        result = {
            "n_cores": args.n,
            "convs": args.convs,
            "avg_turns": args.avg_turns,
            "triples": r_n["triples"],
            "reps": args.reps,
            "pairs": pairs,
            "triples_per_sec_n_median": statistics.median(
                p["triples_per_sec_n"] for p in pairs
            ),
            "triples_per_sec_4n_median": statistics.median(
                p["triples_per_sec_4n"] for p in pairs
            ),
            "scaling_efficiency_median": round(eff, 3),
        }
        print(json.dumps(result))
        stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
        per_rep = "; ".join(
            f"{p['triples_per_sec_n']}/s → {p['triples_per_sec_4n']}/s "
            f"(eff {p['efficiency']}, load1 {p['load1_at_n']}/{p['load1_at_4n']})"
            for p in pairs
        )
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Scaling run {stamp} (median of {args.reps} interleaved pairs"
                f"{', GATED: recorded unconditionally after a passing probe' if args.gate else ''})\n\n"
                f"| setting | value |\n|---|---|\n"
                f"| input | synthetic transcripts, {args.convs} convs × ~{args.avg_turns} turns (+mega-conv skew) |\n"
                f"| triples emitted | {r_n['triples']} |\n"
                f"| per-pair (N={args.n} → 4N={args.n * 4}) | {per_rep} |\n"
                f"| median triples/s | {result['triples_per_sec_n_median']} @N, "
                f"{result['triples_per_sec_4n_median']} @4N |\n"
                f"| **median scaling efficiency (thr@4N/thr@N)/4** | **{result['scaling_efficiency_median']}** |\n"
            )
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
