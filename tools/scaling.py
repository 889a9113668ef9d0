"""Two-parallelism-level scaling harness (BASELINE.json north_rule evidence).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the identical job at local[8] and local[32] (per driver
instruction) on the same input and reporting throughput at both plus scaling
efficiency:

    efficiency = (throughput_high / throughput_low) / (cores_high / cores_low)

Input: the FIXTURES.md §5 "bench" fixture — 50k docs generated on the fly by
replicating the sf0.1 documents 10× with a per-replica token suffix (so the
content-hash chunk dedup cannot collapse replicas and per-doc work scales
linearly). At sf0.1 itself the pipeline is fixed-overhead-bound (~40 s at
both levels); the larger corpus is what exposes the compute scaling.

Writes BENCH/BASELINE.md and prints the per-level JSON lines.
Usage: python tools/scaling.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def gen_fixture(sf_dir: str, replicas: int, out_dir: str) -> int:
    """Replicate documents.parquet with per-replica token suffixes (DuckDB)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    out = f"{out_dir}/documents.parquet"
    n_base = duckdb.sql(
        f"SELECT count(*), max(doc_id) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    stride = int(n_base[1]) + 1
    duckdb.sql(f"""
      COPY (
        SELECT doc_id + {stride} * CAST(u.r AS BIGINT) AS doc_id,
               array_to_string([x || CAST(u.r AS VARCHAR)
                                for x in string_split(text, ' ')], ' ') AS text,
               lang, source, n_chars
        FROM '{sf_dir}/documents.parquet', UNNEST(range({replicas})) AS u(r)
      ) TO '{out}' (FORMAT PARQUET)
    """)
    return int(n_base[0]) * replicas


def _healthy(max_wait_s: int = 900) -> None:
    """Block until the host looks calm. Two probes, because the sick phases
    come in two flavors (stack-sampled, PLANS.md): CPU contention (single-
    thread loop slows) and page-allocation/IO stalls (tmpfs writes and mmap
    crawl while CPUs idle). Healthy nominals: loop ~0.3 s, 200 MB tmpfs
    write ~0.3 s."""
    import os
    import time

    t0 = time.perf_counter()
    while True:
        s = time.perf_counter()
        x = 0
        for i in range(3_000_000):
            x += i * i % 7
        cpu_dt = time.perf_counter() - s

        s = time.perf_counter()
        with open("/dev/shm/_health_probe", "wb") as f:
            f.write(b"\x5a" * (200 * 1024 * 1024))
        os.remove("/dev/shm/_health_probe")
        io_dt = time.perf_counter() - s

        if (cpu_dt < 0.6 and io_dt < 0.9) or time.perf_counter() - t0 > max_wait_s:
            return
        time.sleep(30)


def _run_once(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--cores", str(cores),
         "--sf-dir", sf_dir],
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_levels(lo: int, hi: int, sf_dir: str, rounds: int = 3) -> tuple[dict, dict]:
    """Alternate levels across rounds, health-gating each run, keep mins —
    a bad host phase then hurts both levels equally or gets skipped."""
    best = {lo: None, hi: None}
    for _ in range(rounds):
        for cores in (lo, hi):
            _healthy()
            r = _run_once(cores, sf_dir)
            if best[cores] is None or r["value"] < best[cores]["value"]:
                best[cores] = r
    return best[lo], best[hi]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    fixture_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    fixture = f"{fixture_root}/kg_bench_fixture"
    n_docs = gen_fixture(sf_dir, replicas, fixture)

    lo, hi = 8, 32
    r_lo, r_hi = run_levels(lo, hi, fixture)
    print(json.dumps(r_lo))
    print(json.dumps(r_hi))
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput & scaling ({ts})

Same job (end-to-end checkpointed KG construction, bench.py) on identical
input, two parallelism levels — the sandbox stand-in for N vs 4N executors
(no real cluster available; method per driver instruction). Input =
FIXTURES.md §5 bench fixture: {n_docs} docs ({replicas}× sf0.1 with
per-replica token suffixes; content-hash dedup cannot collapse replicas).
Wall times are the min over 3 health-gated, level-alternating rounds (the
host has multi-minute noisy-neighbor phases; see PLANS.md).

| level | cores | wall (s) | docs/sec | triples/sec |
|---|---|---|---|---|
| low  | {lo} | {r_lo['value']} | {r_lo['docs_per_sec']} | {r_lo['triples_per_sec']} |
| high | {hi} | {r_hi['value']} | {r_hi['docs_per_sec']} | {r_hi['triples_per_sec']} |

- speedup (wall_low / wall_high): **{speedup:.3f}×** on {hi // lo}× cores
- scaling efficiency = speedup / (cores_high/cores_low) = **{eff:.3f}**
  (north_rule target ≥ 0.8; local-mode caveats below)

Per-stage seconds (high level): `{json.dumps(r_hi['queries'])}`
Per-stage seconds (low level): `{json.dumps(r_lo['queries'])}`
Row counts: `{json.dumps(r_hi['rows'])}`

Caveats: local[N] shares one JVM, one memory bus, and one disk on one host —
8→32 threads adds no memory bandwidth (a real 4× executor scale-out does),
and per-stage scheduling latency (~45 jobs) is constant. The number above is
therefore a lower bound on cluster scaling for this plan shape: every stage
is hash-partitioned on its key with map-side combine, there is no driver-side
loop, and the only broadcast sides are O(merge-map) and O(seeds).
Environment note: shuffle dirs and checkpoints run on tmpfs because the
sandbox block device has multi-second file-create latency bursts
(stack-sampled; PLANS.md §4-5) — real clusters use local NVMe.
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
