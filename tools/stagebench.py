"""Re-run ONE pipeline stage repeatedly under different configs — the
controlled A/B harness for local-scaling experiments (full bench runs on this
host have up to 4x noisy-neighbor variance; a single stage, health-gated and
min-of-N, is the narrowest repeatable probe).

Usage:
  python tools/stagebench.py <stage> <cores> [reps] [-- k=v ...spark conf]

`--` entries whose key starts with ``cfg.`` override PipelineConfig fields
instead (e.g. ``cfg.fused_strategy=full`` A/Bs the fused-graph incremental
rewiring against the full re-aggregation path).

Populates a work dir once (resume), then for each rep deletes the stage's
outputs and re-runs with resume=True so ONLY that stage executes.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

STAGE_OUTPUTS = {
    "spans": ["spans"],
    "chunks": ["chunks"],
    "extract_raw": ["extraction_raw"],
    "decode": ["mentions", "triples"],
    "media": ["img_mentions", "img_triples"],
    "graph": ["nodes", "nodes_base", "edges"],
    "fusion": ["fusion_blocks"],
    "fused_graph": ["fused_nodes", "fused_edges"],
}


def main() -> None:
    argv = sys.argv[1:]
    conf = {}
    if "--" in argv:
        i = argv.index("--")
        for kv in argv[i + 1:]:
            k, v = kv.split("=", 1)
            conf[k] = v
        argv = argv[:i]
    stage = argv[0]
    cores = int(argv[1])
    reps = int(argv[2]) if len(argv) > 2 else 3

    from tools.scaling import _healthy
    from mmgraphrag_spark.plans.pipeline import Pipeline
    from mmgraphrag_spark.session import get_spark

    import dataclasses
    from mmgraphrag_spark.config import DEFAULT

    cfg_over = {k[4:]: v for k, v in conf.items() if k.startswith("cfg.")}
    conf = {k: v for k, v in conf.items() if not k.startswith("cfg.")}
    cfg = DEFAULT
    if cfg_over:
        fld = {f.name: f.type for f in dataclasses.fields(DEFAULT)}
        typed = {}
        for k, v in cfg_over.items():
            if k not in fld:
                raise SystemExit(
                    f"unknown cfg field {k!r}; valid: {', '.join(sorted(fld))}"
                )
            cur = getattr(DEFAULT, k)
            if isinstance(cur, bool):
                if v.lower() not in ("true", "false", "1", "0"):
                    raise SystemExit(f"cfg.{k} expects true/false, got {v!r}")
                typed[k] = v.lower() in ("true", "1")
            else:
                typed[k] = type(cur)(v)
        cfg = dataclasses.replace(DEFAULT, **typed)

    spark = get_spark("stagebench", cores=cores, extra_conf=conf or None)
    warm = spark.range(0, cores * 4, 1, cores).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    )
    warm.groupBy("id").count().count()

    sf_dir = "/dev/shm/kg_bench_fixture"
    work = f"/dev/shm/stagebench_{cores}"
    pipe = Pipeline(spark, sf_dir, work, cfg=cfg)
    pipe.run(resume=True)  # populate everything once

    walls = []
    for _ in range(reps):
        for out in STAGE_OUTPUTS[stage]:
            shutil.rmtree(Path(work) / out, ignore_errors=True)
        _healthy(max_wait_s=300)
        t0 = time.perf_counter()
        pipe.run(resume=True)
        walls.append(round(time.perf_counter() - t0, 2))
    print({"stage": stage, "cores": cores, "conf": conf, "cfg": cfg_over,
           "walls": walls, "min": min(walls)})


if __name__ == "__main__":
    main()
