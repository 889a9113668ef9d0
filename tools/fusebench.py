"""Fused-graph strategy crossover harness: incremental vs full rewiring at
CONTROLLED merge-map densities.

The pipeline's merge map density is a property of the corpus (the bench
fixture's replicated docs produce a dense ~0.8-dirty map, where full wins —
PLANS.md). Production fusion passes touch a few percent of entities. This
harness constructs synthetic merge maps at given dirty fractions over the
already-populated stagebench checkpoints (edges / nodes_base / mentions /
triples at 100k docs) and times both strategies on the SAME inputs,
forcing full evaluation through the noop sink (all compute + exchanges, no
write IO). Output: one JSON line per (fraction, strategy).

Usage: python tools/fusebench.py <cores> [fractions...]   (default 0.01 0.05 0.2 0.8)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def synthetic_merge_map(spark, nodes_base, frac: float):
    """Deterministic old->new map touching ~frac of entity names: order
    names by md5, pair the first half of the sample onto the second half
    (old absorbs into new), so dirty_names ≈ frac * |names|."""
    from pyspark.sql import Window, functions as F

    n = nodes_base.count()
    k = max(2, int(n * frac / 2) * 2)  # even: k/2 old -> k/2 new
    w = Window.orderBy("h")
    ranked = (
        nodes_base.select("entity_name", F.md5("entity_name").alias("h"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )
    half = k // 2
    old = ranked.filter(F.col("r") <= half).select(
        F.col("entity_name").alias("old_name"), F.col("r").alias("j"))
    new = ranked.filter(F.col("r") > half).select(
        F.col("entity_name").alias("new_name"),
        (F.col("r") - half).alias("j"))
    return old.join(new, "j").drop("j")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    fracs = [float(x) for x in sys.argv[2:]] or [0.01, 0.05, 0.2, 0.8]

    from pyspark.sql import functions as F

    from mmgraphrag_spark.operators import canonicalize as canon
    from mmgraphrag_spark.operators import fusion
    from mmgraphrag_spark.session import get_spark
    from tools.scaling import _healthy

    spark = get_spark("fusebench", cores=cores)
    work = f"/dev/shm/stagebench_{cores}"
    if not (Path(work) / "edges" / "_SUCCESS").exists():
        raise SystemExit(f"populate {work} first: python tools/stagebench.py graph {cores} 1")

    from mmgraphrag_spark.plans.pipeline import Pipeline

    pipe = Pipeline(spark, "/dev/shm/kg_bench_fixture", work)
    cols_t = ["subj", "obj", "description", "weight", "source_id", "order"]
    all_t = (
        pipe.read("triples").select(cols_t)
        .unionByName(pipe.read("img_triples").select(cols_t))
    )
    edges = pipe.read("edges", spread=False)
    nodes_base = pipe.read("nodes_base", spread=False)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for frac in fracs:
        mm = synthetic_merge_map(spark, nodes_base, frac).persist()
        n_dirty = fusion.dirty_names(mm).count()  # materializes the persist
        for strategy in ("incremental", "full"):
            walls = []
            for _ in range(3):
                _healthy(max_wait_s=300)
                t0 = time.perf_counter()
                if strategy == "full":
                    noop(canon.build_edges(fusion._rewire_triples(all_t, mm)))
                else:
                    noop(fusion.fuse_edges_incremental(edges, all_t, mm))
                walls.append(round(time.perf_counter() - t0, 2))
            print(json.dumps({
                "frac": frac, "n_dirty": n_dirty, "strategy": strategy,
                "cores": cores, "walls": walls, "min": min(walls),
            }), flush=True)
        mm.unpersist()


if __name__ == "__main__":
    main()
