"""Dump .explain("formatted") for named driver queries into plans/r06/.

Usage: python tools/plandump.py <suffix> <query> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (suffix is
"before" or "after"). Read-only w.r.t. data: explain never executes the
query. Uses sf0.001 so the plan shapes are the driver-gate shapes.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from mmgraphrag_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.001"
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plandump")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
