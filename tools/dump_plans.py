"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage:
  python tools/dump_plans.py before q_graph_hyperanf q_stream_pattern_match_rle
  python tools/dump_plans.py after q_graph_hyperanf
  SPARK_GRAFT_PLAN_DIR=r13 python tools/dump_plans.py before q_x

Queries whose result is driver-materialized (createDataFrame readouts)
still show the plan of the returned frame; for those the interesting
plans are the internal stages, which the per-op notes in
OPTIMIZATION_r12.md cite from the code instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    _REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        print("error: need <tag> and at least one query name", file=sys.stderr)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)

    import __spark_entry__ as ent
    from end_to_end_aws_data_pipeline_spark.cache import release_all
    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = ent.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF)
            # documented API only: explain() prints, so capture stdout
            # (the former _jdf.queryExecution() route relied on private
            # internals that break across versions)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record the failure in the file
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        finally:
            release_all()
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF} [{tag}]\n")
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
