"""Dump the round-13 INTERNAL plan evidence — the plans that changed
live inside foreachBatch folds / multi-action drivers, which the
registered query's returned frame does not show.

  python tools/dump_internals_r13.py <tag>        # tag = before | after

Writes plans/r13/<name>_<tag>.txt:
- pattern_rle_fold_internal: _batch_runs over an events-shaped batch
  (shows the run-index window frame: RANGE before, ROWS after)
- percentiles_pass1_internal: the pass-1 aggregate of
  binned_exact_percentiles_multi (plain (cidx, g) grouping before;
  fused (cidx, g, b0) monotone bucketing after)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "SPARK_GRAFT_PLAN_OUT", os.path.join(_REPO, "plans", "r13")
)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    tag = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import functions as F

    from end_to_end_aws_data_pipeline_spark.catalog import table
    from end_to_end_aws_data_pipeline_spark.session import get_spark
    from end_to_end_aws_data_pipeline_spark.streaming.pattern import (
        _batch_runs,
    )

    spark = get_spark("dump-internals")
    dumps = {}

    ev = table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    dumps["pattern_rle_fold_internal"] = _explain(_batch_runs(ev))

    # pass-1 aggregate exactly as binned_exact_percentiles_multi builds
    # it (module-internal; rebuilt here for explain because the real
    # call collect()s immediately)
    li = table(spark, SF, "lineitem")
    cols = ["l_extendedprice", "l_quantity"]
    base = (
        li.select(
            F.col("l_returnflag").alias("g"),
            *[
                F.col(c).cast("double").alias(f"_v{i}")
                for i, c in enumerate(cols)
            ],
        )
        .select(
            "g",
            F.expr(
                f"stack({len(cols)}, "
                + ", ".join(f"{i}, _v{i}" for i in range(len(cols)))
                + ") AS (cidx, v)"
            ),
        )
        .filter(F.col("v").isNotNull())
    )
    if tag == "before" or os.environ.get("SPARK_GRAFT_PCT_NO_FUSE"):
        grouped = base.groupBy("cidx", "g")
    else:
        _av = F.abs(F.col("v"))
        _e = F.greatest(
            F.lit(-64.0), F.least(F.lit(63.0), F.floor(F.log2(_av)))
        )
        _sub = F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(15.0),
                F.floor((_av / F.pow(F.lit(2.0), _e) - F.lit(1.0)) * 16),
            ),
        )
        _mag = (_e + F.lit(64.0)) * 16 + _sub
        _b0 = (
            F.when(F.col("v") == 0, F.lit(0.0))
            .when(F.col("v") > 0, _mag + 1)
            .otherwise(-_mag - 1)
            .cast("long")
        )
        grouped = base.groupBy("cidx", "g", _b0.alias("b0"))
    dumps["percentiles_pass1_internal"] = _explain(
        grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )

    for name, plan in dumps.items():
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF} [{tag}]\n")
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
