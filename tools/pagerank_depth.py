"""Measure PageRank iteration-depth behavior: wall time and logical-plan
size at depth 10, with and without the checkpoint-every-3 policy the
graph.py docstring promises (VERDICT r5 item 5).

Plan size is measured as the length of the analyzed logical plan's
string rendering — a direct proxy for the analyzer/optimizer work that
grows with uncheckpointed iteration depth, independent of execution
time.

Usage: python tools/pagerank_depth.py [SF_DIR] [DEPTH] [CKPT_EVERY] [MODE]
MODE: both (default) | ckpt | none — at depth 20 the UNCHECKPOINTED
plan string alone OOMs an 8 GB driver (measured: java.lang.OutOfMemoryError
inside QueryExecution.explainString while AQE renders the plan), so the
checkpointed leg must be runnable on its own.
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_chars(df) -> int:
    return len(df._jdf.queryExecution().analyzed().toString())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mode = sys.argv[4] if len(sys.argv) > 4 else "both"

    from end_to_end_aws_data_pipeline_spark.cache import release_all
    from end_to_end_aws_data_pipeline_spark.operators.graph import pagerank_ranks
    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("pagerank-depth")
    # warmup: absorb JVM/codegen cold start with the registered depth
    pagerank_ranks(spark, sf_dir).count()
    release_all()

    configs = {"both": (None, every), "ckpt": (every,), "none": (None,)}[mode]
    results = []
    for ckpt in configs:
        t0 = time.perf_counter()
        ranks = pagerank_ranks(spark, sf_dir, iters=depth, checkpoint_every=ckpt)
        n = ranks.count()
        checksum = ranks.selectExpr("sum(rank) AS s").collect()[0]["s"]
        dt = round(time.perf_counter() - t0, 3)
        rec = {
            "sf_dir": sf_dir,
            "depth": depth,
            "checkpoint_every": ckpt,
            "wall_sec": dt,
            "plan_chars": plan_chars(ranks),
            "n_nodes": n,
            "rank_checksum": int(checksum),
        }
        release_all()
        results.append(rec)
        print(json.dumps(rec), flush=True)
    # checkpoint placement must not change the arithmetic
    if len(results) == 2:
        assert results[0]["rank_checksum"] == results[1]["rank_checksum"]
        assert results[0]["n_nodes"] == results[1]["n_nodes"]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
