"""LPA convergence study: per-round label-change counts and wall time
at a given scale — the iteration-depth evidence for the LPA operator
(cf. tools/pagerank_depth.py for the checkpoint-policy study).

Usage: python tools/lpa_depth.py [sf_dir] [max_rounds]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from end_to_end_aws_data_pipeline_spark.cache import persisted, release_all
    from end_to_end_aws_data_pipeline_spark.operators.graph import (
        _LPA_B,
        _purchase_fwd,
    )
    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("lpa-depth")
    e0 = _purchase_fwd(spark, sf_dir)
    edges = persisted(
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition("dst")
    )
    n_edges = edges.count()
    labels = persisted(
        edges.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("lbl")
        )
    )
    n_nodes = labels.count()
    print(f"graph: {n_nodes} nodes, {n_edges} directed edges")
    b1 = F.lit(_LPA_B - 1)
    for r in range(1, max_rounds + 1):
        t0 = time.perf_counter()
        votes = (
            edges.join(labels.select(F.col("node").alias("dst"), "lbl"), "dst")
            .select(F.col("src").alias("node"), "lbl")
            .unionByName(labels)
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        enc = F.max(F.col("cnt") * F.lit(_LPA_B) + (b1 - F.col("lbl"))).alias("enc")
        new_labels = (
            votes.groupBy("node")
            .agg(enc)
            .select("node", (b1 - F.expr(f"enc & {_LPA_B - 1}")).alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        n_comm = new_labels.select("lbl").distinct().count()
        labels = new_labels
        dt = time.perf_counter() - t0
        print(f"round {r:2d}: {changed:8d} changed, {n_comm:6d} communities, {dt:6.2f}s")
        if changed == 0:
            print(f"converged at round {r}")
            break
    release_all()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
