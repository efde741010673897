"""Worked example: the round-6 analytics patterns, end to end.

Runs the product-analytics / warehouse-statistics surface added in
round 6 through the public registry, grouped by the distributed
pattern that powers it:

  1. segmented scans    — order statistics and running aggregates with
                          NO corpus-sized single-partition window
                          (sweep.py's two-level prefix pattern)
  2. event analytics    — attribution, funnels, paths, concurrency
  3. drift & audits     — PSI, Benford, CUSUM, skew, Z-order layout
  4. co-occurrence      — market-basket affinity, PMI collocations
  5. sketch rollups     — rolling-window HLL (mergeability in action)

Every query is a registered, DuckDB-oracle-verified entry; this demo
just runs them the way a user would.

Run:  python examples/analytics_patterns_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SHOWCASE = (
    ("segmented scan: equi-depth deciles (global rank)", "q_window_global_decile", 10),
    ("segmented scan: robust stats (median/MAD/trimmed)", "q_agg_robust_stats", 1),
    ("segmented scan: quantity-weighted median", "q_agg_weighted_median", 1),
    ("segmented scan: systematic PPS sample", "q_sample_weighted_pps", 5),
    ("events: linear multi-touch attribution", "q_attribution_linear", 5),
    ("events: funnel latency (median/p90 to convert)", "q_funnel_latency", 1),
    ("events: top 3-step paths", "q_events_top_paths", 5),
    ("events: peak session concurrency per day", "q_interval_concurrency", 5),
    ("drift: PSI between periods", "q_etl_psi_drift", 10),
    ("audit: Benford first-digit screen", "q_etl_benford", 9),
    ("audit: CUSUM change-point", "q_timeseries_changepoint", 1),
    ("audit: join-key skew profile", "q_etl_skew_profile", 4),
    ("layout: Z-order bounding boxes", "q_etl_zorder_stats", 5),
    ("co-occurrence: basket affinity (conf ppm)", "q_basket_affinity", 5),
    ("co-occurrence: PMI collocations", "q_text_collocations", 5),
    ("sketch rollup: rolling 7-day HLL vs exact", "q_window_rolling_hll", 5),
    # round-6 close: retrieval, statistics, governance
    ("retrieval: BM25 lexical top-10", "q_text_bm25_search", 5),
    ("retrieval: RRF hybrid lexical+vector fusion", "q_search_hybrid_rrf", 5),
    ("keywords: RAKE phrases", "q_text_rake_keywords", 5),
    ("keywords: TextRank (PageRank on co-occurrence)", "q_text_textrank", 5),
    ("stats: Poisson-bootstrap CI for the mean", "q_agg_bootstrap_ci", 1),
    ("stats: KS two-sample drift", "q_etl_ks_drift", 1),
    ("governance: GDPR erasure cascade", "q_etl_gdpr_erasure", 3),
    ("governance: referential-integrity audit", "q_etl_referential_integrity", 7),
    ("graph: k-core trading core", "q_graph_kcore", 4),
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as ent
    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("analytics-patterns-demo")
    qs = ent.queries()
    for title, name, n in SHOWCASE:
        print(f"\n=== {title}  [{name}]")
        qs[name](spark, sf_dir).show(n, truncate=False)
    print(
        "\nAll of the above are oracle-verified registry queries; the "
        "segmented-scan library lives in operators/sweep.py and its "
        "measured scale story in SCALING.md."
    )


if __name__ == "__main__":
    main()
