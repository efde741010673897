"""Worked example: an LLM training-corpus curation pass on this engine.

The ETL twin (`reference_migration_demo.py`) shows the reference
pipeline's own workload; this demo shows the OTHER half of the engine —
the corpus operators a 100 TB training-data pipeline runs between "raw
crawl" and "training shards" — wired end to end on the synthetic
`documents`/`embeddings` tables:

  1. health audits     — per-source KL drift, Zipf slope, language-ID
                         confusion (does the corpus look right?)
  2. model-based gates — hashed linear classifier, Gopher rules
  3. dedup             — exact digests, MinHash-LSH near-dup clusters
  4. selection         — DSIR importance top-k, temperature quotas
  5. similarity        — IVF ANN top-k + in-engine recall audit
  6. capstone          — the v3 funnel (classifier → canonical dedup →
                         DSIR) with per-stage checksums

Every one of these is a registered, DuckDB-oracle-verified query; the
demo just runs them through the public registry the way a user would.

Run:  python examples/llm_corpus_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SHOWCASE = (
    ("corpus health: per-source KL drift (bits)", "q_text_kl_divergence", 5),
    ("corpus health: Zipf slope (natural text ~ -1)", "q_text_zipf", 3),
    ("corpus health: language-ID confusion", "q_text_langid_confusion", 6),
    ("gate: hashed linear classifier (per source)", "q_text_classifier", 5),
    ("gate: Gopher rule survivors", "q_curation_gopher_rules", 3),
    ("dedup: near-dup clusters (MinHash-LSH verified)", "q_dedup_clusters", 5),
    ("selection: DSIR importance top-k", "q_curation_dsir", 5),
    ("selection: temperature quotas (alpha=0.5)", "q_curation_temperature_mix", 5),
    ("similarity: IVF ANN top-k", "q_ann_ivf_topk", 5),
    ("similarity: ANN recall audit", "q_ann_recall", 5),
    ("capstone: v3 selection funnel", "q_pipeline_curation_v3", 10),
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as ent
    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("llm-corpus-demo")
    qs = ent.queries()
    for title, name, n in SHOWCASE:
        print(f"\n=== {title}  [{name}]")
        qs[name](spark, sf_dir).show(n, truncate=False)
    print("\nAll of the above are oracle-verified registry queries; see "
          "COVERAGE.md for the full inventory and SCALING.md for the "
          "measured 10x scale step.")


if __name__ == "__main__":
    main()
