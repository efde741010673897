"""Connected-components variants: min-label propagation vs
large-star/small-star contraction — identical labels, and the star
variant's round count is O(log n) on a long path where propagation
needs O(diameter) rounds (or raises past its budget)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


GRAPHS = {
    "two_triangles": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)],
    "star_hub": [(5, i) for i in range(6, 20)],
    "chain_and_single_edge": [(i, i + 1) for i in range(20)] + [(100, 101)],
    "dup_edges_both_dirs": [(1, 2), (2, 1), (2, 3), (1, 2)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_matches_propagation(spark, name):
    e = _edges(spark, GRAPHS[name])
    # force BOTH distributed paths; the adaptive default routes graphs
    # this small to the driver union-find
    assert _labels(connected_components_star(e, local_max_edges=0)) == _labels(
        connected_components(e, local_max_edges=0)
    )


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_local_union_find_matches_distributed(spark, name):
    """The adaptive driver fast path (graphs under the edge cap) must
    produce byte-identical labels to the forced distributed paths of
    BOTH variants."""
    e = _edges(spark, GRAPHS[name])
    assert _labels(connected_components(e)) == _labels(
        connected_components(e, local_max_edges=0)
    )
    assert _labels(connected_components_star(e)) == _labels(
        connected_components_star(e, local_max_edges=0)
    )


def test_star_handles_long_path_propagation_raises(spark):
    """A 200-node path has diameter 199: DISTRIBUTED propagation cannot
    finish in 10 rounds (and must say so loudly, not return split
    components); the star variant finishes well within 10 rounds. The
    adaptive default instead routes this sub-cap graph to the driver
    union-find, which is exact at any diameter."""
    path = [(i, i + 1) for i in range(200)]
    e = _edges(spark, path)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iterations=10, local_max_edges=0)
    assert _labels(connected_components(e, max_iterations=10)) == {
        i: 0 for i in range(201)
    }
    got = _labels(
        connected_components_star(e, max_iterations=10, local_max_edges=0)
    )
    assert got == {i: 0 for i in range(201)}


def test_star_on_corpus_neardup_graph(spark):
    """Equivalence on the real near-dup edge set of the test corpus."""
    from end_to_end_aws_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(docs.select("doc_id", "text")).select(
        "doc_a", "doc_b"
    )
    assert _labels(
        connected_components_star(pairs, local_max_edges=0)
    ) == _labels(connected_components(pairs))


def test_propagation_converged_path_unchanged(spark):
    """Small-diameter graphs still converge under propagation (the
    raise only fires on genuine exhaustion)."""
    e = _edges(spark, [(1, 2), (3, 4), (2, 3)])
    assert _labels(
        connected_components(e, max_iterations=50, local_max_edges=0)
    ) == {
        1: 1,
        2: 1,
        3: 1,
        4: 1,
    }
