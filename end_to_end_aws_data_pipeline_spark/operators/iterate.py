"""Iteration-stop helpers for driver-loop algorithms over KEYED state
vectors — LPA (graph.lpa_labels_deep, period=2), PageRank
(graph.pagerank_ranks_deep, period=1) and k-core peeling
(graph.kcore_peel_deep, period=1 with ``keys_shrink``). Star
contraction is the one iterative algorithm NOT served here: its state
is an edge MULTISET, not a keyed vector, so
``dedup.connected_components_star`` keeps its native edge-set fixpoint
(count tie + ``subtract`` probe, most rounds cost one count job).

The measured LPA depth study (tools/lpa_depth.py, SCALING.md) proved
that a plain ``changed == 0`` fixpoint check NEVER fires on bipartite
graphs: even with the retention self-vote, ~10% of the purchase graph's
nodes sit in a period-2 label orbit, swapping between two labels every
round forever. The correct deep-R stop criterion is therefore
``state(t) == state(t-2)`` — compared at matching parity (t vs t-2 have
equal parity by construction), it detects the orbit itself as the
fixpoint. Monotone algorithms (k-core: degrees only fall, nodes only
leave) cannot oscillate, so ``period=1`` degrades to the classic
changed==0 stop. These helpers make both criteria executable instead of
comments.

Scale shape: one equality probe is a single co-partitioned equi-join of
two key-sized (not edge-sized) vectors with an ``isEmpty`` short-circuit
— the first differing partition aborts the scan. For a deep-R run the
probe cost is amortized by ``check_every`` (default = period). A step
that detects its own fixpoint (k-core's empty peel set) can return its
input DataFrame unchanged — the runner recognizes object identity and
stops without any probe job.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fused_ckpt(df: DataFrame) -> DataFrame:
    """LAZY localCheckpoint for per-round lineage truncation: the
    returned DataFrame is LogicalRDD-backed immediately (the plan is
    truncated exactly as with eager=True), but materialization happens
    inside the NEXT action's job — so a round's "checkpoint job +
    fixpoint-probe job" collapses to one job, and rounds between
    probes (period>1 runners) fuse their shuffles into the probe job.
    Measured on SCC at sf10: 91 inner rounds, 144.3 → 128.9 s (−11%).
    SPARK_GRAFT_EAGER_CKPT=1 restores eager checkpoints (A/B lever;
    also the right setting if a step's result is consumed by something
    that must not pay materialization inside its own job)."""
    import os

    return df.localCheckpoint(
        eager=bool(os.environ.get("SPARK_GRAFT_EAGER_CKPT"))
    )


def vectors_differ(
    a: DataFrame,
    b: DataFrame,
    key: str = "node",
    val: str = "lbl",
    keys_shrink: bool = False,
) -> bool:
    """True iff the two state vectors disagree on any key.

    With ``keys_shrink=False`` both vectors must carry the same key set
    — which label/rank loops preserve (a node never appears or
    disappears mid-iteration), so an inner join suffices and a
    row-count comparison is not needed. Peeling loops (k-core) REMOVE
    keys, and a removed key is invisible to an inner join — e.g. an
    isolated sub-k clique peels away without touching any survivor's
    degree — so ``keys_shrink=True`` first compares row counts (keys
    only ever leave, so equal counts ⇒ equal key sets). Both probes
    short-circuit: ``isEmpty`` stops at the first mismatch."""
    if keys_shrink and a.count() != b.count():
        return True
    bb = b.select(F.col(key), F.col(val).alias("__b_val"))
    return not (
        a.join(bb, key, "inner")
        .filter(F.col(val) != F.col("__b_val"))
        .isEmpty()
    )


def run_until_periodic(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_rounds: int,
    period: int = 2,
    key: str = "node",
    val: str = "lbl",
    check_every: int | None = None,
    keys_shrink: bool = False,
) -> tuple[DataFrame, int, bool]:
    """Iterate ``state = step(state)`` until the state repeats with the
    given period (``state(t) == state(t-period)``, parity matching by
    construction) or ``max_rounds`` is hit.

    Returns ``(final_state, rounds_run, converged)``. ``step`` is
    responsible for its own lineage truncation (localCheckpoint /
    persist) exactly as a fixed-R loop body would be; this runner only
    keeps a ``period``-deep history of (checkpointed, hence cheap)
    DataFrames for the equality probes.

    ``period=1`` degrades to the classic changed==0 fixpoint — useful
    for monotone algorithms (k-core peeling) where oscillation is
    impossible; oscillating label algorithms need ``period=2``. Pass
    ``keys_shrink=True`` for peeling state whose key set loses rows
    (see ``vectors_differ``). A step that detects its own fixpoint may
    return its input object unchanged — recognized by identity, no
    probe job runs.
    """
    if check_every is None:
        check_every = period
    history: list[DataFrame] = [state]
    for r in range(1, max_rounds + 1):
        prev = state
        state = step(state)
        if state is prev:
            return state, r, True
        history.append(state)
        if len(history) > period + 1:
            history.pop(0)
        if (
            r >= period
            and r % check_every == 0
            and not vectors_differ(
                state, history[0], key, val, keys_shrink=keys_shrink
            )
        ):
            return state, r, True
    return state, max_rounds, False
