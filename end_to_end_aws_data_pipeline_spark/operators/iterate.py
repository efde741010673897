"""Iteration-stop helpers for driver-loop algorithms (LPA, PageRank,
k-core, star contraction).

The measured LPA depth study (tools/lpa_depth.py, SCALING.md) proved
that a plain ``changed == 0`` fixpoint check NEVER fires on bipartite
graphs: even with the retention self-vote, ~10% of the purchase graph's
nodes sit in a period-2 label orbit, swapping between two labels every
round forever. The correct deep-R stop criterion is therefore
``state(t) == state(t-2)`` — compared at matching parity (t vs t-2 have
equal parity by construction), it detects the orbit itself as the
fixpoint. These helpers make that criterion executable instead of a
comment.

Scale shape: one equality probe is a single co-partitioned equi-join of
two key-sized (not edge-sized) vectors with an ``isEmpty`` short-circuit
— the first differing partition aborts the scan. For a deep-R run the
probe cost is amortized by ``check_every`` (default 2: the smallest
interval at which period-2 detection is possible).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vectors_differ(
    a: DataFrame, b: DataFrame, key: str = "node", val: str = "lbl"
) -> bool:
    """True iff the two state vectors disagree on any key.

    Both vectors must carry the same key set — which label/rank loops
    preserve (a node never appears or disappears mid-iteration), so an
    inner join suffices and a row-count comparison is not needed. The
    probe short-circuits: ``isEmpty`` stops at the first mismatch."""
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
    impossible; oscillating label algorithms need ``period=2``.
    """
    if check_every is None:
        check_every = period
    history: list[DataFrame] = [state]
    for r in range(1, max_rounds + 1):
        state = step(state)
        history.append(state)
        if len(history) > period + 1:
            history.pop(0)
        if (
            r >= period
            and r % check_every == 0
            and not vectors_differ(state, history[0], key, val)
        ):
            return state, r, True
    return state, max_rounds, False
