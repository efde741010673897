"""Gate: the frozen bench record must have recoverable per-query detail.

The round-10 record run (219.9 s, bench_sf01.json) lost its per-query
detail when the next run overwrote bench_detail.json before it was
archived.  bench.py now archives every full-suite run under bench_runs/
as an immutable run-numbered file; this test makes the discipline
structural — whenever a frozen record artifact exists, an archived run
whose total matches it must exist on disk with a full per-query map.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# records frozen BEFORE bench_runs/ existed are exempt: their detail is
# unrecoverable (documented in-band in the artifact's record_note) and
# re-freezing them is round-11 item 3, not this test's job
_PRE_ARCHIVE_RECORDS = {219.937}


def test_frozen_record_has_archived_detail() -> None:
    rec_path = REPO / "bench_sf01.json"
    if not rec_path.exists():
        return
    rec = json.loads(rec_path.read_text())
    total = rec.get("value")
    if total is None or total in _PRE_ARCHIVE_RECORDS:
        return
    runs_dir = REPO / "bench_runs"
    assert runs_dir.is_dir(), (
        "bench_sf01.json exists but bench_runs/ does not — the record's "
        "per-query detail is not archived"
    )
    n_q = rec.get("n_queries") or len(rec.get("queries", {}))
    for f in sorted(runs_dir.glob("detail_run*.json")):
        d = json.loads(f.read_text())
        if d.get("value") == total and len(d.get("queries", {})) >= n_q:
            return
    raise AssertionError(
        f"no archived run in bench_runs/ matches the frozen record "
        f"({total} s, {n_q} queries) with a full per-query map"
    )


def test_archive_filenames_are_run_numbered() -> None:
    runs_dir = REPO / "bench_runs"
    if not runs_dir.is_dir():
        return
    pat = re.compile(r"detail_run\d{4}_sf[\w]+\.json$")
    bad = [f.name for f in runs_dir.iterdir() if not pat.match(f.name)]
    assert not bad, f"non-conforming files in bench_runs/: {bad}"
