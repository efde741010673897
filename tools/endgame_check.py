"""Endgame consistency guard.

Two rounds in a row, registered queries landed AFTER the end-of-round
"all green" record, leaving the shipped tree unverified relative to its
own record (harmless in round 7, ship-broken in round 6). This tool
makes that habit structurally impossible to repeat silently:

1. **Count sync** (always): the registry's visible query count must
   match the counts README.md and COVERAGE.md state. Runs in pytest too
   (tests/test_registry_order.py::test_registry_counts_match_docs), so
   any count drift fails the suite immediately.
2. **Record freshness** (verify mode): if ENDGAME.json exists, the
   CURRENT registry count must equal the recorded one — registering a
   query after the record without re-running ``--record`` (which is
   only legitimate after a full re-verify) is a hard failure.

Usage:
    python tools/endgame_check.py            # verify
    python tools/endgame_check.py --record   # stamp ENDGAME.json

The endgame sequence is therefore: full check_oracle sweep + pytest +
bench → ``--record`` → commit. Any commit that adds a registered query
afterwards turns the next verify red until the sweep is re-run.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def registry_counts() -> dict:
    """Visible + env-gated registry counts. The protobuf-gated State
    API v2 query registers only when protobuf is importable, so doc
    counts (written for the full surface) may exceed the visible count
    by the number of gated-out registrations."""
    from end_to_end_aws_data_pipeline_spark import registry as reg
    from end_to_end_aws_data_pipeline_spark.streaming.queries import (
        _has_protobuf,
    )

    reg._load()
    visible = len(reg._QUERIES)
    oracle = len(reg._ORACLE)
    gated = 0 if _has_protobuf() else 1  # q_stream_transform_with_state
    return {
        "visible": visible,
        "oracle_backed": oracle,
        "gated_out": gated,
        "full_surface": visible + gated,
        "full_oracle": oracle + gated,
    }


def doc_counts() -> dict:
    """The counts README.md and COVERAGE.md state (full-surface
    convention: gated registrations included)."""
    readme = (_REPO / "README.md").read_text(encoding="utf-8")
    m = re.search(
        r"\*\*Status \(round \d+\):\*\* (\d+) registered queries\s*"
        r"\((\d+)",
        readme,
    )
    if not m:
        raise SystemExit("README.md: no '**Status (round N):** X "
                         "registered queries (Y ...' line found")
    coverage = (_REPO / "COVERAGE.md").read_text(encoding="utf-8")
    c = re.search(
        r"Registry: (\d+) registered queries \((\d+) oracle-backed",
        coverage,
    )
    if not c:
        raise SystemExit("COVERAGE.md: no 'Registry: X registered "
                         "queries (Y oracle-backed' line found")
    return {
        "readme": (int(m.group(1)), int(m.group(2))),
        "coverage": (int(c.group(1)), int(c.group(2))),
    }


def check_counts() -> dict:
    reg = registry_counts()
    docs = doc_counts()
    want = (reg["full_surface"], reg["full_oracle"])
    errors = []
    for name, got in docs.items():
        if got != want:
            errors.append(
                f"{name.upper()} states {got[0]} queries ({got[1]} "
                f"oracle-backed) but the registry has {want[0]} "
                f"({want[1]}) — sync the doc or re-count"
            )
    if errors:
        raise SystemExit("\n".join(errors))
    return reg


def main() -> int:
    record = "--record" in sys.argv[1:]
    reg = check_counts()
    path = _REPO / "ENDGAME.json"
    if record:
        head = subprocess.run(
            ["git", "-C", str(_REPO), "rev-parse", "HEAD"],
            capture_output=True, text=True, check=False,
        ).stdout.strip()
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {"registry_count": reg["visible"],
                 "oracle_count": reg["oracle_backed"],
                 "recorded_after_commit": head},
                f, indent=1,
            )
            f.write("\n")
        print(f"recorded: {reg['visible']} queries "
              f"({reg['oracle_backed']} oracle-backed) at {head[:9]}")
        return 0
    if path.exists():
        with open(path, encoding="utf-8") as f:
            rec = json.load(f)
        if rec.get("registry_count") != reg["visible"]:
            print(
                f"STALE ENDGAME RECORD: {rec.get('registry_count')} "
                f"queries recorded, {reg['visible']} registered now.\n"
                "A query was registered after the endgame record — "
                "re-run the full verification sweep (check_oracle "
                "default+bare, pytest, bench) and then "
                "tools/endgame_check.py --record.",
                file=sys.stderr,
            )
            return 1
    print(f"counts in sync: {reg['full_surface']} full-surface "
          f"({reg['full_oracle']} oracle-backed), "
          f"{reg['visible']} visible in this env"
          + ("; endgame record fresh" if path.exists() else
             "; no endgame record yet"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
