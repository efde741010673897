"""Regenerate VERIFIED.json — the committed manifest of driver-verified
query fingerprints that drives the registry's verification-queue order.

For each green row in the given driver CORRECTNESS artifact(s), records
``name -> fingerprint`` where the fingerprint is computed from the code
at ``--code-root`` (default: this repo). Run this against the code state
the driver actually verified — i.e. right after a driver round lands its
CORRECTNESS_r{N}.json, before making new edits, or inside a git worktree
checked out at the round's snapshot commit with ``--code-root`` pointing
there.

Green means: rows+schema+hash all match, or a rows-only row
(err == "no_oracle") that returned without error. Red rows are skipped,
so they stay stale and re-queue for the next driver round.

Usage:
    python tools/update_verified.py CORRECTNESS_r02.json
    python tools/update_verified.py --code-root /tmp/wt_r1 \
        --out /root/repo/VERIFIED.json CORRECTNESS_r01.json
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import re
import sys
from pathlib import Path


def _green(row: dict) -> bool:
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    if row.get("err"):
        return False
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="+", help="CORRECTNESS_r*.json paths, oldest first")
    ap.add_argument("--code-root", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="driver round to stamp (overrides the _rN inferred from the "
        "artifact filename; required when the filename carries no _rN)",
    )
    ns = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    code_root = Path(ns.code_root).resolve() if ns.code_root else repo
    out = Path(ns.out).resolve() if ns.out else repo / "VERIFIED.json"

    # import the registry from code_root (may be a historical worktree
    # that predates registry.fingerprint(), so compute the hash here)
    sys.path.insert(0, str(code_root))
    for m in list(sys.modules):
        if m.startswith("end_to_end_aws_data_pipeline_spark"):
            del sys.modules[m]
    from end_to_end_aws_data_pipeline_spark import registry as reg

    reg._load()

    def fp(name: str) -> str:
        src = inspect.getsource(reg._QUERIES[name])
        return hashlib.sha256(
            (src + "\n--\n" + reg._ORACLE.get(name, "")).encode("utf-8")
        ).hexdigest()[:16]

    try:
        with open(out, encoding="utf-8") as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        manifest = {}

    n_add = 0
    for art in ns.artifacts:
        with open(art, encoding="utf-8") as f:
            rows = json.load(f)
        # stamp the driver round onto each green entry ("fp:rN") so the
        # registry can rotate re-verification oldest-green-first once
        # the whole registry is verified (legacy bare-fp entries parse
        # as round 0 and therefore rotate to the front — exactly right,
        # they ARE the oldest)
        if ns.round is not None:
            rnd = ns.round
        else:
            m = re.search(r"_r(\d+)", Path(art).name)
            if m is None:
                print(
                    f"WARNING: {Path(art).name} carries no _rN round marker; "
                    "stamping :r0 pushes these entries to the FRONT of the "
                    "re-verification rotation. Pass --round N if that is "
                    "not intended.",
                    file=sys.stderr,
                )
            rnd = int(m.group(1)) if m else 0
        for name, row in rows.items():
            if name in reg._QUERIES and _green(row):
                manifest[name] = f"{fp(name)}:r{rnd}"
                n_add += 1
    # drop entries for queries that no longer exist
    manifest = {n: h for n, h in manifest.items() if n in reg._QUERIES}

    with open(out, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(manifest)} verified entries ({n_add} updated)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
