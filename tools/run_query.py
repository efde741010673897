"""Run any registered engine query by name and show its result/plan.

Usage:
  python tools/run_query.py q1_pricing_summary [sf_dir] [--explain] [--n 20]
  python tools/run_query.py --list
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    n = 20
    for a in list(flags):
        if a.startswith("--n="):
            n = int(a.split("=")[1])

    import __spark_entry__ as ent

    qs = ent.queries()
    if "--list" in flags or not args:
        oracles = ent.oracle_sql()
        for name in sorted(qs):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name:36s} {kind}")
        print(f"\n{len(qs)} queries ({len(oracles)} oracle-checked)")
        return 0

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in qs:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2

    from end_to_end_aws_data_pipeline_spark.session import get_spark

    spark = get_spark("run-query")
    df = qs[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(n, truncate=False)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
