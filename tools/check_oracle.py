"""Local mirror of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and order-insensitive values. Run this before every
commit so driver-side CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from end_to_end_aws_data_pipeline_spark.catalog import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    sort_cols = [c for c in df.columns if df[c].map(type).nunique() <= 1]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    except Exception:
        df = df.sort_values(by=sort_cols, kind="mergesort", ignore_index=True)
    return df


def _numclass(v):
    """Coarse numeric class: the driver's value-hash distinguishes 27 from
    27.0, so int-vs-float (and decimal-vs-float) is a mismatch even when
    ``==`` says the values agree."""
    import numpy as np
    from decimal import Decimal

    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    return None


def _values_equal(a, b) -> bool:
    ca, cb = _numclass(a), _numclass(b)
    if ca is not None and cb is not None and ca != cb:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or a is pd.NA or (isinstance(a, float) and math.isnan(a))) and (
        b is None or b is pd.NA or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a (normalized) column dtype to the class the driver's
    value-hash distinguishes: int / float / bool / datetime / object."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duckdb={dc}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        ka, kb = _dtype_kind(a[col]), _dtype_kind(b[col])
        if ka != kb:
            problems.append(
                f"col {col!r}: dtype kind mismatch spark={ka} "
                f"({a[col].dtype}) duckdb={kb} ({b[col].dtype})"
            )
    if problems:
        return problems
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(av)} mismatched values; "
                f"first at sorted-row {i}: spark={x!r} duckdb={y!r}"
            )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as ent

    if bare:
        # replicate the driver harness: a SparkSession with NO engine
        # confs — queries must self-provision what they need
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]").appName("bare-oracle").getOrCreate()
        )
    else:
        from end_to_end_aws_data_pipeline_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # scale_up fixtures store each table as a DIRECTORY of part
        # files (multi-file production layout) — glob those for DuckDB
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        finally:
            # drop per-query persists so a 127-query session doesn't
            # accumulate cache pressure (mirrors bench.py hygiene)
            from end_to_end_aws_data_pipeline_spark.cache import release_all

            release_all()
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows hash-match")
    print(f"\n{len([q for q in qs if not only or q in only]) - n_fail} ok, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
