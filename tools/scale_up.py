"""Key-consistent synthetic scale-up of a testdata SF directory.

Replicates every sf-scaling table R times with entity keys shifted by a
per-copy offset, preserving referential integrity (lineitem.l_orderkey
still joins orders.o_orderkey, orders.o_custkey still joins
customer.c_custkey, ...), so every engine query runs unchanged at R×
the data. Fixed-cardinality dims (region, nation) are copied verbatim.

Used to produce local scaling evidence (SCALING.md): the driver ships
sf0.001/0.01/0.1 only; `python tools/scale_up.py` materializes an
sf1-equivalent under the repo-local (gitignored) .benchdata/ so
bench.py can measure a true 10× scale step.

Usage: python tools/scale_up.py [SRC] [DST] [R]
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table key columns shifted by (copy_index * stride[entity]);
# stride = max(key)+1 of the owning entity so copies never collide
_ENTITY_KEY = {
    "orders": ("orders", "o_orderkey"),
    "customer": ("customer", "c_custkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
    "events": ("events", "event_id"),
    "users": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    # ts is re-cast to TIMESTAMP_NS on write so the scaled copy keeps
    # the source's parquet TIMESTAMP(NANOS) physical type (the engine's
    # nanosAsLong read path stays exercised at scale)
    "events": [("event_id", "events"), ("user_id", "users")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}


def _src_glob(src: str, table: str) -> str:
    """A source table may be a single parquet file (driver fixtures) or
    a directory of part files (output of a previous scale_up run —
    chaining sf0.1 → sf1 → sf10 works)."""
    path = f"{src}/{table}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def scale_up(src: str, dst: str, r: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    stride = {
        ent: con.sql(
            f"SELECT max({col}) + 1 FROM '{_src_glob(src, tbl)}'"
        ).fetchone()[0]
        for ent, (tbl, col) in _ENTITY_KEY.items()
    }
    for table, shifts in _SHIFTS.items():
        parts = []
        for i in range(r if shifts else 1):
            if shifts:
                repls = [
                    f"{col} + {i * stride[ent]} AS {col}" for col, ent in shifts
                ]
                if table == "events":
                    repls.append("CAST(ts AS TIMESTAMP_NS) AS ts")
                if table == "documents" and i > 0:
                    # perturb text per copy by SUFFIX-TAGGING every word
                    # (w -> wc{i}): every shingle of copy i differs from
                    # every shingle of copy j, so a verbatim-cloned
                    # corpus's pathologies are avoided (df multiplied by
                    # R, the df-quadratic pair join by R^2, clone groups
                    # welded into mega-clusters) — while, unlike the
                    # earlier interleave perturbation (' ' -> ' c{i} '),
                    # word count, shingle count, and the per-copy
                    # document-frequency DISTRIBUTION stay exactly the
                    # source corpus's. (The interleave form doubled doc
                    # length and created '(c{i} word c{i})' shingles
                    # whose df = word frequency — thousands — turning
                    # shingle-Jaccard into word-Jaccard and making the
                    # scaled corpus adversarially unlike the original.)
                    # Copy 0 keeps the original texts and their pair
                    # structure; each tagged copy carries its own.
                    repls.append(
                        rf"regexp_replace(text, '(\S+)', '\1c{i}', 'g')"
                        " AS text"
                    )
                    repls.append(
                        rf"length(regexp_replace(text, '(\S+)', '\1c{i}',"
                        " 'g')) AS n_chars"
                    )
                parts.append(f"SELECT * REPLACE ({', '.join(repls)}) FROM src")
            else:
                parts.append("SELECT * FROM src")
        con.sql(
            f"CREATE OR REPLACE VIEW src AS FROM '{_src_glob(src, table)}'"
        )
        # a previous run may have left the opposite shape (file vs dir)
        out_path = f"{dst}/{table}.parquet"
        if os.path.isdir(out_path):
            import shutil

            shutil.rmtree(out_path)
        elif os.path.exists(out_path):
            os.remove(out_path)
        # bounded row groups AND one FILE per copy: the driver's sf
        # fixtures are single-row-group single-file tables (unsplittable
        # scans — catalog.spread() exists for that pathology), but a
        # scaled corpus should look like production data, where many
        # parquet files give the scheduler one task per split without
        # any repartition. Spark reads the '<table>.parquet' DIRECTORY
        # transparently; expression-scan scale ratios stop being
        # split-count artifacts (q_text_fingerprint measured 7.7x on the
        # single-file corpus purely from serialized scan parallelism).
        if shifts:
            tdir = f"{dst}/{table}.parquet"
            os.makedirs(tdir, exist_ok=True)
            for i, sel in enumerate(parts):
                con.sql(
                    f"COPY ({sel}) TO '{tdir}/part-{i:02d}.parquet' "
                    "(FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
                )
            glob = f"{tdir}/*.parquet"
        else:
            con.sql(
                f"COPY (SELECT * FROM src) TO '{dst}/{table}.parquet' "
                "(FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
            )
            glob = f"{dst}/{table}.parquet"
        n = con.sql(f"SELECT count(*) FROM '{glob}'").fetchone()[0]
        print(f"{table}: {n} rows ({len(parts) if shifts else 1} files)", file=sys.stderr)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_up(src, dst, r)
