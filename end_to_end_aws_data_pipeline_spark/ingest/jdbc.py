"""JDBC sinks: append (native) and batched upsert (custom).

The reference upserts row-by-row — one ``INSERT ... ON DUPLICATE KEY
UPDATE`` + one commit per row over the network (ref delta_load.py:
169-202). OSS Spark's JDBC writer has no upsert mode (SURVEY.md §4.3),
so the upsert path here is ``foreachPartition`` + ``executemany``: each
executor task opens one connection, sends its partition in batches of
``batch_size``, and commits once per batch — thousands of times fewer
round-trips, parallel across executors.

No database driver ships in this environment, so the connection step is
injected (``connection_factory``) and import-gated; the SQL generation
— the part with reference semantics — is a pure function, unit-tested
without a database.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame


def upsert_sql(table: str, columns: list[str], dialect: str = "mysql") -> str:
    """Parameterized upsert statement (reference shape, delta_load.py:182-186
    — but parameterized, never f-string literals: the reference's
    quote-doubling `format_value` (delta_load.py:160-166) is unnecessary
    and injectable; bind parameters are both)."""
    collist = ", ".join(f"`{c}`" for c in columns)
    placeholders = ", ".join(["%s"] * len(columns))
    if dialect == "mysql":
        updates = ", ".join(f"`{c}`=VALUES(`{c}`)" for c in columns)
        return (
            f"INSERT INTO `{table}` ({collist}) VALUES ({placeholders}) "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "postgresql":
        # requires key columns; caller passes them via columns order contract
        raise NotImplementedError("postgres ON CONFLICT needs explicit key columns")
    raise ValueError(f"unsupported dialect: {dialect}")


def write_jdbc_append(df: DataFrame, url: str, table: str, properties: dict[str, str]) -> None:
    """Native JDBC append — parity with the effective behavior of the
    reference's keyless upsert (degrades to append, SURVEY.md §2.A row 8)."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties)


def write_jdbc_upsert(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], Any],
    batch_size: int = 1000,
    dialect: str = "mysql",
) -> None:
    """Distributed batched upsert via foreachPartition + executemany.

    ``connection_factory`` must be picklable (e.g. a top-level function
    closing over DSN strings) and is invoked once per partition on the
    executor.
    """
    columns = df.columns
    sql = upsert_sql(table, columns, dialect)

    def _write_partition(rows) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    conn.commit()
                    batch.clear()
            if batch:
                cur.executemany(sql, batch)
                conn.commit()
        finally:
            conn.close()

    df.foreachPartition(_write_partition)
