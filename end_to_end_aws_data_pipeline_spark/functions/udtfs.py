"""Python UDTFs (table functions, Spark ≥ 3.5): one row in, many rows
out, used via LATERAL join — the remaining cell of the UDF surface
(SURVEY.md §2.B "UDF/UDAF/UDTF").

Like every Python path in this engine, UDTFs are the escape hatch, not
the default: `tokenize_udtf` duplicates what `posexplode(split(...))`
does natively (and the oracle-checked query exists precisely to prove
the UDTF path agrees with the relational definition). Real uses are
generators with no built-in equivalent — parsers, segmenters,
model-driven expanders.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark ≥ 3.5
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizeUDTF:
        """text → (position, token) rows; whitespace tokenization."""

        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield (i + 1, tok)

    HAVE_UDTF = True
except ImportError:  # pragma: no cover - older Spark
    TokenizeUDTF = None
    HAVE_UDTF = False


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register engine UDTFs in the session's function
    registry (needed for SQL LATERAL join usage)."""
    if HAVE_UDTF:
        spark.udtf.register("tokenize_udtf", TokenizeUDTF)
