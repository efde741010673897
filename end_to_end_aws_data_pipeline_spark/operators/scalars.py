"""Scalar-function suites: strings, dates, math, arrays, maps, JSON,
plus pivot. The reference's only scalar op is SQL-literal quote
escaping (ref: delta_load.py:160-166); this module supplies the full
per-row expression surface, all JVM-side built-ins inside whole-stage
codegen — no Python UDFs anywhere in these paths.

Cross-engine notes baked into the oracles:
- transcendental fns (ln/pow) can differ by 1 ulp across libm
  implementations → results rounded to 6 digits (boundary risk ~1e-10).
- array arithmetic folds sequentially in both engines; elements are cast
  to DOUBLE before arithmetic so float32 inputs widen identically.
- day-of-week numbering differs across engines → not used; ISO
  year/quarter/month/day are used instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.functions.aggs import stable_round
from end_to_end_aws_data_pipeline_spark.registry import register

# ---------------------------------------------------------------------------
# strings
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT
  p_partkey,
  upper(p_brand)                                   AS brand_upper,
  lower(p_type)                                    AS type_lower,
  length(p_name)                                   AS name_len,
  substring(p_name, 1, 8)                          AS name_prefix,
  concat_ws('|', p_brand, p_type)                  AS brand_type,
  trim(p_name)                                     AS name_trim,
  lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
  replace(p_name, ' ', '_')                        AS name_snake,
  regexp_extract(p_brand, '[0-9]+')                AS brand_num,
  regexp_replace(p_type, '[aeiou]', '')            AS type_novowel,
  CAST(length(string_split(p_name, ' ')) AS INT)   AS n_words,
  contains(p_type, 'BRASS')                        AS is_brass,
  levenshtein(p_brand, 'Brand#11')                 AS brand_dist
FROM part
"""


@register("q_string_funcs", oracle=_STRING_ORACLE)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite (SURVEY.md §2.B scalar row): case, length,
    substring, concat, pad, regexp extract/replace, split, contains,
    levenshtein — all codegen'd built-ins."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.regexp_extract(F.col("p_brand"), "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "").alias("type_novowel"),
        F.size(F.split(F.col("p_name"), " ")).alias("n_words"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_dist"),
    )


# ---------------------------------------------------------------------------
# dates / timestamps
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT)     AS order_year,
  CAST(quarter(o_orderdate) AS INT)  AS order_quarter,
  CAST(month(o_orderdate) AS INT)    AS order_month,
  CAST(day(o_orderdate) AS INT)      AS order_day,
  date_trunc('month', o_orderdate)   AS month_start,
  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
                                     AS days_since_95,
  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
  CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS INT)
    AS months_since_95
FROM orders
"""


@register("q_date_funcs", oracle=_DATE_ORACLE)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time suite: extract parts, truncate, diff, add-interval,
    last_day, epoch seconds. Session TZ pinned UTC (session.py) keeps
    epoch/date math identical to the oracle's naive timestamps."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("order_year"),
        F.quarter(od).alias("order_quarter"),
        F.month(od).alias("order_month"),
        F.dayofmonth(od).alias("order_day"),
        F.date_trunc("month", od).alias("month_start"),
        od.cast("date").cast("timestamp").alias("order_date"),
        F.datediff(od, F.to_timestamp(F.lit("1995-01-01 00:00:00"))).alias(
            "days_since_95"
        ),
        (od + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.last_day(od.cast("date")).cast("timestamp").alias("month_end"),
        F.unix_timestamp(od).alias("epoch_sec"),
        # integer month arithmetic (fractional months_between semantics
        # are engine-specific; whole-month diffs are portable)
        ((F.year(od) - 1995) * 12 + (F.month(od) - 1)).alias("months_since_95"),
    )


# ---------------------------------------------------------------------------
# math
# ---------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  round(l_extendedprice, 1)                      AS price_round1,
  abs(l_discount - 0.05)                         AS disc_dev,
  CAST(floor(l_quantity) AS BIGINT)              AS qty_floor,
  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_kceil,
  CAST(l_orderkey % 10 AS BIGINT)                AS key_mod,
  floor(sqrt(l_extendedprice) * 1000000 + 0.5) / 1000000 AS price_sqrt,
  floor(ln(l_extendedprice + 1.0) * 1000000 + 0.5) / 1000000 AS price_ln,
  floor(pow(1.0 + l_discount, l_linenumber) * 1000000 + 0.5) / 1000000
    AS compound,
  CAST(sign(l_discount - 0.05) AS DOUBLE)        AS disc_sign,
  greatest(l_tax, l_discount)                    AS max_rate,
  least(l_tax, l_discount)                       AS min_rate
FROM lineitem
WHERE l_orderkey % 37 = 0
"""


@register("q_math_funcs", oracle=_MATH_ORACLE)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math suite: round/abs/floor/ceil/mod/sqrt/ln/pow/sign/greatest."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 37 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("price_round1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity")).alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_kceil"),
        (F.col("l_orderkey") % 10).alias("key_mod"),
        stable_round(F.sqrt(F.col("l_extendedprice")), 6).alias("price_sqrt"),
        stable_round(F.log(F.col("l_extendedprice") + 1.0), 6).alias(
            "price_ln"
        ),
        stable_round(
            F.pow(F.lit(1.0) + F.col("l_discount"), F.col("l_linenumber")), 6
        ).alias("compound"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


# ---------------------------------------------------------------------------
# arrays (embeddings table: array<float> dim 64)
# ---------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS INT) AS dim,
  floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) / 1000000
    AS first_elem,
  floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        * 1000000 + 0.5) / 1000000 AS elem_sum,
  floor(sqrt(list_sum(list_transform(
      embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        * 1000000 + 0.5) / 1000000 AS l2_norm,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
  floor(CAST(list_max(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000
    AS max_elem
FROM embeddings
"""


@register("q_array_funcs", oracle=_ARRAY_ORACLE)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array suite over embedding vectors: size, index, higher-order
    transform/filter/aggregate (fold), max — the same primitives the
    similarity operators build on (operators/similarity.py)."""
    e = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    fsum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        stable_round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_elem"
        ),
        stable_round(fsum(as_double), 6).alias("elem_sum"),
        stable_round(F.sqrt(fsum(sq)), 6).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        stable_round(F.array_max("embedding").cast("double"), 6).alias(
            "max_elem"
        ),
    )


# ---------------------------------------------------------------------------
# JSON (events.props) + map types
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  (json_extract_string(props, '$.k') IS NOT NULL)   AS has_k,
  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_value
FROM events
"""


@register("q_json_funcs", oracle=_JSON_ORACLE)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column:
    get_json_object + typed from_json (map<string,long>) round-trip."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        "event_type",
        F.element_at(parsed, "k").alias("k_value"),
        F.get_json_object(F.col("props"), "$.k").isNotNull().alias("has_k"),
        F.get_json_object(F.col("props"), "$.missing").cast("long").alias(
            "missing_value"
        ),
    )


# ---------------------------------------------------------------------------
# pivot (conditional aggregation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT
  user_id,
  {", ".join(
    f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
    for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


@register("q_pivot_event_counts", oracle=_PIVOT_ORACLE)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide: per-user counts of each event type.

    Explicit pivot values keep the plan one-pass (no extra distinct-scan
    job to discover values — essential when the fact side is huge).
    """
    e = table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# conditional functions + struct build / JSON round-trip
# ---------------------------------------------------------------------------

_COND_ORACLE = """
SELECT
  event_id,
  coalesce(nullif(event_type, 'error'), 'recovered') AS type_or_recovered,
  ifnull(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1)
    AS missing_or_default,
  CASE WHEN value > 50 THEN 'high' WHEN value > 10 THEN 'mid' ELSE 'low' END
    AS value_band,
  (CASE WHEN user_id IS NOT NULL THEN user_id * 10 ELSE -1 END) AS nvl2_like
FROM events
"""


@register("q_conditional_funcs", oracle=_COND_ORACLE)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional suite: nullif / coalesce / ifnull-nvl / nvl2 /
    multi-branch CASE."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")
        ).alias("type_or_recovered"),
        F.nvl(
            F.get_json_object(F.col("props"), "$.missing").cast("long"), F.lit(-1)
        ).alias("missing_or_default"),
        F.when(F.col("value") > 50, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.nvl2(F.col("user_id"), F.col("user_id") * 10, F.lit(-1)).alias("nvl2_like"),
    )


_STRUCT_ORACLE = """
SELECT
  o_orderkey,
  to_json(struct_pack(k := o_orderkey, status := o_orderstatus))
    AS order_json,
  struct_pack(k := o_orderkey, status := o_orderstatus).status
    AS status_via_struct
FROM orders WHERE o_orderkey % 11 = 0
"""


@register("q_struct_funcs", oracle=_STRUCT_ORACLE)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, and to_json serialization
    (the nested-type pattern multimodal metadata uses)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    st = F.struct(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status")
    )
    return o.select(
        "o_orderkey",
        F.to_json(st).alias("order_json"),
        st.getField("status").alias("status_via_struct"),
    )


# ---------------------------------------------------------------------------
# null-semantics conformance (three-valued logic, null-safe equality)
# ---------------------------------------------------------------------------

_NULLSEM_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE o_custkey % 100 END AS a,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE o_custkey % 100 END AS b
  FROM orders
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS eq_true,
  CAST(sum(CASE WHEN a = b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS eq_unknown,
  CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
    AS nullsafe_eq_true,
  CAST(sum(CASE WHEN a IN (1, 2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS in_true,
  CAST(sum(CASE WHEN NOT (a IN (1, 2, 3)) THEN 1 ELSE 0 END) AS BIGINT)
    AS not_in_true,
  CAST(sum(CASE WHEN coalesce(a, b, -1) = -1 THEN 1 ELSE 0 END) AS BIGINT)
    AS both_null,
  CAST(sum(CASE WHEN a IS NULL AND b IS NOT NULL THEN b ELSE 0 END)
       AS BIGINT) AS b_when_a_null_checksum
FROM t
"""


@register("q_scalar_null_semantics", oracle=_NULLSEM_ORACLE)
def q_scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic conformance, value-checked between engines:
    with NULLs injected on coprime key patterns (%7 / %11, so
    null/null, null/value, and value/value rows all occur), the query
    counts where `a = b` is TRUE vs UNKNOWN, where the NULL-SAFE
    equality (Spark `<=>`, SQL IS NOT DISTINCT FROM) differs from
    plain equality, and how IN / NOT IN / coalesce treat the NULL
    rows. These are the semantics silently assumed by every join and
    filter in the engine — the null-aware anti join
    (q_join_null_aware_anti) is the plan-level face of the same
    rules; this row pins the expression-level face.
    """
    o = table(spark, sf_dir, "orders")
    t = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("a"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("b"),
    )
    eq = F.col("a") == F.col("b")
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(eq, 1).otherwise(0)).cast("long").alias("eq_true"),
        F.sum(F.when(eq.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("eq_unknown"),
        F.sum(F.when(F.col("a").eqNullSafe(F.col("b")), 1).otherwise(0))
        .cast("long")
        .alias("nullsafe_eq_true"),
        F.sum(F.when(F.col("a").isin(1, 2, 3), 1).otherwise(0))
        .cast("long")
        .alias("in_true"),
        F.sum(F.when(~F.col("a").isin(1, 2, 3), 1).otherwise(0))
        .cast("long")
        .alias("not_in_true"),
        F.sum(
            F.when(F.coalesce(F.col("a"), F.col("b"), F.lit(-1)) == -1, 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_null"),
        F.sum(
            F.when(
                F.col("a").isNull() & F.col("b").isNotNull(), F.col("b")
            ).otherwise(0)
        )
        .cast("long")
        .alias("b_when_a_null_checksum"),
    )


# ---------------------------------------------------------------------------
# URL functions (parse_url) against constructed ground truth
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH u AS (
  SELECT doc_id, source,
         'https://' || source || '.example.com/docs/' ||
           CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url,
         lang
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_urls,
       min(source || '.example.com') AS host,
       CAST(sum(length('/docs/' || CAST(doc_id AS VARCHAR))) AS BIGINT)
         AS path_len_sum,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_en
FROM u GROUP BY source
"""


@register("q_scalar_url_funcs", oracle=_URL_ORACLE)
def q_scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's `parse_url` (HOST / PATH /
    QUERY-key extraction) validated against CONSTRUCTED ground truth:
    each document synthesizes its own URL from known parts, Spark
    parses the parts back out, and the oracle computes the same
    aggregates directly from the parts — so a parse_url that
    mis-split host/path/query breaks the hash. (DuckDB has no
    parse_url; constructing the truth side-steps needing one, the
    same pattern as the codec oracles.)

    URL parsing is a first-class crawl-pipeline need (domain-level
    dedup, per-site caps, blocklists — q_curation_source_cap's keys
    come from exactly this step in production). All string
    expressions, fully codegen'd, one scan.
    """
    d = table(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    parsed = u.select(
        "source",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "q_lang"
        ),
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.min("host").alias("host"),
        F.sum(F.length("path")).cast("long").alias("path_len_sum"),
        F.sum(F.when(F.col("q_lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_lang_en"),
    )
