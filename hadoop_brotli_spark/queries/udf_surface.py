"""User-defined function surface, completing the UDF/UDAF/UDTF row of
SURVEY.md §2b: a Python UDTF (table function via LATERAL) and a
grouped-aggregate pandas UDAF.

The reference's nearest analog is its JNI native-function table
(`BroNative.java:51-78`) — an extension point for row-level native
code; here the extension points are Spark's Python UDF family.

These are deliberately the *slow path* demos (SURVEY.md: "UDFs are
the slow path"): everything they compute is also expressible in pure
Catalyst (the oracles prove it). Use them as templates for logic that
genuinely cannot be expressed with built-ins.

Scale notes (100 TB): the UDTF is Arrow-batched per partition and
emits bounded output (top-k per row); the grouped-agg UDAF receives
whole groups — safe here because groups are bounded (6 return-flag ×
status groups), but for high-cardinality keys prefer two-phase
Catalyst aggregation. Both keep exact integer arithmetic internally
so results are partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import t

TOP_K = 3


@register(
    "q94_python_udtf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    cnt AS (
      SELECT doc_id, term, COUNT(*) AS cnt
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    rnk AS (
      SELECT doc_id, term, cnt,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY cnt DESC, term ASC
             ) AS BIGINT) AS rnk
      FROM cnt
    )
    SELECT doc_id, term, cnt, rnk FROM rnk WHERE rnk <= 3
    """,
)
def q94_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: per-document top-3 terms via a LATERAL table
    function (one input row → k output rows).

    The UDTF computes counts with a local Counter — deterministic
    integer arithmetic, ties broken by term — so it hash-matches the
    window-function oracle exactly.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="term: string, cnt: bigint, rnk: bigint")
    class TopTerms:
        def eval(self, text: str):
            from collections import Counter

            counts = Counter(w for w in (text or "").split(" ") if w)
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
            for i, (term, cnt) in enumerate(best):
                yield term, cnt, i + 1

    spark.udtf.register("top_terms", TopTerms)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        """
        SELECT d.doc_id, s.term, s.cnt, s.rnk
        FROM documents_udtf_src d, LATERAL top_terms(d.text) s
        """
    )


@register(
    "q95_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS wavg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q95_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: price-weighted average discount
    per (returnflag, linestatus).

    The UDAF sums in integer cents (int64 — exact, order-free) and
    divides once at the end, so it matches the oracle's
    decimal-exact ratio bit-for-bit. Arrow moves each group's
    columns as one batch (no per-row Python).
    """
    import pandas as pd

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: `from __future__ import annotations`
    # stringifies type hints, which breaks signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg_disc(price: pd.Series, disc: pd.Series) -> float:
        price_cents = (price * 100).round().astype("int64")
        disc_cents = (disc * 100).round().astype("int64")
        num = int((price_cents * disc_cents).sum())  # scale 4
        den = int(price_cents.sum())  # scale 2
        return (num / 10000.0) / (den / 100.0)

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wavg_disc("l_extendedprice", "l_discount").alias("wavg_disc")
    )


# ------------------------------------------ q342 Arrow-optimized UDF


@register(
    "q342_arrow_scalar_udf",
    oracle="""
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', '-', 'g'), '-')
             AS slug,
           CAST(LENGTH(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', '-',
                                           'g'), '-')) AS BIGINT)
             AS slug_len
    FROM documents
    """,
)
def q342_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``udf(useArrow=True)``) —
    the third member of the UDF family beside the UDTF (q94) and the
    grouped-agg pandas UDAF (q95): URL-slug normalization
    (lowercase, non-alphanumeric runs → single hyphen, trimmed).

    Arrow batching moves rows JVM↔Python in columnar batches instead
    of pickled rows — the ~10× serialization win that makes scalar
    Python UDFs survivable when a built-in truly can't express the
    logic. The oracle states the equivalent pure-SQL regexp chain,
    proving (as with q94/q95) that THIS one could have stayed in
    Catalyst — it's the template, not the recommendation.

    Scale: per-row independent, no shuffle; batch size bounds Python
    memory; the UDF sees only the projected text column.
    """
    import re

    from pyspark.sql.functions import udf

    pat = re.compile(r"[^a-z0-9]+")

    @udf(returnType="string", useArrow=True)
    def slugify(text: str) -> str:
        if text is None:
            return None
        return pat.sub("-", text.lower()).strip("-")

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        slugify(F.col("text")).alias("slug"),
        F.length(slugify(F.col("text"))).cast("bigint").alias("slug_len"),
    )
