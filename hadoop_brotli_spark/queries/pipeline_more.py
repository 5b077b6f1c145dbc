"""Training-data-pipeline operators, batch 2: embedding bucket
centroids (the k-means/IVF building block), int8 scalar quantization
(the storage/ANN scale path), corpus term salience (TF-IDF-shaped
ranking without engine-specific ``ln``), and deterministic stratified
sampling.

Like every relational op, these are absent from the reference codec
(SURVEY.md §2b census) — they extend the engine along the
BASELINE.json north star (LLM-data-pipeline surface).

Numeric determinism (see _util/similarity docstrings): float arrays
are cast to DOUBLE before math; centroid sums run over (FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
values in DECIMAL so partial-aggregation order cannot change the
result; salience avoids ``ln`` entirely (libm results differ between
engines) in favor of exact integer ratios.

Scale notes (100 TB):
- q75: one shuffle on (bucket, dim) — 2^8 buckets × 64 dims = 16k
  groups regardless of corpus size; partial aggregation does the
  heavy lifting map-side. This is exactly one k-means/IVF training
  iteration, so the same plan shape iterates for codebook learning.
- q76: purely per-row (no shuffle until the per-vector re-group,
  which AQE coalesces); the int8 codes cut ANN candidate-scan bytes
  4× vs float32 — the standard IVF-PQ-ish storage layout.
- q77: explode → two-level agg; term keys are Zipf-skewed, but the
  map-side partial agg absorbs hot terms before the shuffle. The
  doc-count scalar joins via broadcast, never a driver collect.
- q89: sampling is a pure hash of the key — no RNG, no
  partition-layout dependence, reproducible across engines/runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, dsum, fan_out, t, ts
from .similarity import _sql_sign_bucket, sign_bucket


@register(
    "q75_embedding_centroids",
    oracle=f"""
    WITH b AS (
      SELECT {_sql_sign_bucket('embedding')} AS bucket,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    ex AS (
      SELECT bucket, UNNEST(e) AS x,
             CAST(generate_subscripts(e, 1) AS BIGINT) - 1 AS dim
      FROM b
    )
    SELECT bucket, dim,
           CAST(SUM(CAST((FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS centroid,
           COUNT(*) AS n_vecs
    FROM ex GROUP BY bucket, dim
    """,
)
def q75_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LSH-bucket centroids: one k-means/IVF training iteration.

    posexplode keeps the dim index JVM-side; the exact-decimal sum
    over rounded elements makes the mean order-independent, so the
    hash matches DuckDB regardless of partial-agg ordering.
    """
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        sign_bucket("embedding").alias("bucket"),
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    )
    return (
        ex.groupBy("bucket", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            (dsum(dround(F.col("x").cast("double"), 6), 6) / F.count(F.lit(1))).alias(
                "centroid"
            ),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@register(
    "q76_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    st AS (
      SELECT vec_id, e, list_min(e) AS mn,
             (list_max(e) - list_min(e)) / 255.0 AS sc
      FROM e
    ),
    ex AS (SELECT vec_id, mn, sc, UNNEST(e) AS x FROM st),
    c AS (
      SELECT vec_id, x, mn, sc,
             CASE WHEN sc = 0 THEN 0
                  ELSE LEAST(CAST(FLOOR((x - mn) / sc) AS BIGINT), 255)
             END AS code
      FROM ex
    )
    SELECT vec_id,
           CAST(COUNT(DISTINCT code) AS BIGINT) AS n_levels,
           (FLOOR(CAST(MAX(ABS(mn + (code + 0.5) * sc - x)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS max_abs_err
    FROM c GROUP BY vec_id
    """,
)
def q76_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings + reconstruction error.

    Per-vector affine codes ``floor((x - min) / scale)`` clamped to
    [0, 255], dequantized at bin centers. Every step is the same
    IEEE-double expression in both engines, so even FLOOR edge cases
    agree bit-for-bit. Constant vectors degrade to code 0 with zero
    error (scale = 0 guard).
    """
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    st = e.select(
        "vec_id",
        F.array_min("e").alias("mn"),
        ((F.array_max("e") - F.array_min("e")) / F.lit(255.0)).alias("sc"),
        F.explode("e").alias("x"),
    )
    code = (
        F.when(F.col("sc") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.floor((F.col("x") - F.col("mn")) / F.col("sc")),
                F.lit(255).cast("bigint"),
            )
        )
        .alias("code")
    )
    c = st.select("vec_id", "x", "mn", "sc", code)
    deq = F.col("mn") + (F.col("code").cast("double") + F.lit(0.5)) * F.col("sc")
    return c.groupBy("vec_id").agg(
        F.countDistinct("code").alias("n_levels"),
        dround(F.max(F.abs(deq - F.col("x"))), 6).alias("max_abs_err"),
    )


@register(
    "q77_term_salience",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    f AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
      FROM toks WHERE term <> '' GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, df, cf,
           CAST(cf * (n_docs + 1) AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS salience
    FROM f, n
    ORDER BY salience DESC, term ASC
    LIMIT 50
    """,
)
def q77_term_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term salience: TF-IDF-shaped ranking of the top-50
    terms, with the idf factor as an exact integer ratio
    ``cf · (N+1) / (df+1)`` — no ``ln``, whose libm rounding differs
    between engines and would break the value hash.

    The corpus doc count joins as a broadcast scalar (never a
    driver-side collect), keeping the whole plan distributed.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    f = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("cf")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        f.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "cf",
            (
                (F.col("cf") * (F.col("n_docs") + 1)).cast("double")
                / (F.col("df") + 1).cast("double")
            ).alias("salience"),
        )
        .orderBy(F.col("salience").desc(), F.col("term").asc())
        .limit(50)
    )


@register(
    "q89_stratified_sample",
    oracle="""
    WITH assigned AS (
      SELECT lang, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
               % 100 AS bucket,
             CASE WHEN lang IN ('es', 'zh') THEN 20 ELSE 50 END AS rate
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM assigned WHERE bucket < rate GROUP BY lang
    """,
)
def q89_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates applied
    through a hash of the stable key (md5(doc_id) % 100 < rate).

    Unlike ``df.sampleBy``, membership is a pure function of the key
    — identical across runs, partitionings, and engines — which is
    what training pipelines need for reproducible subsets and
    incremental backfills.
    """
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    rate = F.when(F.col("lang").isin("es", "zh"), 20).otherwise(50)
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@register(
    "q67_text_normalize",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT)
             AS n_norm_chars
    FROM documents
    """,
)
def q67_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → strip non-alnum →
    collapse whitespace) emitting the normalized-content hash that
    exact dedup keys on.

    Normalize-then-hash is the standard prelude to dedup at scale:
    downstream shuffles carry the 32-byte hash, never the document
    body, and formatting-only variants collapse to one key. Pure
    codegen string expressions — no UDF in the hot path.
    """
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("n_norm_chars"),
    )


def _sql_split_bucket() -> str:
    return (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10"
    )


@register(
    "q68_split_contamination",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS shingle
      FROM docs, UNNEST(range(len(w) - 2)) AS u(i)
    ),
    assigned AS (
      SELECT doc_id, {_sql_split_bucket()} AS bucket FROM documents
    ),
    train_sh AS (
      SELECT DISTINCT md5(shingle) AS h
      FROM sh JOIN assigned USING (doc_id) WHERE bucket < 8
    ),
    test_sh AS (
      SELECT doc_id, md5(shingle) AS h
      FROM sh JOIN assigned USING (doc_id) WHERE bucket = 9
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM test_sh GROUP BY doc_id),
    contam AS (
      SELECT doc_id, COUNT(*) AS n_contam
      FROM test_sh WHERE h IN (SELECT h FROM train_sh) GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(c.n_contam, 0) AS n_contam,
           CAST(COALESCE(c.n_contam, 0) AS DOUBLE) / t.n_shingles
             AS contamination
    FROM totals t LEFT JOIN contam c USING (doc_id)
    """,
)
def q68_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: fraction of each test doc's
    3-word shingles that also occur anywhere in the train split.

    The benchmark-leakage check every training pipeline needs before
    shipping a split. Both sides of the membership join carry md5
    shingle hashes (fixed 32-byte shuffle keys, never shingle text);
    the train side is a distinct hash set, so the membership probe is
    an equi-join on uniform keys — no skew, no quadratic blowup,
    O(test shingles + train shingles) at any SF. A LEFT join with a
    match marker (instead of left-semi + a second totals pass) lets
    ONE aggregation produce both the shingle total (COUNT(*)) and the
    contaminated count (COUNT(marker)) — no re-scan, no final join.
    """
    from .dedup import _shingle_df

    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long"),
        F.lit(10),
    )
    assigned = docs.select("doc_id", bucket.alias("bucket"))
    sh = _shingle_df(spark, sf_dir, 3).select(
        "doc_id", F.md5(F.col("shingle").cast("binary")).alias("h")
    )
    sh_b = sh.join(assigned, "doc_id")
    train_sh = (
        sh_b.filter(F.col("bucket") < 8)
        .select("h")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    test_sh = sh_b.filter(F.col("bucket") == 9).select("doc_id", "h")
    return (
        test_sh.join(train_sh, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("in_train").alias("n_contam"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contam",
            (F.col("n_contam").cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
    )


@register(
    "q79_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    f AS (
      SELECT term, COUNT(*) AS cf FROM toks WHERE term <> '' GROUP BY term
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks WHERE term <> '')
    SELECT term, cf, CAST(cf AS DOUBLE) / n AS support
    FROM f, tot
    WHERE cf * 200 > n
    """,
)
def q79_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens with corpus support above 0.5%.

    The threshold compare is integer (``cf · 200 > n``) so no float
    enters the predicate. At 100 TB the same shape runs with a
    count-min/space-saving sketch as the pre-filter and this exact
    count as the verification pass over the (tiny) candidate set.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    f = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        f.crossJoin(F.broadcast(tot))
        .filter(F.col("cf") * 200 > F.col("n"))
        .select(
            "term", "cf", (F.col("cf").cast("double") / F.col("n")).alias("support")
        )
    )


@register(
    "q96_repetition_score",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id, array_to_string(w[i+1:i+3], ' ') AS shingle
      FROM docs, UNNEST(range(len(w) - 2)) AS u(i)
    ),
    cnt AS (
      SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY doc_id, shingle
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_shingles,
           MAX(c) AS max_repeat,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS repetition
    FROM cnt GROUP BY doc_id
    """,
)
def q96_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-text detector: fraction of a document's 3-gram
    stream owned by its single most-repeated 3-gram.

    Looping/boilerplate generations score near 1; natural text stays
    low — a standard pre-training quality filter. Both aggregation
    levels group by doc_id, so after the first shuffle the second is
    partition-local (no re-exchange); counts are integers, the final
    ratio one identical IEEE division.
    """
    from .dedup import _shingle_df

    sh = _shingle_df(spark, sf_dir, 3, distinct=False)
    cnt = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_shingles"),
        F.max("c").alias("max_repeat"),
        (F.max("c").cast("double") / F.sum("c")).alias("repetition"),
    )


@register(
    "q97_incremental_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q97_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a base rollup (shipdate <
    cutoff) merged with a delta rollup (shipdate >= cutoff) must
    equal the full recompute — which is exactly what the oracle
    checks.

    This is the materialized-view refresh pattern for daily ETL at
    100 TB: only the delta partition is scanned per refresh, and the
    merge is a re-aggregation of partial aggregates. Decimal-exact
    sums are what make the merge bit-identical to a cold recompute
    (IEEE double partials would drift with grouping order).
    """
    li = t(spark, sf_dir, "lineitem")
    cutoff = ts("1997-01-01")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("p_qty"),
            F.count(F.lit(1)).alias("p_n"),
        )

    base = partial(li.filter(F.col("l_shipdate") < cutoff))
    delta = partial(li.filter(F.col("l_shipdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("p_qty").cast("double").alias("sum_qty"),
            F.sum("p_n").alias("n_rows"),
        )
    )


@register(
    "q101_pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                         AS DECIMAL(18,2))) AS DOUBLE) AS O_qty,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_n,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                         AS DECIMAL(18,2))) AS DOUBLE) AS F_qty,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q101_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot with MULTIPLE aggregates per cell: each pivot
    value (linestatus) produces a sum and a count column, named by
    Spark's ``<value>_<agg alias>`` convention.

    Explicit pivot values skip the extra distinct-values job Spark
    otherwise runs before planning — the required form at scale.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            dsum(F.col("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q102_bag_set_ops",
    oracle="""
    WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity >= 25),
    b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_discount >= 0.05),
    i AS (SELECT flag FROM a INTERSECT ALL SELECT flag FROM b),
    e AS (SELECT flag FROM a EXCEPT ALL SELECT flag FROM b)
    SELECT 'intersect_all' AS op, flag, COUNT(*) AS n FROM i GROUP BY flag
    UNION ALL
    SELECT 'except_all' AS op, flag, COUNT(*) AS n FROM e GROUP BY flag
    """,
)
def q102_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicities are min(m, n) and m - n per value — distinct from
    q32/q33's set semantics, and the variant dedup bookkeeping needs
    (how many copies survive, not just which values).
    """
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_discount") >= 0.05).select(F.col("l_returnflag").alias("flag"))
    i = (
        a.intersectAll(b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "flag", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "flag", "n")
    )
    return i.unionByName(e)


@register(
    "q103_explode_outer",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             CASE WHEN vec_id % 7 = 0
                  THEN CAST([] AS DOUBLE[])
                  ELSE CAST(embedding[1:2] AS DOUBLE[]) END AS pair
      FROM embeddings
    )
    SELECT vec_id,
           (FLOOR(CAST(UNNEST(CASE WHEN len(pair) = 0
                             THEN [CAST(NULL AS DOUBLE)]
                             ELSE pair END) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS x
    FROM base
    """,
)
def q103_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with empty arrays survive as NULL
    output rows (plain explode would drop them — silently losing
    every document/vector with no extracted features, the classic
    pipeline bug this operator exists to avoid).

    Every 7th vector's array is emptied to exercise the outer path;
    the oracle emulates outer semantics by substituting [NULL].
    """
    emb = t(spark, sf_dir, "embeddings")
    pair = F.when(
        F.col("vec_id") % 7 == 0,
        F.array().cast("array<double>"),
    ).otherwise(F.slice(F.transform("embedding", lambda x: x.cast("double")), 1, 2))
    return (
        emb.select("vec_id", pair.alias("pair"))
        .select("vec_id", F.explode_outer("pair").alias("raw_x"))
        .select("vec_id", dround("raw_x", 6).alias("x"))
    )


@register(
    "q104_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
           BOOL_OR(l_tax > 0.07) AS any_high_tax,
           BOOL_AND(l_quantity > 0) AS all_positive_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q104_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate forms: per-condition counts (``count_if`` ==
    SQL FILTER clause) and boolean aggregates (``bool_or`` /
    ``bool_and``) — one pass instead of N self-joins or CASE
    pyramids; all partial-aggregatable, so one shuffle as usual.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_nodisc"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
    )


@register(
    "q105_string_agg",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
             AS statuses_csv,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q105_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): distinct
    values collected, sorted, joined — sorted-before-join is what
    makes a collect deterministic across partition orders (a bare
    collect_list would hash differently every run).
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses_csv"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "q106_calendar_fill",
    oracle="""
    WITH spine_days AS (
      SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-30',
                                    INTERVAL 1 DAY)) AS day
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT day, event_type FROM spine_days CROSS JOIN types),
    counts AS (
      SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.day, s.event_type, COALESCE(c.n, 0) AS n_events
    FROM spine s
    LEFT JOIN counts c ON s.day = c.day AND s.event_type = c.event_type
    """,
)
def q106_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine zero fill: a generated (day × event_type) spine
    left-joined to daily counts, so days with no events appear as 0
    instead of vanishing — what dashboards and training-label
    pipelines need on the time axis.

    The spine comes from ``sequence()`` + explode (no driver-side
    loop). The aggregated counts side is broadcast (a left join can
    only build its right side); both are calendar-sized, never
    data-sized.
    """
    ev = t(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)
    counts = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(F.broadcast(counts), ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )


@register(
    "q107_pipeline_funnel",
    oracle="""
    WITH normed AS (
      SELECT doc_id, n_chars,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash
      FROM documents
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars
      FROM normed GROUP BY norm_hash
    ),
    quality AS (SELECT doc_id FROM kept WHERE n_chars >= 200),
    split AS (
      SELECT doc_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
                       AS BIGINT) % 10 < 8
                  THEN 'train' ELSE 'heldout' END AS part
      FROM quality
    )
    SELECT 'raw' AS stage, COUNT(*) AS n FROM documents
    UNION ALL
    SELECT 'deduped', COUNT(*) FROM kept
    UNION ALL
    SELECT 'quality', COUNT(*) FROM quality
    UNION ALL
    SELECT 'train', COUNT(*) FROM split WHERE part = 'train'
    UNION ALL
    SELECT 'heldout', COUNT(*) FROM split WHERE part = 'heldout'
    """,
)
def q107_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the full training-data funnel in one plan —
    normalize → exact dedup on the normalized hash (keep lowest
    doc_id) → length-based quality gate → hash split — reporting the
    survivor count per stage.

    Composition is the point: every stage is one of this engine's
    individually-verified operators (q67, q60, q81-family, q88)
    chained as DataFrames, and Catalyst still plans it as one job.
    All shuffle keys are 32-byte hashes; stage counts are exact.

    Plan shape (round-2): the four post-dedup stages are CONDITIONAL
    counts over one pass of the dedup aggregate — a naive
    branch-per-stage union recomputes the normalize+dedup subtree
    four times (column pruning diverges the branches, defeating
    ReuseExchange), so the funnel is one corpus scan + one wide
    exchange + a stack() unpivot of the 1-row count vector
    (9 exchanges → 2; 1.9 s → ~0.6 s on the sf0.1 bench).
    """
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    normed = docs.select(
        "doc_id", "n_chars", F.md5(norm.cast("binary")).alias("norm_hash")
    )
    kept = normed.groupBy("norm_hash").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_chars").alias("n_chars")
    )
    is_quality = F.col("n_chars") >= 200
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long"),
        F.lit(10),
    )
    counts = kept.agg(
        F.count(F.lit(1)).alias("deduped"),
        F.count(F.when(is_quality, 1)).alias("quality"),
        F.count(F.when(is_quality & (bucket < 8), 1)).alias("train"),
        F.count(F.when(is_quality & (bucket >= 8), 1)).alias("heldout"),
    )
    stacked = counts.select(
        F.expr(
            "stack(4, 'deduped', deduped, 'quality', quality,"
            " 'train', train, 'heldout', heldout) AS (stage, n)"
        )
    )
    raw = docs.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("raw").alias("stage"), "n"
    )
    return raw.unionByName(stacked)


@register(
    "q108_hll_sketch_merge",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_groups,
           COUNT(DISTINCT l_orderkey) AS exact_global,
           TRUE AS est_ok
    FROM lineitem
    """,
)
def q108_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark):
    per-group sketches built with ``hll_sketch_agg`` are merged with
    ``hll_union_agg`` into a global estimate — re-aggregation WITHOUT
    re-scanning, the architecture for incremental distinct counts
    over 100 TB (store per-partition sketch bytes, union on demand).

    Sketch estimates can't hash-match across engines, so the output
    is the checkable invariant (round-1 VERDICT task 7): the merged
    estimate must land within 5% of the exact global distinct.
    """
    li = t(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_global"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_global"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_groups",
        "exact_global",
        (
            F.abs(F.col("est_global") - F.col("exact_global"))
            <= 0.05 * F.col("exact_global")
        ).alias("est_ok"),
    )


@register(
    "q109_fk_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'orders->customer', COUNT(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', COUNT(*) FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'nation->region', COUNT(*) FROM nation n
      WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
    """,
)
def q109_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign
    key in the star schema via anti joins — the ingest-time data-
    quality gate that catches broken upstream extracts before they
    poison downstream joins (orphans silently vanish in inner joins).

    Dimension sides broadcast; the fact-side anti joins are the only
    shuffles and stop probing on first match.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    p = t(spark, sf_dir, "part")

    def orphans(name, child, parent, ck, pk, bcast=True):
        par = F.broadcast(parent.select(pk)) if bcast else parent.select(pk)
        return (
            child.join(par, F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        orphans("lineitem->orders", li, o, "l_orderkey", "o_orderkey", bcast=False)
        .unionByName(orphans("lineitem->part", li, p, "l_partkey", "p_partkey"))
        .unionByName(orphans("orders->customer", o, c, "o_custkey", "c_custkey"))
        .unionByName(orphans("customer->nation", c, n, "c_nationkey", "n_nationkey"))
        .unionByName(orphans("nation->region", n, r, "n_regionkey", "r_regionkey"))
    )


STOPWORDS = ("select", "from", "where", "join", "group")


@register(
    "q110_array_set_ops",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      FROM documents
    )
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_intersect(tk, {list(STOPWORDS)})) AS BIGINT) AS n_stop,
           CAST(len(list_filter(tk,
                x -> NOT list_contains({list(STOPWORDS)}, x))) AS BIGINT)
             AS n_nonstop,
           list_contains(tk, 'select') AS has_select
    FROM toks
    """,
)
def q110_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: per-document distinct-token sets intersected
    / subtracted against a stopword list, plus membership — all
    Catalyst array expressions (no explode, no shuffle; purely
    per-row codegen). Sizes are emitted instead of arrays so element
    order never enters the hash.
    """
    docs = t(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    tk = F.array_distinct(F.split("text", " "))
    return docs.select(
        "doc_id",
        F.size(tk).cast("bigint").alias("n_tokens"),
        F.size(F.array_intersect(tk, stop)).cast("bigint").alias("n_stop"),
        F.size(F.array_except(tk, stop)).cast("bigint").alias("n_nonstop"),
        F.array_contains(tk, "select").alias("has_select"),
    )
