"""Round-7 operators (q501+): winnowing document fingerprints (the
MOSS plagiarism/code-clone primitive missing from the dedup family),
Kendall's tau-b rank concordance (the tie-aware complement of q323's
Spearman-style rank correlation), and vocabulary Gini/Lorenz
concentration (how much of the corpus token mass the head of the
vocabulary holds — the budget question behind vocab-size choices).

Conventions: exact integer/DECIMAL arithmetic until a final division,
ROUND-6 only at the output boundary, NULLIF guards for ANSI division;
no unpartitioned window over a corpus-bound grain
(tests/test_window_audit.py), no unaudited broadcast hint
(tests/test_broadcast_audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, grain_rank, t

# ---------------------------------------------------------------------------
# q501 winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 —
# the MOSS local fingerprinting scheme)

WIN_K = 8  # char k-gram width
WIN_W = 4  # winnowing window (w consecutive k-gram hashes)
# rightmost-tie-break packing: hash 32 hex chars, then a descending
# position key so MIN picks (smallest hash, LARGEST position)
_WIN_POS_BASE = 9_999_999_999


@register(
    "q501_winnowing_fingerprints",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH grams AS (
      SELECT d.doc_id, d.source, r.i AS pos,
             md5(SUBSTRING(d.text, CAST(r.i AS INTEGER), {WIN_K})) AS h
      FROM documents d,
           UNNEST(range(1, GREATEST(LENGTH(d.text) - {WIN_K - 1}, 0) + 1))
             r(i)
    ),
    keyed AS (
      SELECT doc_id, source, pos,
             h || '-' || LPAD(CAST({_WIN_POS_BASE} - pos AS VARCHAR),
                              10, '0') AS key
      FROM grams
    ),
    wins AS (
      SELECT doc_id, source,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN {WIN_W - 1} PRECEDING
                            AND CURRENT ROW) AS wkey,
             pos
      FROM keyed
    ),
    fps AS (
      SELECT DISTINCT doc_id, source,
             SUBSTRING(wkey, 1, 32) AS fp_hash,
             {_WIN_POS_BASE} - CAST(SUBSTRING(wkey, 34, 10) AS BIGINT)
               AS fp_pos
      FROM wins WHERE pos >= {WIN_W}
    ),
    hash_sources AS (
      SELECT fp_hash, COUNT(DISTINCT source) AS n_src
      FROM fps GROUP BY fp_hash
    ),
    per_source AS (
      SELECT f.source,
             COUNT(DISTINCT f.doc_id) AS docs,
             COUNT(*) AS fp_total,
             COUNT(DISTINCT f.fp_hash) AS fp_distinct,
             COUNT(DISTINCT CASE WHEN hs.n_src >= 2 THEN f.fp_hash END)
               AS fp_shared_out
      FROM fps f JOIN hash_sources hs ON hs.fp_hash = f.fp_hash
      GROUP BY f.source
    ),
    chars AS (
      SELECT source, SUM(n_chars) AS total_chars FROM documents
      GROUP BY source
    )
    SELECT p.source,
           CAST(p.docs AS BIGINT) AS docs,
           CAST(p.fp_total AS BIGINT) AS fp_total,
           CAST(p.fp_distinct AS BIGINT) AS fp_distinct,
           CAST(p.fp_shared_out AS BIGINT) AS fp_shared_out,
           (FLOOR(CAST(p.fp_total * 1000.0 / c.total_chars AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS fp_per_kchar
    FROM per_source p JOIN chars c ON c.source = p.source
    ORDER BY p.source
    """,
)
def q501_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust winnowing (Schleimer/Wilkerson/Aiken, the MOSS
    fingerprint): hash every {WIN_K}-char gram, slide a window of
    {WIN_W} consecutive hashes, and record the window minimum with a
    rightmost tie-break — guaranteeing any shared substring of
    length >= {WIN_K + WIN_W - 1} shares a fingerprint, at ~2/(w+1)
    the density of full k-gram sets. The per-source report gives
    fingerprint density and the cross-source shared-hash count — the
    clone/plagiarism signal the MinHash (q62) / SimHash (q63) /
    CDC (q260) family cannot localize to positions.

    Cross-engine exactness: the "hash" is the md5 hex STRING (both
    engines emit lowercase hex), and the rightmost tie-break is
    packed into the key itself (hash || '-' || zero-padded
    descending position), so the window MIN is one lexicographic
    comparison with no engine-specific argmin semantics.

    Scale: the gram explode fans out from the narrow (doc_id, text)
    scan (fan_out); the winnowing window is PARTITIONED BY doc —
    bounded by document length, never corpus-bound; the shared-hash
    join is fingerprint-grain (hash cardinality ≪ gram cardinality
    by the winnowing density guarantee).
    """
    # Explicit short-doc guard: for length(text) < WIN_K, Spark's
    # sequence(1, 0) defaults to step -1 and yields the DESCENDING
    # list [1, 0] — two bogus grams per short doc that only the
    # pos >= WIN_W filter happened to drop. Filter first so the empty
    # case never reaches the explode (DuckDB's range(1, 1) is already
    # empty, so the oracle needs no guard).
    docs = fan_out(
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .filter(F.length("text") >= WIN_K)
    )
    grams = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {WIN_K - 1},"
                f" 0)), i -> md5(substring(text, i, {WIN_K})))"
            )
        ).alias("pos0", "h"),
    ).select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).alias("pos"),
        F.concat(
            F.col("h"),
            F.lit("-"),
            F.lpad((F.lit(_WIN_POS_BASE) - F.col("pos0") - 1).cast("string"),
                   10, "0"),
        ).alias("key"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WIN_W - 1), Window.currentRow)
    )
    fps = (
        grams.withColumn("wkey", F.min("key").over(w))
        .filter(F.col("pos") >= WIN_W)
        .select(
            "doc_id",
            "source",
            F.substring("wkey", 1, 32).alias("fp_hash"),
            (
                F.lit(_WIN_POS_BASE)
                - F.substring("wkey", 34, 10).cast("bigint")
            ).alias("fp_pos"),
        )
        .distinct()
    )
    hash_sources = fps.groupBy("fp_hash").agg(
        F.countDistinct("source").alias("n_src")
    )
    per_source = (
        fps.join(hash_sources, "fp_hash")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("docs"),
            F.count(F.lit(1)).alias("fp_total"),
            F.countDistinct("fp_hash").alias("fp_distinct"),
            F.countDistinct(
                F.when(F.col("n_src") >= 2, F.col("fp_hash"))
            ).alias("fp_shared_out"),
        )
    )
    chars = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("total_chars"))
    )
    return (
        per_source.join(chars, "source")
        .select(
            "source",
            F.col("docs").cast("bigint").alias("docs"),
            F.col("fp_total").cast("bigint").alias("fp_total"),
            F.col("fp_distinct").cast("bigint").alias("fp_distinct"),
            F.col("fp_shared_out").cast("bigint").alias("fp_shared_out"),
            dround(
                F.col("fp_total") * F.lit(1000.0) / F.col("total_chars"), 6
            ).alias("fp_per_kchar"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q502 Kendall's tau-b (Kendall 1938; tau-b tie correction)


@register(
    "q502_kendall_tau",
    category="analytics",
    oracle="""
    WITH m AS (
      SELECT source,
             SUM(n_chars) AS x,
             COUNT(DISTINCT doc_id) AS y
      FROM documents GROUP BY source
    ),
    pairs AS (
      SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      FROM m a JOIN m b ON a.source < b.source
    ),
    cnt AS (
      SELECT
        COUNT(*) AS n0,
        SUM(CASE WHEN (xa > xb AND ya > yb) OR (xa < xb AND ya < yb)
                 THEN 1 ELSE 0 END) AS concordant,
        SUM(CASE WHEN (xa > xb AND ya < yb) OR (xa < xb AND ya > yb)
                 THEN 1 ELSE 0 END) AS discordant,
        SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS ties_x,
        SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS ties_y
      FROM pairs
    )
    SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_items,
           CAST(n0 AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(ties_x AS BIGINT) AS ties_x,
           CAST(ties_y AS BIGINT) AS ties_y,
           (FLOOR(CAST((concordant - discordant)
                 / NULLIF(SQRT(CAST((n0 - ties_x) AS DOUBLE)
                               * CAST((n0 - ties_y) AS DOUBLE)), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS tau_b
    FROM cnt
    """,
)
def q502_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank concordance between two per-source
    corpus metrics (total characters vs document count): the
    tie-aware ordinal-association complement of q323's rank
    correlation — tau's pair-counting definition is exact in
    integers, so the only float is the final tie-corrected division.

    Scale: the pair stage is a self-join at SOURCE grain (the
    group-by output, ~tens of rows for any corpus — sources are a
    design-bounded dimension, not corpus-bound), so the O(n^2) pair
    count is over n = |sources|, never |docs|.
    """
    m = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum("n_chars").alias("x"),
            F.countDistinct("doc_id").alias("y"),
        )
    )
    a = m.select(
        F.col("source").alias("sa"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = m.select(
        F.col("source").alias("sb"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    # Concordance by SIGN comparison, never (xa-xb)*(ya-yb): at corpus
    # scale the char-sum delta (~1e12) times the doc-count delta
    # (~1e7) overflows int64 — Spark wraps silently (misclassified
    # pairs) while DuckDB raises, so the engines would diverge exactly
    # when it matters.
    concordant = ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))) | (
        (F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb"))
    )
    discordant = ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))) | (
        (F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb"))
    )
    cnt = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(concordant, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(discordant, 1).otherwise(0)).alias("discordant"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0)).alias(
            "ties_x"
        ),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0)).alias(
            "ties_y"
        ),
    )
    n_items = m.agg(F.count(F.lit(1)).alias("n_items"))
    return cnt.crossJoin(F.broadcast(n_items)).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n0").cast("bigint").alias("n_pairs"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.col("ties_x").cast("bigint").alias("ties_x"),
        F.col("ties_y").cast("bigint").alias("ties_y"),
        dround(
            (F.col("concordant") - F.col("discordant"))
            / F.nullif(
                F.sqrt(
                    (F.col("n0") - F.col("ties_x")).cast("double")
                    * (F.col("n0") - F.col("ties_y")).cast("double")
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# q503 vocabulary Gini / Lorenz concentration


@register(
    "q503_vocab_gini_lorenz",
    category="llm-corpus-pipeline",
    oracle="""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT word, COUNT(*) AS f FROM words
      WHERE word <> '' GROUP BY word
    ),
    ranked AS (
      SELECT word, f,
             ROW_NUMBER() OVER (ORDER BY f ASC, word ASC) AS rk
      FROM freq
    ),
    tot AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(f AS DECIMAL(38,0))) AS mass,
             SUM(CAST(rk AS DECIMAL(38,0)) * CAST(f AS DECIMAL(38,0)))
               AS rank_mass
      FROM ranked
    ),
    deciles AS (
      SELECT LEAST(10, 1 + CAST(FLOOR(10.0 * (rk - 1)
                                      / (SELECT n FROM tot)) AS INTEGER))
               AS decile,
             COUNT(*) AS types,
             SUM(CAST(f AS DECIMAL(38,0))) AS mass
      FROM ranked GROUP BY 1
    )
    SELECT d.decile,
           CAST(d.types AS BIGINT) AS types,
           CAST(d.mass AS BIGINT) AS mass,
           (FLOOR(CAST(CAST(SUM(d.mass) OVER (ORDER BY d.decile) AS DOUBLE)
                 / CAST(t.mass AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cum_mass_share,
           (FLOOR(CAST((2.0 * CAST(t.rank_mass AS DOUBLE)
                  - (t.n + 1) * CAST(t.mass AS DOUBLE))
                 / (CAST(t.n AS DOUBLE) * CAST(t.mass AS DOUBLE)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS gini
    FROM deciles d CROSS JOIN tot t
    ORDER BY d.decile
    """,
)
def q503_vocab_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration: rank word types by ascending corpus
    frequency and report the Lorenz curve by vocabulary decile plus
    the Gini coefficient Gini = (2·Σ rk·f − (n+1)·Σ f)/(n·Σ f) — the
    "how head-heavy is the token mass" audit behind vocabulary-size
    and tokenizer-budget choices (a Zipfian corpus concentrates most
    mass in the top decile of types).

    Exactness: frequencies and ranks are integers; rk·f products are
    summed as DECIMAL(38,0) (rank ~|V| times freq ~tokens overflows
    BIGINT at scale); the only floats are the two final divisions on
    the 10-row decile grain.

    Scale: the rank is grain_rank (score-bucket local ranks + bounded
    frequency-grain offsets — distinct frequency VALUES ≪ types under
    Zipf), never a global row_number over the vocabulary; the decile
    cumulative window runs over exactly 10 rows.
    """
    words = (
        fan_out(t(spark, sf_dir, "documents").select("text"))
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    ranked = grain_rank(freq, "f", ["word"], descending=False, out="rk")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f").cast("decimal(38,0)"))
        .cast("double")
        .alias("mass_total"),
        F.sum(
            F.col("rk").cast("decimal(38,0)")
            * F.col("f").cast("decimal(38,0)")
        ).alias("rank_mass"),
    )
    deciles = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.least(
                F.lit(10),
                1
                + F.floor(
                    F.lit(10.0) * (F.col("rk") - 1) / F.col("n")
                ).cast("int"),
            ).alias("decile"),
            "f",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("types"),
            F.sum(F.col("f").cast("decimal(38,0)")).alias("mass"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        deciles.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("types").cast("bigint").alias("types"),
            F.col("mass").cast("bigint").alias("mass"),
            dround(
                F.sum(F.col("mass").cast("double")).over(wcum)
                / F.col("mass_total"),
                6,
            ).alias("cum_mass_share"),
            dround(
                (
                    F.lit(2.0) * F.col("rank_mass").cast("double")
                    - (F.col("n") + 1) * F.col("mass_total")
                )
                / (F.col("n").cast("double") * F.col("mass_total")),
                6,
            ).alias("gini"),
        )
        .orderBy("decile")
    )
