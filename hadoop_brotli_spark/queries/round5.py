"""Round-5 expansion operators: deterministic weighted reservoir
sampling, corpus n-gram novelty, balanced shard packing, and the
asymmetric (containment) similarity join — four classic large-scale
training-data-pipeline ops the registry did not yet cover.

Shares the repo's determinism contract (FIXTURES.md): md5-derived
uniforms for anything random (replayable releases), exact integer /
DECIMAL reductions for cross-row sums, the FLOOR(x*1eN + 0.5)/1eN
half-up grid for integer-ratio finals (q325 convention), ln() only
under ROUND-6 (q261 precedent), and total-order tie-breakers on
every ranked output.

Reference parity note: the reference (tesseract2048/hadoop-brotli)
is a compression codec (`BroCodec.java`) with no query surface;
these extend the engine's LLM-data-pipeline layer per SURVEY.md §2b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import fan_out, t

# ---------------------------------------------------------------------------
# q427 weighted reservoir sample (Efraimidis-Spirakis A-Res)
#
# THE one-pass distributed sampling primitive: weighted sampling
# without replacement as a top-K over per-item keys u^(1/w) — each
# executor keeps a local top-K, the merge is a K-row reduce, no
# second pass. We rank by the monotone-equivalent ln(u)/w (larger =
# closer to 0 wins), which avoids cross-engine pow() entirely; ln on
# identical md5-uniform doubles is accepted under ROUND-6 (q261
# precedent), with doc_id breaking grid ties.

RES_K = 20
RES_SALT = "res_r5"


@register(
    "q427_weighted_reservoir_sample",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
             ROUND(
               LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || '|{RES_SALT}'), 1, 13)) AS BIGINT) + 1.0)
                  / {float((1 << 52) + 2)!r})
               / GREATEST(n_chars, 1), 6) AS sample_key
      FROM documents
    )
    SELECT doc_id, source, weight, sample_key,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               ORDER BY sample_key DESC, doc_id ASC) AS rk
      FROM keyed
    ) WHERE rk <= {RES_K}
    """,
)
def q427_weighted_reservoir_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted reservoir sample of {RES_K} documents with weight =
    document length (Efraimidis-Spirakis A-Res): key_i = u_i^(1/w_i),
    keep the top-K keys — the standard one-pass, merge-friendly way
    to draw a length-weighted sample from a stream or a 100 TB
    corpus (each task keeps K rows; the final reduce is K x tasks).

    Ranking uses ln(u)/w (monotone in u^(1/w)) so no cross-engine
    pow(); the uniform is the replayable md5 52-bit draw (q421's
    mechanism) — rerun the query, get the same sample; rotate
    {RES_SALT!r} to re-randomize.

    Scale: TakeOrderedAndProject over a scan — no shuffle of the
    corpus, no window; the only exchange is the K-row top-K merge.
    """
    docs = t(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f"|{RES_SALT}"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / float((1 << 52) + 2)
    keyed = docs.select(
        "doc_id",
        "source",
        w.alias("weight"),
        F.round(F.log(u) / w, 6).alias("sample_key"),
    )
    topk = keyed.orderBy(
        F.col("sample_key").desc(), F.col("doc_id").asc()
    ).limit(RES_K)
    wr = Window.orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
    return topk.withColumn("rk", F.row_number().over(wr).cast("bigint"))


# ---------------------------------------------------------------------------
# q428 n-gram novelty (within-corpus self-overlap)
#
# The diversity-side complement of q394's train/test leakage audit:
# what share of each document's distinct word-trigram TYPES appears
# in no other document? Low novelty = templated/boilerplate-heavy
# sources (the thing repeated-ngram filters and Self-BLEU measure on
# generations). Everything reduces to trigram-TYPE grain — and per
# the r5 broadcast audit, the vocabulary-grain df table is joined
# WITHOUT a broadcast hint.

NOV_MIN_WORDS = 3


@register(
    "q428_ngram_novelty",
    category="llm-corpus-pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    tris AS (
      SELECT DISTINCT doc_id, source,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
      FROM (
        SELECT doc_id, source, w,
               UNNEST(generate_series(1, len(w) - 2)) AS i
        FROM base
      )
    ),
    df AS (SELECT tri, COUNT(*) AS d FROM tris GROUP BY tri),
    per_doc AS (
      SELECT t.doc_id, t.source,
             COUNT(*) AS n_tris,
             SUM(CASE WHEN f.d = 1 THEN 1 ELSE 0 END) AS n_novel,
             FLOOR(CAST(SUM(CASE WHEN f.d = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*) * 1e9 + 0.5) / 1e9
               AS novelty
      FROM tris t JOIN df f ON f.tri = t.tri
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tris) AS BIGINT) AS n_tris,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           FLOOR(CAST(SUM(CAST(novelty AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_novelty
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def q428_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: the share of each document's
    distinct word trigrams that occur in NO other document, averaged
    per source — the templated-content detector (a source whose docs
    share most trigrams scores near 0) and the within-corpus
    Self-BLEU analogue.

    Determinism: counts are exact integers; the per-doc ratio and
    the per-source mean both land on the FLOOR half-up grid (q325
    convention) with a DECIMAL(28,9) order-free sum between them.

    Scale: distinct (doc, trigram) pairs reduce map-side; the df
    table is trigram-TYPE grain and therefore joined with NO
    broadcast hint (r5 audit rule) — AQE picks the strategy; the
    final rollup is source-grain.
    """
    base = fan_out(
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= NOV_MIN_WORDS)
    )
    tris = base.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', element_at(w, i),"
                    " element_at(w, i + 1), element_at(w, i + 2)))"
                )
            )
        ).alias("tri"),
    )
    df = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("d"))
    per_doc = (
        # trigram-TYPE-grain df: no broadcast hint (r5 audit rule)
        tris.join(df, "tri")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tris"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.floor(
                F.col("n_novel").cast("double") / F.col("n_tris") * 1e9
                + F.lit(0.5)
            )
            / 1e9,
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tris").cast("bigint").alias("n_tris"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            (
                F.floor(
                    F.sum(F.col("novelty").cast("decimal(28,9)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("mean_novelty"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q429 balanced shard packing (serpentine LPT)
#
# The "write N balanced output files" operator every corpus
# materialization step needs: order documents by token count within
# each source, deal them serpentine (0..N-1, N-1..0, ...) across N
# shards — the deterministic, shuffle-light approximation of
# longest-processing-time bin packing (serpentine dealing bounds the
# max-min spread by one document per round) — and report the
# realized per-shard load plus the spread the skew would cost.

PACK_SHARDS = 8


@register(
    "q429_balanced_shard_packing",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY len(string_split(text, ' ')) DESC, doc_id ASC
             ) - 1 AS pos
      FROM documents
    ),
    dealt AS (
      SELECT *,
             CASE WHEN pos % {2 * PACK_SHARDS} < {PACK_SHARDS}
                  THEN pos % {2 * PACK_SHARDS}
                  ELSE {2 * PACK_SHARDS - 1} - pos % {2 * PACK_SHARDS}
             END AS shard
      FROM sized
    ),
    loads AS (
      SELECT source, shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tokens
      FROM dealt GROUP BY source, shard
    )
    SELECT source, CAST(shard AS BIGINT) AS shard, n_docs, tokens,
           CAST(MAX(tokens) OVER (PARTITION BY source)
                - MIN(tokens) OVER (PARTITION BY source) AS BIGINT)
             AS spread
    FROM loads
    ORDER BY source, shard
    """,
)
def q429_balanced_shard_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Serpentine token-balanced sharding: within each source, rank
    documents by token count (ties on doc_id) and deal them
    boustrophedon across {PACK_SHARDS} shards, reporting per-shard
    document counts, token loads, and the per-source max-min token
    spread — the deterministic planner for "write N equal training
    files per source" (straggler shards = wasted accelerator time).

    All-integer outputs: rank, modulo dealing, and integer sums —
    nothing to round.

    Scale: the only wide op is a per-source sort window (sources
    partition the corpus; within-source ranking is the operator's
    semantics). The final spread is a {PACK_SHARDS}-row-per-source
    window.
    """
    sized = fan_out(
        t(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
    )
    wrank = Window.partitionBy("source").orderBy(
        F.col("n_tok").desc(), F.col("doc_id").asc()
    )
    dealt = sized.withColumn(
        "pos", F.row_number().over(wrank) - 1
    ).withColumn(
        "shard",
        F.when(
            F.col("pos") % (2 * PACK_SHARDS) < PACK_SHARDS,
            F.col("pos") % (2 * PACK_SHARDS),
        ).otherwise(
            (2 * PACK_SHARDS - 1) - F.col("pos") % (2 * PACK_SHARDS)
        ),
    )
    loads = dealt.groupBy("source", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens"),
    )
    wsrc = Window.partitionBy("source")
    return (
        loads.select(
            "source",
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "tokens",
            (F.max("tokens").over(wsrc) - F.min("tokens").over(wsrc))
            .cast("bigint")
            .alias("spread"),
        )
        .orderBy("source", "shard")
    )


# ---------------------------------------------------------------------------
# q430 shingle containment join (asymmetric near-duplicate detection)
#
# Jaccard (q230) misses the QUOTE/SUBSET case: a short document
# wholly contained in a long one has tiny Jaccard but containment
# C(A->B) = |S(A) ∩ S(B)| / |S(A)| ≈ 1. The prefix filter adapts
# asymmetrically: if C(A->B) >= T = 4/5, B must contain one of A's
# floor(|A|/5) + 1 RAREST shingles (EXACT-integer bound; the float
# form floor((1-T)*|A|)+1 under-counts exactly when C sits on the
# 4/5 boundary, because double 0.8 < 4/5) — so only A's rare prefix
# probes the posting lists, and the exact verify runs on candidates
# only. The oracle computes the UNPRUNED pair set, certifying the
# pruning lossless.

CONT_NUM, CONT_DEN = 4, 5  # containment threshold 4/5, EXACT integers
CONT_T = CONT_NUM / CONT_DEN  # display only


@register(
    "q430_containment_join",
    category="dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
      FROM (
        SELECT doc_id, w, UNNEST(generate_series(1, len(w) - 2)) AS i
        FROM base
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS isz
      FROM sh a JOIN sh b ON b.tri = a.tri AND b.doc_id <> a.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.isz AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS n_a,
           FLOOR(CAST(i.isz AS DOUBLE) / sa.n * 1e6 + 0.5) / 1e6
             AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
    -- EXACT integer threshold: isz/n >= {CONT_NUM}/{CONT_DEN}
    WHERE i.isz * {CONT_DEN} >= sa.n * {CONT_NUM}
    ORDER BY doc_a, doc_b
    """,
)
def q430_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment self-join on word-trigram shingles:
    emit every ORDERED pair (A, B) with |S(A) ∩ S(B)| / |S(A)| >=
    {CONT_T} — the quote/subset detector that catches a document
    embedded inside a longer one, which symmetric Jaccard (q230)
    structurally under-scores.

    Pruning (exact, certified by the unpruned oracle): rank each
    A's shingles rarest-first by global document frequency (ties on
    the shingle); if the containment bound holds, B shares one of
    A's first floor(|A|/{CONT_DEN}) + 1 shingles (exact-integer
    bound — see the module comment), so only that prefix probes the
    posting lists. Candidates then verify with an
    exact intersection count.

    Determinism: intersection and set sizes are exact integers; the
    threshold is the EXACT integer comparison isz*{CONT_DEN} >=
    n*{CONT_NUM}; containment lands on the FLOOR half-up grid for
    display only.

    Scale: the df ranking join and posting-list probes are
    shingle-TYPE grain — no broadcast hints (r5 audit rule); prefix
    shingles are globally rare, so their posting lists are the short
    ones (q230's rare-first argument, made one-sided). Output is
    legitimately quadratic only inside true duplicate families —
    compose after exact dedup (q60), as q230 documents.
    """
    base = fan_out(
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
    )
    sh = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', element_at(w, i),"
                    " element_at(w, i + 1), element_at(w, i + 2)))"
                )
            )
        ).alias("tri"),
    )
    dfreq = sh.groupBy("tri").agg(F.count(F.lit(1)).alias("df"))
    wtok = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("tri").asc()
    )
    ranked = (
        # shingle-TYPE-grain df: no broadcast hint (r5 audit rule)
        sh.join(dfreq, "tri").select(
            "doc_id",
            "tri",
            F.row_number().over(wtok).alias("pos"),
            F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
        )
    )
    prefix = ranked.filter(
        F.col("pos") <= F.floor(F.col("n") / F.lit(CONT_DEN)) + 1
    ).select(F.col("doc_id").alias("doc_a"), "tri", F.col("n").alias("n_a"))
    cand = (
        prefix.join(
            sh.select(F.col("doc_id").alias("doc_b"), "tri"), "tri"
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "tri")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "tri")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "tri"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isz"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), "n"), "doc_a"
        )
        .filter(F.col("isz") * CONT_DEN >= F.col("n") * CONT_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.col("isz").cast("bigint").alias("n_shared"),
            F.col("n").cast("bigint").alias("n_a"),
            (
                F.floor(
                    F.col("isz").cast("double") / F.col("n") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q431 join-order advisor (CBO statistics op)
#
# The ANALYZE TABLE + cost-model step every catalyst-style optimizer
# runs: exact row counts and join-key NDVs for the lineitem ⋈ orders
# ⋈ customer star, textbook intermediate-cardinality estimates
# |R ⋈ S| = |R|·|S| / max(ndv_R(k), ndv_S(k)) for both bushy-free
# orders, and the recommended order = argmin estimated intermediate.
# All-integer arithmetic (BIGINT products, FLOOR division) — nothing
# to round, nothing engine-defined.


@register(
    "q431_join_order_advisor",
    category="relational",
    oracle="""
    WITH s AS (
      SELECT
        (SELECT COUNT(*) FROM lineitem) AS n_l,
        (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_l_ok,
        (SELECT COUNT(*) FROM orders) AS n_o,
        (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_o_ok,
        (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ndv_o_ck,
        (SELECT COUNT(*) FROM customer) AS n_c,
        (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS ndv_c_ck
    ),
    est AS (
      SELECT *,
        CAST(FLOOR(CAST(n_l AS DOUBLE) * n_o
             / GREATEST(ndv_l_ok, ndv_o_ok)) AS BIGINT) AS est_lo,
        CAST(FLOOR(CAST(n_o AS DOUBLE) * n_c
             / GREATEST(ndv_o_ck, ndv_c_ck)) AS BIGINT) AS est_oc
      FROM s
    )
    SELECT n_l, ndv_l_ok, n_o, ndv_o_ok, ndv_o_ck, n_c, ndv_c_ck,
           est_lo, est_oc,
           CASE WHEN est_lo <= est_oc THEN '(lineitem*orders)*customer'
                ELSE 'lineitem*(orders*customer)' END AS recommended
    FROM est
    """,
)
def q431_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join-order advisor over the L ⋈ O ⋈ C star: exact
    table cardinalities + join-key NDVs (the statistics ANALYZE
    TABLE collects), textbook first-join cardinality estimates for
    both left-deep orders, and the recommended order — the
    explainable core of what Catalyst's CBO does with the same
    numbers at plan time.

    Determinism: counts and NDVs are exact integers; estimates are
    one FLOOR'd division each; the tie prefers the (L*O) order.

    Scale: three scans with partial countDistinct aggregates (no
    joins executed — the advisor costs them without running them);
    output is one row.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    sl = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_l"),
        F.countDistinct("l_orderkey").cast("bigint").alias("ndv_l_ok"),
    )
    so = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_o"),
        F.countDistinct("o_orderkey").cast("bigint").alias("ndv_o_ok"),
        F.countDistinct("o_custkey").cast("bigint").alias("ndv_o_ck"),
    )
    sc = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.countDistinct("c_custkey").cast("bigint").alias("ndv_c_ck"),
    )
    est_lo = F.floor(
        F.col("n_l").cast("double")
        * F.col("n_o")
        / F.greatest("ndv_l_ok", "ndv_o_ok")
    ).cast("bigint")
    est_oc = F.floor(
        F.col("n_o").cast("double")
        * F.col("n_c")
        / F.greatest("ndv_o_ck", "ndv_c_ck")
    ).cast("bigint")
    return (
        sl.crossJoin(F.broadcast(so))
        .crossJoin(F.broadcast(sc))
        .select(
            "n_l", "ndv_l_ok", "n_o", "ndv_o_ok", "ndv_o_ck",
            "n_c", "ndv_c_ck",
            est_lo.alias("est_lo"),
            est_oc.alias("est_oc"),
            F.when(
                est_lo <= est_oc, F.lit("(lineitem*orders)*customer")
            )
            .otherwise(F.lit("lineitem*(orders*customer)"))
            .alias("recommended"),
        )
    )


# ---------------------------------------------------------------------------
# q432 incremental view maintenance (delta merge == full recompute)
#
# The correctness contract of every materialized-view / streaming-agg
# engine: maintaining an aggregate from (base, delta) partitions must
# equal recomputing from scratch. Split events at a date boundary,
# maintain per-type (count, DECIMAL sum, min, max) both ways, emit
# both plus the equality flag — a row with ivm_ok = false is an IVM
# bug by construction (insert-only deltas keep min/max mergeable).

IVM_SPLIT = "2024-02-15"


@register(
    "q432_ivm_delta_merge",
    category="relational",
    oracle=f"""
    WITH base AS (
      SELECT event_type, COUNT(*) AS c,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DECIMAL(28,2))
               AS s,
             MIN(value) AS mn, MAX(value) AS mx
      FROM events WHERE ts < TIMESTAMP '{IVM_SPLIT}'
      GROUP BY event_type
    ),
    delta AS (
      SELECT event_type, COUNT(*) AS c,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DECIMAL(28,2))
               AS s,
             MIN(value) AS mn, MAX(value) AS mx
      FROM events WHERE ts >= TIMESTAMP '{IVM_SPLIT}'
      GROUP BY event_type
    ),
    merged AS (
      SELECT COALESCE(b.event_type, d.event_type) AS event_type,
             COALESCE(b.c, 0) + COALESCE(d.c, 0) AS m_count,
             CAST(COALESCE(b.s, 0) + COALESCE(d.s, 0)
                  AS DECIMAL(28,2)) AS m_sum,
             LEAST(COALESCE(b.mn, d.mn), COALESCE(d.mn, b.mn)) AS m_min,
             GREATEST(COALESCE(b.mx, d.mx), COALESCE(d.mx, b.mx)) AS m_max
      FROM base b FULL OUTER JOIN delta d ON d.event_type = b.event_type
    ),
    full_v AS (
      SELECT event_type, COUNT(*) AS f_count,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DECIMAL(28,2))
               AS f_sum,
             MIN(value) AS f_min, MAX(value) AS f_max
      FROM events GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.m_count AS BIGINT) AS m_count,
           CAST(m.m_sum AS DOUBLE) AS m_sum, m.m_min, m.m_max,
           CAST(f.f_count AS BIGINT) AS f_count,
           CAST(f.f_sum AS DOUBLE) AS f_sum, f.f_min, f.f_max,
           (m.m_count = f.f_count AND m.m_sum = f.f_sum
            AND m.m_min = f.f_min AND m.m_max = f.f_max) AS ivm_ok
    FROM merged m JOIN full_v f ON f.event_type = m.event_type
    ORDER BY m.event_type
    """,
)
def q432_ivm_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance check: the per-event-type
    (count, sum, min, max) aggregate maintained by merging a BASE
    partition (ts < {IVM_SPLIT}) with an insert-only DELTA
    (ts >= {IVM_SPLIT}) must equal the full recompute — emitted side
    by side with an ivm_ok flag, the invariant a materialized-view
    engine (or this repo's foreachBatch upsert sink) must keep.

    Determinism: counts are integers; sums go through DECIMAL(28,2)
    (order-free) and cast to double only for display; min/max are
    exact.

    Scale: two filtered partial aggregates + a type-grain merge join
    — the delta side is what a streaming micro-batch would be; the
    full recompute exists only to certify the merge.
    """
    ev = t(spark, sf_dir, "events")
    split = F.lit(IVM_SPLIT).cast("timestamp")

    def agg(df, pre):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"{pre}c"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("decimal(28,2)")
            .alias(f"{pre}s"),
            F.min("value").alias(f"{pre}mn"),
            F.max("value").alias(f"{pre}mx"),
        )

    base = agg(ev.filter(F.col("ts") < split), "b")
    delta = agg(ev.filter(F.col("ts") >= split), "d")
    merged = (
        base.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0)))
            .cast("bigint")
            .alias("m_count"),
            (
                F.coalesce(F.col("bs"), F.lit(0).cast("decimal(28,2)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(28,2)"))
            )
            .cast("decimal(28,2)")
            .alias("m_sum_dec"),
            F.least(
                F.coalesce("bmn", F.col("dmn")),
                F.coalesce("dmn", F.col("bmn")),
            ).alias("m_min"),
            F.greatest(
                F.coalesce("bmx", F.col("dmx")),
                F.coalesce("dmx", F.col("bmx")),
            ).alias("m_max"),
        )
    )
    full_v = agg(ev, "f").select(
        "event_type",
        F.col("fc").cast("bigint").alias("f_count"),
        F.col("fs").alias("f_sum_dec"),
        F.col("fmn").alias("f_min"),
        F.col("fmx").alias("f_max"),
    )
    return (
        merged.join(full_v, "event_type")
        .select(
            "event_type",
            "m_count",
            F.col("m_sum_dec").cast("double").alias("m_sum"),
            "m_min",
            "m_max",
            "f_count",
            F.col("f_sum_dec").cast("double").alias("f_sum"),
            "f_min",
            "f_max",
            (
                (F.col("m_count") == F.col("f_count"))
                & (F.col("m_sum_dec") == F.col("f_sum_dec"))
                & (F.col("m_min") == F.col("f_min"))
                & (F.col("m_max") == F.col("f_max"))
            ).alias("ivm_ok"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q433 compaction planner (small-file OPTIMIZE scheduling)
#
# The table-maintenance op behind Delta/Iceberg OPTIMIZE: given a
# directory of files (simulated here as (source, doc_id % 16)
# byte-size groups), plan sequential compaction jobs that fill to a
# byte target, and report the realized job sizes — the planner whose
# output decides how many tasks a compaction run schedules.

COMPACT_TARGET = 120_000  # bytes per compaction job
COMPACT_BUCKETS = 16


@register(
    "q433_compaction_planner",
    category="sources-sinks",
    oracle=f"""
    WITH files AS (
      SELECT source, doc_id % {COMPACT_BUCKETS} AS file_id,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY source, doc_id % {COMPACT_BUCKETS}
    ),
    planned AS (
      SELECT source, file_id, bytes,
             CAST(FLOOR(
               (SUM(bytes) OVER (PARTITION BY source ORDER BY file_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS NULL)::INT * 0
               + COALESCE(SUM(bytes) OVER (PARTITION BY source
                   ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) / {COMPACT_TARGET}) AS BIGINT) AS job
      FROM files
    )
    SELECT source, CAST(job AS BIGINT) AS job,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS job_bytes
    FROM planned
    GROUP BY source, job
    ORDER BY source, job
    """,
)
def q433_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: files (simulated as
    (source, doc_id % {COMPACT_BUCKETS}) byte-size groups) are
    assigned to sequential compaction jobs by the running-sum rule
    job = floor(bytes_before / {COMPACT_TARGET}) within each source
    — the deterministic schedule a Delta-style OPTIMIZE run executes,
    with per-job file counts and realized bytes (over-target jobs =
    one oversized file; under-target tail = the remainder).

    Determinism: byte sizes, running sums, and job ids are exact
    integers end to end.

    Scale: one file-grain aggregate, one per-source running-sum
    window (files per source are bounded by the layout, not the
    corpus), one job-grain rollup.
    """
    files = (
        fan_out(t(spark, sf_dir, "documents"))
        .groupBy(
            "source",
            (F.col("doc_id") % COMPACT_BUCKETS).alias("file_id"),
        )
        .agg(F.sum("n_chars").cast("bigint").alias("bytes"))
    )
    wrun = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "job",
        F.floor(
            F.coalesce(F.sum("bytes").over(wrun), F.lit(0))
            / COMPACT_TARGET
        ).cast("bigint"),
    )
    return (
        planned.groupBy("source", "job")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("job_bytes"),
        )
        .orderBy("source", "job")
    )


# ---------------------------------------------------------------------------
# q434 grouped train/val/test split (leakage-free by construction)
#
# q394 AUDITS split leakage; this op CREATES the split the way a
# leakage-safe pipeline must: assign whole GROUPS (users), never
# rows, by hashing the group key into 80/10/10 — then certify
# in-query that zero groups span splits and report the realized row
# shares (which drift from 80/10/10 exactly as much as group-size
# skew dictates — the number a naive row-wise splitter hides).

SPLIT_SALT = "split_r5"


@register(
    "q434_grouped_split",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                    || '|{SPLIT_SALT}'), 1, 13)) AS BIGINT) % 10 < 8
                 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                    || '|{SPLIT_SALT}'), 1, 13)) AS BIGINT) % 10 = 8
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    rows_ AS (
      SELECT a.split, e.user_id, COUNT(*) AS n
      FROM events e JOIN assign a ON a.user_id = e.user_id
      GROUP BY a.split, e.user_id
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM rows_)
    SELECT r.split,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(r.n) AS BIGINT) AS n_rows,
           FLOOR(CAST(SUM(r.n) AS DOUBLE) / t.n_total * 1e6 + 0.5)
             / 1e6 AS row_share,
           CAST(0 AS BIGINT) AS n_leaky_groups
    FROM rows_ r CROSS JOIN tot t
    GROUP BY r.split, t.n_total
    ORDER BY r.split
    """,
)
def q434_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped 80/10/10 train/val/test split over events: whole
    users are hashed (replayable md5, salt {SPLIT_SALT!r}) into a
    split, so no user's rows can leak across the boundary — with
    the leakage count certified in-query (a user keyed by a
    non-deterministic assignment would show up here as
    n_leaky_groups > 0) and realized ROW shares reported, since
    group-size skew is exactly why row shares drift off 80/10/10.

    Determinism: md5 bucket arithmetic is integer; row shares land
    on the FLOOR half-up grid.

    Scale: one distinct-user reduce, one user-grain join (no
    broadcast hint — user-grain grows with the corpus), split-grain
    rollup.
    """
    ev = t(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(f"|{SPLIT_SALT}"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(h < 8, F.lit("train"))
            .when(h == 8, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
    per_user = (
        # user-grain assignment table: no broadcast hint (r5 audit)
        ev.join(assign, "user_id")
        .groupBy("split", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per_user.agg(F.sum("n").cast("bigint").alias("n_total"))
    leaky = (
        per_user.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaky"))
    )
    return (
        per_user.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leaky))
        .select(
            "split",
            "n_groups",
            "n_rows",
            (
                F.floor(
                    F.col("n_rows").cast("double") / F.col("n_total")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("row_share"),
            F.col("n_leaky").alias("n_leaky_groups"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q435 calendar gap-fill with linear interpolation
#
# q106 fills missing days with zeros; real time-series prep
# INTERPOLATES. The cross-engine trap is IGNORE NULLS window support,
# so both engines use the same engine-neutral construction: a running
# count of PRESENT days indexes each gap day to its previous present
# neighbor, and neighbor+1 is the next one — two equi-joins after one
# window, no IGNORE NULLS anywhere.


@register(
    "q435_gap_fill_interpolate",
    category="relational",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-03-01'
      GROUP BY CAST(o_orderdate AS DATE)
    ),
    present AS (
      SELECT day, revenue,
             ROW_NUMBER() OVER (ORDER BY day) AS idx
      FROM daily
    ),
    spine AS (
      SELECT UNNEST(generate_series(DATE '1995-01-01',
                                    DATE '1995-02-28',
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    runs AS (
      SELECT s.day, p.revenue,
             SUM(CASE WHEN p.day IS NOT NULL THEN 1 ELSE 0 END)
               OVER (ORDER BY s.day) AS run
      FROM spine s LEFT JOIN present p ON p.day = s.day
    )
    SELECT r.day,
           CASE
             WHEN r.revenue IS NOT NULL THEN r.revenue
             WHEN p1.day IS NULL OR p2.day IS NULL THEN NULL
             ELSE FLOOR((p1.revenue
                  + (p2.revenue - p1.revenue)
                    * (r.day - p1.day) / (p2.day - p1.day))
                  * 1e6 + 0.5) / 1e6
           END AS revenue,
           (r.revenue IS NULL) AS interpolated
    FROM runs r
    LEFT JOIN present p1 ON p1.idx = r.run
    LEFT JOIN present p2 ON p2.idx = r.run + 1
    ORDER BY r.day
    """,
)
def q435_gap_fill_interpolate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily-revenue calendar fill with LINEAR interpolation over
    Jan-Feb 1995: missing days get the straight line between their
    nearest present neighbors (NULL outside the observed range) —
    the resampling step time-series models need where q106's
    zero-fill would fabricate collapses.

    Engine-neutral neighbor lookup: a running count of present days
    gives every gap day the INDEX of its previous present day; the
    previous/next values arrive by two equi-joins on that index —
    no IGNORE NULLS window forms (which the two engines support
    differently).

    Determinism: daily revenue is a DECIMAL sum; the interpolation
    is one expression over identical doubles with integer day
    deltas, landed on the FLOOR half-up grid.

    Scale: one date-bounded aggregate, one running-count window over
    a calendar-sized spine, two spine-grain equi-joins.
    """
    o = t(spark, sf_dir, "orders")
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    present = daily.withColumn(
        "idx", F.row_number().over(Window.orderBy("day"))
    )
    spine = o.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-02-28").cast("date"),
            )
        ).alias("day")
    )
    runs = (
        spine.join(present.select("day", "revenue"), "day", "left")
        .withColumn(
            "run",
            F.sum(
                F.when(F.col("revenue").isNotNull(), 1).otherwise(0)
            ).over(Window.orderBy("day")),
        )
    )
    p1 = present.select(
        F.col("idx").alias("run"),
        F.col("day").alias("d1"),
        F.col("revenue").alias("v1"),
    )
    p2 = present.select(
        (F.col("idx") - 1).alias("run"),
        F.col("day").alias("d2"),
        F.col("revenue").alias("v2"),
    )
    interp = F.floor(
        (
            F.col("v1")
            + (F.col("v2") - F.col("v1"))
            * F.datediff("day", "d1")
            / F.datediff("d2", "d1")
        )
        * 1e6
        + F.lit(0.5)
    ) / 1e6
    return (
        runs.join(p1, "run", "left")
        .join(p2, "run", "left")
        .select(
            "day",
            F.when(F.col("revenue").isNotNull(), F.col("revenue"))
            .when(F.col("d1").isNull() | F.col("d2").isNull(), F.lit(None))
            .otherwise(interp)
            .alias("revenue"),
            F.col("revenue").isNull().alias("interpolated"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q436 SCD Type-2 dimension build
#
# The warehouse-classic slowly-changing-dimension op q294's CDC
# compaction does NOT cover: turn an event stream into versioned
# dimension rows with validity intervals. The tracked attribute is
# the user's spend tier (value // 25); consecutive same-tier events
# collapse, each change opens a new version row.

SCD_TIER = 25


@register(
    "q436_scd2_dimension",
    category="relational",
    oracle=f"""
    WITH tiers AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value / {SCD_TIER}) AS BIGINT) AS tier,
             LAG(CAST(FLOOR(value / {SCD_TIER}) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
      FROM events
    ),
    changes AS (
      SELECT user_id, event_id, ts, tier,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM tiers
      WHERE prev_tier IS NULL OR tier <> prev_tier
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, tier,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM changes
    ORDER BY user_id, version
    """,
)
def q436_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from the event stream: per user,
    version rows for every spend-tier (value // {SCD_TIER}) change,
    with [valid_from, valid_to) intervals and an is_current flag —
    the versioned-dimension shape every warehouse join-as-of relies
    on, and the missing sibling of q294 (which compacts ops) and
    q16 (which consumes such intervals as-of).

    Determinism: tiers are integer divisions; (ts, event_id) is a
    total order, so duplicate timestamps version identically.

    Scale: two user-partitioned windows over the stream, second one
    over change rows only — no joins, no self-products.
    """
    ev = t(spark, sf_dir, "events")
    tier = F.floor(F.col("value") / SCD_TIER).cast("bigint")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiers = ev.select(
        "user_id", "event_id", "ts", tier.alias("tier")
    ).withColumn("prev_tier", F.lag("tier").over(wu))
    changes = (
        tiers.filter(
            F.col("prev_tier").isNull()
            | (F.col("tier") != F.col("prev_tier"))
        )
        .withColumn("version", F.row_number().over(wu))
    )
    return (
        changes.select(
            "user_id",
            F.col("version").cast("bigint").alias("version"),
            "tier",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wu).alias("valid_to"),
            F.lead("ts").over(wu).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# q437 blocking-quality audit (reduction ratio / pair completeness)
#
# Entity-resolution meta-op: BEFORE running an expensive matcher,
# audit the blocking scheme. Truth pairs = same (lang, source);
# blocking key = n_chars // 50. Both metrics come from GROUP SIZES
# via C(g,2) integer sums — no pair is ever materialized, which is
# the whole point of auditing blocking at 100 TB.

BLOCK_WIDTH = 50


@register(
    "q437_blocking_quality",
    category="dedup",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang, source,
             -- FLOOR, not bare CAST: DuckDB / is float division
             -- and CAST(double AS BIGINT) ROUNDS (cookbook trap)
             CAST(FLOOR(n_chars / {BLOCK_WIDTH}.0) AS BIGINT) AS blk
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sized),
    truth AS (
      SELECT CAST(SUM((g * (g - 1)) // 2) AS BIGINT) AS true_pairs
      FROM (SELECT COUNT(*) AS g FROM sized GROUP BY lang, source)
    ),
    cand AS (
      SELECT CAST(SUM((g * (g - 1)) // 2) AS BIGINT) AS cand_pairs
      FROM (SELECT COUNT(*) AS g FROM sized GROUP BY blk)
    ),
    hit AS (
      SELECT CAST(SUM((g * (g - 1)) // 2) AS BIGINT) AS hit_pairs
      FROM (SELECT COUNT(*) AS g FROM sized
            GROUP BY lang, source, blk)
    )
    SELECT n.n_docs,
           CAST((n.n_docs * (n.n_docs - 1)) // 2 AS BIGINT) AS all_pairs,
           t.true_pairs, c.cand_pairs, h.hit_pairs,
           FLOOR((1.0 - CAST(c.cand_pairs AS DOUBLE)
                  / ((n.n_docs * (n.n_docs - 1)) // 2)) * 1e6 + 0.5)
             / 1e6 AS reduction_ratio,
           FLOOR(CAST(h.hit_pairs AS DOUBLE)
                 / NULLIF(t.true_pairs, 0) * 1e6 + 0.5) / 1e6
             AS pair_completeness
    FROM n, truth t, cand c, hit h
    """,
)
def q437_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit for entity resolution: REDUCTION RATIO
    (share of the all-pairs space the {BLOCK_WIDTH}-char-bucket
    blocking scheme prunes) and PAIR COMPLETENESS (share of truth
    pairs — same (lang, source) — the blocks retain). The
    pre-flight check that decides whether a matcher is affordable,
    computed entirely from group sizes via sum-of-C(g,2) — NO pair
    is ever materialized, so the audit itself runs at any scale.

    Determinism: every count is an exact integer; the two ratios
    land on the FLOOR half-up grid; zero truth pairs NULL the
    completeness on both engines.

    Scale: three group-size aggregates and a four-scalar join.
    """
    sized = t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / BLOCK_WIDTH).cast("bigint").alias("blk"),
    )

    def pair_sum(df, cols, name):
        return (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("g"))
            .agg(
                # g*(g-1) is even; shiftright halves it in LONG
                # arithmetic — exact past 2^53 where double / 2 isn't
                F.sum(F.shiftright(F.col("g") * (F.col("g") - 1), 1))
                .cast("bigint")
                .alias(name)
            )
        )

    n = sized.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    truth = pair_sum(sized, ["lang", "source"], "true_pairs")
    cand = pair_sum(sized, ["blk"], "cand_pairs")
    hit = pair_sum(sized, ["lang", "source", "blk"], "hit_pairs")
    all_pairs = F.shiftright(
        F.col("n_docs") * (F.col("n_docs") - 1), 1
    ).cast("bigint")
    return (
        n.crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(hit))
        .select(
            "n_docs",
            all_pairs.alias("all_pairs"),
            "true_pairs",
            "cand_pairs",
            "hit_pairs",
            (
                F.floor(
                    (
                        1.0
                        - F.col("cand_pairs").cast("double")
                        / F.shiftright(
                            F.col("n_docs") * (F.col("n_docs") - 1), 1
                        )
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("reduction_ratio"),
            (
                F.floor(
                    F.col("hit_pairs").cast("double")
                    / F.nullif(F.col("true_pairs"), F.lit(0))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("pair_completeness"),
        )
    )


# ---------------------------------------------------------------------------
# q438 decile gains / lift table
#
# The model-eval table every targeting campaign reads: rank users by
# a score (here: click count, a deterministic behavioral proxy),
# split into explicit deciles (FLOOR((rank-1)*10/n) — NOT ntile, so
# the remainder rule is pinned), report per-decile positives,
# cumulative capture, and lift over the base rate.


@register(
    "q438_decile_gains",
    category="ml-eval-calibration",
    oracle="""
    WITH users AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS score,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS label
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC)
               AS rk,
             (SELECT COUNT(*) FROM users) AS n,
             (SELECT SUM(label) FROM users) AS n_pos
      FROM users
    ),
    deciled AS (
      -- FLOOR, not bare CAST: DuckDB / is float division and
      -- CAST(double AS BIGINT) ROUNDS (cookbook trap)
      SELECT CAST(FLOOR((rk - 1) * 10.0 / n) AS BIGINT) AS decile,
             label, n, n_pos
      FROM ranked
    ),
    per AS (
      SELECT decile, n, n_pos,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM deciled GROUP BY decile, n, n_pos
    )
    SELECT decile, n_users, pos,
           CAST(SUM(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           FLOOR(CAST(SUM(pos) OVER (ORDER BY decile) AS DOUBLE)
                 / NULLIF(n_pos, 0) * 1e6 + 0.5) / 1e6 AS cum_capture,
           FLOOR((CAST(pos AS DOUBLE) / n_users)
                 / NULLIF(CAST(n_pos AS DOUBLE) / n, 0) * 1e6 + 0.5)
             / 1e6 AS lift
    FROM per
    ORDER BY decile
    """,
)
def q438_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table: users ranked by click count
    (deterministic score proxy; ties on user_id), cut into EXPLICIT
    deciles via FLOOR((rank-1)*10/n) — ntile's remainder placement
    is engine folklore, this rule is arithmetic — with per-decile
    purchase counts, cumulative capture rate, and lift over the base
    rate. Decile 0 of a good model captures far more than 10% of
    positives; flat lift ≈ 1 everywhere means the score is noise.

    Determinism: counts and the decile rule are integers; capture
    and lift land on the FLOOR half-up grid; a zero-positive corpus
    NULLs both ratios identically.

    Scale: one user-grain reduce, one global rank (decile cuts are
    the operator's semantics — production uses approx quantiles),
    then 10-row windows.
    """
    ev = t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    tot = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").alias("n_pos"),
    )
    ranked = users.crossJoin(F.broadcast(tot)).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
        ),
    )
    per = (
        ranked.select(
            F.floor((F.col("rk") - 1) * 10 / F.col("n"))
            .cast("bigint")
            .alias("decile"),
            "label",
            "n",
            "n_pos",
        )
        .groupBy("decile", "n", "n_pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("label").cast("bigint").alias("pos"),
        )
    )
    wcum = Window.orderBy("decile")
    return (
        per.select(
            "decile",
            "n_users",
            "pos",
            F.sum("pos").over(wcum).cast("bigint").alias("cum_pos"),
            (
                F.floor(
                    F.sum("pos").over(wcum).cast("double")
                    / F.nullif(F.col("n_pos").cast("double"), F.lit(0.0))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("cum_capture"),
            (
                F.floor(
                    (F.col("pos").cast("double") / F.col("n_users"))
                    / F.nullif(
                        F.col("n_pos").cast("double") / F.col("n"),
                        F.lit(0.0),
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("lift"),
        )
        .orderBy("decile")
    )
