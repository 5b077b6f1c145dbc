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
from ._util import dround, fan_out, grain_rank, t


def _score_desc_rank(users: DataFrame) -> DataFrame:
    """Exact global ROW_NUMBER over (score DESC, user_id ASC) WITHOUT
    a single-partition global window (r6 scale fix; the q242
    rank-reconstruction pattern).  Generalized into
    ``_util.grain_rank`` when the r6 window audit found six more
    sites of the class — this wrapper keeps the q438/q445 call
    sites' original shape.  Adds ``rk`` to ``users``.
    """
    return grain_rank(users, "score", ["user_id"], out="rk")

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
             (FLOOR(CAST(LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || '|{RES_SALT}'), 1, 13)) AS BIGINT) + 1.0)
                  / {float((1 << 52) + 2)!r})
               / GREATEST(n_chars, 1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sample_key
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
        dround(F.log(u) / w, 6).alias("sample_key"),
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
                        # NULLIF: a 1-doc corpus has 0 possible pairs;
                        # ANSI Spark throws on /0 where DuckDB NULLs
                        / F.nullif(
                            F.shiftright(
                                F.col("n_docs") * (F.col("n_docs") - 1), 1
                            ),
                            F.lit(0),
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

    Scale: one user-grain reduce; the global rank is RECONSTRUCTED
    from score-bucket local ranks + bounded score-grain offsets
    (``_score_desc_rank``, the q242 pattern — no single-partition
    window ever sees user-grain data), then 10-row windows.
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
    ranked = _score_desc_rank(users).crossJoin(F.broadcast(tot))
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


# ---------------------------------------------------------------------------
# q440 skew-join advisor
#
# The operational sibling of q431's join-order advisor and q314's
# broadcast advisor: BEFORE running a big shuffle join, profile the
# join key's frequency distribution and emit the salting plan for its
# heavy hitters. recommended_salt is the number of sub-keys that
# splits a hot key into average-sized chunks — CEIL(key_rows * n_keys
# / n_rows) in exact integer arithmetic (DIV, no doubles) — i.e. the
# S in the classic key||hash(row)%S salting rewrite, and the same
# split factor AQE's skew-join picks at runtime from shuffle stats.


@register(
    "q440_skew_join_advisor",
    category="relational",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS suppkey,
             CAST(COUNT(*) AS BIGINT) AS key_rows
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (
      SELECT CAST(SUM(key_rows) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM per_key
    ),
    top AS (
      SELECT suppkey, key_rows,
             ROW_NUMBER() OVER (
               ORDER BY key_rows DESC, suppkey ASC) AS rk
      FROM per_key
    )
    SELECT CAST(rk AS BIGINT) AS rk, suppkey, key_rows,
           t.n_rows, t.n_keys,
           FLOOR(CAST(key_rows AS DOUBLE) * 1e6 / t.n_rows + 0.5)
             / 1e6 AS row_share,
           FLOOR(CAST(key_rows AS DOUBLE) * t.n_keys * 1e6
                 / t.n_rows + 0.5) / 1e6 AS skew_ratio,
           CAST((key_rows * t.n_keys + t.n_rows - 1) // t.n_rows
                AS BIGINT) AS recommended_salt
    FROM top, tot t
    WHERE rk <= 5
    ORDER BY rk
    """,
)
def q440_skew_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join advisor: key-frequency profile of ``lineitem.
    l_suppkey`` (the fact side of the supplier join) — top-5 heaviest
    keys with their row share, skew ratio vs a perfectly uniform key
    (key_rows x n_keys / n_rows), and the integer salt factor
    CEIL(key_rows x n_keys / n_rows) that splits each hot key into
    average-sized sub-keys. skew_ratio ~ 1 everywhere means the key
    is uniform and salting is wasted work; ratio >> 1 is the key you
    pre-split (or let AQE skew-split) before the 100 TB join.

    Determinism: counts and the salt are exact integers (DIV
    arithmetic, never a double); shares/ratios land on the FLOOR
    half-up grid; ties rank by suppkey.

    Scale: one key-grain reduce (map-side partial), a 2-scalar
    global, and a top-5 TakeOrdered — no global window over the key
    relation, no corpus shuffle.
    """
    li = t(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("key_rows")
    )
    tot = per_key.agg(
        F.sum("key_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    # top-5 without a key-grain global window: TakeOrdered, then rank
    # the 5 survivors (the window runs on a 5-row relation)
    top5 = per_key.orderBy(
        F.col("key_rows").desc(), F.col("suppkey").asc()
    ).limit(5)
    ranked = top5.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.col("key_rows").desc(), F.col("suppkey").asc()))
        .cast("bigint"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rk",
            "suppkey",
            "key_rows",
            "n_rows",
            "n_keys",
            (
                F.floor(
                    F.col("key_rows").cast("double") * 1e6 / F.col("n_rows")
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("row_share"),
            (
                F.floor(
                    F.col("key_rows").cast("double")
                    * F.col("n_keys")
                    * 1e6
                    / F.col("n_rows")
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("skew_ratio"),
            F.expr(
                "CAST((key_rows * n_keys + n_rows - 1) DIV n_rows AS BIGINT)"
            ).alias("recommended_salt"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# q441 bottom-k sample quantile CERTIFICATION
#
# The mergeable-quantile primitive production uses at 100 TB
# (percentile_approx / KLL / t-digest) is a sample-or-sketch whose
# error you must TRUST. This op makes the error auditable in-query:
# draw a replayable K-row uniform sample per group (bottom-K by
# md5(event_id) — the KMV mechanism, a one-pass mergeable top-K),
# compute p50/p90 from the sample with the same explicit
# order-statistic rule as the exact side, and report the absolute
# error in exact DECIMAL cents. The exact side is the certification
# (affordable at audit time); the sample side is the scale path.

SQ_K = 64
SQ_SALT = "sq_r5"


@register(
    "q441_sample_quantile_certification",
    category="aggregation-advanced (rollup/percentile/sketch/pivot)",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type, event_id,
             CAST(value AS DECIMAL(18,2)) AS v,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                   || '|{SQ_SALT}'), 1, 13)) AS BIGINT) AS u
      FROM events
    ),
    full_rk AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v ASC, event_id ASC) AS frk,
             COUNT(*) OVER (PARTITION BY event_type) AS n_rows
      FROM keyed
    ),
    samp AS (
      SELECT event_type, v, event_id
      FROM (
        SELECT event_type, v, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY u ASC, event_id ASC) AS srk
        FROM keyed
      ) WHERE srk <= {SQ_K}
    ),
    samp_rk AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v ASC, event_id ASC) AS srk,
             COUNT(*) OVER (PARTITION BY event_type) AS k_eff
      FROM samp
    ),
    exact AS (
      SELECT event_type,
             CAST(MAX(n_rows) AS BIGINT) AS n_rows,
             MAX(CASE WHEN frk = (n_rows - 1) // 2 + 1 THEN v END)
               AS p50_exact,
             MAX(CASE WHEN frk = ((n_rows - 1) * 9) // 10 + 1 THEN v END)
               AS p90_exact
      FROM full_rk GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CAST(MAX(k_eff) AS BIGINT) AS k_eff,
             MAX(CASE WHEN srk = (k_eff - 1) // 2 + 1 THEN v END)
               AS p50_sample,
             MAX(CASE WHEN srk = ((k_eff - 1) * 9) // 10 + 1 THEN v END)
               AS p90_sample
      FROM samp_rk GROUP BY event_type
    )
    SELECT e.event_type, e.n_rows, s.k_eff,
           CAST(e.p50_exact AS DOUBLE) AS p50_exact,
           CAST(s.p50_sample AS DOUBLE) AS p50_sample,
           CAST(e.p90_exact AS DOUBLE) AS p90_exact,
           CAST(s.p90_sample AS DOUBLE) AS p90_sample,
           CAST(ABS(e.p50_exact - s.p50_sample) AS DOUBLE) AS err_p50,
           CAST(ABS(e.p90_exact - s.p90_sample) AS DOUBLE) AS err_p90
    FROM exact e JOIN est s USING (event_type)
    ORDER BY e.event_type
    """,
)
def q441_sample_quantile_certification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bottom-K sample quantiles with in-query error certification:
    per event type, a replayable {SQ_K}-row uniform sample (smallest
    md5-uniforms — one pass, mergeable: each task keeps K rows, the
    reduce keeps the K smallest of K x tasks), p50/p90 from the
    sample via the explicit order-statistic rule value[FLOOR((n-1)p)]
    (rank arithmetic, not engine percentile builtins), the same rule
    over the full group as ground truth, and |exact - sample| in
    exact DECIMAL(18,2) cents. This is the audit that tells you
    whether K is big enough BEFORE you trust the sketch on 100 TB.

    Determinism: the sample is md5-replayable ({SQ_SALT!r} rotates
    it); order statistics use integer rank rules with event_id
    tie-breaks; errors are DECIMAL-exact differences cast to double.

    Scale: the sample side is the production path (bottom-K per
    group, no full sort needed at scale — Spark plans the rank +
    filter as a windowed top-K); the exact side exists to certify and
    runs at audit scale. Output is group-grain (|event types| rows).
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"),
                               F.lit("|" + SQ_SALT))),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u"),
    )
    w_full = Window.partitionBy("event_type").orderBy(
        F.col("v").asc(), F.col("event_id").asc()
    )
    w_u = Window.partitionBy("event_type").orderBy(
        F.col("u").asc(), F.col("event_id").asc()
    )
    full_rk = ev.select(
        "event_type",
        "v",
        F.row_number().over(w_full).alias("frk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias(
            "n_rows"
        ),
    )
    exact = full_rk.groupBy("event_type").agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.max(
            F.when(
                F.col("frk")
                == F.expr("(n_rows - 1) DIV 2 + 1"),
                F.col("v"),
            )
        ).alias("p50_exact"),
        F.max(
            F.when(
                F.col("frk")
                == F.expr("((n_rows - 1) * 9) DIV 10 + 1"),
                F.col("v"),
            )
        ).alias("p90_exact"),
    )
    samp = (
        ev.withColumn("srk0", F.row_number().over(w_u))
        .filter(F.col("srk0") <= SQ_K)
        .select("event_type", "v", "event_id")
    )
    samp_rk = samp.select(
        "event_type",
        "v",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.col("v").asc(), F.col("event_id").asc()
            )
        )
        .alias("srk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("k_eff"),
    )
    est = samp_rk.groupBy("event_type").agg(
        F.max("k_eff").cast("bigint").alias("k_eff"),
        F.max(
            F.when(
                F.col("srk") == F.expr("(k_eff - 1) DIV 2 + 1"),
                F.col("v"),
            )
        ).alias("p50_sample"),
        F.max(
            F.when(
                F.col("srk") == F.expr("((k_eff - 1) * 9) DIV 10 + 1"),
                F.col("v"),
            )
        ).alias("p90_sample"),
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_rows",
            "k_eff",
            F.col("p50_exact").cast("double").alias("p50_exact"),
            F.col("p50_sample").cast("double").alias("p50_sample"),
            F.col("p90_exact").cast("double").alias("p90_exact"),
            F.col("p90_sample").cast("double").alias("p90_sample"),
            F.abs(F.col("p50_exact") - F.col("p50_sample"))
            .cast("double")
            .alias("err_p50"),
            F.abs(F.col("p90_exact") - F.col("p90_sample"))
            .cast("double")
            .alias("err_p90"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q442 sorted-neighborhood candidate pairs
#
# The OTHER classic entity-resolution blocking scheme beside q437's
# equi-blocking: sort on a cheap key, compare each record only to the
# next w neighbors in sort order. Window size bounds candidates at
# w x n (vs blocking's unbounded hot buckets) — the trade is recall.
# This op measures both sides of that trade on a real corpus.

SN_W = 3


@register(
    "q442_sorted_neighborhood_pairs",
    category="dedup",
    oracle=f"""
    WITH ordered AS (
      SELECT lang, source, n_chars, doc_id
      FROM documents
    ),
    leads AS (
      SELECT lang, source,
             LEAD(source, 1) OVER w AS s1,
             LEAD(source, 2) OVER w AS s2,
             LEAD(source, 3) OVER w AS s3
      FROM ordered
      WINDOW w AS (PARTITION BY lang
                   ORDER BY n_chars ASC, doc_id ASC)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cand_pairs,
           CAST(SUM(CASE WHEN s1 = source THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s2 = source THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s3 = source THEN 1 ELSE 0 END)
                AS BIGINT) AS matched_pairs,
           FLOOR((SUM(CASE WHEN s1 = source THEN 1 ELSE 0 END)
                + SUM(CASE WHEN s2 = source THEN 1 ELSE 0 END)
                + SUM(CASE WHEN s3 = source THEN 1 ELSE 0 END))
                 * 1e6
                 / NULLIF(SUM(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END),
                          0) + 0.5) / 1e6 AS match_rate
    FROM leads
    GROUP BY lang
    ORDER BY lang
    """,
)
def q442_sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez-Stolfo
    merge/purge): per language, documents sorted by (n_chars,
    doc_id); each doc pairs with its next {SN_W} neighbors via LEAD —
    so candidates are bounded at {SN_W} x n per partition no matter
    how skewed the key (the failure mode q437's equi-blocking audit
    exists to catch). matched_pairs counts same-source neighbors —
    the recall proxy — and match_rate is the precision of the
    neighborhood.

    Determinism: LEAD over the total order (n_chars, doc_id); counts
    integer; the rate on the FLOOR half-up grid, NULL when a
    partition is a single doc.

    Scale: ONE shuffle on lang + an in-partition sort — the whole
    point of sorted-neighborhood is that it needs exactly a
    repartition-and-sort, never a self-join; {SN_W} LEADs share one
    window frame.
    """
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    leads = docs.select(
        "lang",
        "source",
        F.lead("source", 1).over(w).alias("s1"),
        F.lead("source", 2).over(w).alias("s2"),
        F.lead("source", 3).over(w).alias("s3"),
    )

    def cnt(c):
        return F.sum(F.when(c, 1).otherwise(0))

    cand = (
        cnt(F.col("s1").isNotNull())
        + cnt(F.col("s2").isNotNull())
        + cnt(F.col("s3").isNotNull())
    )
    hit = (
        cnt(F.col("s1") == F.col("source"))
        + cnt(F.col("s2") == F.col("source"))
        + cnt(F.col("s3") == F.col("source"))
    )
    return (
        leads.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            cand.cast("bigint").alias("cand_pairs"),
            hit.cast("bigint").alias("matched_pairs"),
            (
                F.floor(
                    hit * F.lit(1e6) / F.nullif(cand, F.lit(0)) + F.lit(0.5)
                )
                / 1e6
            ).alias("match_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q443 Gopher-style repetition filters
#
# The repetition family of quality gates from the Gopher corpus
# pipeline (Rae et al. 2021, Table A1) that q81's surface-statistics
# gate doesn't cover: documents dominated by a repeated n-gram or by
# duplicated words are templated/boilerplate and poison training. All
# three signals are exact word/character arithmetic, so the oracle
# replays them bit-for-bit.

REP_TOP2_MAX = 0.20  # Gopher's top-2-gram character-share gate
REP_DUPW_MAX = 0.50  # duplicate-word-fraction gate


@register(
    "q443_repetition_filters",
    category="llm-text-analysis",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, n_chars, w, pos
      FROM (
        SELECT doc_id, n_chars,
               UNNEST(string_split(text, ' ')) AS w,
               UNNEST(generate_series(
                 1, LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1))
                 AS pos
        FROM documents
      )
    ),
    base AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct
      FROM words GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id, n_chars, w, nxt,
             LENGTH(w) + LENGTH(nxt) + 1 AS blen
      FROM (
        SELECT doc_id, n_chars, w,
               LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM words
      ) WHERE nxt IS NOT NULL
    ),
    bg_counts AS (
      SELECT doc_id, w, nxt, blen,
             CAST(COUNT(*) AS BIGINT) AS c,
             MAX(n_chars) AS n_chars
      FROM bigrams GROUP BY doc_id, w, nxt, blen
    ),
    top2 AS (
      SELECT doc_id, c AS top2_count, c * blen AS top2_chars, n_chars
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY doc_id
                 ORDER BY c DESC, w ASC, nxt ASC) AS rn
        FROM bg_counts
      ) WHERE rn = 1
    )
    SELECT b.doc_id, b.n_words, b.n_distinct,
           FLOOR((b.n_words - b.n_distinct) * 1e6
                 / b.n_words + 0.5) / 1e6 AS dup_word_frac,
           COALESCE(t.top2_count, CAST(0 AS BIGINT)) AS top2_count,
           FLOOR(COALESCE(t.top2_chars, 0) * 1e6
                 / NULLIF(t.n_chars, 0) + 0.5) / 1e6 AS top2_share,
           (COALESCE(t.top2_chars, 0) * 1.0
              <= {REP_TOP2_MAX} * COALESCE(t.n_chars, 1)
            AND (b.n_words - b.n_distinct) * 1.0
              <= {REP_DUPW_MAX} * b.n_words) AS keep
    FROM base b LEFT JOIN top2 t USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def q443_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality GATES (the Gopher pipeline's n-gram family,
    Rae et al. 2021) — distinct from q96's trigram token-share
    score: Gopher's thresholds are defined on CHARACTER shares and
    the decision is a boolean keep/drop, not a score. Per document,
    the duplicate-word fraction (1 - distinct/total) and the
    character share of the single most frequent word 2-gram
    (count x bigram char length / doc chars) —
    a doc whose top bigram covers >{REP_TOP2_MAX:.0%} of its
    characters or whose words are >{REP_DUPW_MAX:.0%} duplicates is
    dropped. The keep flag compares in EXACT integer cross-products
    (a*1.0 <= t*b), never on the rounded grid, so the gate itself has
    no float boundary.

    Determinism: counts are integers; shares land on the FLOOR
    half-up grid; the top bigram tie-breaks (count DESC, w, nxt).

    Scale: one fan-out explode to word grain, a LEAD window at doc
    grain, then doc x bigram-type partial aggregates — vocabulary
    math, no self-joins; single-bigram docs COALESCE cleanly.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    words = fan_out(docs).select(
        "doc_id",
        "n_chars",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w"),
    )
    base = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.countDistinct("w").cast("bigint").alias("n_distinct"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        words.withColumn("nxt", F.lead("w").over(wd))
        .filter(F.col("nxt").isNotNull())
        .withColumn(
            "blen", F.length("w") + F.length("nxt") + F.lit(1)
        )
    )
    bg_counts = bigrams.groupBy("doc_id", "w", "nxt", "blen").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.max("n_chars").alias("n_chars"),
    )
    top2 = (
        bg_counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("c").desc(), F.col("w").asc(), F.col("nxt").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("c").alias("top2_count"),
            (F.col("c") * F.col("blen")).alias("top2_chars"),
            "n_chars",
        )
    )
    return (
        base.join(top2, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            (
                F.floor(
                    (F.col("n_words") - F.col("n_distinct"))
                    * F.lit(1e6)
                    / F.col("n_words")
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("dup_word_frac"),
            F.coalesce(F.col("top2_count"), F.lit(0).cast("bigint")).alias(
                "top2_count"
            ),
            (
                F.floor(
                    F.coalesce(F.col("top2_chars"), F.lit(0))
                    * F.lit(1e6)
                    / F.nullif(F.col("n_chars"), F.lit(0))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("top2_share"),
            (
                (
                    F.coalesce(F.col("top2_chars"), F.lit(0)) * F.lit(1.0)
                    <= F.lit(REP_TOP2_MAX)
                    * F.coalesce(F.col("n_chars"), F.lit(1))
                )
                & (
                    (F.col("n_words") - F.col("n_distinct")) * F.lit(1.0)
                    <= F.lit(REP_DUPW_MAX) * F.col("n_words")
                )
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q444 distributed exact median (bucket refinement, no global sort)
#
# The selection-algorithm answer to "exact p50 over 100 TB": a global
# sort is O(n log n) ALL-shuffle; two bucketed passes find the k-th
# element exactly — pass 1 histograms values into 256 range buckets
# (map-side combinable), the cumulative walk (256 rows) locates the
# bucket holding rank k, pass 2 ranks ONLY that bucket's rows. The
# oracle computes the same order statistic by brute ROW_NUMBER, so
# the refinement must be exactly right, including the off-by-ones.

MED_BUCKETS = 256


@register(
    "q444_distributed_median",
    category="aggregation-advanced (rollup/percentile/sketch/pivot)",
    oracle=f"""
    WITH c AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
    ),
    bounds AS (
      SELECT CAST(MIN(cents) AS BIGINT) AS lo,
             CAST(MAX(cents) AS BIGINT) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM c
    ),
    ranked AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk
      FROM c
    ),
    med AS (
      SELECT r.cents AS median_cents
      FROM ranked r, bounds b
      WHERE r.rk = (b.n_rows + 1) // 2
    ),
    -- replay the ENGINE's bucket arithmetic so the audit columns
    -- (bucket id + bucket population) certify the refinement path
    bucketed AS (
      SELECT CAST((cents - b.lo) * {MED_BUCKETS}
                  // (b.hi - b.lo + 1) AS BIGINT) AS bkt
      FROM c, bounds b
    ),
    target AS (
      SELECT CAST(m.median_cents AS BIGINT) AS median_cents,
             CAST((SELECT (median_cents - b2.lo) * {MED_BUCKETS}
                          // (b2.hi - b2.lo + 1)
                   FROM bounds b2) AS BIGINT) AS bucket_id
      FROM med m
    )
    SELECT b.n_rows,
           CAST((b.n_rows + 1) // 2 AS BIGINT) AS k,
           t.median_cents,
           CAST(t.median_cents AS DOUBLE) / 100 AS median,
           t.bucket_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bucketed
            WHERE bkt = t.bucket_id) AS bucket_rows
    FROM bounds b, target t
    """,
)
def q444_distributed_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of ``l_extendedprice`` WITHOUT a global
    sort: (1) one scalar pass for min/max/count, (2) a 256-bucket
    range histogram (map-side combinable aggregate), (3) a cumulative
    walk over the 256-row histogram to find the bucket containing
    rank k = (n+1)//2 and the residual rank r inside it, (4) a rank
    over ONLY that bucket's rows (a ~n/256 slice). This is the
    classic distributed selection algorithm — the exact-answer
    sibling of the q441 sample sketch; one more refinement round
    would handle pathological single-bucket skew.

    Determinism: prices become exact BIGINT cents via DECIMAL; every
    bucket boundary is integer DIV arithmetic; the median is a value
    (rank ties collapse), so no tie-break is even needed.

    Scale: two scans + one tiny-bucket rank instead of a full
    shuffle sort. The only windows run over 256 histogram rows and
    one bucket's slice.
    """
    c = t(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    bounds = c.agg(
        F.min("cents").cast("bigint").alias("lo"),
        F.max("cents").cast("bigint").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    bucketed = c.crossJoin(F.broadcast(bounds)).withColumn(
        "bkt",
        F.expr(
            f"CAST((cents - lo) * {MED_BUCKETS} DIV (hi - lo + 1) AS BIGINT)"
        ),
    )
    hist = bucketed.groupBy("bkt", "lo", "hi", "n_rows").agg(
        F.count(F.lit(1)).cast("bigint").alias("bucket_rows")
    )
    cum = hist.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("bucket_rows").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).withColumn("k", F.expr("CAST((n_rows + 1) DIV 2 AS BIGINT)"))
    target = cum.filter(
        (F.col("cum_before") < F.col("k"))
        & (F.col("k") <= F.col("cum_before") + F.col("bucket_rows"))
    ).select(
        "bkt", "lo", "hi", "n_rows", "k", "bucket_rows", "cum_before"
    )
    # pass 2: rank only inside the winning bucket
    in_bucket = bucketed.join(
        F.broadcast(target.select("bkt", "k", "cum_before")), "bkt"
    )
    picked = (
        in_bucket.withColumn(
            "r", F.row_number().over(Window.partitionBy("bkt").orderBy("cents"))
        )
        .filter(F.col("r") == F.col("k") - F.col("cum_before"))
        .select("bkt", F.col("cents").alias("median_cents"))
    )
    return target.join(F.broadcast(picked), "bkt").select(
        "n_rows",
        "k",
        "median_cents",
        (F.col("median_cents").cast("double") / 100).alias("median"),
        F.col("bkt").alias("bucket_id"),
        "bucket_rows",
    )


# ---------------------------------------------------------------------------
# q445 WOE / Information-Value binning
#
# The credit-scoring / feature-selection standard: quintile-bin a
# score, per bin compute Weight of Evidence ln(pos_share/neg_share)
# with 0.5 smoothing, and the feature's Information Value
# IV = SUM((pos_share - neg_share) * WOE). IV < 0.02 means the
# feature is useless; > 0.5 suspicious. ln() rides the ROUND-6
# convention (q261); the IV cross-row sum is exact BIGINT micro-grid
# arithmetic so partition order can't move the float.


@register(
    "q445_woe_iv_binning",
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
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC)
               AS rk,
             (SELECT COUNT(*) FROM users) AS n
      FROM users
    ),
    binned AS (
      SELECT CAST(FLOOR((rk - 1) * 5.0 / n) AS BIGINT) AS bin, label
      FROM ranked
    ),
    per AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(label) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(label) AS BIGINT) AS neg
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS tot_pos,
             CAST(SUM(neg) AS BIGINT) AS tot_neg,
             CAST(COUNT(*) AS BIGINT) AS n_bins
      FROM per
    ),
    woe AS (
      SELECT p.bin, p.n_users, p.pos, p.neg,
             (FLOOR(CAST(LN(((p.pos + 0.5) / (t.tot_pos + 0.5 * t.n_bins))
                      / ((p.neg + 0.5) / (t.tot_neg + 0.5 * t.n_bins))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS woe,
             FLOOR(((p.pos + 0.5) / (t.tot_pos + 0.5 * t.n_bins)
                    - (p.neg + 0.5) / (t.tot_neg + 0.5 * t.n_bins))
                   * 1e9 + 0.5) AS dshare_nano
      FROM per p, tot t
    )
    SELECT bin, n_users, pos, neg, woe,
           CAST(SUM(CAST(FLOOR(woe * 1e6 + 0.5) AS BIGINT)
                    * CAST(dshare_nano AS BIGINT)) OVER ()
                AS DOUBLE) / 1e15 AS iv
    FROM woe
    ORDER BY bin
    """,
)
def q445_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence with the TOTAL Information Value q272
    deliberately avoided: q272 bins by value thresholds and reports
    per-bin IV *contributions* only, because a naive cross-bin float
    sum is partition-order-dependent. This op closes that gap — users
    are RANK-binned into exact quintiles (the explicit
    FLOOR((rk-1)*5/n) rule, q438's convention, so bin populations are
    equal by construction rather than threshold-dependent), per-bin
    WOE = ln(smoothed pos share / smoothed neg share) with 0.5-count
    smoothing, and the single feature-level IV = SUM((pos_share -
    neg_share) x WOE) every scorecard actually thresholds on
    (IV < 0.02 useless, > 0.5 suspicious).

    Determinism: smoothed shares are exact-integer-ratio doubles
    (identical IEEE division on both engines); WOE rides the ROUND-6
    ln convention (q261); IV is summed in BIGINT micro x nano grid
    units (exact, order-independent) and divided once at the end.

    Scale: user-grain reduce; the quintile rank is RECONSTRUCTED
    scale-safely via ``_score_desc_rank`` (score-bucket local ranks
    + bounded score-grain offsets), 5-row aggregates after that.
    The IV window runs over 5 rows.
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
    n = users.agg(F.count(F.lit(1)).alias("n"))
    ranked = _score_desc_rank(users).crossJoin(F.broadcast(n))
    per = (
        ranked.select(
            F.floor((F.col("rk") - 1) * 5 / F.col("n"))
            .cast("bigint")
            .alias("bin"),
            "label",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("label").cast("bigint").alias("pos"),
            (F.count(F.lit(1)) - F.sum("label"))
            .cast("bigint")
            .alias("neg"),
        )
    )
    tot = per.agg(
        F.sum("pos").cast("bigint").alias("tot_pos"),
        F.sum("neg").cast("bigint").alias("tot_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    ps = (F.col("pos") + 0.5) / (F.col("tot_pos") + 0.5 * F.col("n_bins"))
    ns_ = (F.col("neg") + 0.5) / (F.col("tot_neg") + 0.5 * F.col("n_bins"))
    woe = per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_users",
        "pos",
        "neg",
        dround(F.log(ps / ns_), 6).alias("woe"),
        F.floor((ps - ns_) * F.lit(1e9) + F.lit(0.5)).alias("dshare_nano"),
    )
    iv_win = Window.partitionBy()
    return (
        woe.select(
            "bin",
            "n_users",
            "pos",
            "neg",
            "woe",
            (
                F.sum(
                    F.floor(F.col("woe") * 1e6 + F.lit(0.5)).cast("bigint")
                    * F.col("dshare_nano").cast("bigint")
                )
                .over(iv_win)
                .cast("double")
                / 1e15
            ).alias("iv"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q446 rendezvous (HRW) sharding audit
#
# Consistent placement for a 100 TB corpus: rendezvous hashing sends
# each doc to argmax_s md5(doc, s). The property that makes it THE
# resharding strategy — growing 8 -> 9 shards moves ~1/9 of docs and
# EVERY mover lands on the new shard — is certified in-query: any
# doc that changes shard without landing on shard 8 breaks stable_ok.

HRW_N = 8
HRW_SALT = "hrw_r5"


def _hrw_hash_sql(s: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) "
        f"|| '|{HRW_SALT}|' || '{s}'), 1, 13)) AS BIGINT)"
    )


@register(
    "q446_rendezvous_sharding",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, s, h
      FROM documents,
           UNNEST([{", ".join(
             "STRUCT_PACK(s := CAST(%d AS BIGINT), h := %s)"
             % (s, _hrw_hash_sql(s)) for s in range(HRW_N + 1)
           )}]) AS u(x),
           LATERAL (SELECT x.s AS s, x.h AS h)
    ),
    pick8 AS (
      SELECT doc_id, s AS shard8
      FROM (
        SELECT doc_id, s, ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY h DESC, s ASC) AS rn
        FROM scored WHERE s < {HRW_N}
      ) WHERE rn = 1
    ),
    pick9 AS (
      SELECT doc_id, s AS shard9
      FROM (
        SELECT doc_id, s, ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY h DESC, s ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    joined AS (
      SELECT p8.doc_id, p8.shard8, p9.shard9
      FROM pick8 p8 JOIN pick9 p9 USING (doc_id)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM joined)
    SELECT j.shard8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(COUNT(*) * 1e6 / t.n_docs + 0.5) / 1e6 AS share,
           CAST(SUM(CASE WHEN j.shard9 <> j.shard8 THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_out,
           CAST(SUM(CASE WHEN j.shard9 = {HRW_N} THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_to_new,
           (SUM(CASE WHEN j.shard9 <> j.shard8 THEN 1 ELSE 0 END)
            = SUM(CASE WHEN j.shard9 = {HRW_N} THEN 1 ELSE 0 END))
             AS stable_ok
    FROM joined j, tot t
    GROUP BY j.shard8, t.n_docs
    ORDER BY shard
    """,
)
def q446_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding audit: every doc
    hashes against each candidate shard (md5(doc|s)) and lands on the
    argmax — per-shard balance for {HRW_N} shards, then the
    {HRW_N}->{HRW_N + 1} reshard simulated in the same query. HRW's
    minimal-disruption guarantee — movers ONLY move to the new shard,
    ~1/(N+1) of docs — is CERTIFIED per shard: stable_ok fails if any
    doc changed shard without landing on shard {HRW_N}. This is the
    shard map a 100 TB corpus store wants (vs mod-N hashing, where a
    reshard moves ~8/9 of all data).

    Determinism: md5-derived 52-bit weights ({HRW_SALT!r} rotates the
    map), argmax tie-broken by shard id; counts integer, shares on
    the FLOOR grid.

    Scale: the argmax is a map-side MAX(struct) partial aggregate
    over a 9x in-row fan-out — one doc-grain reduce, one shard-grain
    reduce; no window over the corpus, no joins except the in-query
    before/after comparison (doc-grain equi-join).
    """
    docs = t(spark, sf_dir, "documents").select("doc_id")
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(s) for s in range(HRW_N + 1)])
        ).alias("s"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|" + HRW_SALT + "|"),
                        F.col("s").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    # argmax via MAX(struct(h, -s)): lexicographic max = highest h,
    # ties to the SMALLEST shard id — a partial-aggregable reduce,
    # not a doc-grain window
    pick8 = (
        pairs.filter(F.col("s") < HRW_N)
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("h"), (-F.col("s")).alias("ns"))).alias("m"))
        .select("doc_id", (-F.col("m.ns")).cast("bigint").alias("shard8"))
    )
    pick9 = (
        pairs.groupBy("doc_id")
        .agg(F.max(F.struct(F.col("h"), (-F.col("s")).alias("ns"))).alias("m"))
        .select("doc_id", (-F.col("m.ns")).cast("bigint").alias("shard9"))
    )
    joined = pick8.join(pick9, "doc_id")
    tot = joined.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        joined.crossJoin(F.broadcast(tot))
        .groupBy(F.col("shard8").alias("shard"), "n_docs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(
                F.when(F.col("shard9") != F.col("shard8"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("moved_out"),
            F.sum(
                F.when(F.col("shard9") == HRW_N, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("moved_to_new"),
        )
        .select(
            "shard",
            F.col("cnt").alias("n_docs"),
            (
                F.floor(
                    F.col("cnt") * F.lit(1e6) / F.col("n_docs") + F.lit(0.5)
                )
                / 1e6
            ).alias("share"),
            "moved_out",
            "moved_to_new",
            (F.col("moved_out") == F.col("moved_to_new")).alias("stable_ok"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q447 CDC MERGE-apply certification
#
# The lakehouse MERGE INTO contract, certified the q432 way (two
# independent computations must agree in-query): events are a CDC
# stream per user — 'signup' INSERTS (or re-inserts, resetting the
# row), 'error' DELETES, click/view/purchase UPDATE-accumulate value
# into the live row (ignored when no row exists, per WHEN MATCHED).
# Path A replays the WHOLE stream; path B folds a checkpointed
# first-half state forward with only second-half events — exactly an
# incremental MERGE of a micro-batch onto a snapshot. Any divergence
# (a tombstone leaking spend across a delete, a resurrect missing its
# reset, an update landing on a dead row) breaks merge_ok.

CDC_SPLIT = IVM_SPLIT  # share q432's snapshot boundary


@register(
    "q447_cdc_merge_certification",
    category="relational",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             CAST(value AS DECIMAL(28,2)) AS v,
             ts < TIMESTAMP '{CDC_SPLIT}' AS in_h1,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    -- path A: full replay. Only the FINAL signup segment survives:
    -- a row exists iff last signup outlives last error; its spend is
    -- the updates strictly after that signup.
    full_mark AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'signup' THEN rn END)
               OVER (PARTITION BY user_id) AS ls,
             MAX(CASE WHEN event_type = 'error' THEN rn END)
               OVER (PARTITION BY user_id) AS le
      FROM ordered
    ),
    full_state AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type NOT IN
                     ('signup', 'error') AND rn > ls THEN v END), 0)
                  AS DECIMAL(28,2)) AS spend,
             CAST(COALESCE(SUM(CASE WHEN event_type NOT IN
                     ('signup', 'error') AND rn > ls
                     THEN 1 END), 0) AS BIGINT) AS n_updates
      FROM full_mark
      GROUP BY user_id
      HAVING MAX(ls) IS NOT NULL
         AND (MAX(le) IS NULL OR MAX(ls) > MAX(le))
    ),
    -- path B: checkpoint H1 with the same rule...
    h1_mark AS (
      SELECT * FROM full_mark WHERE in_h1
    ),
    h1_state AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup' THEN rn END) AS ls1,
             MAX(CASE WHEN event_type = 'error' THEN rn END) AS le1
      FROM h1_mark GROUP BY user_id
    ),
    h1_rows AS (
      SELECT m.user_id,
             CAST(COALESCE(SUM(CASE WHEN m.event_type NOT IN
                     ('signup', 'error') AND m.rn > s.ls1
                     THEN m.v END), 0) AS DECIMAL(28,2)) AS spend1,
             CAST(COALESCE(SUM(CASE WHEN m.event_type NOT IN
                     ('signup', 'error') AND m.rn > s.ls1
                     THEN 1 END), 0) AS BIGINT) AS n1
      FROM h1_mark m JOIN h1_state s USING (user_id)
      WHERE s.ls1 IS NOT NULL AND (s.le1 IS NULL OR s.ls1 > s.le1)
      GROUP BY m.user_id
    ),
    -- ...then fold ONLY H2 events onto the checkpoint
    h2 AS (
      SELECT * FROM ordered WHERE NOT in_h1
    ),
    h2_state AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup' THEN rn END) AS ls2,
             MAX(CASE WHEN event_type = 'error' THEN rn END) AS le2,
             CAST(COALESCE(SUM(CASE WHEN event_type NOT IN
                     ('signup', 'error') THEN v END), 0)
                  AS DECIMAL(28,2)) AS upd_all
      FROM h2 GROUP BY user_id
    ),
    h2_seg AS (
      SELECT h.user_id, s.ls2, s.le2, s.upd_all,
             CAST(COALESCE(SUM(CASE WHEN h.event_type NOT IN
                     ('signup', 'error') AND h.rn > s.ls2
                     THEN h.v END), 0) AS DECIMAL(28,2)) AS spend2,
             CAST(COALESCE(SUM(CASE WHEN h.event_type NOT IN
                     ('signup', 'error') AND h.rn > s.ls2
                     THEN 1 END), 0) AS BIGINT) AS n2,
             CAST(COALESCE(SUM(CASE WHEN h.event_type NOT IN
                     ('signup', 'error') THEN 1 END), 0)
                  AS BIGINT) AS n_all
      FROM h2 h JOIN h2_state s USING (user_id)
      GROUP BY h.user_id, s.ls2, s.le2, s.upd_all
    ),
    inc_state AS (
      SELECT COALESCE(b.user_id, d.user_id) AS user_id,
             CASE
               -- H2 started a fresh row: only its final segment
               WHEN d.ls2 IS NOT NULL
                    AND (d.le2 IS NULL OR d.ls2 > d.le2)
                 THEN d.spend2
               -- H2 deleted (and never resurrected): no row
               WHEN d.le2 IS NOT NULL THEN NULL
               -- no lifecycle in H2: carry the checkpoint + updates
               WHEN b.user_id IS NOT NULL
                 THEN CAST(b.spend1 + COALESCE(d.upd_all, 0)
                           AS DECIMAL(28,2))
               ELSE NULL
             END AS spend,
             CASE
               WHEN d.ls2 IS NOT NULL
                    AND (d.le2 IS NULL OR d.ls2 > d.le2) THEN d.n2
               WHEN d.le2 IS NOT NULL THEN NULL
               WHEN b.user_id IS NOT NULL
                 THEN b.n1 + COALESCE(d.n_all, 0)
               ELSE NULL
             END AS n_updates
      FROM h1_rows b FULL OUTER JOIN h2_seg d ON d.user_id = b.user_id
    ),
    inc_rows AS (
      SELECT user_id, spend, n_updates FROM inc_state
      WHERE spend IS NOT NULL
    )
    SELECT COALESCE(f.user_id, i.user_id) AS user_id,
           CAST(f.spend AS DOUBLE) AS spend_full,
           f.n_updates AS n_full,
           CAST(i.spend AS DOUBLE) AS spend_inc,
           i.n_updates AS n_inc,
           (f.user_id IS NOT NULL AND i.user_id IS NOT NULL
            AND f.spend = i.spend
            AND f.n_updates = i.n_updates) AS merge_ok
    FROM full_state f FULL OUTER JOIN inc_rows i
      ON i.user_id = f.user_id
    ORDER BY user_id
    """,
)
def q447_cdc_merge_certification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC MERGE-apply certification: the event stream is change
    data per user — signup INSERTS (a re-signup resets the row),
    error DELETES, click/view/purchase UPDATE-accumulate value when
    (and only when) a live row exists. The final table is computed
    two independent ways and must agree row-for-row: (A) full-stream
    replay (a row survives iff the last signup outlives the last
    error; spend is the value accumulated strictly after that final
    signup), and (B) a checkpoint of the first half folded forward
    with ONLY second-half events — the incremental MERGE a streaming
    micro-batch performs against a snapshot, with all the tombstone /
    resurrect / carry cases handled by explicit CASE arms. merge_ok
    certifies A == B per user; a FULL OUTER JOIN surfaces rows either
    path produces alone.

    Determinism: the stream order is the (ts, event_id) total order;
    spend accumulates in DECIMAL(28,2); counts are integers.

    Scale: user-grain windows and reduces only — no corpus-wide
    window, no self-join; the checkpoint fold touches H2 events plus
    a user-grain state table, exactly the micro-batch shape.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(28,2)").alias("v"),
        (F.col("ts") < F.lit(CDC_SPLIT).cast("timestamp")).alias("in_h1"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
        .alias("rn"),
    )
    is_upd = ~F.col("event_type").isin("signup", "error")
    wu = Window.partitionBy("user_id")
    marked = ev.select(
        "*",
        F.max(
            F.when(F.col("event_type") == "signup", F.col("rn"))
        )
        .over(wu)
        .alias("ls"),
        F.max(F.when(F.col("event_type") == "error", F.col("rn")))
        .over(wu)
        .alias("le"),
    )

    def seg_rows(df, ls_col):
        return (
            F.coalesce(
                F.sum(
                    F.when(is_upd & (F.col("rn") > F.col(ls_col)), F.col("v"))
                ),
                F.lit(0),
            )
            .cast("decimal(28,2)"),
            F.coalesce(
                F.sum(
                    F.when(
                        is_upd & (F.col("rn") > F.col(ls_col)), F.lit(1)
                    )
                ),
                F.lit(0),
            ).cast("bigint"),
        )

    spend_e, n_e = seg_rows(marked, "ls")
    full_state = (
        marked.groupBy("user_id")
        .agg(
            spend_e.alias("spend"),
            n_e.alias("n_updates"),
            F.max("ls").alias("ls"),
            F.max("le").alias("le"),
        )
        .filter(
            F.col("ls").isNotNull()
            & (F.col("le").isNull() | (F.col("ls") > F.col("le")))
        )
        .select("user_id", "spend", "n_updates")
    )

    h1 = marked.filter(F.col("in_h1"))
    h1_state = h1.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", F.col("rn"))
        ).alias("ls1"),
        F.max(
            F.when(F.col("event_type") == "error", F.col("rn"))
        ).alias("le1"),
    )
    h1_rows = (
        h1.join(h1_state, "user_id")
        .filter(
            F.col("ls1").isNotNull()
            & (F.col("le1").isNull() | (F.col("ls1") > F.col("le1")))
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(is_upd & (F.col("rn") > F.col("ls1")), F.col("v"))
                ),
                F.lit(0),
            )
            .cast("decimal(28,2)")
            .alias("spend1"),
            F.coalesce(
                F.sum(
                    F.when(is_upd & (F.col("rn") > F.col("ls1")), F.lit(1))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n1"),
        )
    )

    h2 = ev.filter(~F.col("in_h1"))
    h2_state = h2.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", F.col("rn"))
        ).alias("ls2"),
        F.max(
            F.when(F.col("event_type") == "error", F.col("rn"))
        ).alias("le2"),
        F.coalesce(F.sum(F.when(is_upd, F.col("v"))), F.lit(0))
        .cast("decimal(28,2)")
        .alias("upd_all"),
    )
    h2_seg = (
        h2.join(h2_state, "user_id")
        .groupBy("user_id", "ls2", "le2", "upd_all")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(is_upd & (F.col("rn") > F.col("ls2")), F.col("v"))
                ),
                F.lit(0),
            )
            .cast("decimal(28,2)")
            .alias("spend2"),
            F.coalesce(
                F.sum(
                    F.when(is_upd & (F.col("rn") > F.col("ls2")), F.lit(1))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n2"),
            F.coalesce(F.sum(F.when(is_upd, F.lit(1))), F.lit(0))
            .cast("bigint")
            .alias("n_all"),
        )
    )
    joined = h1_rows.alias("b").join(
        h2_seg.alias("d"), "user_id", "full_outer"
    )
    fresh = F.col("d.ls2").isNotNull() & (
        F.col("d.le2").isNull() | (F.col("d.ls2") > F.col("d.le2"))
    )
    inc_rows = joined.select(
        "user_id",
        F.when(fresh, F.col("d.spend2"))
        .when(F.col("d.le2").isNotNull(), F.lit(None))
        .when(
            F.col("b.spend1").isNotNull(),
            (F.col("b.spend1") + F.coalesce(F.col("d.upd_all"), F.lit(0)))
            .cast("decimal(28,2)"),
        )
        .alias("spend"),
        F.when(fresh, F.col("d.n2"))
        .when(F.col("d.le2").isNotNull(), F.lit(None))
        .when(
            F.col("b.n1").isNotNull(),
            F.col("b.n1") + F.coalesce(F.col("d.n_all"), F.lit(0)),
        )
        .alias("n_updates"),
    ).filter(F.col("spend").isNotNull())

    return (
        full_state.alias("f")
        .join(inc_rows.alias("i"), "user_id", "full_outer")
        .select(
            "user_id",
            F.col("f.spend").cast("double").alias("spend_full"),
            F.col("f.n_updates").alias("n_full"),
            F.col("i.spend").cast("double").alias("spend_inc"),
            F.col("i.n_updates").alias("n_inc"),
            (
                F.col("f.spend").isNotNull()
                & F.col("i.spend").isNotNull()
                & (F.col("f.spend") == F.col("i.spend"))
                & (F.col("f.n_updates") == F.col("i.n_updates"))
            ).alias("merge_ok"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q448 UniMax budget allocation (waterfilling with epoch caps)
#
# The THIRD mixture policy beside q181/q243's temperature sampling:
# UniMax (Chung et al. 2023) splits a token budget as evenly as
# possible across sources but never takes more than C epochs of any
# one source — i.e. exact waterfilling over caps c_i = C x s_i. The
# closed form: sort caps ascending; a source is CAPPED iff granting
# every not-yet-capped source at least its cap fits the budget
# (prefix + cap x remaining <= B, a monotone prefix); the rest split
# the leftover in integer division with largest-remainder
# distribution. Everything is exact BIGINT token arithmetic — the
# in-query feasibility flag certifies the allocation spends
# min(B, sum caps) to the token.

UNIMAX_EPOCH_CAP = 2
UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 3, 5  # B = 3/5 of corpus tokens


@register(
    "q448_unimax_allocation",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(tokens) * {UNIMAX_BUDGET_NUM}
                  // {UNIMAX_BUDGET_DEN} AS BIGINT) AS budget,
             CAST(COUNT(*) AS BIGINT) AS n_src
      FROM src
    ),
    ranked AS (
      SELECT s.source, s.tokens,
             CAST(s.tokens * {UNIMAX_EPOCH_CAP} AS BIGINT) AS cap_tokens,
             t.budget, t.n_src,
             ROW_NUMBER() OVER (
               ORDER BY s.tokens * {UNIMAX_EPOCH_CAP} ASC,
                        s.source ASC) AS rk,
             SUM(s.tokens * {UNIMAX_EPOCH_CAP}) OVER (
               ORDER BY s.tokens * {UNIMAX_EPOCH_CAP} ASC, s.source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pre
      FROM src s, tot t
    ),
    marked AS (
      SELECT *,
             (COALESCE(pre, 0) + cap_tokens * (n_src - rk + 1)
              <= budget) AS capped
      FROM ranked
    ),
    sums AS (
      SELECT *,
             CAST(SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END)
                  OVER () AS BIGINT) AS capped_tokens,
             CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
                  AS BIGINT) AS n_capped,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY capped ORDER BY source ASC) AS BIGINT)
               AS urk
      FROM marked
    ),
    alloc AS (
      SELECT source, tokens, cap_tokens, capped, budget,
             CASE WHEN capped THEN cap_tokens
                  WHEN n_src = n_capped THEN 0
                  ELSE LEAST(cap_tokens,
                    (budget - capped_tokens) // (n_src - n_capped)
                    + CASE WHEN urk <=
                        (budget - capped_tokens) % (n_src - n_capped)
                      THEN 1 ELSE 0 END)
             END AS alloc_tokens
      FROM sums
    )
    SELECT source, tokens, cap_tokens, capped,
           CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
           FLOOR(alloc_tokens * 1e6 / tokens + 0.5) / 1e6 AS epochs,
           budget,
           (CAST(SUM(alloc_tokens) OVER () AS BIGINT)
            = LEAST(budget,
                    CAST(SUM(cap_tokens) OVER () AS BIGINT)))
             AS feasible_ok
    FROM alloc
    ORDER BY source
    """,
)
def q448_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023): split a token
    budget (here {UNIMAX_BUDGET_NUM}/{UNIMAX_BUDGET_DEN} of the
    corpus) across sources as uniformly as possible subject to a
    {UNIMAX_EPOCH_CAP}-epoch repetition cap per source — the
    waterfilling solution, computed in closed form: caps sorted
    ascending, the capped prefix identified by the monotone test
    prefix + cap x remaining <= budget, the leftover split by exact
    integer division with largest-remainder top-up (deterministic by
    source name). The low-resource sources hit their epoch cap; the
    rest share evenly — the anti-memorization dial temperature
    mixtures can't express. feasible_ok certifies the allocation
    spends exactly min(budget, sum of caps) tokens.

    Determinism: all token arithmetic is BIGINT (DIV/%); only the
    epochs diagnostic touches the FLOOR grid.

    Scale: one doc-grain token count, then every window runs over
    the SOURCE-grain relation (a handful of rows at any corpus
    size) — the planner's cost lives in the scan, as it should.
    """
    docs = t(spark, sf_dir, "documents").select("source", "text")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("tokens")
    )
    tot = src.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.expr(
            f"CAST(SUM(tokens) * {UNIMAX_BUDGET_NUM} "
            f"DIV {UNIMAX_BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    ranked = (
        src.crossJoin(F.broadcast(tot))
        .withColumn(
            "cap_tokens",
            (F.col("tokens") * UNIMAX_EPOCH_CAP).cast("bigint"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.col("cap_tokens").asc(), F.col("source").asc()
                )
            ),
        )
        .withColumn(
            "pre",
            F.sum("cap_tokens").over(
                Window.orderBy(
                    F.col("cap_tokens").asc(), F.col("source").asc()
                ).rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
    )
    marked = ranked.withColumn(
        "capped",
        (
            F.coalesce(F.col("pre"), F.lit(0))
            + F.col("cap_tokens") * (F.col("n_src") - F.col("rk") + 1)
        )
        <= F.col("budget"),
    )
    wall = Window.partitionBy()
    sums = (
        marked.withColumn(
            "capped_tokens",
            F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0))
            .over(wall)
            .cast("bigint"),
        )
        .withColumn(
            "n_capped",
            F.sum(F.when(F.col("capped"), 1).otherwise(0))
            .over(wall)
            .cast("bigint"),
        )
        .withColumn(
            "urk",
            F.row_number()
            .over(
                Window.partitionBy("capped").orderBy(F.col("source").asc())
            )
            .cast("bigint"),
        )
    )
    alloc = sums.withColumn(
        "alloc_tokens",
        F.when(F.col("capped"), F.col("cap_tokens"))
        .when(F.col("n_src") == F.col("n_capped"), F.lit(0))
        .otherwise(
            F.least(
                F.col("cap_tokens"),
                F.expr(
                    "(budget - capped_tokens) DIV (n_src - n_capped)"
                    " + CASE WHEN urk <="
                    " (budget - capped_tokens) % (n_src - n_capped)"
                    " THEN 1 ELSE 0 END"
                ),
            )
        )
        .cast("bigint"),
    )
    return (
        alloc.select(
            "source",
            "tokens",
            "cap_tokens",
            "capped",
            "alloc_tokens",
            (
                F.floor(
                    F.col("alloc_tokens") * F.lit(1e6) / F.col("tokens")
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("epochs"),
            "budget",
            (
                F.sum("alloc_tokens").over(wall).cast("bigint")
                == F.least(
                    F.col("budget"),
                    F.sum("cap_tokens").over(wall).cast("bigint"),
                )
            ).alias("feasible_ok"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q449 Selinger left-deep join enumeration (4-relation star)
#
# q431 costed the two orders of a 3-relation chain; this is the real
# System R exercise over the 4-relation star L-O-C / L-S: enumerate
# every CONNECTED left-deep order (cross products pruned — 8 of the
# 24 permutations survive), cost each as the classic C_out sum of
# estimated intermediate cardinalities under the independence model
# |prefix| = PROD(n_i) / PROD(max NDV per joined edge), and rank.
# The per-order cost EXPRESSIONS are generated once in Python and
# fed verbatim to both engines, so the floating product/division
# sequence is bit-identical by construction.

_SELINGER_REL = {"L": "n_l", "O": "n_o", "C": "n_c", "S": "n_s"}
_SELINGER_EDGES = {
    frozenset("LO"): "GREATEST(ndv_l_ok, ndv_o_ok)",
    frozenset("OC"): "GREATEST(ndv_o_ck, ndv_c_ck)",
    frozenset("LS"): "GREATEST(ndv_l_sk, ndv_s_sk)",
}


def _selinger_orders() -> list[str]:
    """All connected left-deep orders of L,O,C,S (a new relation must
    share an edge with the prefix)."""
    from itertools import permutations

    orders = []
    for perm in permutations("LOCS"):
        have = {perm[0]}
        ok = True
        for r in perm[1:]:
            if not any(frozenset((r, h)) in _SELINGER_EDGES for h in have):
                ok = False
                break
            have.add(r)
        if ok:
            orders.append("".join(perm))
    return orders


def _selinger_card_sql(prefix: str) -> str:
    """Estimated cardinality of the join of ``prefix``'s relations:
    PROD sizes / PROD per-edge max-NDVs, FLOOR'd to BIGINT. The
    multiplication order is fixed (relation order, then edge order)
    so both engines run the identical IEEE sequence."""
    rels = list(prefix)
    num = " * ".join(
        [f"CAST({_SELINGER_REL[rels[0]]} AS DOUBLE)"]
        + [_SELINGER_REL[r] for r in rels[1:]]
    )
    edges = [
        sql
        for pair, sql in sorted(
            _SELINGER_EDGES.items(), key=lambda kv: sorted(kv[0])
        )
        if pair <= frozenset(rels)
    ]
    if not edges:
        return f"CAST(FLOOR({num}) AS BIGINT)"
    den = " * ".join([f"CAST({edges[0]} AS DOUBLE)"] + edges[1:])
    return f"CAST(FLOOR({num} / ({den})) AS BIGINT)"


def _selinger_cost_sql(order: str) -> str:
    """C_out: sum of the estimated sizes of every join prefix."""
    return " + ".join(
        _selinger_card_sql(order[: k + 1]) for k in range(1, len(order))
    )


_SELINGER_STATS_SQL = """
      SELECT
        (SELECT COUNT(*) FROM lineitem) AS n_l,
        (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_l_ok,
        (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS ndv_l_sk,
        (SELECT COUNT(*) FROM orders) AS n_o,
        (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_o_ok,
        (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ndv_o_ck,
        (SELECT COUNT(*) FROM customer) AS n_c,
        (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS ndv_c_ck,
        (SELECT COUNT(*) FROM supplier) AS n_s,
        (SELECT COUNT(DISTINCT s_suppkey) FROM supplier) AS ndv_s_sk
"""


@register(
    "q449_selinger_enumeration",
    category="relational",
    oracle=f"""
    WITH s AS ({_SELINGER_STATS_SQL}),
    costed AS (
      {" UNION ALL ".join(
        f"SELECT '{o}' AS join_order, {_selinger_cost_sql(o)} AS est_cost "
        f"FROM s"
        for o in _selinger_orders()
      )}
    )
    SELECT join_order, est_cost,
           CAST(ROW_NUMBER() OVER (
             ORDER BY est_cost ASC, join_order ASC) AS BIGINT) AS rk,
           (ROW_NUMBER() OVER (ORDER BY est_cost ASC, join_order ASC)
            = 1) AS recommended
    FROM costed
    ORDER BY rk
    """,
)
def q449_selinger_enumeration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """System R (Selinger) left-deep join enumeration over the
    4-relation star lineitem-orders-customer + lineitem-supplier:
    the 8 connected left-deep orders (cross products pruned at
    enumeration time, the same rule every CBO applies), each costed
    as C_out = sum of estimated intermediate-result sizes under the
    textbook independence model |prefix| = PROD(sizes) / PROD(max
    join-key NDV per in-prefix edge), from exact in-query statistics
    (the ANALYZE TABLE numbers). Ranked ascending; rank 1 is the
    order a cost-based optimizer would pick. Completes the engine-
    maintenance advisor suite: q431 (pairwise order), q314
    (broadcast), q440 (skew salt).

    Determinism: statistics are exact integers; every per-prefix
    estimate FLOORs one double product/division chain whose
    expression text is GENERATED ONCE and handed verbatim to both
    engines; cost sums are BIGINT; ties rank by order name.

    Scale: four scans with partial count-distinct aggregates — the
    advisor costs 8 plans without executing any join; the
    enumeration itself is O(1) rows.
    """
    # register the four tables as temp views so the SAME scalar-
    # subquery stats SQL runs on Spark (keeps the two engines'
    # arithmetic textually identical end-to-end)
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q449_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("q449_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("q449_customer")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q449_supplier")
    stats_sql = (
        _SELINGER_STATS_SQL.replace("FROM lineitem", "FROM q449_lineitem")
        .replace("FROM orders", "FROM q449_orders")
        .replace("FROM customer", "FROM q449_customer")
        .replace("FROM supplier", "FROM q449_supplier")
    )
    union = " UNION ALL ".join(
        f"SELECT '{o}' AS join_order, {_selinger_cost_sql(o)} AS est_cost "
        f"FROM s"
        for o in _selinger_orders()
    )
    return spark.sql(
        f"""
        WITH s AS ({stats_sql}),
        costed AS ({union})
        SELECT join_order, est_cost,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY est_cost ASC, join_order ASC) AS BIGINT) AS rk,
               (ROW_NUMBER() OVER (ORDER BY est_cost ASC, join_order ASC)
                = 1) AS recommended
        FROM costed
        ORDER BY rk
        """
    )
