"""Round-8 operators (q504+): suffix-array-style exact-substring
discovery (the q253 generalization — maximal cross-document repeats
via bucketed adjacent-suffix LCP, the Lee et al. "Deduplicating
Training Data Makes Language Models Better" ExactSubstr primitive),
an HDBSCAN-style density/core-distance audit over the embedding
corpus (the density complement of the q72 threshold near-dup pass),
and a Raft-style replica quorum-placement audit (the failure-domain
companion of q446 rendezvous / q465 ring sharding).

Conventions: exact integer arithmetic until a final division, ROUND-6
at output boundaries, NULLIF guards for ANSI division, no
unpartitioned window over a corpus-bound grain, no unaudited
broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import fan_out, t
from .dedup import (
    MAX_LSH_BUCKET,
    N_HASHES,
    _minhash_pairs,
    _minhash_pairs_ctes,
    _shingle_df,
    _signatures,
)
from .similarity import _sql_sign_bucket, dot_double, norm_double, sign_bucket

# ---------------------------------------------------------------------------
# q504 suffix-array exact-substring (bucketed adjacent-suffix LCP)

SUF_K = 40  # truncated-suffix width: LCP is measured up to this cap
SUF_B = 12  # sort bucket = first SUF_B chars (pairs with LCP < SUF_B
# can never be adjacent winners, so bucketing loses nothing >= SUF_MIN)
SUF_MIN = 16  # report threshold: maximal repeats of at least this len
SUF_TOPK = 20


@register(
    "q504_suffix_lcp_repeats",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH suf AS (
      SELECT d.doc_id, r.i AS pos,
             SUBSTRING(d.text, CAST(r.i AS INTEGER), {SUF_K}) AS s
      FROM documents d,
           UNNEST(range(1, GREATEST(LENGTH(d.text) - {SUF_MIN - 1}, 0) + 1))
             r(i)
    ),
    adj AS (
      SELECT doc_id, pos, s, LENGTH(s) AS ln,
             LAG(doc_id) OVER w AS pdoc,
             LAG(s) OVER w AS ps
      FROM suf
      WINDOW w AS (PARTITION BY SUBSTRING(s, 1, {SUF_B})
                   ORDER BY s, doc_id, pos)
    ),
    cross_adj AS (
      SELECT LEAST(doc_id, pdoc) AS doc_a,
             GREATEST(doc_id, pdoc) AS doc_b,
             s, ps, LEAST(ln, LENGTH(ps)) AS cap
      FROM adj WHERE pdoc IS NOT NULL AND pdoc <> doc_id
    ),
    lcp AS (
      SELECT doc_a, doc_b,
             LEAST(MAX(k.k), ANY_VALUE(cap)) AS pair_lcp
      FROM cross_adj,
           UNNEST(range({SUF_B}, {SUF_K} + 1)) k(k)
      WHERE SUBSTRING(s, 1, CAST(k.k AS INTEGER))
              = SUBSTRING(ps, 1, CAST(k.k AS INTEGER))
      GROUP BY doc_a, doc_b, s, ps, cap
    ),
    per_pair AS (
      SELECT doc_a, doc_b,
             MAX(pair_lcp) AS max_lcp,
             CAST(COUNT(*) AS BIGINT) AS n_anchors
      FROM lcp GROUP BY doc_a, doc_b
      HAVING MAX(pair_lcp) >= {SUF_MIN}
    )
    SELECT doc_a, doc_b, CAST(max_lcp AS BIGINT) AS max_lcp, n_anchors,
           CAST(ROW_NUMBER() OVER (
             ORDER BY max_lcp DESC, doc_a ASC, doc_b ASC
           ) AS BIGINT) AS rn
    FROM per_pair
    QUALIFY rn <= {SUF_TOPK}
    """,
)
def q504_suffix_lcp_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document repeated substrings via the suffix-array
    construction, bucketed: explode every suffix position (truncated
    to {SUF_K} chars), sort suffixes, and take the LCP of ADJACENT
    cross-document entries — the classic SA property that any maximal
    repeat appears as an adjacent pair in suffix order. This is the
    ExactSubstr dedup primitive (Lee et al. 2022) the q253 fixed-gram
    pass approximates: q253 can only see repeats at one gram width,
    this measures the TRUE maximal repeat length per document pair.

    Engine parity: the sort bucket is the first {SUF_B} chars of the
    suffix — two suffixes are adjacent within a bucket iff they are
    adjacent in the full suffix order whenever their LCP >= {SUF_B},
    and pairs below the {SUF_MIN} report threshold are dropped anyway,
    so bucketing changes nothing the query reports. The LCP is
    computed by exploding candidate lengths k and taking MAX(k) where
    the k-prefixes agree (prefix equality is monotone in k), capped by
    both truncated lengths.

    Scale: the suffix explode fans out from the narrow (doc_id, text)
    scan; the sort window is PARTITIONED by the {SUF_B}-char bucket
    (natural-text bucket sizes, the q253 posting-list class — never
    corpus-bound); the LCP fan-out (x{SUF_K - SUF_B + 1}) applies only
    to adjacent CROSS-DOC rows, a vanishing fraction of suffixes; the
    report is pair-grain with a TakeOrdered top-{SUF_TOPK} tail.
    """
    # length filter BEFORE the explode (the q501 lesson: Spark's
    # sequence(1, 0) steps -1 and would emit two bogus suffixes per
    # short doc); DuckDB's range(1, 1) is already empty
    suf = (
        fan_out(
            t(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.length("text") >= SUF_MIN)
        )
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(length(text) - "
                    f"{SUF_MIN - 1}, 0)), i -> substring(text, i, {SUF_K}))"
                )
            ).alias("pos0", "s"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    )
    w = Window.partitionBy(F.substring("s", 1, SUF_B)).orderBy(
        "s", "doc_id", "pos"
    )
    adj = suf.select(
        "doc_id",
        "pos",
        "s",
        F.length("s").alias("ln"),
        F.lag("doc_id").over(w).alias("pdoc"),
        F.lag("s").over(w).alias("ps"),
    )
    cross_adj = adj.filter(
        F.col("pdoc").isNotNull() & (F.col("pdoc") != F.col("doc_id"))
    ).select(
        F.least("doc_id", "pdoc").alias("doc_a"),
        F.greatest("doc_id", "pdoc").alias("doc_b"),
        "s",
        "ps",
        F.least(F.col("ln"), F.length("ps")).alias("cap"),
    )
    lcp = (
        cross_adj.select(
            "doc_a",
            "doc_b",
            "s",
            "ps",
            "cap",
            F.explode(F.sequence(F.lit(SUF_B), F.lit(SUF_K))).alias("k"),
        )
        .filter(
            F.expr("substring(s, 1, k)") == F.expr("substring(ps, 1, k)")
        )
        .groupBy("doc_a", "doc_b", "s", "ps", "cap")
        .agg(F.least(F.max("k"), F.first("cap")).alias("pair_lcp"))
    )
    per_pair = (
        lcp.groupBy("doc_a", "doc_b")
        .agg(
            F.max("pair_lcp").alias("max_lcp"),
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        )
        .filter(F.col("max_lcp") >= SUF_MIN)
    )
    top = per_pair.orderBy(
        F.col("max_lcp").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(SUF_TOPK)
    wr = Window.orderBy(
        F.col("max_lcp").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    )
    return top.select(
        "doc_a",
        "doc_b",
        F.col("max_lcp").cast("bigint").alias("max_lcp"),
        "n_anchors",
        F.row_number().over(wr).cast("bigint").alias("rn"),
    )


# ---------------------------------------------------------------------------
# q505 HDBSCAN-style density / core-distance audit

DENS_BITS = 4  # sign-LSH bucket width: 16 buckets, bounded peers
DENS_K = 3  # core distance = distance to the k-th nearest in-bucket
DENS_T = 0.85  # cosine-distance outlier threshold (p90 at sf0.01)


@register(
    "q505_density_core_audit",
    category="llm-similarity-ann",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_sql_sign_bucket('embedding', DENS_BITS)} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS va, b2.vec_id AS vb, a.label,
             CAST(UNNEST(a.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(b2.embedding) AS DOUBLE) AS y
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id
    ),
    dists AS (
      SELECT va, vb, ANY_VALUE(label) AS label,
             ROUND(1 - SUM(x * y)
                   / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS d
      FROM pairs GROUP BY va, vb
    ),
    core AS (
      SELECT va, label, d AS core_dist
      FROM (
        SELECT va, label, d, ROW_NUMBER() OVER (
                 PARTITION BY va ORDER BY d ASC, vb ASC) AS rn
        FROM dists
      ) WHERE rn = {DENS_K}
    )
    SELECT b.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(c.core_dist) AS BIGINT) AS n_dense,
           CAST(COUNT(*) - COUNT(c.core_dist) AS BIGINT) AS n_sparse,
           ROUND(AVG(c.core_dist), 6) AS avg_core,
           ROUND(MAX(c.core_dist), 6) AS max_core,
           CAST(SUM(CASE WHEN c.core_dist > {DENS_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM b LEFT JOIN core c ON c.va = b.vec_id
    GROUP BY b.label
    ORDER BY b.label
    """,
)
def q505_density_core_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDBSCAN-style density audit over the embedding corpus: each
    vector's CORE DISTANCE (cosine distance to its {DENS_K}-th nearest
    neighbor inside its {DENS_BITS}-bit sign-LSH bucket) is the
    mutual-reachability primitive density-based dedup/clustering
    builds on — per-label distributions plus the count of density
    outliers (core distance > {DENS_T}) that a curation pipeline
    routes to manual review. Complements q72's fixed-threshold
    near-dup pass: q72 asks "who is too CLOSE", this asks "who has no
    dense neighborhood at all".

    Engine parity: distances are ROUND-6 before ranking (identical
    tie surface), ranked with a (distance, vec_id) total order;
    vectors with fewer than {DENS_K} in-bucket peers surface as
    n_sparse via the left join, never as fabricated distances.

    Scale: pairs are bucket-local (sign-LSH, the q71/q74 pattern —
    never corpus x corpus); the rank window partitions per VECTOR
    (bounded by bucket size); the report is label-grain.
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        sign_bucket("embedding", DENS_BITS).alias("bucket"),
        norm_double("embedding").alias("nrm"),
    )
    a = emb.select(
        F.col("vec_id").alias("va"),
        F.col("label"),
        F.col("embedding").alias("ea"),
        "bucket",
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
        F.col("nrm").alias("nb"),
    )
    dists = a.join(
        b,
        (F.col("bucket") == F.col("bucket_b")) & (F.col("va") != F.col("vb")),
    ).select(
        "va",
        "vb",
        "label",
        F.round(
            F.lit(1.0)
            - dot_double("ea", "eb") / (F.col("na") * F.col("nb")),
            6,
        ).alias("d"),
    )
    wk = Window.partitionBy("va").orderBy(F.col("d").asc(), F.col("vb").asc())
    core = (
        dists.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == DENS_K)
        .select("va", F.col("d").alias("core_dist"))
    )
    base = emb.select("vec_id", "label")
    return (
        base.join(core, F.col("vec_id") == F.col("va"), "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.count("core_dist").cast("bigint").alias("n_dense"),
            (F.count(F.lit(1)) - F.count("core_dist"))
            .cast("bigint")
            .alias("n_sparse"),
            F.round(F.avg("core_dist"), 6).alias("avg_core"),
            F.round(F.max("core_dist"), 6).alias("max_core"),
            F.sum(F.when(F.col("core_dist") > DENS_T, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q506 Raft-style replica quorum-placement audit

QUO_R = 3  # replication factor (majority = 2)
QUO_SALT = "quorum_r8"


def _quo_hash_sql() -> str:
    return (
        "CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR) "
        f"|| '|{QUO_SALT}|' || CAST(s_suppkey AS VARCHAR)), 1, 13)) "
        "AS BIGINT)"
    )


@register(
    "q506_quorum_placement_audit",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_nationkey,
             {_quo_hash_sql()} AS h
      FROM part p CROSS JOIN supplier s
    ),
    replicas AS (
      SELECT p_partkey, s_suppkey, s_nationkey
      FROM (
        SELECT p_partkey, s_suppkey, s_nationkey, ROW_NUMBER() OVER (
                 PARTITION BY p_partkey ORDER BY h DESC, s_suppkey ASC
               ) AS rn
        FROM scored
      ) WHERE rn <= {QUO_R}
    ),
    dom AS (
      SELECT p_partkey, s_nationkey, COUNT(*) AS in_dom
      FROM replicas GROUP BY p_partkey, s_nationkey
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part),
    per_nation AS (
      SELECT s_nationkey,
             CAST(SUM(in_dom) AS BIGINT) AS replicas_hosted,
             CAST(SUM(CASE WHEN in_dom * 2 > {QUO_R} THEN 1 ELSE 0 END)
                  AS BIGINT) AS parts_quorum_at_risk,
             CAST(SUM(CASE WHEN in_dom = {QUO_R} THEN 1 ELSE 0 END)
                  AS BIGINT) AS parts_total_loss
      FROM dom GROUP BY s_nationkey
    ),
    nsupp AS (
      SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier
      GROUP BY s_nationkey
    )
    SELECT n.n_nationkey AS nationkey, n.n_name AS nation,
           CAST(COALESCE(ns.n_suppliers, 0) AS BIGINT) AS n_suppliers,
           COALESCE(pn.replicas_hosted, 0) AS replicas_hosted,
           COALESCE(pn.parts_quorum_at_risk, 0) AS parts_quorum_at_risk,
           COALESCE(pn.parts_total_loss, 0) AS parts_total_loss,
           ROUND(COALESCE(pn.parts_quorum_at_risk, 0) * 1.0 / t.n_parts,
                 6) AS risk_share
    FROM nation n
    LEFT JOIN per_nation pn ON pn.s_nationkey = n.n_nationkey
    LEFT JOIN nsupp ns ON ns.s_nationkey = n.n_nationkey
    CROSS JOIN tot t
    ORDER BY nationkey
    """,
)
def q506_quorum_placement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raft-style quorum placement audit: each part (key) places
    {QUO_R} replicas on the suppliers (nodes) with the highest
    rendezvous weights md5(part|supplier) — the q446 HRW map extended
    to replica SETS — and the audit asks, per nation (failure
    domain), how many keys would lose write QUORUM (majority of
    replicas, > {QUO_R}/2, inside the failing domain) and how many
    would lose ALL replicas. This is the placement-safety check a
    quorum-replicated 100 TB store runs before accepting a topology:
    rendezvous placement is domain-oblivious, so domain-concentrated
    replica sets are a real (and here, measured) hazard.

    Determinism: md5-derived 52-bit weights, ties to the smallest
    supplier id; counts integer; the only division is the final
    risk share on the nation grain.

    Scale: the score relation is keys x NODES — nodes are a bounded
    cluster dimension (hundreds to thousands), exactly the cost
    rendezvous placement itself pays; the top-{QUO_R} rank window
    partitions per KEY over that bounded node set; everything after
    is (key, domain)- then domain-grain. Nations enter via a
    broadcast-size dimension join.
    """
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = t(spark, sf_dir, "part").select("p_partkey")
    scored = p.crossJoin(F.broadcast(s)).select(
        "p_partkey",
        "s_suppkey",
        "s_nationkey",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("p_partkey").cast("string"),
                        F.lit("|" + QUO_SALT + "|"),
                        F.col("s_suppkey").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    wr = Window.partitionBy("p_partkey").orderBy(
        F.col("h").desc(), F.col("s_suppkey").asc()
    )
    replicas = (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= QUO_R)
        .select("p_partkey", "s_suppkey", "s_nationkey")
    )
    dom = replicas.groupBy("p_partkey", "s_nationkey").agg(
        F.count(F.lit(1)).alias("in_dom")
    )
    tot = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    per_nation = dom.groupBy("s_nationkey").agg(
        F.sum("in_dom").cast("bigint").alias("replicas_hosted"),
        F.sum(F.when(F.col("in_dom") * 2 > QUO_R, 1).otherwise(0))
        .cast("bigint")
        .alias("parts_quorum_at_risk"),
        F.sum(F.when(F.col("in_dom") == QUO_R, 1).otherwise(0))
        .cast("bigint")
        .alias("parts_total_loss"),
    )
    nsupp = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers")
    )
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        n.join(
            per_nation, n.n_nationkey == per_nation.s_nationkey, "left"
        )
        .drop("s_nationkey")
        .join(nsupp, n.n_nationkey == nsupp.s_nationkey, "left")
        .drop("s_nationkey")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
            F.coalesce("n_suppliers", F.lit(0))
            .cast("bigint")
            .alias("n_suppliers"),
            F.coalesce("replicas_hosted", F.lit(0)).alias(
                "replicas_hosted"
            ),
            F.coalesce("parts_quorum_at_risk", F.lit(0)).alias(
                "parts_quorum_at_risk"
            ),
            F.coalesce("parts_total_loss", F.lit(0)).alias(
                "parts_total_loss"
            ),
            F.round(
                F.coalesce("parts_quorum_at_risk", F.lit(0))
                * F.lit(1.0)
                / F.col("n_parts"),
                6,
            ).alias("risk_share"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# q507 clustering agreement: adjusted Rand index + purity

ARI_BITS = 4  # sign-LSH "clustering" under audit (16 clusters)


@register(
    "q507_adjusted_rand_index",
    category="llm-similarity-ann",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label,
             {_sql_sign_bucket('embedding', ARI_BITS)} AS bucket
      FROM embeddings
    ),
    cell AS (
      SELECT bucket, label, CAST(COUNT(*) AS DECIMAL(38,0)) AS nij
      FROM b GROUP BY bucket, label
    ),
    rows_ AS (
      SELECT bucket, CAST(SUM(nij) AS DECIMAL(38,0)) AS ai,
             MAX(nij) AS mx
      FROM cell GROUP BY bucket
    ),
    cols_ AS (
      SELECT label, CAST(SUM(nij) AS DECIMAL(38,0)) AS bj
      FROM cell GROUP BY label
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_clusters,
             CAST(COUNT(DISTINCT label) AS BIGINT) AS n_classes
      FROM b
    ),
    sums AS (
      -- doubled pair counts: x*(x-1) stays in exact DECIMAL(38,0)
      -- integer space (decimal DIVISION semantics differ between
      -- engines — the q276 lesson); the /2 happens in double below
      SELECT
        (SELECT SUM(nij * (nij - 1)) FROM cell) AS s_cells2,
        (SELECT SUM(ai * (ai - 1)) FROM rows_) AS s_rows2,
        (SELECT SUM(bj * (bj - 1)) FROM cols_) AS s_cols2,
        (SELECT SUM(mx) FROM rows_) AS s_purity
    )
    SELECT CAST(t.n AS BIGINT) AS n_vecs,
           t.n_clusters, t.n_classes,
           ROUND((CAST(s.s_cells2 AS DOUBLE) / 2
                  - (CAST(s.s_rows2 AS DOUBLE) / 2)
                    * (CAST(s.s_cols2 AS DOUBLE) / 2)
                    / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) - 1)
                       / 2))
                 / NULLIF((CAST(s.s_rows2 AS DOUBLE) / 2
                           + CAST(s.s_cols2 AS DOUBLE) / 2) / 2
                          - (CAST(s.s_rows2 AS DOUBLE) / 2)
                            * (CAST(s.s_cols2 AS DOUBLE) / 2)
                            / (CAST(t.n AS DOUBLE)
                               * (CAST(t.n AS DOUBLE) - 1) / 2), 0),
                 6) AS ari,
           ROUND(CAST(s.s_purity AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
             AS purity
    FROM tot t CROSS JOIN sums s
    """,
)
def q507_adjusted_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-agreement audit: the adjusted Rand index (Hubert &
    Arabie 1985) between the {ARI_BITS}-bit sign-LSH bucketing and the
    ground-truth labels, plus cluster purity — the standard "is this
    cheap hash clustering aligned with semantics at all" check run
    before trusting LSH buckets for stratification or dedup blocking
    (q62/q71/q505 all build on these buckets; this measures them).

    Exactness: every pair count C(x,2) = x(x-1)/2 is computed in
    DECIMAL(38,0) (cell counts ~1e12 at corpus scale overflow BIGINT
    products — the q503 lesson); the expected-index correction and
    the two final divisions are the only doubles, on identical
    operands in both engines, ROUND-6 at the boundary. Degenerate
    single-cluster/single-class corpora zero the denominator and
    NULL the ARI identically via NULLIF.

    Scale: one (bucket, label)-grain aggregate over the corpus, then
    16-row / 10-row / 1-row reductions. No pairs materialize — the
    pair counts are closed-form in the contingency cells.
    """
    b = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", sign_bucket("embedding", ARI_BITS).alias("bucket")
    )
    cell = b.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nij")
    )

    def paired2(c: F.Column) -> F.Column:
        # DOUBLED pair count x*(x-1): exact DECIMAL(38,0) integers —
        # decimal division semantics differ between engines (q276
        # lesson), so the /2 happens in double space at the end
        return c * (c - 1)

    rows_ = cell.groupBy("bucket").agg(
        F.sum("nij").cast("decimal(38,0)").alias("ai"),
        F.max("nij").alias("mx"),
    )
    cols_ = cell.groupBy("label").agg(
        F.sum("nij").cast("decimal(38,0)").alias("bj")
    )
    tot = b.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.countDistinct("bucket").cast("bigint").alias("n_clusters"),
        F.countDistinct("label").cast("bigint").alias("n_classes"),
    )
    s_cells = cell.agg(F.sum(paired2(F.col("nij"))).alias("s_cells2"))
    s_rows = rows_.agg(
        F.sum(paired2(F.col("ai"))).alias("s_rows2"),
        F.sum("mx").alias("s_purity"),
    )
    s_cols = cols_.agg(F.sum(paired2(F.col("bj"))).alias("s_cols2"))
    nd = F.col("n").cast("double")
    pairs_n = nd * (nd - 1) / 2
    half_rows = F.col("s_rows2").cast("double") / 2
    half_cols = F.col("s_cols2").cast("double") / 2
    expected = half_rows * half_cols / pairs_n
    return (
        tot.crossJoin(F.broadcast(s_cells))
        .crossJoin(F.broadcast(s_rows))
        .crossJoin(F.broadcast(s_cols))
        .select(
            F.col("n").cast("bigint").alias("n_vecs"),
            "n_clusters",
            "n_classes",
            F.round(
                (F.col("s_cells2").cast("double") / 2 - expected)
                / F.nullif(
                    (half_rows + half_cols) / 2 - expected,
                    F.lit(0.0),
                ),
                6,
            ).alias("ari"),
            F.round(
                F.col("s_purity").cast("double") / nd, 6
            ).alias("purity"),
        )
    )


# ---------------------------------------------------------------------------
# q508 MinHash sketch fidelity audit (estimator vs exact Jaccard)


@register(
    "q508_minhash_fidelity",
    category="llm-dedup",
    oracle=f"""
    WITH {_minhash_pairs_ctes()},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    est AS (
      SELECT p.doc_a, p.doc_b,
             ({" + ".join(
                 f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                 for i in range(N_HASHES)
             )}) AS matches
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
    ),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b2 ON b2.doc_id = p.doc_b AND b2.shingle = a.shingle
      GROUP BY p.doc_a, p.doc_b
    ),
    scored AS (
      SELECT e.matches,
             ROUND(ABS(e.matches / {N_HASHES}.0
                       - COALESCE(c.n_common, 0) * 1.0
                         / (za.sz + zb.sz - COALESCE(c.n_common, 0))),
                   6) AS err,
             ROUND(COALESCE(c.n_common, 0) * 1.0
                   / (za.sz + zb.sz - COALESCE(c.n_common, 0)), 6)
               AS true_j
      FROM est e
      LEFT JOIN common c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
      JOIN sizes za ON za.doc_id = e.doc_a
      JOIN sizes zb ON zb.doc_id = e.doc_b
    )
    SELECT matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           -- half-up 1e-6 grid, not ROUND: the mean can land exactly
           -- on a .5e-6 boundary where the engines' ROUND-on-double
           -- implementations disagree by one grid step
           FLOOR(CAST(SUM(CAST(true_j AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_true_jaccard,
           FLOOR(CAST(SUM(CAST(err AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_abs_err,
           MAX(err) AS max_abs_err
    FROM scored GROUP BY matches ORDER BY matches
    """,
)
def q508_minhash_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-fidelity audit for the q62 MinHash pipeline: for every
    LSH candidate pair, compare the 8-hash signature ESTIMATE of
    Jaccard similarity (matching minhashes / 8) against the EXACT
    shingle-set Jaccard, reported per estimate level — the
    calibration curve that tells a dedup operator what a band
    collision actually means before they pick thresholds. (q62 emits
    the candidates; q61 computes exact Jaccard over ALL co-shingle
    pairs; this joins the two views on the candidate set only.)

    Exactness: estimates are exact multiples of 1/8 (binary-exact
    doubles); exact Jaccard and the absolute error are single
    divisions of integers, ROUND-6 per pair, then summed as
    DECIMAL(18,6) so the per-level means are order-independent and
    engine-identical.

    Scale: candidate pairs are LSH-bounded (banded buckets with the
    {MAX_LSH_BUCKET}-cap, never docs²); the exact-Jaccard join fans
    each pair out by ONE document's shingle set — pair-grain × doc
    length, the same order as scoring the candidates at all.
    """
    pairs = _minhash_pairs(spark, sf_dir).localCheckpoint(eager=False)
    sig = _signatures(spark, sf_dir)
    sh = _shingle_df(spark, sf_dir, 3, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    est = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", matches.alias("matches"))
    )
    common = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    true_j = nc * F.lit(1.0) / (F.col("sza") + F.col("szb") - nc)
    scored = (
        est.join(common, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "matches",
            F.round(
                F.abs(F.col("matches") / F.lit(float(N_HASHES)) - true_j), 6
            ).alias("err"),
            F.round(true_j, 6).alias("true_j"),
        )
    )
    return (
        scored.groupBy("matches")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            # half-up 1e-6 grid (not F.round): boundary-safe cross-
            # engine, same double ops on both sides
            (
                F.floor(
                    F.sum(F.col("true_j").cast("decimal(18,6)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_true_jaccard"),
            (
                F.floor(
                    F.sum(F.col("err").cast("decimal(18,6)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("mean_abs_err"),
            F.max("err").alias("max_abs_err"),
        )
        .orderBy("matches")
    )


# ---------------------------------------------------------------------------
# q509 intra-document repetition (boilerplate) audit

REP_MIN = 8  # minimum internal repeat length worth counting
REP_BOILER = 20  # docs whose longest internal repeat reaches this
# are flagged as boilerplate-heavy


@register(
    "q509_intradoc_repetition",
    category="llm-text-analysis",
    oracle=f"""
    WITH suf AS (
      SELECT d.doc_id, d.source, r.i AS pos,
             SUBSTRING(d.text, CAST(r.i AS INTEGER), {SUF_K}) AS s
      FROM documents d,
           UNNEST(range(1, GREATEST(LENGTH(d.text) - {REP_MIN - 1}, 0) + 1))
             r(i)
    ),
    adj AS (
      SELECT doc_id, source, s, LENGTH(s) AS ln,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s, pos) AS ps
      FROM suf
    ),
    cand AS (
      SELECT doc_id, source, s, ps, LEAST(ln, LENGTH(ps)) AS cap
      FROM adj
      WHERE ps IS NOT NULL
        AND SUBSTRING(s, 1, {REP_MIN}) = SUBSTRING(ps, 1, {REP_MIN})
    ),
    lcp AS (
      SELECT doc_id, source,
             LEAST(MAX(k.k), cap) AS rep_len
      FROM cand,
           UNNEST(range({REP_MIN}, {SUF_K} + 1)) k(k)
      WHERE SUBSTRING(s, 1, CAST(k.k AS INTEGER))
              = SUBSTRING(ps, 1, CAST(k.k AS INTEGER))
      GROUP BY doc_id, source, s, ps, cap
    ),
    per_doc AS (
      SELECT d.doc_id, d.source,
             COALESCE(MAX(l.rep_len), 0) AS max_rep,
             CAST(COUNT(l.rep_len) AS BIGINT) AS n_repeats
      FROM documents d LEFT JOIN lcp l ON l.doc_id = d.doc_id
      GROUP BY d.doc_id, d.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN max_rep >= {REP_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_repeats,
           CAST(SUM(CASE WHEN max_rep >= {REP_BOILER} THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_boilerplate,
           CAST(MAX(max_rep) AS BIGINT) AS longest_repeat,
           CAST(SUM(n_repeats) AS BIGINT) AS total_repeat_anchors,
           ROUND(SUM(CASE WHEN max_rep >= {REP_BOILER} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS boilerplate_share
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q509_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition audit: the longest substring a
    document repeats WITHIN itself (adjacent-suffix LCP with both
    suffixes from the same doc — the single-doc slice of the q504
    construction) — the boilerplate/template signal quality filters
    use that neither cross-doc dedup (q504) nor char-stat scoring
    (q80) captures: a doc that repeats a {REP_BOILER}+ char block is
    navigation chrome, a log loop, or generated filler.

    Engine parity: suffixes sort PER DOCUMENT (no bucket needed —
    the partition is the doc), candidates prefilter on {REP_MIN}-char
    prefix equality before the LCP explode, LCP is the monotone
    prefix-equality MAX capped by both truncated lengths; docs with
    no repeats enter via the left join with max_rep 0.

    Scale: the suffix window partitions per doc (bounded by document
    length, never corpus-bound); the LCP explode applies only to
    prefix-matching adjacent rows; the report is source-grain.
    """
    suf = (
        fan_out(
            t(spark, sf_dir, "documents")
            .select("doc_id", "source", "text")
            .filter(F.length("text") >= REP_MIN)
        )
        .select(
            "doc_id",
            "source",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(length(text) - "
                    f"{REP_MIN - 1}, 0)), i -> substring(text, i, {SUF_K}))"
                )
            ).alias("pos0", "s"),
        )
        .select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "s")
    )
    w = Window.partitionBy("doc_id").orderBy("s", "pos")
    cand = (
        suf.select(
            "doc_id",
            "source",
            "s",
            F.length("s").alias("ln"),
            F.lag("s").over(w).alias("ps"),
            "pos",
        )
        .filter(
            F.col("ps").isNotNull()
            & (
                F.substring("s", 1, REP_MIN)
                == F.substring("ps", 1, REP_MIN)
            )
        )
        .select(
            "doc_id",
            "source",
            "s",
            "ps",
            F.least(F.col("ln"), F.length("ps")).alias("cap"),
        )
    )
    lcp = (
        cand.select(
            "doc_id",
            "source",
            "s",
            "ps",
            "cap",
            F.explode(F.sequence(F.lit(REP_MIN), F.lit(SUF_K))).alias("k"),
        )
        .filter(
            F.expr("substring(s, 1, k)") == F.expr("substring(ps, 1, k)")
        )
        .groupBy("doc_id", "source", "s", "ps", "cap")
        .agg(F.least(F.max("k"), F.first("cap")).alias("rep_len"))
    )
    per_doc = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .join(lcp.select("doc_id", "rep_len"), "doc_id", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.coalesce(F.max("rep_len"), F.lit(0)).alias("max_rep"),
            F.count("rep_len").cast("bigint").alias("n_repeats"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum(F.when(F.col("max_rep") >= REP_MIN, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_repeats"),
            F.sum(F.when(F.col("max_rep") >= REP_BOILER, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_boilerplate"),
            F.max("max_rep").cast("bigint").alias("longest_repeat"),
            F.sum("n_repeats").cast("bigint").alias("total_repeat_anchors"),
            F.round(
                F.sum(
                    F.when(F.col("max_rep") >= REP_BOILER, 1).otherwise(0)
                )
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("boilerplate_share"),
        )
        .orderBy("source")
    )
