"""Round-9 operators (q513+): incremental MinHash index maintenance
(the update-rule certificate for q62's LSH dedup — what a streaming
ingest pipeline runs per batch instead of re-sketching the corpus),
an HNSW-style layered-graph index build audit (the graph member of
the ANN shelf beside q71 LSH / q74 IVF / q343 PQ), and a shuffle-free
two-table AMS join-size estimator (the cross-table composition of
q400's F2 self-join sketch, feeding q431's CBO advisor).

Conventions: exact integer arithmetic until a final division,
dround/sql_dround grids at output boundaries (never bare ROUND —
tests/test_round_census.py), NULLIF guards for ANSI division, no
unpartitioned window over a corpus-bound grain, every per-bucket
fan-in capped by a shared deterministic spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, sql_dround, t
from .dedup import MAX_LSH_BUCKET, N_BANDS, _signatures, _sql_shingles
from .similarity import dot_double, norm_double

# ---------------------------------------------------------------------------
# q513 incremental MinHash index maintenance

INC_DELTA_HEX = "0123"  # md5 first-nibble in this set -> delta doc (1/4)


def _sql_is_delta(col: str) -> str:
    return (
        f"strpos('{INC_DELTA_HEX}', substr(md5(CAST({col} AS VARCHAR)"
        f" || '_inc'), 1, 1)) > 0"
    )


def _is_delta(col: str) -> F.Column:
    return F.substring(
        F.md5(F.concat(F.col(col).cast("string"), F.lit("_inc"))), 1, 1
    ).isin(*list(INC_DELTA_HEX))


@register(
    "q513_incremental_minhash",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH {_sql_shingles(3)},
    hashed AS (SELECT doc_id, md5(shingle) AS h1 FROM sh),
    sig AS (
      SELECT doc_id,
        {", ".join(
            f"MIN(CAST('0x' || substr(h1, {i * 4 + 1}, 4) AS BIGINT)) AS h{i}"
            for i in range(8))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band,"
          f" h{2 * b} * 65536 + h{2 * b + 1} AS bkey,"
          f" {_sql_is_delta('doc_id')} AS is_delta FROM sig"
          for b in range(N_BANDS))}
    ),
    bsz AS (
      SELECT band, bkey, COUNT(*) AS n,
             SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS n_delta
      FROM bands GROUP BY band, bkey
    ),
    live AS (
      SELECT band, bkey, n, n_delta FROM bsz
      WHERE n BETWEEN 2 AND {MAX_LSH_BUCKET}
    ),
    -- route 1 (incremental update rule): join the DELTA band keys
    -- against the full bucket index; a pair is new iff either side
    -- is a delta doc
    inc AS (
      SELECT DISTINCT d.band,
             LEAST(d.doc_id, o.doc_id) AS doc_a,
             GREATEST(d.doc_id, o.doc_id) AS doc_b
      FROM bands d
      JOIN bands o ON o.band = d.band AND o.bkey = d.bkey
                  AND o.doc_id <> d.doc_id
      JOIN live s ON s.band = d.band AND s.bkey = d.bkey
      WHERE d.is_delta
    ),
    -- route 2 (full recompute): every in-cap collision pair, then
    -- restricted to delta-involving
    full_pairs AS (
      SELECT a.band, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON b.band = a.band AND b.bkey = a.bkey
                  AND a.doc_id < b.doc_id
      JOIN live s ON s.band = a.band AND s.bkey = a.bkey
      WHERE {_sql_is_delta('a.doc_id')} OR {_sql_is_delta('b.doc_id')}
    ),
    per_band AS (
      SELECT b.band,
             CAST(COUNT(DISTINCT CASE WHEN l.n_delta > 0
                                      THEN l.bkey END) AS BIGINT)
               AS touched_buckets,
             CAST(COALESCE((SELECT COUNT(*) FROM inc i
                            WHERE i.band = b.band), 0) AS BIGINT)
               AS inc_pairs,
             CAST(COALESCE((SELECT COUNT(*) FROM full_pairs f
                            WHERE f.band = b.band), 0) AS BIGINT)
               AS full_pairs
      FROM (SELECT DISTINCT band FROM bands) b
      LEFT JOIN live l ON l.band = b.band
      GROUP BY b.band
    )
    SELECT band, touched_buckets, inc_pairs, full_pairs,
           inc_pairs = full_pairs AS rule_exact
    FROM per_band
    """,
)
def q513_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash/LSH index maintenance audit — the update
    rule a streaming dedup pipeline runs per ingest batch: new (delta)
    documents sketch THEMSELVES only, join their band keys against
    the standing bucket index, and emit candidate pairs touching a
    delta doc. Certified per band against the full recompute (q62's
    bucket-collect route restricted to delta-involving pairs):
    ``rule_exact`` must read true everywhere, proving the incremental
    rule loses nothing — the streaming twin of q62 (delta split is a
    deterministic md5 quarter of doc_ids).

    Determinism: bands/buckets are q62's shared integer spec (16-bit
    md5-chunk minhashes, 32-bit band keys, combined-size cap
    {MAX_LSH_BUCKET}); delta membership is a pure hash of doc_id, so
    both engines and both routes see identical sets.

    Scale: the incremental route is the point — per batch it is
    O(delta shingles) sketch work plus one join of delta band keys
    against a bucket-keyed index (uniform 32-bit keys, no skew), with
    the same bucket cap bounding any degenerate collision group. The
    full-recompute route exists only as the audit's reference side.
    Spark computes it via the q62 bucket-collect (one shuffle, pairs
    emitted JVM-side from capped buckets) rather than the oracle's
    self-join — route diversity is what makes the certificate real.
    """
    sig = _signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"h{2 * b}") * F.lit(1 << 16)
                            + F.col(f"h{2 * b + 1}")
                        ).alias("bkey"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id", "bk.band", "bk.bkey", _is_delta("doc_id").alias("is_delta")
    )
    wb = Window.partitionBy("band", "bkey")
    sized = bands.withColumn(
        "n", F.count(F.lit(1)).over(wb)
    ).withColumn(
        "n_delta", F.sum(F.col("is_delta").cast("int")).over(wb)
    )
    live = sized.filter(
        (F.col("n") >= 2) & (F.col("n") <= MAX_LSH_BUCKET)
    )
    # route 1: incremental update rule — delta rows joined back to
    # their (band, bkey) bucket members
    delta_side = live.filter("is_delta").select(
        "band", "bkey", F.col("doc_id").alias("d")
    )
    inc = (
        delta_side.join(
            live.select("band", "bkey", F.col("doc_id").alias("o")),
            ["band", "bkey"],
        )
        .filter(F.col("o") != F.col("d"))
        .select(
            "band",
            F.least("d", "o").alias("doc_a"),
            F.greatest("d", "o").alias("doc_b"),
        )
        .distinct()
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inc_pairs"))
    )
    # route 2: full recompute via the q62 bucket-collect shape (pairs
    # emitted from each capped bucket's sorted doc list), then the
    # delta-involving restriction as a pure hash of the pair ids
    buckets = (
        live.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    full = (
        buckets.select(
            "band",
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p"),
        )
        .select("band", "p.doc_a", "p.doc_b")
        .filter(_is_delta("doc_a") | _is_delta("doc_b"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("full_pairs"))
    )
    touched = (
        live.filter(F.col("n_delta") > 0)
        .select("band", "bkey")
        .distinct()
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("touched_buckets"))
    )
    base = bands.select("band").distinct()
    return (
        base.join(touched, "band", "left")
        .join(inc, "band", "left")
        .join(full, "band", "left")
        .select(
            "band",
            F.coalesce("touched_buckets", F.lit(0)).cast("bigint").alias(
                "touched_buckets"
            ),
            F.coalesce("inc_pairs", F.lit(0)).cast("bigint").alias("inc_pairs"),
            F.coalesce("full_pairs", F.lit(0)).cast("bigint").alias(
                "full_pairs"
            ),
            (
                F.coalesce("inc_pairs", F.lit(0))
                == F.coalesce("full_pairs", F.lit(0))
            ).alias("rule_exact"),
        )
    )


# ---------------------------------------------------------------------------
# q514 HNSW-style layered-graph index build audit

HNSW_MAX_LAYER = 4  # geometric layer cap (p = 1/2 per level, M = 2 style)
HNSW_M = 4  # out-degree target per node per layer
HNSW_BUCKET_BITS = 3  # sign-LSH buckets bounding candidate sets (8)
HNSW_BUCKET_CAP = 100  # audited members per (layer, bucket), md5 order


def _sql_hnsw_layer(col: str) -> str:
    # trailing-zero bits of a 32-bit md5 hash -> geometric levels
    h = (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || '_hnsw'),"
        f" 1, 8) AS BIGINT)"
    )
    return (
        f"CASE WHEN {h} % 2 = 1 THEN 0 WHEN {h} % 4 = 2 THEN 1"
        f" WHEN {h} % 8 = 4 THEN 2 WHEN {h} % 16 = 8 THEN 3"
        f" ELSE {HNSW_MAX_LAYER} END"
    )


def _hnsw_layer(col: str) -> F.Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(col).cast("string"), F.lit("_hnsw"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        F.when(h % 2 == 1, 0)
        .when(h % 4 == 2, 1)
        .when(h % 8 == 4, 2)
        .when(h % 16 == 8, 3)
        .otherwise(HNSW_MAX_LAYER)
    )


def _sql_hnsw_bucket() -> str:
    cases = ", ".join(
        f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(HNSW_BUCKET_BITS)
    )
    return f"CONCAT({cases})"


@register(
    "q514_hnsw_layer_audit",
    category="similarity-search",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding,
             {_sql_hnsw_layer('vec_id')} AS node_layer,
             {_sql_hnsw_bucket()} AS bucket
      FROM embeddings
    ),
    member AS (
      -- node participates in every layer l <= its node_layer
      SELECT l.l AS layer, vec_id, embedding, node_layer, bucket
      FROM v, UNNEST(range(0, {HNSW_MAX_LAYER} + 1)) l(l)
      WHERE l.l <= node_layer
    ),
    capped AS (
      SELECT * FROM (
        SELECT layer, vec_id, embedding, node_layer, bucket,
               ROW_NUMBER() OVER (
                 PARTITION BY layer, bucket
                 ORDER BY CAST('0x' || substr(md5(
                     CAST(vec_id AS VARCHAR) || ':' ||
                     CAST(layer AS VARCHAR)), 1, 7) AS BIGINT), vec_id
               ) AS crk
        FROM member)
      WHERE crk <= {HNSW_BUCKET_CAP}
    ),
    zipped AS (
      -- parallel UNNEST zips positionally (the q70 convention)
      SELECT a.layer, a.vec_id AS u, b.vec_id AS cand,
             b.node_layer AS cand_layer,
             CAST(UNNEST(a.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(b.embedding) AS DOUBLE) AS y
      FROM capped a
      JOIN capped b ON b.layer = a.layer AND b.bucket = a.bucket
                   AND b.vec_id <> a.vec_id
    ),
    dots AS (
      SELECT layer, u, cand, cand_layer,
             SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS na,
             SQRT(SUM(y * y)) AS nb
      FROM zipped
      GROUP BY layer, u, cand, cand_layer
    ),
    ranked AS (
      SELECT layer, u, cand, cand_layer,
             ROW_NUMBER() OVER (
               PARTITION BY layer, u
               ORDER BY {sql_dround("dot / NULLIF(na * nb, 0)", 6)} DESC, cand ASC
             ) AS rn
      FROM dots
    ),
    nbr AS (
      SELECT layer, u,
             COUNT(*) AS deg,
             MAX(CASE WHEN cand_layer > layer THEN 1 ELSE 0 END) AS esc
      FROM ranked WHERE rn <= {HNSW_M}
      GROUP BY layer, u
    ),
    per_layer AS (
      SELECT c.layer,
             CAST(COUNT(*) AS BIGINT) AS n_audited,
             CAST(SUM(CASE WHEN n.deg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_isolated,
             CAST(SUM(COALESCE(n.deg, 0)) AS BIGINT) AS total_deg,
             CAST(SUM(CASE WHEN COALESCE(n.esc, 0) = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_escape
      FROM capped c
      LEFT JOIN nbr n ON n.layer = c.layer AND n.u = c.vec_id
      GROUP BY c.layer
    )
    SELECT layer, n_audited, n_isolated,
           {sql_dround("CAST(total_deg AS DOUBLE) / n_audited", 6)}
             AS avg_degree,
           {sql_dround(
               "CAST(n_escape AS DOUBLE) / NULLIF(n_audited - n_isolated, 0)",
               6)} AS escape_rate
    FROM per_layer
    ORDER BY layer
    """,
)
def q514_hnsw_layer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW-style layered ANN graph build audit (Malkov & Yashunin
    2018): assign every vector a geometric layer (trailing-zero bits
    of an id hash — the deterministic stand-in for HNSW's
    floor(-ln(U)·mL) draw), build each layer's neighbor lists as
    cosine top-{HNSW_M} within sign-LSH buckets among nodes of that
    layer and above, and report the three properties a navigable
    hierarchy needs: geometric layer occupancy, healthy out-degree,
    and a nonzero ESCAPE RATE (neighbors reaching a higher layer —
    what greedy search descends through). The graph member of the ANN
    shelf beside q71 (LSH), q74 (IVF), q343 (PQ); a real HNSW build
    is sequential-insert, this is the order-free bulk variant whose
    metrics upper-bound what the sequential build can achieve.

    Determinism: layers and the per-bucket audit cap are pure md5
    functions of vec_id; cosine ranks are dround-6 grid values with
    vec_id tie-breaks.

    Scale: candidate generation is bucket-local (2^{HNSW_BUCKET_BITS}
    sign buckets) AND capped at {HNSW_BUCKET_CAP} audited members per
    (layer, bucket) by a deterministic md5 order — the q62/q504
    shared-spec cap — so pair work is O(layers · buckets · cap²) with
    a WindowGroupLimit pre-limit, never corpus². Layer membership
    fans out at most {HNSW_MAX_LAYER + 1}x but decays geometrically
    (E[copies per node] < 2).
    """
    from .similarity import sign_bucket

    v = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _hnsw_layer("vec_id").alias("node_layer"),
        sign_bucket("embedding", HNSW_BUCKET_BITS).alias("bucket"),
    )
    member = v.select(
        F.explode(
            F.sequence(F.lit(0), F.col("node_layer"))
        ).alias("layer"),
        "vec_id",
        "embedding",
        "node_layer",
        "bucket",
    )
    crk_key = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("vec_id").cast("string"),
                    F.lit(":"),
                    F.col("layer").cast("string"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    wcap = Window.partitionBy("layer", "bucket").orderBy(crk_key, "vec_id")
    capped = (
        member.withColumn("crk", F.row_number().over(wcap))
        .filter(F.col("crk") <= HNSW_BUCKET_CAP)
        .drop("crk")
    )
    a = capped.select(
        "layer",
        "bucket",
        F.col("vec_id").alias("u"),
        F.col("embedding").alias("ea"),
    ).withColumn("na", norm_double("ea"))
    b = capped.select(
        "layer",
        "bucket",
        F.col("vec_id").alias("cand"),
        F.col("node_layer").alias("cand_layer"),
        F.col("embedding").alias("eb"),
    ).withColumn("nb", norm_double("eb"))
    pairs = a.join(b, ["layer", "bucket"]).filter(F.col("cand") != F.col("u"))
    cosine = dround(
        dot_double("ea", "eb")
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        6,
    )
    wr = Window.partitionBy("layer", "u").orderBy(
        cosine.desc(), F.col("cand").asc()
    )
    nbr = (
        pairs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= HNSW_M)
        .groupBy("layer", "u")
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.max(
                (F.col("cand_layer") > F.col("layer")).cast("int")
            ).alias("esc"),
        )
        .select(
            F.col("layer").alias("nlayer"),
            F.col("u").alias("nu"),
            "deg",
            "esc",
        )
    )
    per_layer = (
        capped.join(
            nbr,
            (F.col("nlayer") == F.col("layer"))
            & (F.col("nu") == F.col("vec_id")),
            "left",
        )
        .select(
            F.col("layer").alias("l"),
            "deg",
            "esc",
        )
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_audited"),
            F.sum(F.when(F.col("deg").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_isolated"),
            F.sum(F.coalesce("deg", F.lit(0))).cast("bigint").alias(
                "total_deg"
            ),
            F.sum(F.when(F.coalesce("esc", F.lit(0)) == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_escape"),
        )
    )
    return (
        per_layer.select(
            F.col("l").alias("layer"),
            "n_audited",
            "n_isolated",
            dround(
                F.col("total_deg").cast("double") / F.col("n_audited"), 6
            ).alias("avg_degree"),
            dround(
                F.col("n_escape").cast("double")
                / F.nullif(
                    (F.col("n_audited") - F.col("n_isolated")).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("escape_rate"),
        )
        .orderBy("layer")
    )


# ---------------------------------------------------------------------------
# q515 shuffle-free two-table AMS join-size estimator

JS_EST = 32  # ±1-sign estimators, one md5 nibble each
JS_GROUPS = 4  # median-of-means groups (8 estimators each)


def _js_sign_sql(col: str, e: int) -> str:
    return (
        f"CASE WHEN strpos('89abcdef', substr(md5(CAST({col} AS VARCHAR)"
        f" || '_js'), {e + 1}, 1)) > 0 THEN 1 ELSE -1 END"
    )


@register(
    "q515_join_size_ams",
    category="mixed-extensions",
    oracle=f"""
    WITH co AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ),
    cl AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    sa AS (
      SELECT
        {", ".join(f"SUM(({_js_sign_sql('k', e)}) * c) AS a{e}"
                   for e in range(JS_EST))},
        COUNT(*) AS keys_a, SUM(c) AS rows_a
      FROM co
    ),
    sb AS (
      SELECT
        {", ".join(f"SUM(({_js_sign_sql('k', e)}) * c) AS b{e}"
                   for e in range(JS_EST))},
        COUNT(*) AS keys_b, SUM(c) AS rows_b
      FROM cl
    ),
    exact AS (
      SELECT SUM(co.c * cl.c) AS join_exact
      FROM co JOIN cl ON cl.k = co.k
    ),
    means AS (
      SELECT keys_a, rows_a, keys_b, rows_b,
        {", ".join(
            "(" + " + ".join(f"a{g * 8 + i} * b{g * 8 + i}" for i in range(8))
            + f") / 8.0 AS g{g}" for g in range(JS_GROUPS))}
      FROM sa, sb
    ),
    med AS (
      SELECT keys_a, rows_a, keys_b, rows_b,
             LIST_SORT([g0, g1, g2, g3]) AS gs
      FROM means
    )
    SELECT CAST((SELECT join_exact FROM exact) AS BIGINT) AS join_exact,
           {sql_dround("(gs[2] + gs[3]) / 2.0", 4)} AS join_est,
           {sql_dround(
               "((gs[2] + gs[3]) / 2.0"
               " - (SELECT join_exact FROM exact))"
               " / NULLIF((SELECT join_exact FROM exact), 0)", 6)}
             AS rel_err,
           CAST(keys_a AS BIGINT) AS keys_a,
           CAST(rows_a AS BIGINT) AS rows_a,
           CAST(keys_b AS BIGINT) AS keys_b,
           CAST(rows_b AS BIGINT) AS rows_b
    FROM med
    """,
)
def q515_join_size_ams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free two-table join-size estimator: |orders ⋈ lineitem
    on orderkey| from paired AMS ±1-sign sketches — E[S_e(A)·S_e(B)]
    is exactly the inner product Σ_k c_A(k)·c_B(k) = the join
    cardinality (Alon-Gibbons-Matias-Szegedy 1999, the join-size
    extension of q400's F2 self-join sketch). Median of {JS_GROUPS}
    means of 8 estimators; certified against the exact join size in
    the same row. This is the statistic q431's CBO advisor needs
    BEFORE choosing shuffle-vs-broadcast: two independent single-table
    sketch scans replace the join it is trying to plan.

    Determinism: signs are md5-nibble functions of the key under a
    shared salt, counters and their products are exact integers; only
    the group means and the final median/relative-error rows divide,
    on the dround grid.

    Scale/mergeability: each side's sketch is 32 plain SUMs over a
    key-count aggregate — map-side partials, a 256-byte final state,
    NO cross-table shuffle anywhere in the estimate path (the exact
    side exists only as the certificate). Sketches of disjoint ingest
    shards merge by addition, so the estimator also serves streaming
    ingest without recomputation.
    """
    co = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cl = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h = F.md5(F.concat(F.col("k").cast("string"), F.lit("_js")))
    signs = [
        F.when(
            F.substring(h, e + 1, 1).isin(*list("89abcdef")), F.lit(1)
        ).otherwise(F.lit(-1))
        for e in range(JS_EST)
    ]
    sa = co.agg(
        *[F.sum(signs[e] * F.col("c")).alias(f"a{e}") for e in range(JS_EST)],
        F.count(F.lit(1)).alias("keys_a"),
        F.sum("c").alias("rows_a"),
    )
    sb = cl.agg(
        *[F.sum(signs[e] * F.col("c")).alias(f"b{e}") for e in range(JS_EST)],
        F.count(F.lit(1)).alias("keys_b"),
        F.sum("c").alias("rows_b"),
    )
    exact = (
        co.join(cl.select(F.col("k"), F.col("c").alias("c2")), "k")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("join_exact"))
    )
    gmeans = [
        (
            sum(
                F.col(f"a{g * 8 + i}") * F.col(f"b{g * 8 + i}")
                for i in range(8)
            )
            / F.lit(8.0)
        ).alias(f"g{g}")
        for g in range(JS_GROUPS)
    ]
    med = (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(exact))
        .select(
            "join_exact",
            "keys_a",
            "rows_a",
            "keys_b",
            "rows_b",
            *gmeans,
        )
        .select(
            "join_exact",
            "keys_a",
            "rows_a",
            "keys_b",
            "rows_b",
            F.array_sort(
                F.array(*[F.col(f"g{g}") for g in range(JS_GROUPS)])
            ).alias("gs"),
        )
    )
    est = (F.col("gs")[1] + F.col("gs")[2]) / F.lit(2.0)
    return med.select(
        F.col("join_exact").cast("bigint").alias("join_exact"),
        dround(est, 4).alias("join_est"),
        dround(
            (est - F.col("join_exact"))
            / F.nullif(F.col("join_exact").cast("double"), F.lit(0.0)),
            6,
        ).alias("rel_err"),
        F.col("keys_a").cast("bigint").alias("keys_a"),
        F.col("rows_a").cast("bigint").alias("rows_a"),
        F.col("keys_b").cast("bigint").alias("keys_b"),
        F.col("rows_b").cast("bigint").alias("rows_b"),
    )


# --------------------------------------------------------------------------
# q516 weighted MinHash (tf-replicated) fuzzy dedup audit

WMH_TF_CAP = 4  # replicate each word min(tf, cap) times (integer CWS)
WMH_BUCKET_CAP = 64  # LSH bucket skew guard (q62 shared spec)


@register(
    "q516_weighted_minhash",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w,
             LEAST(CAST(COUNT(*) AS BIGINT), {WMH_TF_CAP}) AS c
      FROM words GROUP BY doc_id, w
    ),
    rep AS (
      SELECT doc_id, md5(w || '#' || CAST(r.i AS VARCHAR)) AS h1
      FROM tf, UNNEST(range(1, c + 1)) r(i)
    ),
    sig AS (
      SELECT doc_id,
        {", ".join(
            f"MIN(CAST('0x' || substr(h1, {i * 4 + 1}, 4) AS BIGINT)) AS h{i}"
            for i in range(8))}
      FROM rep GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band,"
          f" h{2 * b} * 65536 + h{2 * b + 1} AS bkey FROM sig"
          for b in range(4))}
    ),
    bsz AS (
      SELECT band, bkey, COUNT(*) AS n FROM bands GROUP BY band, bkey
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON b.band = a.band AND b.bkey = a.bkey
                  AND a.doc_id < b.doc_id
      JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey
                AND s.n BETWEEN 2 AND {WMH_BUCKET_CAP}
    ),
    est AS (
      SELECT p.doc_a, p.doc_b,
             {" + ".join(
                 f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                 for i in range(8))} AS n_match
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
    ),
    ta AS (
      SELECT p.doc_a, p.doc_b, f.w, f.c AS ca
      FROM pairs p JOIN tf f ON f.doc_id = p.doc_a
    ),
    tb AS (
      SELECT p.doc_a, p.doc_b, f.w, f.c AS cb
      FROM pairs p JOIN tf f ON f.doc_id = p.doc_b
    ),
    overlap AS (
      SELECT COALESCE(ta.doc_a, tb.doc_a) AS doc_a,
             COALESCE(ta.doc_b, tb.doc_b) AS doc_b,
             CAST(SUM(LEAST(COALESCE(ca, 0), COALESCE(cb, 0)))
                  AS BIGINT) AS s_min,
             CAST(SUM(GREATEST(COALESCE(ca, 0), COALESCE(cb, 0)))
                  AS BIGINT) AS s_max
      FROM ta FULL JOIN tb
        ON tb.doc_a = ta.doc_a AND tb.doc_b = ta.doc_b AND tb.w = ta.w
      GROUP BY 1, 2
    )
    SELECT e.doc_a, e.doc_b,
           CAST(e.n_match AS BIGINT) AS n_match,
           {sql_dround("e.n_match / 8.0", 6)} AS est_sim,
           {sql_dround(
               "CAST(o.s_min AS DOUBLE) / NULLIF(o.s_max, 0)", 6)}
             AS exact_wjacc
    FROM est e JOIN overlap o
      ON o.doc_a = e.doc_a AND o.doc_b = e.doc_b
    """,
)
def q516_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (tf-sensitive) MinHash near-dup audit: each word is
    replicated min(tf, {WMH_TF_CAP}) times before hashing, so the
    signature estimates the WEIGHTED Jaccard
    sum(min(tf_a, tf_b)) / sum(max(tf_a, tf_b)) — integer consistent
    weighted sampling, the tf-aware upgrade of q62's set-semantics
    MinHash (a doc repeating one template line 50 times looks very
    different from one mentioning it once; set Jaccard cannot see
    that). Candidate pairs come from the same banding spec as q62
    (2x16-bit band keys, bucket cap {WMH_BUCKET_CAP}), and every pair
    reports the signature estimate BESIDE the exact capped weighted
    Jaccard — the calibration certificate (q508 shape).

    Determinism: hashes are md5(word#i) chunks (shared spec), the
    estimate n_match/8 lands on the exact eighth grid, the exact
    ratio is an integer ratio on the dround grid.

    Scale: replication multiplies the word stream by at most
    {WMH_TF_CAP}; signatures are one HashAggregate; pair generation
    is the capped-bucket collect (never corpus^2); the exact side
    joins tf vectors only for CANDIDATE pairs (bucket-capped), each
    pair's work bounded by its two docs' vocabularies.
    """
    words = (
        fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    tf = words.groupBy("doc_id", "w").agg(
        F.least(F.count(F.lit(1)).cast("bigint"), F.lit(WMH_TF_CAP)).alias(
            "c"
        )
    )
    rep = tf.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.col("c"))).alias("i"),
    ).select(
        "doc_id",
        F.md5(
            F.concat(F.col("w"), F.lit("#"), F.col("i").cast("string"))
        ).alias("h1"),
    )
    sig = rep.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(F.substring("h1", i * 4 + 1, 4), 16, 10).cast("long")
            ).alias(f"h{i}")
            for i in range(8)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"h{2 * b}") * F.lit(1 << 16)
                            + F.col(f"h{2 * b + 1}")
                        ).alias("bkey"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")
    bn = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
    buckets = (
        bands.withColumn("bn", bn)
        .filter((F.col("bn") >= 2) & (F.col("bn") <= WMH_BUCKET_CAP))
        .groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)],
    )
    est = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            sum(
                F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(8)
            ).alias("n_match"),
        )
    )
    ta = pairs.join(
        tf.select(F.col("doc_id").alias("doc_a"), "w", F.col("c").alias("ca")),
        "doc_a",
    )
    tb = pairs.join(
        tf.select(F.col("doc_id").alias("doc_b"), "w", F.col("c").alias("cb")),
        "doc_b",
    )
    overlap = (
        ta.join(tb, ["doc_a", "doc_b", "w"], "full")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.least(F.coalesce("ca", F.lit(0)), F.coalesce("cb", F.lit(0)))
            )
            .cast("bigint")
            .alias("s_min"),
            F.sum(
                F.greatest(
                    F.coalesce("ca", F.lit(0)), F.coalesce("cb", F.lit(0))
                )
            )
            .cast("bigint")
            .alias("s_max"),
        )
    )
    return est.join(overlap, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        F.col("n_match").cast("bigint").alias("n_match"),
        dround(F.col("n_match") / 8.0, 6).alias("est_sim"),
        dround(
            F.col("s_min").cast("double")
            / F.nullif(F.col("s_max").cast("double"), F.lit(0.0)),
            6,
        ).alias("exact_wjacc"),
    )


# --------------------------------------------------------------------------
# q517 sample-based distinct-count estimation (the ANALYZE statistic)

GEE_HEX = "0123"  # row sample: md5 first nibble in this set (q = 1/4)
GEE_Q = 0.25


@register(
    "q517_sample_distinct_gee",
    category="mixed-extensions",
    oracle=f"""
    WITH rows_s AS (
      SELECT l_partkey,
             strpos('{GEE_HEX}', substr(md5(
                 CAST(l_orderkey AS VARCHAR) || ':' ||
                 CAST(l_linenumber AS VARCHAR)), 1, 1)) > 0 AS picked
      FROM lineitem
    ),
    samp AS (
      SELECT l_partkey, COUNT(*) AS c FROM rows_s
      WHERE picked GROUP BY l_partkey
    ),
    sstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(SUM(c) AS BIGINT) AS n_sampled
      FROM samp
    ),
    ex AS (
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_exact,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
    )
    SELECT ex.d_exact, ex.n_rows, s.n_sampled, s.d, s.f1, s.f2,
           {sql_dround(
               f"SQRT(1.0 / {GEE_Q!r}) * s.f1 + (s.d - s.f1)", 4)}
             AS est_gee,
           {sql_dround(
               "s.d + (CAST(s.f1 AS DOUBLE) * s.f1)"
               " / NULLIF(2.0 * s.f2, 0)", 4)} AS est_chao1,
           {sql_dround(
               f"(SQRT(1.0 / {GEE_Q!r}) * s.f1 + (s.d - s.f1)"
               " - ex.d_exact) / NULLIF(ex.d_exact, 0)", 6)} AS gee_rel_err
    FROM sstats s, ex
    """,
)
def q517_sample_distinct_gee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based distinct-count estimation — the statistic ANALYZE
    computes when a full scan is too expensive: a deterministic
    Bernoulli row sample (hash of the row key, q = {GEE_Q}), sample
    frequency-of-frequencies (d, f1, f2), then the GEE estimator
    sqrt(1/q)*f1 + (d - f1) (Charikar et al. 2000, within their
    sqrt(1/q) ratio-error guarantee) and Chao1 d + f1^2/(2 f2)
    beside the exact distinct count. Completes the cardinality shelf:
    q229/q246 (HLL, full-scan sketch), q271 (KMV), q400/q515 (AMS
    moments) estimate from FULL passes — this is the only member that
    reads a FRACTION of the data, the trade a CBO actually faces.

    Determinism: sample membership is a pure row-key hash; d/f1/f2
    are exact integers; the two estimates and the relative error are
    dround-grid outputs of identical double expressions.

    Scale: the sampled aggregate touches q of the rows; both
    frequency tables are one HashAggregate each; everything after is
    one row. The exact side exists as the certificate.
    """
    li = t(spark, sf_dir, "lineitem")
    picked = F.substring(
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        1,
    ).isin(*list(GEE_HEX))
    samp = (
        fan_out(li.select("l_orderkey", "l_linenumber", "l_partkey"))
        .filter(picked)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sstats = samp.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
        F.sum("c").cast("bigint").alias("n_sampled"),
    )
    ex = li.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("d_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    gee = (
        F.lit(float(1.0 / GEE_Q) ** 0.5) * F.col("f1")
        + (F.col("d") - F.col("f1"))
    )
    return (
        sstats.crossJoin(F.broadcast(ex))
        .select(
            "d_exact",
            "n_rows",
            "n_sampled",
            "d",
            "f1",
            "f2",
            dround(gee, 4).alias("est_gee"),
            dround(
                F.col("d")
                + (F.col("f1").cast("double") * F.col("f1"))
                / F.nullif(2.0 * F.col("f2"), F.lit(0.0)),
                4,
            ).alias("est_chao1"),
            dround(
                (gee - F.col("d_exact"))
                / F.nullif(F.col("d_exact").cast("double"), F.lit(0.0)),
                6,
            ).alias("gee_rel_err"),
        )
    )


# --------------------------------------------------------------------------
# q518 mergeable top-k heavy-hitter summaries (SpaceSaving-style bounds)

SS_K = 12  # per-shard summary keeps the top-SS_K items
SS_SHARDS = 4  # deterministic hash shards (stand-ins for ingest shards)
SS_TOP = 10  # merged report rows


@register(
    "q518_topk_summary_merge",
    category="mixed-extensions",
    oracle=f"""
    WITH base AS (
      SELECT l_partkey % 997 AS item,
             CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                 || '_ss'), 1, 7) AS BIGINT) % {SS_SHARDS} AS shard
      FROM lineitem
    ),
    shard_counts AS (
      SELECT shard, item, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY shard, item
    ),
    ranked AS (
      SELECT shard, item, c,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY c DESC, item ASC) AS rk
      FROM shard_counts
    ),
    summar AS (SELECT shard, item, c FROM ranked WHERE rk <= {SS_K}),
    bound AS (
      -- per-shard residual bound: the largest DROPPED count (0 if
      -- nothing dropped) — an absent item's shard count is <= this
      SELECT r.shard,
             COALESCE(MAX(CASE WHEN r.rk > {SS_K} THEN r.c END), 0) AS b
      FROM ranked r GROUP BY r.shard
    ),
    cand AS (SELECT DISTINCT item FROM summar),
    merged AS (
      SELECT cand.item,
             CAST(SUM(COALESCE(s.c, 0)) AS BIGINT) AS lower_b,
             CAST(SUM(COALESCE(s.c, bound.b)) AS BIGINT) AS upper_b
      FROM cand
      CROSS JOIN bound
      LEFT JOIN summar s ON s.shard = bound.shard AND s.item = cand.item
      GROUP BY cand.item
    ),
    exact AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c_exact
      FROM base GROUP BY item
    ),
    report AS (
      SELECT m.item, m.lower_b, m.upper_b, e.c_exact,
             e.c_exact BETWEEN m.lower_b AND m.upper_b AS within_bounds,
             CAST(ROW_NUMBER() OVER (
               ORDER BY m.lower_b DESC, m.item ASC) AS BIGINT) AS rn
      FROM merged m JOIN exact e ON e.item = m.item
    )
    SELECT item, lower_b, upper_b, c_exact, within_bounds, rn
    FROM report WHERE rn <= {SS_TOP}
    """,
)
def q518_topk_summary_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable top-k heavy-hitter summaries with deterministic error
    bounds (the Agarwal et al. "Mergeable Summaries" shape of
    SpaceSaving): each of {SS_SHARDS} hash shards keeps only its top
    {SS_K} item counts plus one residual bound (the largest count it
    dropped); merging sums present counts (lower bound) and
    substitutes the shard bound for absent items (upper bound). The
    certificate: the exact global count of every reported item must
    lie within [lower, upper]. This is how heavy hitters are actually
    computed at 100 TB — shards ship k+1 numbers each, never their
    full frequency tables — and the error interval is carried
    explicitly instead of hoped about (the mergeable-bounds
    complement of q79 exact / q202 approx_top_k / q219 CMS).

    Determinism: shard assignment is an md5 of the row key; per-shard
    ranks break count ties by item; bounds and merges are pure
    integers end to end — no doubles anywhere.

    Scale: per-shard summaries are rank-filtered top-k
    (WindowGroupLimit pre-limit per map task); the merge joins
    {SS_SHARDS} x {SS_K} summary rows against {SS_SHARDS} bound rows
    — constant-size no matter the corpus. The exact side exists as
    the certificate.
    """
    base = fan_out(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ).select(
        (F.col("l_partkey") % 997).alias("item"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("l_orderkey").cast("string"), F.lit("_ss")
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("bigint")
            % SS_SHARDS
        ).alias("shard"),
    )
    shard_counts = base.groupBy("shard", "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = shard_counts.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("shard").orderBy(
                F.col("c").desc(), F.col("item").asc()
            )
        ),
    )
    summar = ranked.filter(F.col("rk") <= SS_K).select("shard", "item", "c")
    bound = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rk") > SS_K, F.col("c"))), F.lit(0)
        ).alias("b")
    )
    cand = summar.select("item").distinct()
    merged = (
        cand.crossJoin(F.broadcast(bound))
        .join(F.broadcast(summar), ["shard", "item"], "left")
        .groupBy("item")
        .agg(
            F.sum(F.coalesce("c", F.lit(0))).cast("bigint").alias("lower_b"),
            F.sum(F.coalesce(F.col("c"), F.col("b")))
            .cast("bigint")
            .alias("upper_b"),
        )
    )
    exact = base.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_exact")
    )
    wr = Window.orderBy(F.col("lower_b").desc(), F.col("item").asc())
    return (
        merged.join(exact, "item")
        .select(
            "item",
            "lower_b",
            "upper_b",
            "c_exact",
            (
                (F.col("c_exact") >= F.col("lower_b"))
                & (F.col("c_exact") <= F.col("upper_b"))
            ).alias("within_bounds"),
            F.row_number().over(wr).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= SS_TOP)
    )


# --------------------------------------------------------------------------
# q519 portable Bloom filter with certified false-positive rate

BF_M = 1024  # filter bits
BF_K = 4  # hash functions = 3-hex-char md5 chunks mod m


def _bf_bits_sql(col: str) -> str:
    """The K bit positions of a key (DuckDB)."""
    return ", ".join(
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || '_bf'),"
        f" {h * 3 + 1}, 3) AS BIGINT) % {BF_M} AS bit{h}"
        for h in range(BF_K)
    )


@register(
    "q519_bloom_filter_fpr",
    category="mixed-extensions",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders
    ),
    bits AS (
      -- the built filter: the set of distinct bit positions
      SELECT DISTINCT b.bit FROM (
        SELECT {_bf_bits_sql('k')} FROM members
      ) s, UNNEST([{", ".join(f"s.bit{h}" for h in range(BF_K))}]) b(bit)
    ),
    probes AS (
      -- probe with keys OUTSIDE the member domain: customers with no
      -- orders (true negatives by construction)
      SELECT c.c_custkey AS k FROM customer c
      ANTI JOIN members m ON m.k = c.c_custkey
    ),
    probe_bits AS (
      SELECT k, UNNEST([{", ".join(f"bit{h}" for h in range(BF_K))}]) AS bit
      FROM (SELECT k, {_bf_bits_sql('k')} FROM probes)
    ),
    hits AS (
      SELECT p.k,
             COUNT(DISTINCT CASE WHEN b.bit IS NOT NULL
                                 THEN p.bit END) AS set_bits,
             COUNT(DISTINCT p.bit) AS want_bits
      FROM probe_bits p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY p.k
    ),
    agg AS (
      SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
             CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(CASE WHEN set_bits = want_bits
                           THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
      FROM hits
    )
    SELECT n_members, bits_set, n_probes, false_pos,
           {sql_dround("CAST(false_pos AS DOUBLE) / NULLIF(n_probes, 0)", 6)}
             AS fpr_measured,
           {sql_dround(
               f"POW(CAST(bits_set AS DOUBLE) / {BF_M}, {BF_K})", 6)}
             AS fpr_load_predicted
    FROM agg
    """,
)
def q519_bloom_filter_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter built and probed in-engine with a
    CERTIFIED false-positive rate: member keys (customers with
    orders) set {BF_K} md5-chunk bits each in an m={BF_M} filter;
    probe keys are customers with NO orders (true negatives by
    construction), so every all-bits-set probe is a measured false
    positive. Reported beside the load-based prediction
    (bits_set/m)^k — the exact expected FPR given the realized fill,
    the check a join-pruning deployment (Spark's own runtime bloom
    filters, q151) runs before trusting a filter size. Completes the
    sketch shelf: CMS (q219) overcounts, HLL (q229) counts, KMV
    (q271) samples, AMS (q400/q515) squares — Bloom answers
    membership, and unlike the engine-native one its state here is a
    plain bit-position table, byte-identical cross-engine.

    Determinism: bit positions are md5-chunk mods of the key; the
    filter is a distinct integer set; counts are exact; the two FPR
    readouts are dround-grid outputs of identical expressions.

    Scale: the filter build is one distinct over <= m integers
    (constant-size state regardless of member cardinality — the
    mergeable-by-OR property that makes Bloom filters shippable);
    the probe is a broadcast-friendly join of probe bit rows against
    the <= {BF_M}-row bit table.
    """
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    members = orders.select(F.col("o_custkey").alias("k")).distinct()

    def bf_bits(df: DataFrame) -> DataFrame:
        h = F.md5(F.concat(F.col("k").cast("string"), F.lit("_bf")))
        return df.select(
            "k",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(h, i * 3 + 1, 3), 16, 10
                            ).cast("bigint")
                            % BF_M
                        )
                        for i in range(BF_K)
                    ]
                )
            ).alias("bit"),
        )

    bits = bf_bits(members).select("bit").distinct()
    probes = customer.select(F.col("c_custkey").alias("k")).join(
        members, "k", "left_anti"
    )
    probe_bits = bf_bits(probes)
    hits = (
        probe_bits.join(
            F.broadcast(bits.withColumn("present", F.lit(1))), "bit", "left"
        )
        .groupBy("k")
        .agg(
            F.count_distinct(
                F.when(F.col("present").isNotNull(), F.col("bit"))
            ).alias("set_bits"),
            F.count_distinct("bit").alias("want_bits"),
        )
    )
    n_members = members.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    bits_set = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    agg = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(
            F.when(F.col("set_bits") == F.col("want_bits"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("false_pos"),
    )
    return (
        agg.crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(bits_set))
        .select(
            "n_members",
            "bits_set",
            "n_probes",
            "false_pos",
            dround(
                F.col("false_pos").cast("double")
                / F.nullif(F.col("n_probes").cast("double"), F.lit(0.0)),
                6,
            ).alias("fpr_measured"),
            dround(
                F.pow(
                    F.col("bits_set").cast("double") / F.lit(float(BF_M)),
                    F.lit(float(BF_K)),
                ),
                6,
            ).alias("fpr_load_predicted"),
        )
    )


# --------------------------------------------------------------------------
# q520 Merkle corpus-snapshot audit (incremental == full rebuild)

MK_SHARDS = 16  # leaf shards (4 tree levels)


@register(
    "q520_merkle_snapshot_audit",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_mk'),
                  1, 7) AS BIGINT) % {MK_SHARDS} AS shard,
             md5(text) AS dh,
             {_sql_is_delta('doc_id')} AS is_delta
      FROM documents
    ),
    leaves AS (
      SELECT shard, md5(string_agg(dh, '' ORDER BY doc_id)) AS leaf,
             CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
               AS n_delta,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM docs GROUP BY shard
    ),
    spine AS (
      SELECT s.s AS shard FROM UNNEST(range({MK_SHARDS})) s(s)
    ),
    l0 AS (
      -- empty shards hash the empty string (both engines)
      SELECT sp.shard, COALESCE(l.leaf, md5('')) AS h,
             COALESCE(l.n_delta, 0) AS n_delta,
             COALESCE(l.n_docs, 0) AS n_docs
      FROM spine sp LEFT JOIN leaves l ON l.shard = sp.shard
    ),
    l1 AS (
      SELECT shard // 2 AS shard,
             md5(string_agg(h, '' ORDER BY shard)) AS h,
             SUM(n_delta) AS n_delta
      FROM l0 GROUP BY shard // 2
    ),
    l2 AS (
      SELECT shard // 2 AS shard,
             md5(string_agg(h, '' ORDER BY shard)) AS h,
             SUM(n_delta) AS n_delta
      FROM l1 GROUP BY shard // 2
    ),
    l3 AS (
      SELECT shard // 2 AS shard,
             md5(string_agg(h, '' ORDER BY shard)) AS h,
             SUM(n_delta) AS n_delta
      FROM l2 GROUP BY shard // 2
    ),
    root AS (
      SELECT md5(string_agg(h, '' ORDER BY shard)) AS root_h
      FROM l3
    ),
    -- incremental route: recompute ONLY delta-touched leaves from
    -- docs; splice untouched leaf digests through unchanged, and
    -- fold the same tree
    inc_l0 AS (
      SELECT l0.shard,
             CASE WHEN l0.n_delta > 0
                  THEN (SELECT md5(string_agg(d.dh, '' ORDER BY d.doc_id))
                        FROM docs d WHERE d.shard = l0.shard)
                  ELSE l0.h END AS h
      FROM l0
    ),
    inc_l1 AS (
      SELECT shard // 2 AS shard, md5(string_agg(h, '' ORDER BY shard)) AS h
      FROM inc_l0 GROUP BY shard // 2
    ),
    inc_l2 AS (
      SELECT shard // 2 AS shard, md5(string_agg(h, '' ORDER BY shard)) AS h
      FROM inc_l1 GROUP BY shard // 2
    ),
    inc_l3 AS (
      SELECT shard // 2 AS shard, md5(string_agg(h, '' ORDER BY shard)) AS h
      FROM inc_l2 GROUP BY shard // 2
    ),
    inc_root AS (
      SELECT md5(string_agg(h, '' ORDER BY shard)) AS root_h FROM inc_l3
    )
    SELECT CAST((SELECT COUNT(*) FROM l0 WHERE n_delta > 0) AS BIGINT)
             AS touched_leaves,
           CAST({MK_SHARDS} AS BIGINT) AS n_leaves,
           CAST((SELECT SUM(n_docs) FROM l0) AS BIGINT) AS n_docs,
           substr((SELECT root_h FROM root), 1, 16) AS root_prefix,
           (SELECT root_h FROM root) = (SELECT root_h FROM inc_root)
             AS roots_match
    """,
)
def q520_merkle_snapshot_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-tree corpus snapshot audit: shard every document by an
    id hash into {MK_SHARDS} leaves, digest each leaf (md5 over its
    docs' content hashes in doc_id order), fold a binary tree to one
    root — the content-addressed snapshot identity a dataset registry
    publishes (what "the corpus at commit X" MEANS) — then certify
    the INCREMENTAL maintenance rule: re-digesting only the leaves
    containing changed (delta) docs and splicing untouched digests
    through must reproduce the identical root. touched_leaves vs
    n_leaves is the cost argument: an update re-hashes O(affected
    shards + tree path), never the corpus.

    Determinism: shard assignment and the delta split are pure id
    hashes; every digest is md5 over an ORDER BY doc_id
    concatenation; empty shards hash the empty string on both
    engines.

    Scale: leaf digests are one grouped aggregate over (doc_id,
    content-hash) rows — content hashes are 32 bytes each regardless
    of document size, and the ordered within-shard concat is
    shard-local; the tree above is {MK_SHARDS} rows folding to 1.
    (At petabyte scale the leaf aggregate would use a sorted
    sub-digest chain instead of one concat, same invariant.)
    """
    docs = fan_out(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    ).select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit("_mk"))
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("bigint")
            % MK_SHARDS
        ).alias("shard"),
        F.md5("text").alias("dh"),
        _is_delta("doc_id").alias("is_delta"),
    )
    leaf_digest = F.md5(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "dh"))
            ).getField("dh"),
            "",
        )
    )
    leaves = docs.groupBy("shard").agg(
        leaf_digest.alias("leaf"),
        F.sum(F.col("is_delta").cast("int")).cast("bigint").alias("n_delta"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    spine = spark.range(MK_SHARDS).select(F.col("id").alias("shard"))
    l0 = spine.join(leaves, "shard", "left").select(
        "shard",
        F.coalesce("leaf", F.md5(F.lit(""))).alias("h"),
        F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
    )

    def fold(df: DataFrame) -> DataFrame:
        return df.groupBy((F.col("shard") / 2).cast("bigint").alias("shard")).agg(
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.struct("shard", "h"))
                    ).getField("h"),
                    "",
                )
            ).alias("h")
        )

    # full route
    lvl = l0.select("shard", "h")
    for _ in range(4):
        lvl = fold(lvl)
    root = lvl.select(F.col("h").alias("root_h"))
    # incremental route: recompute ONLY touched leaves, splice the rest
    inc_leaves = docs.join(
        l0.filter(F.col("n_delta") > 0).select("shard"), "shard"
    ).groupBy("shard").agg(leaf_digest.alias("h2"))
    inc0 = l0.join(inc_leaves, "shard", "left").select(
        "shard", F.coalesce("h2", F.col("h")).alias("h")
    )
    ilvl = inc0
    for _ in range(4):
        ilvl = fold(ilvl)
    inc_root = ilvl.select(F.col("h").alias("inc_root_h"))
    stats = l0.agg(
        F.sum(F.when(F.col("n_delta") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("touched_leaves"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
    )
    return (
        stats.crossJoin(F.broadcast(root))
        .crossJoin(F.broadcast(inc_root))
        .select(
            "touched_leaves",
            F.lit(MK_SHARDS).cast("bigint").alias("n_leaves"),
            "n_docs",
            F.substring("root_h", 1, 16).alias("root_prefix"),
            (F.col("root_h") == F.col("inc_root_h")).alias("roots_match"),
        )
    )


# --------------------------------------------------------------------------
# q521 population stability index (PSI) distribution drift

PSI_BINS = 10
PSI_EPS = 0.0005  # additive floor so empty bins keep ln finite (shared)


@register(
    "q521_psi_drift",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH rng AS (
      SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents
    ),
    binned AS (
      SELECT d.source,
             LEAST({PSI_BINS - 1}, CAST(FLOOR(
               (d.n_chars - r.lo) * {PSI_BINS}.0
               / NULLIF(r.hi - r.lo, 0)) AS BIGINT)) AS bin
      FROM documents d, rng r
    ),
    g AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS cg FROM binned GROUP BY bin
    ),
    gt AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM g),
    s AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS cs
      FROM binned GROUP BY source, bin
    ),
    st AS (
      SELECT source, CAST(SUM(cs) AS BIGINT) AS n FROM s GROUP BY source
    ),
    terms AS (
      SELECT st.source,
             (COALESCE(s.cs, 0) / CAST(st.n AS DOUBLE) + {PSI_EPS!r})
               AS p,
             (g.cg / CAST((SELECT n FROM gt) AS DOUBLE) + {PSI_EPS!r})
               AS q
      FROM st
      CROSS JOIN g
      LEFT JOIN s ON s.source = st.source AND s.bin = g.bin
    )
    SELECT source,
           (SELECT MAX(n) FROM st x WHERE x.source = terms.source)
             AS n_docs,
           {sql_dround("SUM((p - q) * ln(p / q))", 6)} AS psi
    FROM terms
    GROUP BY source
    """,
)
def q521_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per source vs the global corpus —
    the production drift gauge risk teams run between scoring
    batches: bin the n_chars distribution into {PSI_BINS} equal-width
    bins, PSI = sum (p_i - q_i) ln(p_i/q_i) with a shared additive
    floor {PSI_EPS} keeping empty bins finite. Rule of thumb: < 0.1
    stable, 0.1-0.25 drifting, > 0.25 shifted. Completes the drift
    shelf: q141 (chi-square counts), q352 (KS statistic), q409
    (Wasserstein) — PSI is the one with industry-standard action
    thresholds.

    Determinism: integer bin edges from one (min, max) scalar
    aggregate; bin counts are exact; the PSI sum runs over the fixed
    {PSI_BINS}-bin grid per source (ln of a ratio of identical
    doubles), dround at the output.

    Scale: one corpus pass for the range, one for the per-source bin
    counts (map-side partial); everything after is sources x
    {PSI_BINS} rows.
    """
    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    rng = d.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    binned = d.crossJoin(F.broadcast(rng)).select(
        "source",
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("n_chars") - F.col("lo"))
                * float(PSI_BINS)
                / F.nullif((F.col("hi") - F.col("lo")).cast("double"), F.lit(0.0))
            ),
        )
        .cast("bigint")
        .alias("bin"),
    )
    g = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    gt = g.agg(F.sum("cg").cast("bigint").alias("n"))
    s = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cs")
    )
    st = s.groupBy("source").agg(F.sum("cs").cast("bigint").alias("n"))
    terms = (
        st.crossJoin(F.broadcast(g))
        .join(s, ["source", "bin"], "left")
        .crossJoin(F.broadcast(gt.select(F.col("n").alias("ng"))))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            (
                F.coalesce("cs", F.lit(0)) / F.col("n").cast("double")
                + F.lit(PSI_EPS)
            ).alias("p"),
            (F.col("cg") / F.col("ng").cast("double") + F.lit(PSI_EPS)).alias(
                "q"
            ),
        )
    )
    return terms.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        dround(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
    )


# --------------------------------------------------------------------------
# q522 corpus snapshot diff (the registry operation between two commits)


@register(
    "q522_snapshot_diff",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH full_snap AS (
      SELECT doc_id, source, md5(text) AS dh, n_chars FROM documents
    ),
    base_snap AS (
      -- the "previous commit": the corpus without the delta quarter
      SELECT * FROM full_snap WHERE NOT {_sql_is_delta('doc_id')}
    ),
    adds AS (
      SELECT f.source, f.n_chars FROM full_snap f
      ANTI JOIN base_snap b ON b.doc_id = f.doc_id
    ),
    dels AS (
      SELECT b.source, b.n_chars FROM base_snap b
      ANTI JOIN full_snap f ON f.doc_id = b.doc_id
    ),
    common AS (
      SELECT f.source,
             CASE WHEN f.dh <> b.dh THEN 1 ELSE 0 END AS changed,
             f.n_chars
      FROM full_snap f JOIN base_snap b ON b.doc_id = f.doc_id
    ),
    srcs AS (
      SELECT DISTINCT source FROM full_snap
      UNION SELECT DISTINCT source FROM base_snap
    )
    SELECT s.source,
           CAST(COALESCE((SELECT COUNT(*) FROM adds a
                          WHERE a.source = s.source), 0) AS BIGINT)
             AS n_added,
           CAST(COALESCE((SELECT COUNT(*) FROM dels d
                          WHERE d.source = s.source), 0) AS BIGINT)
             AS n_removed,
           CAST(COALESCE((SELECT SUM(changed) FROM common c
                          WHERE c.source = s.source), 0) AS BIGINT)
             AS n_changed,
           CAST(COALESCE((SELECT COUNT(*) - SUM(changed) FROM common c
                          WHERE c.source = s.source), 0) AS BIGINT)
             AS n_unchanged,
           CAST(COALESCE((SELECT SUM(a.n_chars) FROM adds a
                          WHERE a.source = s.source), 0) AS BIGINT)
             AS chars_added
    FROM srcs s
    """,
)
def q522_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the registry operation between two
    dataset commits (the changelog q520's Merkle root summarizes to
    one hash): per source, documents ADDED, REMOVED, CHANGED
    (same id, different content hash), UNCHANGED, plus the added
    char volume. The "previous commit" is the corpus minus the
    deterministic delta quarter (q513's split), so both engines
    derive both snapshots from one table — in production the two
    sides are two manifest-table snapshots (sources/manifest_table
    time travel).

    Determinism: membership is a pure id hash; change detection
    compares md5 content hashes; every count is an exact integer.

    Scale: two anti-joins and one inner join on doc_id (32-byte hash
    rows, never text bytes); per-source rollups are map-side
    partials. This is the incremental-ingest accounting pass — cost
    scales with the snapshot SIZE, not document length, because only
    (id, hash, n_chars) rows move.
    """
    full_snap = fan_out(
        t(spark, sf_dir, "documents").select(
            "doc_id", "source", "text", "n_chars"
        )
    ).select("doc_id", "source", F.md5("text").alias("dh"), "n_chars")
    base_snap = full_snap.filter(~_is_delta("doc_id"))
    adds = full_snap.join(base_snap.select("doc_id"), "doc_id", "left_anti")
    dels = base_snap.join(full_snap.select("doc_id"), "doc_id", "left_anti")
    common = full_snap.alias("f").join(
        base_snap.select("doc_id", F.col("dh").alias("bh")), "doc_id"
    )
    srcs = (
        full_snap.select("source")
        .union(base_snap.select("source"))
        .distinct()
    )
    a = adds.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_added"),
        F.sum("n_chars").cast("bigint").alias("chars_added"),
    )
    d = dels.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_removed")
    )
    c = common.groupBy("source").agg(
        F.sum(F.when(F.col("dh") != F.col("bh"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("dh") == F.col("bh"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unchanged"),
    )
    return (
        srcs.join(a, "source", "left")
        .join(d, "source", "left")
        .join(c, "source", "left")
        .select(
            "source",
            F.coalesce("n_added", F.lit(0)).cast("bigint").alias("n_added"),
            F.coalesce("n_removed", F.lit(0))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce("n_changed", F.lit(0))
            .cast("bigint")
            .alias("n_changed"),
            F.coalesce("n_unchanged", F.lit(0))
            .cast("bigint")
            .alias("n_unchanged"),
            F.coalesce("chars_added", F.lit(0))
            .cast("bigint")
            .alias("chars_added"),
        )
    )


# --------------------------------------------------------------------------
# q523 dedup impact tiers (what each dedup pass would actually save)


@register(
    "q523_dedup_impact_tiers",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH alldocs AS (
      SELECT doc_id, md5(text) AS dh,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    -- tier 1: exact copies (q60 semantics — keep MIN doc_id)
    exact_groups AS (
      SELECT dh, MIN(doc_id) AS keep_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(SUM(n_tokens) AS BIGINT) AS tok,
             CAST(MIN(n_tokens) AS BIGINT) AS tok_keep
      FROM alldocs GROUP BY dh
    ),
    t1 AS (
      SELECT CAST(SUM(n_copies - 1) AS BIGINT) AS docs_removed,
             CAST(SUM(tok - tok_keep) AS BIGINT) AS tokens_removed
      FROM exact_groups
    ),
    -- tier 2: near-dups among exact-distinct survivors (q62's
    -- MinHash+LSH pairs over the kept docs; the lower doc keeps)
    kept AS (
      SELECT d.doc_id, d.n_tokens FROM alldocs d
      JOIN exact_groups g ON g.keep_id = d.doc_id
    ),
    {_sql_shingles(3)},
    hashed AS (
      SELECT sh.doc_id, md5(sh.shingle) AS h1 FROM sh
      JOIN kept k ON k.doc_id = sh.doc_id
    ),
    sig AS (
      SELECT doc_id,
        {", ".join(
            f"MIN(CAST('0x' || substr(h1, {i * 4 + 1}, 4) AS BIGINT)) AS h{i}"
            for i in range(8))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band,"
          f" h{2 * b} * 65536 + h{2 * b + 1} AS bkey FROM sig"
          for b in range(N_BANDS))}
    ),
    bsz AS (
      SELECT band, bkey, COUNT(*) AS n FROM bands GROUP BY band, bkey
    ),
    neardup_losers AS (
      SELECT DISTINCT b.doc_id
      FROM bands a
      JOIN bands b ON b.band = a.band AND b.bkey = a.bkey
                  AND a.doc_id < b.doc_id
      JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey
                AND s.n BETWEEN 2 AND {MAX_LSH_BUCKET}
    ),
    t2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS docs_removed,
             CAST(COALESCE(SUM(k.n_tokens), 0) AS BIGINT) AS tokens_removed
      FROM neardup_losers nl JOIN kept k ON k.doc_id = nl.doc_id
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM alldocs
    )
    SELECT tier, docs_removed, tokens_removed,
           {sql_dround(
               "tokens_removed / CAST((SELECT n_tokens FROM tot)"
               " AS DOUBLE)", 6)} AS token_share
    FROM (
      SELECT 1 AS tier, docs_removed, tokens_removed FROM t1
      UNION ALL
      SELECT 2 AS tier, docs_removed, tokens_removed FROM t2
    )
    """,
)
def q523_dedup_impact_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact accounting — the executive-summary number a data
    team needs BEFORE running a dedup campaign: how many documents
    and tokens each tier would actually remove. Tier 1 = exact copies
    (q60's keep-MIN rule; removable tokens = group total minus the
    kept doc). Tier 2 = MinHash/LSH near-dups among the tier-1
    SURVIVORS (q62's banding; the higher doc_id of a candidate pair
    loses), counted disjointly so the tiers sum to a defensible
    campaign estimate, each beside its share of the corpus token
    count. Composes the dedup shelf into the decision artifact.

    Determinism: tier-1 groups key on md5(text); tier-2 pairs use
    q62's shared banding spec over the kept set; token counts are
    exact integers; the share divides on the dround grid (corpus
    token total >= 1 whenever documents exist — the UNION output is
    empty on an empty corpus on both engines).

    Scale: tier 1 is one 32-byte-key groupBy; tier 2 rides the
    capped-bucket LSH plan (never corpus^2); the output is 2 rows.
    """
    docs = fan_out(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    ).select(
        "doc_id",
        "text",
        F.md5("text").alias("dh"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    exact_groups = docs.groupBy("dh").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.sum("n_tokens").cast("bigint").alias("tok"),
        F.min("n_tokens").cast("bigint").alias("tok_keep"),
    )
    t1 = exact_groups.agg(
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("docs_removed"),
        F.sum(F.col("tok") - F.col("tok_keep"))
        .cast("bigint")
        .alias("tokens_removed"),
    ).select(F.lit(1).alias("tier"), "docs_removed", "tokens_removed")
    kept = docs.join(
        exact_groups.select(F.col("keep_id").alias("doc_id")), "doc_id"
    ).select("doc_id", "text", "n_tokens")
    # q62's banding over the kept set only (shingle inline — the
    # shared _shingle_df helper reads the full table)
    sh = kept.select(
        "doc_id", F.split("text", " ").alias("w"), "n_tokens"
    ).filter(F.size("w") >= 3)
    sh = sh.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', slice(w, i, 3)))"
            )
        ).alias("shingle"),
    )
    sig = (
        sh.select("doc_id", F.md5(F.col("shingle").cast("binary")).alias("h1"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.conv(F.substring("h1", i * 4 + 1, 4), 16, 10).cast(
                        "long"
                    )
                ).alias(f"h{i}")
                for i in range(8)
            ]
        )
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"h{2 * b}") * F.lit(1 << 16)
                            + F.col(f"h{2 * b + 1}")
                        ).alias("bkey"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")
    bn = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
    buckets = (
        bands.withColumn("bn", bn)
        .filter((F.col("bn") >= 2) & (F.col("bn") <= MAX_LSH_BUCKET))
        .groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    losers = (
        buckets.select(
            F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias("doc_id")
        )
        .distinct()
    )
    t2 = (
        losers.join(kept.select("doc_id", "n_tokens"), "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_removed"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
        )
        .select(F.lit(2).alias("tier"), "docs_removed", "tokens_removed")
    )
    tot = docs.agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    return (
        t1.unionByName(t2)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("tier").cast("int").alias("tier"),
            "docs_removed",
            "tokens_removed",
            dround(
                F.col("tokens_removed")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("token_share"),
        )
    )
