"""ML-evaluation / calibration operators (round-4 widening): the
measurement layer a training-data pipeline runs between data curation
and model rollout — conformal intervals, graded-relevance retrieval
quality, importance-resampled data selection, domain-mixture
reweighting, and sampled-evaluation pass@k.

Shares the repo's determinism contract (FIXTURES.md): hash-derived
synthetic model outputs, integer-grid log-probabilities for
order-independent sums, rounded ranking keys with total-order
tie-breaks, NULLIF on every data-dependent denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, t

# ---------------------------------------------------------------------------
# q381 split-conformal prediction intervals

CONF_ALPHA = 0.1  # target miscoverage: 90% intervals
CONF_SPLIT_MOD = 2  # orderkey % 2 == 0 -> calibration set


def _h7(col: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || '_{salt}'), 1, 7)"
        " AS BIGINT)"
    )


@register(
    "q381_split_conformal",
    oracle=f"""
    WITH split AS (
      SELECT o_orderkey, o_orderpriority AS grp,
             CAST(o_totalprice AS DOUBLE) AS y,
             o_orderkey % {CONF_SPLIT_MOD} = 0 AS calib
      FROM orders
    ),
    model AS (
      -- the "regressor": per-priority mean fitted on the calibration
      -- half only (DECIMAL-exact sum -> one exact double division)
      SELECT grp,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS pred
      FROM split WHERE calib GROUP BY grp
    ),
    scores AS (
      SELECT s.o_orderkey, ABS(s.y - m.pred) AS s
      FROM split s JOIN model m ON m.grp = s.grp
      WHERE s.calib
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scores),
    qhat AS (
      -- conformal quantile: the ceil((n+1)(1-alpha))-th smallest
      -- score (order statistic by VALUE; ties cannot change it)
      SELECT s AS q FROM (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s, o_orderkey) AS rk
        FROM scores
      )
      WHERE rk = LEAST(
        (SELECT n FROM nc),
        CAST(ceil((1.0 - {CONF_ALPHA!r})
                  * ((SELECT n FROM nc) + 1)) AS BIGINT))
    ),
    test AS (
      SELECT s.y, m.pred FROM split s JOIN model m ON m.grp = s.grp
      WHERE NOT s.calib
    )
    SELECT (SELECT n FROM nc) AS n_calib,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           (FLOOR(CAST((SELECT q FROM qhat) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS q_hat,
           (FLOOR(CAST(CAST(SUM(CASE WHEN ABS(y - pred) <= (SELECT q FROM qhat)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(COUNT(*), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS coverage,
           CAST({1.0 - CONF_ALPHA!r} AS DOUBLE) AS target
    FROM test
    """,
)
def q381_split_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al.) — the
    distribution-free uncertainty wrapper every deployed regressor
    needs: fit on one half, take the ceil((n+1)(1-alpha))-th smallest
    absolute residual on the calibration half as the interval
    half-width q_hat, then AUDIT the finite-sample coverage guarantee
    (>= 1-alpha in expectation) on the held-out half. Completes the
    uncertainty shelf beside q266 (Wilson), q324 (bootstrap), q325
    (jackknife): those quantify estimator error, conformal wraps
    PREDICTIONS.

    Determinism: the "model" is the per-priority calibration mean
    (DECIMAL-exact), residuals are identical doubles, and the
    conformal quantile is an order STATISTIC — selected by
    (value, orderkey) rank but defined by value alone, so ties cannot
    diverge engines. Coverage is an exact integer ratio.

    Scale: two grouped reduces over the fact table; the conformal
    quantile is an EXACT distributed selection (the q444 two-pass
    refinement — r6 window audit: the previous global rank funneled
    the whole calibration half through ONE task): a 256-bucket
    equi-width histogram over the residuals, a cumulative walk over
    the 256-row histogram to find the bucket holding rank m, then a
    rank over only that bucket's ~n/256 slice. Test scoring is a
    broadcast join of the 5-row model.
    """
    o = t(spark, sf_dir, "orders")
    split = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("y"),
        (F.col("o_orderkey") % CONF_SPLIT_MOD == 0).alias("calib"),
    )
    model = (
        split.filter("calib")
        .groupBy("grp")
        .agg(
            (
                F.sum(F.col("y").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("pred")
        )
    )
    scores = (
        split.filter("calib")
        .join(F.broadcast(model), "grp")
        .select("o_orderkey", F.abs(F.col("y") - F.col("pred")).alias("s"))
    )
    # n + residual bounds in ONE calibration-half pass (r8: these were
    # two separate aggregates — two fact-table scans and two broadcast
    # jobs for three scalars)
    calib_stats = scores.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("s").alias("lo"),
        F.max("s").alias("hi"),
    )
    # bucket is a monotone function of s ALONE (ties share a bucket),
    # so in-bucket (s, o_orderkey) ranks + bucket offsets reproduce
    # the global rank exactly; all-equal residuals degenerate to one
    # bucket (still correct, single slice)
    bucketed = (
        scores.crossJoin(F.broadcast(calib_stats))
        .withColumn(
            "bkt",
            F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(255),
                    F.floor(
                        (F.col("s") - F.col("lo"))
                        * 256.0
                        / (F.col("hi") - F.col("lo"))
                    ),
                )
            ),
        )
        .drop("n", "lo", "hi")
    )
    hist = bucketed.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("bucket_rows")
    )
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = (
        hist.withColumn(
            "cum_before",
            F.coalesce(F.sum("bucket_rows").over(woff), F.lit(0)),
        )
        .crossJoin(F.broadcast(calib_stats.select("n")))
        .withColumn(
            "m",
            F.least(
                F.col("n"),
                F.ceil((1.0 - CONF_ALPHA) * (F.col("n") + 1)).cast(
                    "bigint"
                ),
            ),
        )
    )
    target = cum.filter(
        (F.col("cum_before") < F.col("m"))
        & (F.col("m") <= F.col("cum_before") + F.col("bucket_rows"))
    ).select("bkt", "m", "cum_before", "n")
    qhat = (
        bucketed.join(F.broadcast(target), "bkt")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("bkt").orderBy("s", "o_orderkey")
            ),
        )
        .filter(F.col("rk") == F.col("m") - F.col("cum_before"))
        .select(F.col("s").alias("q"))
    )
    test = split.filter(~F.col("calib")).join(F.broadcast(model), "grp")
    # aggregate the test half FIRST (a no-groupBy agg always yields
    # one row, even on an empty test half — the property hunt's
    # 1-row-corpus find), then attach n_calib / q_hat from the
    # calibration-side frames (qhat can only be empty when the test
    # half is too, so the left cross-join never drops coverage rows)
    stats = test.crossJoin(F.broadcast(qhat.select("q"))).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        dround(
            F.sum(
                F.when(
                    F.abs(F.col("y") - F.col("pred")) <= F.col("q"), 1
                ).otherwise(0)
            ).cast("double")
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            6,
        ).alias("coverage"),
    )
    meta = calib_stats.select("n").join(
        F.broadcast(qhat.select("q")), F.lit(True), "left"
    )
    return stats.crossJoin(F.broadcast(meta)).select(
        F.col("n").alias("n_calib"),
        "n_test",
        dround("q", 4).alias("q_hat"),
        "coverage",
        F.lit(1.0 - CONF_ALPHA).alias("target"),
    )


# ---------------------------------------------------------------------------
# q382 nDCG@k graded-relevance retrieval quality

NDCG_K = 10
NDCG_NQ = 5  # query vectors


@register(
    "q382_ndcg_at_k",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id < {NDCG_NQ}
    ),
    pairs AS (
      SELECT q.query_id, c.vec_id AS cand_id, q.ql, c.label AS cl,
             CAST(UNNEST(q.qe) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM q, embeddings c
      WHERE c.vec_id <> q.query_id
    ),
    dots AS (
      SELECT query_id, cand_id, ql, cl,
             SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc
      FROM pairs GROUP BY 1, 2, 3, 4
    ),
    graded AS (
      SELECT query_id, cand_id,
             CASE WHEN cl = ql THEN 3
                  WHEN cl % 2 = ql % 2 THEN 1 ELSE 0 END AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC
             ) AS rk
      FROM dots
    ),
    ideal AS (
      SELECT query_id, rel,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rel DESC, cand_id ASC
             ) AS rk
      FROM graded
    ),
    dcg AS (
      SELECT query_id,
             SUM(rel / (ln(rk + 1.0) / ln(2.0))) AS dcg
      FROM graded WHERE rk <= {NDCG_K} GROUP BY 1
    ),
    idcg AS (
      SELECT query_id,
             SUM(rel / (ln(rk + 1.0) / ln(2.0))) AS idcg
      FROM ideal WHERE rk <= {NDCG_K} GROUP BY 1
    )
    SELECT d.query_id,
           (FLOOR(CAST(d.dcg AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS dcg_at_k,
           (FLOOR(CAST(i.idcg AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS idcg_at_k,
           (FLOOR(CAST(d.dcg / NULLIF(i.idcg, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ndcg_at_k
    FROM dcg d JOIN idcg i ON i.query_id = d.query_id
    """,
)
def q382_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@k with GRADED relevance — the ranking-quality metric
    recall@k (q98) and MRR (q233) cannot express: position-discounted
    gain over 0/1/3-graded labels, normalized by the ideal ordering.
    Grades derive from the label column (exact match = 3, parity
    match = 1), ranking uses the repo's rounded-cosine + cand_id
    total order, and the ideal ranking sorts by grade (ties
    contribute identically regardless of order, so IDCG is
    tie-safe by construction).

    Scale: the scored pair frame is queries x corpus with the query
    side broadcast (q70's shape); both DCG reductions are
    k-bounded per query. The discount ladder ln(rk+1)/ln(2) runs the
    same libm ops on identical inputs on both engines (q229/q261
    precedent), rounded at 1e-6.
    """
    from .similarity import dot_double, norm_double

    emb = t(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < NDCG_NQ)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("label").alias("ql"),
        )
        .withColumn("qn", norm_double("qe"))
    )
    cand = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("cl"),
    ).withColumn("cn", norm_double("ce"))
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    graded = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.when(F.col("cl") == F.col("ql"), 3)
            .when(F.col("cl") % 2 == F.col("ql") % 2, 1)
            .otherwise(0)
            .alias("rel"),
            cosine.alias("cosine"),
        )
        .select(
            "query_id",
            "cand_id",
            "rel",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("cand_id").asc()
                )
            )
            .alias("rk"),
        )
    )
    discount = F.col("rel") / (F.log(F.col("rk") + 1.0) / F.log(F.lit(2.0)))
    dcg = (
        graded.filter(F.col("rk") <= NDCG_K)
        .groupBy("query_id")
        .agg(F.sum(discount).alias("dcg"))
    )
    ideal = graded.select(
        "query_id",
        "rel",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("rel").desc(), F.col("cand_id").asc()
            )
        )
        .alias("rk"),
    )
    idcg = (
        ideal.filter(F.col("rk") <= NDCG_K)
        .groupBy("query_id")
        .agg(F.sum(discount).alias("idcg"))
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        dround("dcg", 6).alias("dcg_at_k"),
        dround("idcg", 6).alias("idcg_at_k"),
        dround(
            F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0)), 6
        ).alias("ndcg_at_k"),
    )


# ---------------------------------------------------------------------------
# q383 DSIR-style hashed-n-gram importance selection

DSIR_B = 256  # hashed unigram feature buckets
DSIR_K = 20  # selected documents
DSIR_SCALE = 1_000_000  # integer log-prob grid
DSIR_TARGET_LANG = "en"


@register(
    "q383_dsir_importance_selection",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             ({_h7('w', 'dsir')}) % {DSIR_B} AS b
      FROM (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
        FROM documents
      )
    ),
    tc AS (
      SELECT b, COUNT(*) AS c FROM tok
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1
    ),
    tt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM tok
      WHERE lang = '{DSIR_TARGET_LANG}'
    ),
    rc AS (
      SELECT b, COUNT(*) AS c FROM tok
      WHERE lang <> '{DSIR_TARGET_LANG}' GROUP BY 1
    ),
    rt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM tok
      WHERE lang <> '{DSIR_TARGET_LANG}'
    ),
    model AS (
      -- per-bucket grid log-ratio ln p_target(b) - ln p_raw(b),
      -- +1 smoothing, each ln snapped to the 1e-6 integer grid
      SELECT COALESCE(tc.b, rc.b) AS b,
             CAST(FLOOR(ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
                  / CAST((SELECT tot FROM tt) + {DSIR_B} AS DOUBLE))
                  * {DSIR_SCALE}) AS BIGINT)
             - CAST(FLOOR(ln(CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE)
                  / CAST((SELECT tot FROM rt) + {DSIR_B} AS DOUBLE))
                  * {DSIR_SCALE}) AS BIGINT) AS g
      FROM tc FULL JOIN rc ON rc.b = tc.b
    ),
    scored AS (
      SELECT tok.doc_id,
             CAST(SUM(COALESCE(m.g,
               CAST(FLOOR(ln(1.0 / CAST((SELECT tot FROM tt) + {DSIR_B}
                     AS DOUBLE)) * {DSIR_SCALE}) AS BIGINT)
               - CAST(FLOOR(ln(1.0 / CAST((SELECT tot FROM rt) + {DSIR_B}
                     AS DOUBLE)) * {DSIR_SCALE}) AS BIGINT)))
               AS BIGINT) AS score
      FROM tok LEFT JOIN model m ON m.b = tok.b
      WHERE tok.lang <> '{DSIR_TARGET_LANG}'
      GROUP BY tok.doc_id
    )
    SELECT doc_id, score,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM scored
    )
    WHERE rk <= {DSIR_K}
    """,
)
def q383_dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023: Data Selection
    via Importance Resampling) — score every RAW-pool document by the
    log importance ratio of two hashed-unigram bag-of-words models
    (target distribution over the '{DSIR_TARGET_LANG}' slice vs the
    raw pool), and keep the top-K. The hashed feature space
    (DSIR_B buckets) is what makes the estimator corpus-scale: both
    "models" are DSIR_B-row broadcastable aggregates, never
    vocabulary-sized.

    Determinism: per-bucket log-probabilities snap to the 1e-6
    integer grid BEFORE the per-document sum (q377's rule), so doc
    scores are exact BIGINTs — order-independent across partitions
    and bit-identical cross-engine; top-K carries the (score,
    doc_id) total order. Buckets unseen in either model take the
    smoothed 1/(tot+B) floor on that side.

    Scale: one token-bucket shuffle for the two model aggregates
    (256-row frames, broadcast back), one grouped sum per raw doc,
    one TakeOrdered top-K. A 100 TB pool costs two token-grain
    reduces.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    tok = words.select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("w"), F.lit("_dsir")).cast("binary")),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % DSIR_B
        ).alias("b"),
    )
    is_target = F.col("lang") == DSIR_TARGET_LANG
    tc = tok.filter(is_target).groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    rc = tok.filter(~is_target).groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tt = tok.filter(is_target).agg(
        F.count(F.lit(1)).cast("bigint").alias("ttot")
    )
    rt = tok.filter(~is_target).agg(
        F.count(F.lit(1)).cast("bigint").alias("rtot")
    )

    def grid_ln(num, den):
        return F.floor(
            F.log(num.cast("double") / den.cast("double")) * DSIR_SCALE
        ).cast("bigint")

    model = (
        tc.join(rc, "b", "full")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                grid_ln(
                    F.coalesce(F.col("tc"), F.lit(0)) + 1,
                    F.col("ttot") + DSIR_B,
                )
                - grid_ln(
                    F.coalesce(F.col("rc"), F.lit(0)) + 1,
                    F.col("rtot") + DSIR_B,
                )
            ).alias("g"),
        )
    )
    floor_g = (
        grid_ln(F.lit(1), F.col("ttot") + DSIR_B)
        - grid_ln(F.lit(1), F.col("rtot") + DSIR_B)
    )
    scored = (
        tok.filter(~is_target)
        .join(F.broadcast(model), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("g"), floor_g)).cast("bigint").alias(
                "score"
            )
        )
    )
    return (
        scored.select(
            "doc_id",
            "score",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .alias("rank"),
        )
        .filter(F.col("rank") <= DSIR_K)
        .select("doc_id", "score", F.col("rank").cast("bigint").alias("rank"))
    )


# ---------------------------------------------------------------------------
# q384 DoReMi-style domain mixture reweighting step

DOREMI_ETA = 1.0
DOREMI_SMOOTH = 0.1
DOREMI_SCALE = 1_000_000


@register(
    "q384_doremi_reweight",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
        FROM documents
      )
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM tok),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
    nll AS (
      -- per-token grid NLL under the global add-one unigram model
      SELECT tok.source,
             CAST(FLOOR(-ln(CAST(u.c + 1 AS DOUBLE)
               / CAST((SELECT tot FROM n) + (SELECT v FROM v) AS DOUBLE))
               * {DOREMI_SCALE}) AS BIGINT) AS g
      FROM tok JOIN uni u ON u.w = tok.w
    ),
    dom AS (
      SELECT source, CAST(SUM(g) AS BIGINT) AS sg,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM nll GROUP BY 1
    ),
    base AS (
      -- argmin domain by the shared double key, ties broken exactly;
      -- both engines see identical doubles, so the pick is identical
      SELECT sg AS sg0, nt AS nt0
      FROM (SELECT source, sg, nt,
                   CAST(sg AS DOUBLE) / ({DOREMI_SCALE}.0 * nt) AS l
            FROM dom)
      ORDER BY l, sg, nt, source LIMIT 1
    ),
    grid AS (
      -- half-up integer grid: avg_nll = round(sg/nt) on the 1e-6 grid,
      -- excess = round((sg*nt0 - sg0*nt)/(nt*nt0)) on the same grid,
      -- all in exact integer space (no double ROUND ties possible)
      SELECT d.source, d.nt,
             (2 * d.sg + d.nt) // (2 * d.nt) AS anll_i,
             CAST((2 * GREATEST(CAST(d.sg AS HUGEINT) * b.nt0
                                - CAST(b.sg0 AS HUGEINT) * d.nt,
                                CAST(0 AS HUGEINT))
                   + CAST(d.nt AS HUGEINT) * b.nt0)
                  // (2 * CAST(d.nt AS HUGEINT) * b.nt0) AS BIGINT) AS exc_i
      FROM dom d, base b
    ),
    ew AS (
      SELECT source, nt, anll_i, exc_i,
             exp({DOREMI_ETA!r} * (exc_i / {DOREMI_SCALE}.0)) AS e
      FROM grid
    ),
    z AS (SELECT SUM(e) AS z, COUNT(*) AS k FROM ew)
    SELECT source,
           nt AS n_tokens,
           anll_i / {DOREMI_SCALE}.0 AS avg_nll,
           exc_i / {DOREMI_SCALE}.0 AS excess_loss,
           (FLOOR(CAST(e / (SELECT z FROM z) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS weight,
           (FLOOR(CAST((1.0 - {DOREMI_SMOOTH!r}) * e / (SELECT z FROM z)
                 + {DOREMI_SMOOTH!r} / (SELECT k FROM z) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS smoothed_weight
    FROM ew
    """,
)
def q384_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain-mixture reweighting (Xie et al. 2023,
    Domain Reweighting with Minimax Optimization) — one
    exponentiated-gradient step: per-domain proxy loss (average
    token NLL under the global add-one unigram model), excess loss
    over the best domain, weights ∝ exp(eta * excess), then the
    uniform smoothing mix. The operator a pretraining pipeline runs
    between corpus stats and sampling (its output feeds q362's
    temperature-mixing shelf-mate).

    Determinism: per-token NLL snaps to the 1e-6 integer grid before
    the domain sum (exact BIGINT, order-independent); avg_nll and
    excess_loss are then rounded half-up IN INTEGER SPACE
    ((2*num + den) DIV (2*den), DECIMAL(38,0) products) so a
    cross-engine ROUND tie on an exact integer ratio is impossible
    (r8 hunt find; q480 precedent). Only the exp/sum stage — one row
    per domain, irrational exp outputs — uses dround-grid rounding
    (q229/q261 libm precedent).

    Scale: one vocabulary aggregate (broadcastable), one token-grain
    grouped sum per domain; everything after is domain-cardinality.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = tok.agg(F.count(F.lit(1)).cast("bigint").alias("tot"))
    v = uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    nll = (
        tok.join(uni, "w")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(v))
        .select(
            "source",
            F.floor(
                -F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                )
                * DOREMI_SCALE
            )
            .cast("bigint")
            .alias("g"),
        )
    )
    dom = nll.groupBy("source").agg(
        F.sum("g").cast("bigint").alias("sg"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    # Argmin domain by the shared double key, ties broken exactly on the
    # integer pair; the key doubles are identical cross-engine, so the
    # pick is identical. Then both avg_nll and excess_loss are computed
    # half-up on the exact 1e-6 integer grid — an integer ratio rounded
    # in integer space can never hit a cross-engine ROUND tie (the
    # q325/q416/q475/q480/q486 class; r8 hunt find on this query).
    base = (
        dom.withColumn(
            "l",
            F.col("sg").cast("double") / (float(DOREMI_SCALE) * F.col("nt")),
        )
        .orderBy("l", "sg", "nt", "source")
        .limit(1)
        .select(F.col("sg").alias("sg0"), F.col("nt").alias("nt0"))
    )
    grid = dom.crossJoin(F.broadcast(base)).select(
        "source",
        "nt",
        F.expr("(2 * sg + nt) DIV (2 * nt)").alias("anll_i"),
        F.expr(
            "(2 * GREATEST(CAST(sg AS DECIMAL(38,0)) * nt0"
            "              - CAST(sg0 AS DECIMAL(38,0)) * nt,"
            "              CAST(0 AS DECIMAL(38,0)))"
            " + CAST(nt AS DECIMAL(38,0)) * nt0)"
            " DIV (2 * CAST(nt AS DECIMAL(38,0)) * nt0)"
        )
        .cast("bigint")
        .alias("exc_i"),
    )
    ew = grid.select(
        "source",
        "nt",
        "anll_i",
        "exc_i",
        F.exp(DOREMI_ETA * (F.col("exc_i") / float(DOREMI_SCALE))).alias("e"),
    )
    z = ew.agg(F.sum("e").alias("z"), F.count(F.lit(1)).alias("k"))
    return ew.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("nt").alias("n_tokens"),
        (F.col("anll_i") / float(DOREMI_SCALE)).alias("avg_nll"),
        (F.col("exc_i") / float(DOREMI_SCALE)).alias("excess_loss"),
        dround(F.col("e") / F.col("z"), 6).alias("weight"),
        dround(
            (1.0 - DOREMI_SMOOTH) * F.col("e") / F.col("z")
            + DOREMI_SMOOTH / F.col("k"),
            6,
        ).alias("smoothed_weight"),
    )


# ---------------------------------------------------------------------------
# q385 unbiased pass@k over sampled evaluations

PASS_KS = (1, 5)
PASS_GRID = 1_000_000_000  # per-task grid for the order-independent mean


@register(
    "q385_pass_at_k",
    oracle=f"""
    WITH tasks AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    p1 AS (
      SELECT 1 AS k, user_id,
             CAST(FLOOR(CAST(c AS DOUBLE) / n * {PASS_GRID}) AS BIGINT) AS pg
      FROM tasks WHERE n >= 1
    ),
    p5 AS (
      SELECT 5 AS k, user_id,
             CAST(FLOOR((CASE WHEN n - c < 5 THEN 1.0
               ELSE 1.0 - (CAST(n - c AS DOUBLE) / n)
                        * (CAST(n - c - 1 AS DOUBLE) / (n - 1))
                        * (CAST(n - c - 2 AS DOUBLE) / (n - 2))
                        * (CAST(n - c - 3 AS DOUBLE) / (n - 3))
                        * (CAST(n - c - 4 AS DOUBLE) / (n - 4))
               END) * {PASS_GRID}) AS BIGINT) AS pg
      FROM tasks WHERE n >= 5
    ),
    allk AS (SELECT * FROM p1 UNION ALL SELECT * FROM p5)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           (FLOOR(CAST(CAST(SUM(pg) AS DOUBLE)
                 / ({PASS_GRID}.0 * COUNT(*)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_pass_at_k
    FROM allk GROUP BY k
    """,
)
def q385_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, Codex appendix): for a task
    with n samples and c successes, pass@k = 1 - C(n-c,k)/C(n,k),
    computed as the exact product of k ratios (never the
    numerically-explosive factorials), averaged over tasks — THE
    sampled-evaluation metric for generative models. Tasks here are
    users (samples = events, success = purchase), tasks with n < k
    are excluded per the standard estimator.

    Determinism: each task's pass@k is a fixed-length product of
    identical doubles (shared literal order both engines); per-task
    values snap to a 1e-9 grid so the cross-task MEAN is an exact
    integer ratio — order-independent at any partition count.

    Scale: one grouped reduce over events; everything after is
    task-cardinality with no joins.
    """
    ev = t(spark, sf_dir, "events")
    tasks = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    nn, cc = F.col("n"), F.col("c")
    p1 = tasks.filter(nn >= 1).select(
        F.lit(1).alias("k"),
        F.floor(cc.cast("double") / nn * PASS_GRID).cast("bigint").alias(
            "pg"
        ),
    )
    miss5 = (
        ((nn - cc).cast("double") / nn)
        * ((nn - cc - 1).cast("double") / (nn - 1))
        * ((nn - cc - 2).cast("double") / (nn - 2))
        * ((nn - cc - 3).cast("double") / (nn - 3))
        * ((nn - cc - 4).cast("double") / (nn - 4))
    )
    p5 = tasks.filter(nn >= 5).select(
        F.lit(5).alias("k"),
        F.floor(
            F.when(nn - cc < 5, F.lit(1.0)).otherwise(1.0 - miss5)
            * PASS_GRID
        )
        .cast("bigint")
        .alias("pg"),
    )
    allk = p1.unionByName(p5)
    return allk.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tasks"),
        dround(
            F.sum("pg").cast("double")
            / (float(PASS_GRID) * F.count(F.lit(1))),
            6,
        ).alias("mean_pass_at_k"),
    )


# ---------------------------------------------------------------------------
# q386 ROUGE-L summary-overlap scoring (unrolled LCS DP oracle)

ROUGE_N = 8  # token prefix per side (bounded DP grain)


def _rouge_cell(i: int, j: int) -> str:
    """LCS cell c{i}_{j} from the previous diagonals (0-cells are
    literal 0)."""
    up = f"c{i - 1}_{j}" if i > 1 else "0"
    left = f"c{i}_{j - 1}" if j > 1 else "0"
    diag = f"c{i - 1}_{j - 1}" if i > 1 and j > 1 else "0"
    return (
        f"CASE WHEN ta{i} = tb{j} THEN {diag} + 1 "
        f"ELSE GREATEST({up}, {left}) END AS c{i}_{j}"
    )


def _rouge_sql() -> str:
    n = ROUGE_N
    toks_a = ", ".join(
        f"COALESCE(wa[{i}], '\\01A{i}') AS ta{i}" for i in range(1, n + 1)
    )
    toks_b = ", ".join(
        f"COALESCE(wb[{i}], '\\01B{i}') AS tb{i}" for i in range(1, n + 1)
    )
    stages = []
    prev = "base"
    for d in range(2, 2 * n + 1):
        cells = ", ".join(
            _rouge_cell(i, d - i)
            for i in range(max(1, d - n), min(n, d - 1) + 1)
        )
        stages.append(f"d{d} AS (SELECT *, {cells} FROM {prev})")
        prev = f"d{d}"
    return f"""
    WITH pairs AS (
      SELECT doc_id AS doc_a, nxt AS doc_b, wa, wb,
             LEAST(len(wa), {n}) AS la, LEAST(len(wb), {n}) AS lb
      FROM (
        SELECT doc_id, source, string_split(text, ' ') AS wa,
               LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
                 AS nxt,
               LEAD(string_split(text, ' '))
                 OVER (PARTITION BY source ORDER BY doc_id) AS wb
        FROM documents
      ) WHERE nxt IS NOT NULL
    ),
    base AS (
      SELECT doc_a, doc_b, la, lb, {toks_a}, {toks_b} FROM pairs
    ),
    {", ".join(stages)}
    SELECT doc_a, doc_b,
           CAST(c{n}_{n} AS BIGINT) AS lcs_len,
           CAST(la AS BIGINT) AS len_a,
           CAST(lb AS BIGINT) AS len_b,
           (FLOOR(CAST(2.0 * c{n}_{n}
                 / NULLIF(CAST(la + lb AS DOUBLE), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS rouge_l_f1
    FROM d{2 * n}
    """


@register("q386_rouge_l_pairs", oracle=_rouge_sql())
def q386_rouge_l_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L overlap scoring between adjacent same-source document
    pairs — the summarization/eval metric built on LONGEST COMMON
    SUBSEQUENCE, which order-free n-gram overlap (q124) and TF-IDF
    cosine (q333) cannot express: word order matters, gaps are
    allowed. F1 = 2*LCS/(|a|+|b|) over the first ROUGE_N tokens per
    side (the bounded DP grain; the q318 DTW pattern).

    Spark-side the quadratic LCS DP runs as numpy inside
    Arrow-batched mapInPandas over the bounded pair rows; the ORACLE
    unrolls the identical DP into {2N-1} anti-diagonal CTE stages
    over never-matching padding sentinels (cells past a sequence's
    true length cannot extend the LCS), proving the Python path
    cell-for-cell. All-integer DP -> the F1 is an exact ratio.

    Scale: pairing is one LEAD window per source (single shuffle);
    the Python stage sees one bounded row per pair, corpus text
    never re-shuffles.
    """
    import numpy as np
    import pandas as pd

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        docs.select(
            "doc_id",
            F.split("text", " ").alias("wa"),
            F.lead("doc_id").over(w).alias("doc_b"),
            F.lead(F.split("text", " ")).over(w).alias("wb"),
        )
        .filter(F.col("doc_b").isNotNull())
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.slice("wa", 1, ROUGE_N).alias("wa"),
            F.slice("wb", 1, ROUGE_N).alias("wb"),
        )
    )

    def rouge(batches):
        for pdf in batches:
            rows = []
            for da, db, wa, wb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["wa"], pdf["wb"]
            ):
                a, b = list(wa), list(wb)
                la, lb = len(a), len(b)
                dp = np.zeros((la + 1, lb + 1), dtype=np.int64)
                for i in range(1, la + 1):
                    for j in range(1, lb + 1):
                        if a[i - 1] == b[j - 1]:
                            dp[i, j] = dp[i - 1, j - 1] + 1
                        else:
                            dp[i, j] = max(dp[i - 1, j], dp[i, j - 1])
                lcs = int(dp[la, lb])
                f1 = (
                    round(2.0 * lcs / float(la + lb), 6)
                    if la + lb
                    else None
                )
                rows.append(
                    {
                        "doc_a": int(da),
                        "doc_b": int(db),
                        "lcs_len": lcs,
                        "len_a": la,
                        "len_b": lb,
                        "rouge_l_f1": f1,
                    }
                )
            yield pd.DataFrame(rows)

    return pairs.mapInPandas(
        rouge,
        schema=(
            "doc_a long, doc_b long, lcs_len long, len_a long, "
            "len_b long, rouge_l_f1 double"
        ),
    )


# ---------------------------------------------------------------------------
# q389 KV-cache prefix-sharing analysis

PFX_MAX_DEPTH = 4


@register(
    "q389_prefix_cache_sharing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    depths AS (SELECT UNNEST(range(1, {PFX_MAX_DEPTH + 1})) AS d),
    pfx AS (
      SELECT d.d, t.doc_id,
             array_to_string(t.w[1:d.d], ' ') AS prefix
      FROM toks t JOIN depths d ON len(t.w) >= d.d
    ),
    groups AS (
      SELECT d, prefix, CAST(COUNT(*) AS BIGINT) AS n
      FROM pfx GROUP BY d, prefix
    )
    SELECT CAST(d AS BIGINT) AS depth,
           CAST(SUM(n) AS BIGINT) AS n_prompts,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_groups,
           CAST(SUM((n - 1) * d) AS BIGINT) AS saved_tokens,
           (FLOOR(CAST(CAST(SUM((n - 1) * d) AS DOUBLE)
                 / NULLIF(CAST(SUM(n) * d AS DOUBLE), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS save_rate
    FROM groups GROUP BY d
    """,
)
def q389_prefix_cache_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-cache prefix-sharing planner — the inference-serving
    measurement behind vLLM-style automatic prefix caching: at each
    prefix depth d, prompts whose first d tokens match can reuse one
    cached KV segment, so a group of n prompts computes the prefix
    once and saves (n-1)*d token-forward passes. Reports, per depth:
    group counts, shared-group counts, absolute token savings, and
    the savings RATE against recomputing every prompt's d-prefix —
    the number that decides whether prefix caching pays for a given
    serving corpus (templated prompts -> high; diverse corpora ->
    ~0). Sits beside q346 (padding waste) on the serving-efficiency
    shelf.

    Per-depth accounting is independent by design (the cache can be
    configured at one depth); all quantities are exact integers off
    one (depth, prefix)-grain reduce.

    Scale: the only corpus-sized stage is the grouped count on the
    (d, prefix) key — {PFX_MAX_DEPTH} bounded-size keys per prompt,
    partial-aggregated map-side; no joins, no windows.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    depths = spark.range(1, PFX_MAX_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    pfx = docs.crossJoin(F.broadcast(depths)).filter(
        F.size("w") >= F.col("d")
    ).select(
        "d",
        F.concat_ws(" ", F.slice("w", 1, F.col("d"))).alias("prefix"),
    )
    groups = pfx.groupBy("d", "prefix").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return groups.groupBy(F.col("d").cast("bigint").alias("depth")).agg(
        F.sum("n").cast("bigint").alias("n_prompts"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared_groups"),
        F.sum((F.col("n") - 1) * F.col("d")).cast("bigint").alias(
            "saved_tokens"
        ),
        dround(
            F.sum((F.col("n") - 1) * F.col("d")).cast("double")
            / F.nullif(
                (F.sum("n") * F.first("d")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("save_rate"),
    )


# ---------------------------------------------------------------------------
# q391 IPS / SNIPS off-policy evaluation

IPS_CLIP = 10.0  # importance-weight clip
IPS_GRID = 1_000_000_000


@register(
    "q391_ips_offpolicy_eval",
    oracle=f"""
    WITH logged AS (
      -- logged bandit feedback: context = order, action = the
      -- priority chosen by the LOGGING policy (hash-mixed between
      -- the actual priority and a uniform exploration arm), reward =
      -- 1 if the order shipped fast (o_orderstatus = 'F'), logging
      -- propensity p0 from the mix, target-policy propensity p1
      SELECT o_orderkey,
             CASE WHEN ({_h7('o_orderkey', 'explore')}) % 10 = 0
                  THEN (CASE WHEN ({_h7('o_orderkey', 'arm')}) % 2 = 0
                             THEN '1-URGENT' ELSE '5-LOW' END)
                  ELSE o_orderpriority END AS action,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r
      FROM orders
    ),
    probs AS (
      -- logging propensity: 0.9 on the organic arm + 0.05 per
      -- exploration arm when they coincide; target policy prefers
      -- URGENT deterministically with 0.8 / uniform 0.2 over 5 arms
      SELECT o_orderkey, action, r,
             0.9 * (CASE WHEN action = o2.o_orderpriority
                         THEN 1 ELSE 0 END)
             + 0.05 * (CASE WHEN action IN ('1-URGENT', '5-LOW')
                            THEN 1 ELSE 0 END) AS p0,
             0.8 * (CASE WHEN action = '1-URGENT' THEN 1 ELSE 0 END)
             + 0.04 AS p1
      FROM logged JOIN orders o2 USING (o_orderkey)
    ),
    w AS (
      SELECT r,
             CAST(FLOOR(LEAST(p1 / p0, {IPS_CLIP!r}) * r * {IPS_GRID})
                  AS BIGINT) AS wr_g,
             CAST(FLOOR(LEAST(p1 / p0, {IPS_CLIP!r}) * {IPS_GRID})
                  AS BIGINT) AS w_g
      FROM probs WHERE p0 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           (FLOOR(CAST(CAST(SUM(r) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS logging_ctr,
           (FLOOR(CAST(CAST(SUM(wr_g) AS DOUBLE) / ({IPS_GRID}.0 * COUNT(*)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ips_estimate,
           (FLOOR(CAST(CAST(SUM(wr_g) AS DOUBLE)
                 / NULLIF(CAST(SUM(w_g) AS DOUBLE), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS snips_estimate
    FROM w
    """,
)
def q391_ips_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy (counterfactual) evaluation of a new decision
    policy from logged bandit feedback — clipped Inverse Propensity
    Scoring and its Self-Normalized variant (SNIPS): estimate the
    reward a TARGET policy would earn from data collected by the
    LOGGING policy, reweighting each logged (context, action, reward)
    by p_target/p_logging, clipped at {IPS_CLIP} (the standard
    variance-bias knob). The experimentation shelf (q151 A/B, q287
    sequential, q298 SPRT) measures policies you RAN; IPS evaluates
    one you didn't — the production counterfactual tool.

    Determinism: propensities are closed-form doubles from hash
    arithmetic (identical both engines); per-row clipped weights snap
    to a 1e-9 grid so both estimator sums are exact BIGINTs, making
    IPS and SNIPS order-independent exact ratios.

    Scale: one pass over the fact table, no joins (the oracle's
    self-join is notational), two grid sums + counts.
    """
    o = t(spark, sf_dir, "orders")

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("_" + salt),
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")

    action = F.when(
        h("explore") % 10 == 0,
        F.when(h("arm") % 2 == 0, F.lit("1-URGENT")).otherwise(
            F.lit("5-LOW")
        ),
    ).otherwise(F.col("o_orderpriority"))
    logged = o.select(
        action.alias("action"),
        F.col("o_orderpriority").alias("organic"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("r"),
    )
    p0 = 0.9 * F.when(F.col("action") == F.col("organic"), 1).otherwise(
        0
    ) + 0.05 * F.when(
        F.col("action").isin("1-URGENT", "5-LOW"), 1
    ).otherwise(0)
    p1 = 0.8 * F.when(F.col("action") == "1-URGENT", 1).otherwise(0) + 0.04
    w = logged.select(
        "r",
        F.floor(F.least(p1 / p0, F.lit(IPS_CLIP)) * F.col("r") * IPS_GRID)
        .cast("bigint")
        .alias("wr_g"),
        F.floor(F.least(p1 / p0, F.lit(IPS_CLIP)) * IPS_GRID)
        .cast("bigint")
        .alias("w_g"),
    ).filter(p0 > 0)
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_logged"),
        dround(F.sum("r").cast("double") / F.count(F.lit(1)), 6).alias(
            "logging_ctr"
        ),
        dround(
            F.sum("wr_g").cast("double")
            / (float(IPS_GRID) * F.count(F.lit(1))),
            6,
        ).alias("ips_estimate"),
        dround(
            F.sum("wr_g").cast("double")
            / F.nullif(F.sum("w_g").cast("double"), F.lit(0.0)),
            6,
        ).alias("snips_estimate"),
    )


# ---------------------------------------------------------------------------
# q393 Bradley-Terry pairwise-preference strength fit

BT_ITERS = 6  # unrolled minorization-maximization rounds
BT_GRID = 1_000_000_000  # 1e-9 snapping grid for order-free sums


def _bt_sql() -> str:
    """Unrolled MM iterations over the arm^2 duel matrix; every sum
    that crosses rows is snapped to a BIGINT 1e-9 grid first so both
    engines add exact integers (order-independent), and every
    division is BIGINT/BIGINT -> identical IEEE doubles."""
    its = []
    for r in range(1, BT_ITERS + 1):
        its.append(f"""
    den{r} AS MATERIALIZED (
      SELECT s.i,
             SUM(CAST(FLOOR((CAST(s.sg AS DOUBLE) / {BT_GRID})
                            / (pi.p + pj.p) * {BT_GRID} + 0.5)
                 AS BIGINT)) AS den
      FROM sh s
      JOIN p{r - 1} pi ON pi.i = s.i
      JOIN p{r - 1} pj ON pj.i = s.j
      GROUP BY s.i
    ),
    raw{r} AS MATERIALIZED (
      SELECT w.i,
             GREATEST(CAST(FLOOR(CAST(w.wg AS DOUBLE)
                                 / GREATEST(d.den, 1) * {BT_GRID} + 0.5)
                      AS BIGINT), 1) AS pg
      FROM wg w JOIN den{r} d ON d.i = w.i
    ),
    p{r} AS MATERIALIZED (
      SELECT i,
             CAST(pg * (SELECT k FROM kf) AS DOUBLE)
               / (SELECT SUM(pg) FROM raw{r}) AS p
      FROM raw{r}
    )""")
    return f"""
    WITH lagged AS (
      SELECT event_type AS b, value AS v,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY event_id) AS a,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY event_id) AS pv
      FROM events
    ),
    duels AS MATERIALIZED (
      SELECT a, b,
             CASE WHEN v > pv THEN 1 WHEN v < pv THEN 0
                  WHEN b < a THEN 1 ELSE 0 END AS win_b
      FROM lagged WHERE a IS NOT NULL AND a <> b
    ),
    m AS MATERIALIZED (
      SELECT i, j, COUNT(*) AS n, SUM(wn) AS w
      FROM (
        SELECT a AS i, b AS j, 1 - win_b AS wn FROM duels
        UNION ALL
        SELECT b AS i, a AS j, win_b AS wn FROM duels
      ) GROUP BY i, j
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM m),
    sh AS MATERIALIZED (
      SELECT i, j,
             CAST(FLOOR(n * {BT_GRID} / nn + 0.5) AS BIGINT) AS sg
      FROM m, tot
    ),
    wg AS MATERIALIZED (
      SELECT i, CAST(SUM(n) AS BIGINT) AS games,
             CAST(SUM(w) AS BIGINT) AS wins,
             GREATEST(CAST(FLOOR(SUM(w) * {BT_GRID} / MIN(nn) + 0.5)
                      AS BIGINT), 1) AS wg
      FROM m, tot GROUP BY i
    ),
    kf AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM wg),
    p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM wg),
    {",".join(its)}
    SELECT w.i AS arm, w.games, w.wins,
           (FLOOR(CAST(p.p AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS strength,
           CAST(ROW_NUMBER() OVER (ORDER BY p.p DESC, w.i)
                AS BIGINT) AS rk
    FROM wg w JOIN p{BT_ITERS} p ON p.i = w.i
    """


@register("q393_bradley_terry", oracle=_bt_sql())
def q393_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry pairwise-preference strength fit — the model
    behind RLHF preference learning and LLM arena leaderboards
    (Elo's batch form): arms duel whenever a user emits two
    different event types back-to-back (event_id order), the higher
    value wins (value ties go to the lexicographically smaller
    type), and {BT_ITERS} unrolled minorization-maximization rounds
    fit strengths p_i with p_i' = wins_i / sum_j n_ij/(p_i+p_j)
    (Hunter 2004), L1-normalized to k each round. Complements the
    experimentation shelf (q151 A/B, q391 off-policy IPS) with the
    PAIRWISE-feedback estimator those absolute-metric ops can't
    express.

    Determinism: the duel matrix is exact integers; shares, the MM
    denominator terms, and the normalizer are all snapped to a
    {BT_GRID} BIGINT grid BEFORE summation (order-independent exact
    adds), and every strength is a BIGINT/BIGINT IEEE division —
    bit-identical across engines, so the final rank needs no
    rounded-key crutch.

    Scale: one window pass over the fact table + one arm^2 reduce;
    everything after is a broadcast-sized <= k^2 lattice (k = 5
    event types), iterated {BT_ITERS}x on checkpointed tiny frames.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = e.select(
        F.col("event_type").alias("b"),
        F.col("value").alias("v"),
        F.lag("event_type").over(w).alias("a"),
        F.lag("value").over(w).alias("pv"),
    )
    duels = lagged.filter(
        F.col("a").isNotNull() & (F.col("a") != F.col("b"))
    ).select(
        "a",
        "b",
        F.when(F.col("v") > F.col("pv"), 1)
        .when(F.col("v") < F.col("pv"), 0)
        .otherwise(F.when(F.col("b") < F.col("a"), 1).otherwise(0))
        .alias("win_b"),
    )
    directed = duels.select(
        F.col("a").alias("i"), F.col("b").alias("j"), (1 - F.col("win_b")).alias("wn")
    ).unionByName(
        duels.select(
            F.col("b").alias("i"), F.col("a").alias("j"), F.col("win_b").alias("wn")
        )
    )
    # the arm^2 lattice: one fact-table reduce, then checkpoint so
    # the unrolled iterations below reference a ~k^2-row cached
    # frame instead of re-scanning events 2^ITERS times
    m = (
        directed.groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("wn").alias("w"))
        .localCheckpoint(eager=True)
    )
    tot = m.agg(F.sum("n").cast("double").alias("nn"))
    sh = m.crossJoin(F.broadcast(tot)).select(
        "i",
        "j",
        F.floor(F.col("n") * BT_GRID / F.col("nn") + F.lit(0.5))
        .cast("bigint")
        .alias("sg"),
    )
    wg = (
        m.crossJoin(F.broadcast(tot))
        .groupBy("i")
        .agg(
            F.sum("n").cast("bigint").alias("games"),
            F.sum("w").cast("bigint").alias("wins"),
            F.greatest(
                F.floor(F.sum("w") * BT_GRID / F.min("nn") + F.lit(0.5)),
                F.lit(1),
            )
            .cast("bigint")
            .alias("wg"),
        )
    )
    kf = wg.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    p = wg.select("i", F.lit(1.0).alias("p"))
    for _ in range(BT_ITERS):
        pi = p.select(F.col("i").alias("ii"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("jj"), F.col("p").alias("p_j"))
        den = (
            sh.join(F.broadcast(pi), F.col("i") == F.col("ii"))
            .join(F.broadcast(pj), F.col("j") == F.col("jj"))
            .select(
                "i",
                F.floor(
                    (F.col("sg").cast("double") / F.lit(float(BT_GRID)))
                    / (F.col("p_i") + F.col("p_j"))
                    * BT_GRID
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("tg"),
            )
            .groupBy("i")
            .agg(F.sum("tg").alias("den"))
        )
        raw = wg.join(den, "i").select(
            "i",
            F.greatest(
                F.floor(
                    F.col("wg").cast("double")
                    / F.greatest(F.col("den"), F.lit(1))
                    * BT_GRID
                    + F.lit(0.5)
                ).cast("bigint"),
                F.lit(1),
            ).alias("pg"),
        )
        s = raw.agg(F.sum("pg").alias("s"))
        p = (
            raw.crossJoin(F.broadcast(s))
            .crossJoin(F.broadcast(kf))
            .select(
                "i",
                ((F.col("pg") * F.col("k")).cast("double") / F.col("s")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    wr = Window.orderBy(F.col("p").desc(), F.col("i"))
    return (
        wg.join(p, "i")
        .select(
            F.col("i").alias("arm"),
            "games",
            "wins",
            dround("p", 6).alias("strength"),
            F.row_number().over(wr).cast("bigint").alias("rk"),
        )
    )
