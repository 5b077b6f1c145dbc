"""Round-2 coverage extensions, batch 2: SimHash banded candidate
pairs (the SimHash scale path q63 stopped short of), Z-order layout
audit (multi-dimensional data-skipping), percentile-thresholded graph
triangle counting, Zipf rank-frequency slope (vocabulary health), and
in-engine kNN label-prediction evaluation.

Like every relational op, these are absent from the reference codec
(SURVEY.md §2b census — the reference is a Hadoop compression codec,
`src/main/java/.../BroCodec.java`; its relational surface is
inherited from the host framework); they extend the engine along the
BASELINE.json north star.

Scale notes (100 TB):
- q212: the SimHash twin of q62's MinHash+LSH plan — fingerprints
  are 7 bytes/doc, candidate generation is ONE shuffle on
  (band, key) with the same pre-collect bucket cap (oversized
  buckets = near-identical content that exact dedup q60 handles),
  and Hamming verification runs on candidates only via
  ``bit_count(xor())`` — never O(n²).
- q213: Z-order (Morton) interleaving is how a 100 TB table gets
  data-skipping on TWO correlated filter columns at once: writing
  sorted by zkey (``repartitionByRange(zkey)`` + sortWithinPartitions
  on the write path) makes every file's (min,max) bounding box tight
  in BOTH dimensions, so a conjunctive predicate prunes files the
  way a 1-D sort only could for its leading column. The query audits
  exactly that: per z-range bucket, the 2-D bounding box and its
  area fraction — integer bit arithmetic, one aggregate pass.
- q214: the triangle join runs on the REDUCED co-supply edge list
  (one row per supplier pair, built from the distinct (part,
  supplier) projection with a per-part posting-list cap bounding the
  quadratic pair emission), never on raw lineitem. The percentile
  threshold comes from a window over that reduced edge aggregate —
  bounded by |suppliers|², not by fact rows.
- q215: rank-frequency runs over the per-(source, word) aggregate
  (vocabulary-sized, not corpus-sized); the per-source window ranks
  a bounded vocabulary, and the OLS slope reduces the top-R ranks to
  five sufficient statistics per source.
- q216: broadcast query set (100 vectors) against the streamed
  corpus — zero corpus shuffle, identical to q70's plan; the
  confusion matrix is a |labels|² aggregate.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, dsum, fan_out, grain_rank, t
from .dedup import MAX_LSH_BUCKET, _shingle_df
from .similarity import dot_double, norm_double

# ------------------------------------------------ q212 simhash pairs

SIMHASH_BITS = 56  # 4 bands x 14 bits; bit 63 avoided (DuckDB's
# checked BIGINT shift traps on 1<<63, and a sign bit would flip
# band-key arithmetic in both engines)
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 7  # <= 12.5% of bits differ


def _simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """56-bit SimHash fingerprint per doc as ONE BIGINT: bit j is the
    sign of the term-frequency vote of bit j of the word's md5 (hex
    digit j//4, bit 3-j%4 — big-endian within the nibble on both
    engines). Packing into a single integer (vs q63's 16-char
    bitstring) is what makes banding and ``xor``-Hamming cheap."""
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    h = words.select("doc_id", F.md5(F.col("word").cast("binary")).alias("hw"))

    def bit(j: int):
        nib = F.conv(F.substring("hw", j // 4 + 1, 1), 16, 10).cast("int")
        return F.shiftright(nib, 3 - j % 4).bitwiseAND(F.lit(1))

    terms = [
        F.when(
            F.sum(F.when(bit(j) == 1, 1).otherwise(-1)) >= 0,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(SIMHASH_BITS)
    ]
    sim = functools.reduce(operator.add, terms)
    return h.groupBy("doc_id").agg(sim.alias("sim"))


def _simhash_fp_sql() -> str:
    """Standalone DuckDB SELECT producing (doc_id, sim) — the packed
    56-bit fingerprint table (shared by the q212 and q238 oracles)."""
    bits = " + ".join(
        f"CASE WHEN SUM(CASE WHEN ((strpos('0123456789abcdef',"
        f" substr(hw, {j // 4 + 1}, 1)) - 1) >> {3 - j % 4}) & 1 = 1"
        f" THEN 1 ELSE -1 END) >= 0"
        f" THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
      WITH words AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
      ),
      h AS (SELECT doc_id, md5(word) AS hw FROM words)
      SELECT doc_id, ({bits}) AS sim FROM h GROUP BY doc_id"""


def _simhash_oracle_pairs() -> str:
    band_ids = ", ".join(str(b) for b in range(SIMHASH_BANDS))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return f"""
    WITH fp AS ({_simhash_fp_sql()}),
    bands AS (
      SELECT doc_id, b, (sim >> (b * {SIMHASH_BAND_BITS})) & {mask} AS key
      FROM fp, UNNEST([{band_ids}]) AS t(b)
    ),
    bsz AS (SELECT b, key, COUNT(*) AS n FROM bands GROUP BY b, key),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM bands a
      JOIN bands b2 ON a.b = b2.b AND a.key = b2.key
                   AND a.doc_id < b2.doc_id
      JOIN bsz s ON s.b = a.b AND s.key = a.key
                AND s.n <= {MAX_LSH_BUCKET}
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(fa.sim, fb.sim)) AS BIGINT) AS hamming
    FROM cand
    JOIN fp fa ON fa.doc_id = doc_a
    JOIN fp fb ON fb.doc_id = doc_b
    WHERE bit_count(xor(fa.sim, fb.sim)) <= {SIMHASH_MAX_HAMMING}
    """


@register("q212_simhash_band_pairs", oracle=_simhash_oracle_pairs())
def q212_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded blocking (4 bands x 14 bits —
    any pair within Hamming distance 3 shares at least one exact
    band; wider-distance pairs are found when collisions allow) plus
    exact Hamming verification on candidates only.

    This is the candidate-generation stage q63's fingerprints exist
    for, in the same shape as q62's MinHash plan: one shuffle on the
    band key, a pre-collect bucket-size cap as the skew guard, pair
    emission JVM-side from each bucket's sorted doc list, then a
    fingerprint join and ``bit_count(a XOR b)`` — integer-exact on
    both engines, no float comparisons anywhere.
    """
    from ..functions.columns import hamming_distance

    fp = _simhash_fp(spark, sf_dir)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = fp.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("sim"), b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sim", "bk.b", "bk.key")
    # The fingerprint rides INSIDE the bucket structs, so the
    # corpus-sized fingerprint pipeline runs exactly once — no
    # re-join of fp against the candidate pairs (which would plan
    # the word-explode + 56-vote aggregate two more times).
    bn = F.count(F.lit(1)).over(W.partitionBy("b", "key"))
    buckets = (
        bands.withColumn("bn", bn)
        .filter((F.col("bn") >= 2) & (F.col("bn") <= MAX_LSH_BUCKET))
        .groupBy("b", "key")
        .agg(
            F.sort_array(F.collect_set(F.struct("doc_id", "sim"))).alias("ids")
        )
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,"
                    " x.sim AS sim_a, y.sim AS sim_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.sim_a", "p.sim_b")
        .distinct()
    )
    hamming = hamming_distance("sim_a", "sim_b").cast("bigint")
    return pairs.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)


# ------------------------------------------------- q213 z-order audit

Z_DIM_BITS = 10  # 10 bits per dimension -> 20-bit Morton key
Z_BUCKET_SHIFT = 12  # keep the top 8 z-bits -> 256 layout buckets


def _morton(x, y):
    """Interleave the low Z_DIM_BITS of x (even positions) and y (odd
    positions) into one integer — pure shifts/masks, codegen-side
    (canonical implementation: ``functions.columns.zorder_key``)."""
    from ..functions.columns import zorder_key

    return zorder_key(x, y, Z_DIM_BITS)


def _sql_morton(x: str, y: str) -> str:
    terms = []
    for j in range(Z_DIM_BITS):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


@register(
    "q213_zorder_layout",
    oracle=f"""
    WITH keyed AS (
      SELECT CAST(l_partkey % 1024 AS BIGINT) AS px,
             CAST(l_suppkey % 1024 AS BIGINT) AS sx
      FROM lineitem
    ),
    z AS (
      SELECT px, sx,
             ({_sql_morton('px', 'sx')}) >> {Z_BUCKET_SHIFT} AS zbucket
      FROM keyed
    )
    SELECT zbucket,
           COUNT(*) AS n_rows,
           MIN(px) AS px_min, MAX(px) AS px_max,
           MIN(sx) AS sx_min, MAX(sx) AS sx_max,
           CAST((MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1)
                AS BIGINT) AS bbox_area
    FROM z GROUP BY zbucket
    """,
)
def q213_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit: interleave the low 10 bits of
    (l_partkey, l_suppkey) into a 20-bit z-key, bucket rows by the
    top 8 z-bits (the per-file grain a z-sorted write would produce
    via ``repartitionByRange("zkey").sortWithinPartitions("zkey")``),
    and report each bucket's 2-D bounding box.

    The point of the audit: under z-layout every bucket's
    ``bbox_area`` is a ~1/256 fraction of the 1024x1024 key space in
    BOTH dimensions simultaneously, which is exactly the property
    that lets a conjunctive predicate on the two columns prune
    parquet files from footer min/max stats alone. A 1-D sort gets a
    tight box only on its leading column. Bit interleaving is plain
    shift/mask arithmetic — whole-stage-codegen, no UDF.
    """
    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 1024).cast("long").alias("px"),
        (F.col("l_suppkey") % 1024).cast("long").alias("sx"),
    )
    z = li.withColumn(
        "zbucket", F.shiftright(_morton(F.col("px"), F.col("sx")), Z_BUCKET_SHIFT)
    )
    bbox_area = (
        (F.max("px") - F.min("px") + 1) * (F.max("sx") - F.min("sx") + 1)
    ).cast("bigint")
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("px").alias("px_min"),
        F.max("px").alias("px_max"),
        F.min("sx").alias("sx_min"),
        F.max("sx").alias("sx_max"),
        bbox_area.alias("bbox_area"),
    )


# --------------------------------------------- q214 triangle counting

MAX_SUPP_PER_PART = 64  # posting-list cap (q61's MAX_SHINGLE_DF analog)
TRI_EDGE_FRACTION = 10  # keep the top 1/10 of edges by shared-part count


@register(
    "q214_cosupply_triangles",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    parts AS (
      SELECT p, list_sort(list(s)) AS ss FROM ps GROUP BY p
      HAVING COUNT(*) <= {MAX_SUPP_PER_PART}
    ),
    expanded AS (
      SELECT a.s AS sa, b.s AS sb
      FROM (SELECT p, UNNEST(ss) AS s FROM parts) a
      JOIN (SELECT p, UNNEST(ss) AS s FROM parts) b
        ON a.p = b.p AND a.s < b.s
    ),
    e AS (
      SELECT sa, sb, COUNT(*) AS shared_parts FROM expanded GROUP BY sa, sb
    ),
    ranked AS (
      SELECT sa, sb,
             ROW_NUMBER() OVER (ORDER BY shared_parts DESC, sa, sb) AS rn,
             COUNT(*) OVER () AS n_edges
      FROM e
    ),
    top_e AS (
      SELECT sa, sb FROM ranked WHERE rn <= n_edges // {TRI_EDGE_FRACTION}
    )
    SELECT e1.sa AS s_a, e1.sb AS s_b, e2.sb AS s_c
    FROM top_e e1
    JOIN top_e e2 ON e2.sa = e1.sb
    JOIN top_e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    """,
)
def q214_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the supplier co-supply graph: nodes
    are suppliers, an edge joins two suppliers whose shared distinct
    part count ranks in the top 1/10 of all pairs (a percentile-free
    integer threshold: rank by (count DESC, sa, sb) — deterministic
    across engines, no interpolated-quantile float compare).

    Graph-building is scale-shaped like q61's inverted index: the
    distinct (part, supplier) projection groups per part into a
    capped posting list (a part with pathological supplier fan-out is
    dropped on both sides), pairs come from a bounded per-row double
    explode, and the edge aggregate is |suppliers|-sized — the
    triangle two-hop join then runs on the reduced top-decile edge
    list. a<b<c node ordering counts each triangle exactly once.
    """
    ps = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # Pair generation as a CODEGEN equi-self-join on the part key
    # (r3 sweep find: the previous posting-list collect_set +
    # nested-transform explode allocated arrays/structs per part and
    # measured ~2x slower at sf0.1 for the same 499k edges; the
    # sorted-hash self-join never leaves whole-stage codegen). The
    # fan-out cap survives as a degree semi-join: parts whose
    # supplier count exceeds the cap are dropped BEFORE pair-gen on
    # both sides, so a pathological part still can't go quadratic.
    ok_parts = (
        ps.groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") <= MAX_SUPP_PER_PART)
        .select("p")
    )
    capped = ps.join(ok_parts, "p")
    e = (
        capped.select("p", F.col("s").alias("sa"))
        .join(capped.select("p", F.col("s").alias("sb")), "p")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    # Top-decile cut via checkpoint + count + TakeOrdered (r3 sweep
    # find): the previous global row_number PLUS count-over-empty-
    # partition pair was TWO single-partition WindowExec passes that
    # buffered all 500k edges twice (~4 s at sf0.1). orderBy+limit
    # plans as TakeOrderedAndProject — parallel per-partition partial
    # top-k, one merge — and the edge checkpoint both feeds the count
    # and keeps the triangle join's three aliases from re-deriving
    # the fact-table pipeline (q64's rule).
    e_ck = e.localCheckpoint(eager=True)
    n_edges = e_ck.count()
    top_e = (
        e_ck.orderBy(F.col("shared_parts").desc(), "sa", "sb")
        .limit(n_edges // TRI_EDGE_FRACTION)
        .select("sa", "sb")
        .localCheckpoint(eager=True)
    )
    e1 = top_e.select(F.col("sa").alias("s_a"), F.col("sb").alias("s_b"))
    e2 = top_e.select(F.col("sa").alias("s_b"), F.col("sb").alias("s_c"))
    e3 = top_e.select(F.col("sa").alias("s_a"), F.col("sb").alias("s_c"))
    return e1.join(e2, "s_b").join(e3, ["s_a", "s_c"]).select("s_a", "s_b", "s_c")


# ------------------------------------------------ q215 zipf slope

ZIPF_TOP_RANKS = 100


@register(
    "q215_zipf_slope",
    oracle=f"""
    WITH words AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT source, word, COUNT(*) AS c FROM words GROUP BY source, word
    ),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, word ASC) AS r
      FROM freq
    ),
    top AS (
      SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE r <= {ZIPF_TOP_RANKS}
    ),
    stats AS (
      SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM top GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           (FLOOR(CAST((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0)
             AS zipf_slope
    FROM stats
    """,
)
def q215_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per source: OLS fit of ln(freq) vs
    ln(rank) over the top 100 word ranks. Healthy natural-language
    corpora sit near slope -1; a flat slope flags synthetic/templated
    text, a cliff flags boilerplate domination — a standard corpus-
    health gauge for training-data sourcing.

    Shape: the heavy reduction is the per-(source, word) count; the
    rank window partitions by source over that vocabulary-sized
    aggregate, and the regression collapses the top-100 ranks into 5
    sufficient statistics per source. Rank ties share the same count,
    so the (rank, freq) multiset — and hence the slope — is
    tie-order-invariant; (FLOOR(CAST(… AS DOUBLE) * 10000.0 + 0.5) / 10000.0) absorbs summation-order float
    noise (the q87 precedent).
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    freq = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("source").orderBy(F.col("c").desc(), F.col("word").asc())
    top = (
        freq.select("source", "c", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= ZIPF_TOP_RANKS)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    stats = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return stats.select(
        "source",
        F.col("n").cast("bigint").alias("n_ranks"),
        dround(num / F.when(den != 0, den), 4).alias("zipf_slope"),
    )


# --------------------------------------------- q216 knn label eval

KNN_EVAL_QUERIES = 100
KNN_EVAL_K = 5


@register(
    "q216_knn_label_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id < {KNN_EVAL_QUERIES}
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             CAST(UNNEST(q.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM q, embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT query_id, true_label, cand_id, cand_label,
             SUM(x * y) AS dot, SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc
      FROM pairs GROUP BY query_id, true_label, cand_id, cand_label
    ),
    scored AS (
      SELECT query_id, true_label, cand_label,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC
             ) AS rn
      FROM dots
    ),
    votes AS (
      SELECT query_id, true_label, cand_label, COUNT(*) AS v
      FROM scored WHERE rn <= {KNN_EVAL_K}
      GROUP BY query_id, true_label, cand_label
    ),
    pred AS (
      SELECT query_id, true_label, cand_label AS pred_label,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY v DESC, cand_label ASC
             ) AS pr
      FROM votes
    )
    SELECT true_label, pred_label, COUNT(*) AS n_queries
    FROM pred WHERE pr = 1
    GROUP BY true_label, pred_label
    """,
)
def q216_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine kNN classification evaluation: predict each held-out
    query vector's label by majority vote of its 5 cosine-nearest
    neighbors (self excluded), and report the label confusion matrix
    — the embedding-quality readout a retrieval/labeling pipeline
    runs before trusting an index (q191's classifier-eval twin for
    the vector surface).

    Plan: the 100-query evaluation set broadcasts against the
    streamed corpus (q70's shape — zero corpus shuffle); scoring and
    both argmax windows partition by query_id; ties break on
    (votes DESC, label ASC) and (cosine DESC, cand_id ASC), making
    the prediction a total order on both engines. Output is at most
    |labels|² rows.
    """
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < KNN_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("true_label"),
    ).withColumn("qn", norm_double("qe"))
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("cand_label"),
    ).withColumn("cn", norm_double("ce"))
    # norms PRECOMPUTED per side before the pair join (r3 sweep
    # find): inside the join, cosine recomputed BOTH array norms per
    # PAIR — 3x the array work. Factoring them into per-row columns
    # (evaluated once per corpus/query row under the join) leaves
    # only the dot product per pair. Bit-identical results: same
    # IEEE ops on the same inputs, just not repeated.
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "true_label", "cand_id", "cand_label", cosine.alias("cos"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    votes = (
        scored.select(
            "query_id", "true_label", "cand_label", F.row_number().over(wk).alias("rn")
        )
        .filter(F.col("rn") <= KNN_EVAL_K)
        .groupBy("query_id", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    wp = W.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("cand_label").asc()
    )
    pred = votes.select(
        "query_id",
        "true_label",
        F.col("cand_label").alias("pred_label"),
        F.row_number().over(wp).alias("pr"),
    ).filter(F.col("pr") == 1)
    return pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n_queries")
    )


# --------------------------------------------- q218 vocab OOV rate

OOV_VOCAB_SIZE = 30


@register(
    "q218_vocab_oov_rate",
    oracle=f"""
    WITH words AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, ROW_NUMBER() OVER (
          ORDER BY COUNT(*) DESC, word ASC
        ) AS r
        FROM words GROUP BY word
      ) WHERE r <= {OOV_VOCAB_SIZE}
    ),
    marked AS (
      SELECT w.source,
             CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
      FROM words w LEFT JOIN vocab v ON w.word = v.word
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM marked GROUP BY source
    """,
)
def q218_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the corpus top-30
    vocabulary by global word frequency (ties broken on the word
    itself — a total order), then measure each source's
    out-of-vocabulary token rate. The pre-training question this
    answers: how much of each source would a fixed-size vocab
    fragment into unknowns / byte-fallback?

    Shape: the vocab is a TakeOrdered top-K over the word aggregate
    (global window never touches corpus-sized data), broadcast back
    against the token stream — membership is a broadcast-hash left
    join, zero token shuffle; the per-source reduction is
    |sources|-sized. The exact integer ratio divides bit-identically
    on both engines, no rounding needed.
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    wv = W.orderBy(F.col("c").desc(), F.col("word").asc())
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("word", F.row_number().over(wv).alias("r"))
        .filter(F.col("r") <= OOV_VOCAB_SIZE)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    marked = words.join(F.broadcast(vocab), "word", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        (F.sum(oov).cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


# --------------------------------------------- q223 key-skew report


@register(
    "q223_join_key_skew",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c ASC, user_id ASC) AS i,
             ROW_NUMBER() OVER (ORDER BY c DESC, user_id ASC) AS r
      FROM counts
    ),
    tot AS (
      SELECT COUNT(*) AS k, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(i * c) AS BIGINT) AS swc,
             CAST(MAX(c) AS BIGINT) AS cmax,
             CAST(SUM(CASE WHEN r <= 10 THEN c ELSE 0 END) AS BIGINT)
               AS top10
      FROM ranked
    )
    SELECT n AS n_rows, k AS n_keys,
           CAST(cmax AS DOUBLE) / n AS top1_share,
           CAST(top10 AS DOUBLE) / n AS top10_share,
           CAST(2 * swc - (k + 1) * n AS DOUBLE) / (k * n) AS gini
    FROM tot
    """,
)
def q223_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew pre-flight: the diagnostic a pipeline runs on a
    key BEFORE shuffling 100 TB on it. Reports key count, the
    heaviest key's share, the top-10 share, and the Gini coefficient
    of the key-frequency distribution (0 = uniform, →1 = one key
    owns everything; Gini = (2·Σᵢ i·cᵢ − (K+1)·N) / (K·N) over
    ascending-sorted counts).

    High Gini / top-1 share ⇒ salt the aggregation (q18's pattern)
    or let AQE skew-split the join. All arithmetic is integer until
    the three final divisions (exact int ratios divide bit-identically
    on both engines — no rounding, no tolerance). The rank runs over
    the REDUCED per-key aggregate, and (r6 window audit: the key
    grain itself is corpus-bound) WITHOUT a single-partition window:
    the ascending Gini rank reconstructs via ``grain_rank``
    (count-bucket local ranks + bounded count-grain offsets) and the
    top-10 share is a TakeOrdered of literally 10 rows.
    """
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = grain_rank(
        counts, "c", ["user_id"], descending=False, out="i"
    )
    top10 = (
        counts.orderBy(F.col("c").desc(), F.col("user_id").asc())
        .limit(10)
        .agg(F.sum("c").cast("bigint").alias("top10"))
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("i") * F.col("c")).cast("bigint").alias("swc"),
        F.max("c").cast("bigint").alias("cmax"),
    ).crossJoin(F.broadcast(top10))
    return tot.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_keys"),
        (F.col("cmax").cast("double") / F.col("n")).alias("top1_share"),
        (F.col("top10").cast("double") / F.col("n")).alias("top10_share"),
        (
            (2 * F.col("swc") - (F.col("k") + 1) * F.col("n")).cast("double")
            / (F.col("k") * F.col("n"))
        ).alias("gini"),
    )


# ------------------------------------- q224 per-dimension quantization stats


@register(
    "q224_embedding_dim_stats",
    oracle="""
    WITH e AS (
      SELECT CAST(i AS INTEGER) AS dim,
             embedding[CAST(i + 1 AS INTEGER)] AS x
      FROM embeddings, UNNEST(range(len(embedding))) AS r(i)
    ),
    s AS (
      SELECT dim, COUNT(*) AS n,
             SUM(CAST(x AS DOUBLE)) AS sx,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
             MIN(CAST(x AS DOUBLE)) AS xmin,
             MAX(CAST(x AS DOUBLE)) AS xmax
      FROM e GROUP BY dim
    )
    SELECT dim, CAST(n AS BIGINT) AS n_values,
           (FLOOR(CAST(sx / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean,
           (FLOOR(CAST((sxx - sx * sx / n) / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS variance,
           xmin AS dim_min, xmax AS dim_max,
           (FLOOR(CAST(127.0 / GREATEST(ABS(xmin), ABS(xmax)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS int8_scale
    FROM s
    """,
)
def q224_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics — the calibration pass an
    int8 quantizer (q76) runs first: mean/variance locate dead or
    dominant dimensions, min/max set the symmetric int8 scale factor
    (127 / max|x|) per dimension.

    Shape: posexplode fans each vector into (dim, value) and ONE
    aggregate pass reduces to 64 rows of sufficient statistics —
    mergeable, no second pass (no mean-then-deviation). min/max are
    float-exact (comparisons, not sums), so int8_scale is exact;
    mean/variance round at 1e-6 to absorb summation order (q73's
    precedent).
    """
    e = t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "x")
    )
    x = F.col("x").cast("double")
    s = e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.min(x).alias("xmin"),
        F.max(x).alias("xmax"),
    )
    return s.select(
        "dim",
        F.col("n").cast("bigint").alias("n_values"),
        dround(F.col("sx") / F.col("n"), 6).alias("mean"),
        dround(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n"), 6
        ).alias("variance"),
        F.col("xmin").alias("dim_min"),
        F.col("xmax").alias("dim_max"),
        dround(127.0 / F.greatest(F.abs("xmin"), F.abs("xmax")), 6).alias(
            "int8_scale"
        ),
    )


# ------------------------------------------------ q227 retrieval MRR

MRR_Q_LO, MRR_Q_HI = 100, 150  # evaluation query slice


@register(
    "q227_retrieval_mrr",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id >= {MRR_Q_LO} AND vec_id < {MRR_Q_HI}
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             c.vec_id AS cand_id, c.label AS clabel,
             CAST(UNNEST(q.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM q, embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT query_id, qlabel, cand_id, clabel,
             SUM(x * y) AS dot, SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc
      FROM pairs GROUP BY query_id, qlabel, cand_id, clabel
    ),
    scored AS (
      SELECT query_id, qlabel, clabel,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC
             ) AS rnk
      FROM dots
    ),
    first_hit AS (
      SELECT query_id, qlabel, MIN(rnk) AS hit_rank
      FROM scored WHERE clabel = qlabel
      GROUP BY query_id, qlabel
    )
    SELECT qlabel AS label,
           COUNT(*) AS n_queries,
           (FLOOR(CAST(SUM(1.0 / hit_rank) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mrr,
           CAST(MIN(hit_rank) AS BIGINT) AS best_rank,
           CAST(MAX(hit_rank) AS BIGINT) AS worst_rank
    FROM first_hit GROUP BY qlabel
    """,
)
def q227_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank — the retrieval-quality eval beside
    recall@k (q98) and the kNN confusion matrix (q216): for each
    held-out query vector, the cosine rank of the FIRST
    same-label neighbor; MRR = mean(1/rank) per label, with
    best/worst first-hit ranks as the spread.

    Plan shape is q70's: 50 broadcast queries against the streamed
    corpus, scoring window partitioned per query, conditional-MIN
    for the first hit (no per-rank loop). (FLOOR(CAST(… AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) absorbs the
    reciprocal-sum's last-ulp order sensitivity (q73's precedent).
    """
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") >= MRR_Q_LO) & (F.col("vec_id") < MRR_Q_HI)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    ).withColumn("qn", norm_double("qe"))
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("clabel"),
    ).withColumn("cn", norm_double("ce"))
    # norms PRECOMPUTED per side before the pair join (r3 sweep
    # find): inside the join, cosine recomputed BOTH array norms per
    # PAIR — 3x the array work. Factoring them into per-row columns
    # (evaluated once per corpus/query row under the join) leaves
    # only the dot product per pair. Bit-identical results: same
    # IEEE ops on the same inputs, just not repeated.
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "qlabel", "clabel", "cand_id", cosine.alias("cos"))
        .select(
            "query_id", "qlabel", "clabel", F.row_number().over(wq).alias("rnk")
        )
    )
    first_hit = (
        scored.filter(F.col("clabel") == F.col("qlabel"))
        .groupBy("query_id", "qlabel")
        .agg(F.min("rnk").alias("hit_rank"))
    )
    return first_hit.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        dround(F.sum(1.0 / F.col("hit_rank")) / F.count(F.lit(1)), 6).alias("mrr"),
        F.min("hit_rank").cast("bigint").alias("best_rank"),
        F.max("hit_rank").cast("bigint").alias("worst_rank"),
    )


# ------------------------------------------- q228 boilerplate blocks

BOILER_BLOCK_WORDS = 10  # block grain (docs carry no newlines)
BOILER_MIN_DOCS = 3  # block in >= this many docs = boilerplate


@register(
    "q228_boilerplate_blocks",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    blocks AS (
      SELECT doc_id, source,
             array_to_string(
               w[CAST(i * {BOILER_BLOCK_WORDS} + 1 AS INTEGER)
                 :CAST((i + 1) * {BOILER_BLOCK_WORDS} AS INTEGER)], ' ')
               AS block
      FROM docs,
           UNNEST(range((len(w) + {BOILER_BLOCK_WORDS - 1})
                        // {BOILER_BLOCK_WORDS})) AS r(i)
    ),
    freq AS (
      SELECT block, COUNT(DISTINCT doc_id) AS df FROM blocks GROUP BY block
    ),
    marked AS (
      SELECT b.doc_id, b.source,
             CASE WHEN f.df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END AS boiler
      FROM blocks b JOIN freq f ON f.block = b.block
    )
    SELECT source,
           COUNT(*) AS n_blocks,
           CAST(SUM(boiler) AS BIGINT) AS n_boiler_blocks,
           CAST(SUM(boiler) AS DOUBLE) / COUNT(*) AS boiler_rate,
           CAST(COUNT(DISTINCT CASE WHEN boiler = 1 THEN doc_id END)
                AS BIGINT) AS docs_affected
    FROM marked GROUP BY source
    """,
)
def q228_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (CCNet/RefinedWeb-style
    line dedup, at a 10-word block grain since the corpus has no
    newlines): a block appearing in >= {BOILER_MIN_DOCS} DISTINCT
    documents is boilerplate (headers, footers, templates); report
    each source's boilerplate block rate and affected-doc count —
    the removal pass would drop exactly the marked blocks.

    Scale shape: blocks hash-reduce by content for the
    document-frequency count (one shuffle keyed on the block text —
    a production variant keys on md5(block) for fixed-width keys, as
    q60 does); the marker joins the DF aggregate back onto the block
    stream. Distinct from q61 (whole-doc similarity) and q96
    (within-doc repetition): this finds TEMPLATE text shared across
    unrelated documents.
    """
    docs = fan_out(
        t(spark, sf_dir, "documents").select(
            "doc_id", "source", F.split("text", " ").alias("w")
        )
    )
    k = BOILER_BLOCK_WORDS
    blocks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(w) + {k - 1}) DIV {k} - 1),"
                f" i -> concat_ws(' ', slice(w, i * {k} + 1, {k})))"
            )
        ).alias("block"),
    )
    freq = blocks.groupBy("block").agg(
        F.count_distinct("doc_id").alias("df")
    )
    marked = blocks.join(freq, "block").select(
        "doc_id",
        "source",
        F.when(F.col("df") >= BOILER_MIN_DOCS, 1).otherwise(0).alias("boiler"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("boiler").cast("bigint").alias("n_boiler_blocks"),
        (F.sum("boiler").cast("double") / F.count(F.lit(1))).alias("boiler_rate"),
        F.count_distinct(
            F.when(F.col("boiler") == 1, F.col("doc_id"))
        ).cast("bigint").alias("docs_affected"),
    )


# ------------------------------------ q230 prefix-filtered similarity join

PREFIX_JACCARD_T = 0.6


@register(
    "q230_prefix_filter_join",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    toks AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[i+1:i+3], ' ') AS tok
      FROM docs, UNNEST(range(len(w) - 2)) AS r(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM toks a JOIN toks b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           (FLOOR(CAST(CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {PREFIX_JACCARD_T}
    """,
)
def q230_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join via PREFIX FILTERING — the
    database-literature alternative to probabilistic LSH (q62/q212):
    order each document's distinct 3-shingle set by ascending global
    frequency (rarest first, ties on the word); any pair with
    Jaccard >= t must share a token among each side's first
    n − ⌈t·n⌉ + 1 tokens, so only that PREFIX is indexed. Candidates
    share >= 1 prefix token; exact Jaccard verifies. Lossless by the
    prefix-filtering theorem — and the ORACLE PROVES IT: the SQL
    side computes the full O(shared-token-pairs) join with no
    prefix optimization, so a hash match certifies that the pruned
    plan found every qualifying pair.

    Scale: the inverted index holds ~(1−t) of all tokens (60%+
    smaller at t=0.6), and rare-first ordering makes surviving
    posting lists the SHORT ones — the quadratic candidate blowup of
    hot tokens (q61's DF-cap problem) is designed out rather than
    capped. One shuffle for the frequency ranking, one for the
    prefix-token join, verify on candidates only.

    Degenerate-corpus caveat (deliberate, unlike q62's cap): an
    EXACT similarity join's OUTPUT is itself quadratic when the
    corpus is mass-duplicated (g identical docs ⇒ C(g,2) true pairs
    at J=1 — the oracle emits them too, so no plan can avoid them).
    A cap here would break the losslessness theorem this operator
    exists to demonstrate; the production composition is exact dedup
    (q60) FIRST, then prefix-join the survivors.
    """
    toks = _shingle_df(spark, sf_dir, 3).select(
        "doc_id", F.col("shingle").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    wtok = W.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    ranked = (
        # No broadcast hint: freq is vocabulary-grain (grows ~N^0.8 by
        # Heaps' law), so a hint would force an OOM at 100x. Plain
        # shuffle join; AQE picks broadcast when it actually fits.
        toks.join(freq, "tok")
        .select(
            "doc_id",
            "tok",
            F.row_number().over(wtok).alias("pos"),
            F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("n"),
        )
    )
    # prefix length = n - ceil(t*n) + 1
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(PREFIX_JACCARD_T * F.col("n")) + 1
    ).select("doc_id", "tok", "n")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verify: intersection sizes for candidates only
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(
        F.col("doc_id").alias("doc_b2"), F.col("tok").alias("tok_b")
    )
    inter = (
        cand.join(ta, "doc_a")
        .join(
            tb,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("tok") == F.col("tok_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", dround(jac, 6).alias("jaccard"))
        .filter(jac >= PREFIX_JACCARD_T)
    )


# --------------------------------------------- q233 hybrid RRF fusion

RRF_K = 60  # standard RRF damping constant
RRF_QUERIES = 5
RRF_TOP = 5
RRF_SIGN_DIMS = 56  # sign-agreement ranker dimensionality


@register(
    "q233_rrf_hybrid_retrieval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {RRF_QUERIES}
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CAST(UNNEST(q.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y,
             UNNEST(range(len(q.embedding))) AS dim
      FROM q, embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    scores AS (
      SELECT query_id, cand_id,
             SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc,
             SUM(CASE WHEN dim < {RRF_SIGN_DIMS}
                      AND ((x >= 0) = (y >= 0)) THEN 1 ELSE 0 END)
               AS sign_agree
      FROM pairs GROUP BY query_id, cand_id
    ),
    ranked AS (
      SELECT query_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC)
               AS rank_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY sign_agree DESC, cand_id ASC) AS rank_sign
      FROM scores
    ),
    fused AS (
      SELECT query_id, cand_id, rank_cos, rank_sign,
             (FLOOR(CAST(1.0 / ({RRF_K} + rank_cos)
                   + 1.0 / ({RRF_K} + rank_sign) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS rrf_score
      FROM ranked
    )
    SELECT query_id, cand_id,
           CAST(rank_cos AS BIGINT) AS rank_cos,
           CAST(rank_sign AS BIGINT) AS rank_sign,
           rrf_score,
           CAST(rn AS BIGINT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, cand_id ASC) AS rn
      FROM fused
    ) WHERE rn <= {RRF_TOP}
    """,
)
def q233_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: two rankers —
    exact cosine (the dense signal) and sign-agreement count (a
    cheap binary-sketch signal standing in for the second retriever
    of a hybrid stack) — are fused per query as
    Σ 1/(60+rankᵢ), the standard RRF formula; top-5 fused results
    per query.

    Why RRF at scale: fusion needs only each system's RANKS — no
    score calibration across heterogeneous retrievers — so each
    ranker runs its own optimal plan (here both share one
    broadcast-query corpus pass computing the two scores together;
    both rank windows partition by query_id and reuse the same
    scored exchange). 1/(60+r) is an exact double division on both
    engines, so fusion order — and the oracle hash — is
    deterministic with cand_id tie-breaks.
    """
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    ).withColumn("qn", norm_double("qe"))
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    ).withColumn("cn", norm_double("ce"))
    # norms PRECOMPUTED per side before the pair join (r3 sweep
    # find): inside the join, cosine recomputed BOTH array norms per
    # PAIR — 3x the array work. Factoring them into per-row columns
    # (evaluated once per corpus/query row under the join) leaves
    # only the dot product per pair. Bit-identical results: same
    # IEEE ops on the same inputs, just not repeated.
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    sign_agree = F.aggregate(
        F.zip_with(
            F.slice("qe", 1, RRF_SIGN_DIMS),
            F.slice("ce", 1, RRF_SIGN_DIMS),
            lambda x, y: ((x >= 0) == (y >= 0)).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine.alias("cos"),
            sign_agree.alias("sign_agree"),
        )
    )
    wc = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    ws = W.partitionBy("query_id").orderBy(
        F.col("sign_agree").desc(), F.col("cand_id").asc()
    )
    ranked = scored.select(
        "query_id",
        "cand_id",
        F.row_number().over(wc).alias("rank_cos"),
        F.row_number().over(ws).alias("rank_sign"),
    )
    rrf = dround(
        1.0 / (RRF_K + F.col("rank_cos")) + 1.0 / (RRF_K + F.col("rank_sign")), 6
    )
    wf = W.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("cand_id").asc()
    )
    return (
        ranked.withColumn("rrf_score", rrf)
        .withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select(
            "query_id",
            "cand_id",
            F.col("rank_cos").cast("bigint").alias("rank_cos"),
            F.col("rank_sign").cast("bigint").alias("rank_sign"),
            "rrf_score",
            F.col("fused_rank").cast("bigint").alias("fused_rank"),
        )
    )


# --------------------------------------------------- q234 CUPED A/B

CUPED_SPLIT = "2024-01-16"  # pre-period | post-period boundary


@register(
    "q234_cuped_ab_readout",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7)
                       AS BIGINT) % 2 AS BIGINT) AS variant,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                           THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                           THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                  AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx
      FROM per_user
    ),
    theta AS (
      SELECT n, sx / n AS mean_x,
             (sxy - sx * sy / n) / NULLIF(sxx - sx * sx / n, 0) AS th
      FROM stats
    ),
    adjusted AS (
      SELECT u.variant, u.y,
             u.y - t.th * (u.x - t.mean_x) AS y_adj
      FROM per_user u CROSS JOIN theta t
    )
    SELECT variant,
           COUNT(*) AS n_users,
           (FLOOR(CAST(CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS mean_post,
           (FLOOR(CAST(SUM(y_adj) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_post_cuped,
           (FLOOR(CAST((SUM(y_adj * y_adj) - SUM(y_adj) * SUM(y_adj) / COUNT(*))
                 / NULLIF(SUM(y * y) - SUM(y) * SUM(y) / COUNT(*), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS var_ratio
    FROM adjusted GROUP BY variant
    """,
)
def q234_cuped_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout — the production upgrade
    of q151's plain z-test: each user's post-period purchase spend is
    adjusted by their PRE-period spend (the covariate),
    y' = y − θ·(x − x̄) with θ = cov(x,y)/var(x), which removes the
    between-user variance the experiment didn't cause. Output per
    hash-assigned variant: raw vs CUPED-adjusted means and the
    achieved variance ratio (the sensitivity gain — <1 means a
    smaller experiment detects the same effect).

    Exactness: x, y, and their products are 2-/4-decimal exact, so
    θ and x̄ are identical doubles on both engines; only the final
    means/variances of the adjusted (non-representable) y' round at
    1e-6 to absorb summation order. θ and the covariate stats come
    from ONE pass of mergeable sufficient statistics broadcast back
    as a 1-row aggregate — no per-user second scan at 100 TB.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    variant = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long")
        % 2
    ).cast("bigint")
    pre = F.when(F.col("ts") < F.lit(CUPED_SPLIT).cast("timestamp"), F.col("value")).otherwise(F.lit(0.0))
    post = F.when(F.col("ts") >= F.lit(CUPED_SPLIT).cast("timestamp"), F.col("value")).otherwise(F.lit(0.0))
    per_user = ev.groupBy("user_id").agg(
        dsum(pre).alias("x"), dsum(post).alias("y")
    ).select(variant.alias("variant"), "x", "y")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2("x")).cast("double").alias("sx"),
        F.sum(d2("y")).cast("double").alias("sy"),
        F.sum(d2("x") * d2("y")).cast("double").alias("sxy"),
        F.sum(d2("x") * d2("x")).cast("double").alias("sxx"),
    )
    theta = stats.select(
        (F.col("sx") / F.col("n")).alias("mean_x"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / F.when(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n") != 0,
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
            )
        ).alias("th"),
    )
    adjusted = per_user.crossJoin(F.broadcast(theta)).select(
        "variant",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("mean_x"))).alias("y_adj"),
    )
    n = F.count(F.lit(1))
    var_adj = F.sum(F.col("y_adj") * F.col("y_adj")) - F.sum("y_adj") * F.sum("y_adj") / n
    var_raw = F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / n
    return adjusted.groupBy("variant").agg(
        n.alias("n_users"),
        dround(F.sum(d2("y")).cast("double") / n, 6).alias("mean_post"),
        dround(F.sum("y_adj") / n, 6).alias("mean_post_cuped"),
        dround(var_adj / F.when(var_raw != 0, var_raw), 6).alias("var_ratio"),
    )


# ------------------------------------------- q235 temporal graph diff

GRAPH_SPLIT_DATE = "1998-01-01"


def _period_edges_sql(pred: str) -> str:
    """DuckDB CTE body: top-decile co-supply edges for one period."""
    return f"""(
      WITH ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        WHERE {pred}
      ),
      parts AS (
        SELECT p, list_sort(list(s)) AS ss FROM ps GROUP BY p
        HAVING COUNT(*) <= {MAX_SUPP_PER_PART}
      ),
      expanded AS (
        SELECT a.s AS sa, b.s AS sb
        FROM (SELECT p, UNNEST(ss) AS s FROM parts) a
        JOIN (SELECT p, UNNEST(ss) AS s FROM parts) b
          ON a.p = b.p AND a.s < b.s
      ),
      e AS (SELECT sa, sb, COUNT(*) AS c FROM expanded GROUP BY sa, sb),
      ranked AS (
        SELECT sa, sb,
               ROW_NUMBER() OVER (ORDER BY c DESC, sa, sb) AS rn,
               COUNT(*) OVER () AS ne
        FROM e
      )
      SELECT sa, sb FROM ranked WHERE rn <= ne // {TRI_EDGE_FRACTION}
    )"""


@register(
    "q235_cosupply_graph_diff",
    oracle=f"""
    WITH p1 AS {_period_edges_sql(f"l_shipdate < TIMESTAMP '{GRAPH_SPLIT_DATE}'")},
    p2 AS {_period_edges_sql(f"l_shipdate >= TIMESTAMP '{GRAPH_SPLIT_DATE}'")}
    SELECT COALESCE(p1.sa, p2.sa) AS s_a,
           COALESCE(p1.sb, p2.sb) AS s_b,
           CASE WHEN p1.sa IS NULL THEN 'new'
                WHEN p2.sa IS NULL THEN 'lost'
                ELSE 'kept' END AS status
    FROM p1 FULL OUTER JOIN p2
      ON p1.sa = p2.sa AND p1.sb = p2.sb
    """,
)
def q235_cosupply_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph evolution: the q214 co-supply edge set built
    independently for two ship-date periods, then diffed — each edge
    is 'new' (top-decile only after the split), 'lost' (only
    before), or 'kept'. The relationship-churn readout a supply
    dashboard tracks period over period.

    Shape: each period's edge pipeline is the q214 plan (capped
    posting lists → reduced edge aggregate → rank threshold on the
    REDUCED set), and the diff is a FULL OUTER join of two
    |edges|-sized lists — never fact-sized. The rank-based decile
    threshold re-normalizes per period, so the diff compares
    RELATIVE co-supply strength (an absolute threshold would tag
    every edge 'lost' in a shrinking period).

    r6 window audit: the edge grain itself is corpus-bound (~500k
    rows through ONE task at sf0.1, 100x vs sf0.01 — the worst
    single-partition window in the registry), so the decile
    selection rn <= K over (c DESC, sa, sb) is now reconstructed
    without any global window: (1) a bounded count-grain cumulative
    finds the strata kept whole and the single boundary stratum with
    its residual quota r; (2) inside the boundary stratum (which CAN
    be most of the graph — co-supply counts concentrate at c=1) the
    (sa, sb) rank is rebuilt from 256 order-contiguous sa-range
    buckets (q444/q484 pattern: in-bucket partitioned row_numbers +
    bounded bucket-grain offsets). Same edge set, bit for bit.
    """

    # ONE tagged lineitem scan builds BOTH periods' edge aggregates
    # (r10, r9-verdict task 3): every lineitem row belongs to exactly
    # one period, so distinct over (period, p, s) IS the union of the
    # per-period (p, s) distincts, the posting lists group per
    # (period, p), and the edge counts group per (period, sa, sb) —
    # the r9 shape ran the whole scan -> distinct -> posting ->
    # explode -> count pipeline TWICE, once per period predicate.
    split_ts = F.lit(GRAPH_SPLIT_DATE).cast("timestamp")
    ps_all = (
        t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_shipdate") < split_ts).alias("pd"),
            F.col("l_partkey").alias("p"),
            F.col("l_suppkey").alias("s"),
        )
        .distinct()
    )
    parts_all = (
        ps_all.groupBy("pd", "p")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
        .filter(F.size("ss") <= MAX_SUPP_PER_PART)
    )
    e_all = (
        parts_all.select(
            "pd",
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) ->"
                    " transform(slice(ss, i + 2, size(ss) - i - 1),"
                    " y -> struct(x AS sa, y AS sb))))"
                )
            ).alias("pr"),
        )
        .select("pd", "pr.sa", "pr.sb")
        .groupBy("pd", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("c"))
        # the restructure reads the edge aggregate from FOUR branches
        # PER PERIOD (quota scalar, strata, full-keep join, boundary);
        # checkpointing materializes the single lineitem scan + pair
        # explode once instead of eight times. Non-eager (r6 advice):
        # eager ran Spark jobs at DataFrame CONSTRUCTION (registry
        # enumeration, plan audits); lazy materializes on the first
        # real action. localCheckpoint is not fault-tolerant — an
        # executor loss after materialization fails the query instead
        # of recomputing lineage, the accepted tradeoff for
        # multi-consumer frames (same note as q398/q406).
        .localCheckpoint(eager=False)
    )

    def period_edges(pd_val: bool):
        e = e_all.filter(F.col("pd") == F.lit(pd_val)).select("sa", "sb", "c")
        k = e.agg(
            F.floor(F.count(F.lit(1)) / TRI_EDGE_FRACTION)
            .cast("bigint")
            .alias("k")
        )
        woff = W.orderBy(F.col("c").desc()).rowsBetween(
            W.unboundedPreceding, -1
        )
        strata = (
            e.groupBy("c")
            # min/max sa ride the SAME stratum aggregate (r10): the
            # boundary stratum's sa-range span used to be a separate
            # 1-row aggregate over the joined boundary edges — one
            # more full pass over the checkpointed edge frame
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.min("sa").cast("bigint").alias("mn"),
                F.max("sa").cast("bigint").alias("mx"),
            )
            .select(
                "c",
                "cnt",
                "mn",
                "mx",
                F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("cb"),
            )
            .crossJoin(F.broadcast(k))
        )
        full = e.join(
            F.broadcast(
                strata.filter(
                    F.col("cb") + F.col("cnt") <= F.col("k")
                ).select("c")
            ),
            "c",
        ).select("sa", "sb")
        boundary = strata.filter(
            (F.col("cb") < F.col("k"))
            & (F.col("k") < F.col("cb") + F.col("cnt"))
        ).select("c", (F.col("k") - F.col("cb")).alias("r"), "mn", "mx")
        be = e.join(F.broadcast(boundary), "c")
        bb = be.withColumn(
            "bkt",
            F.expr("CAST((sa - mn) * 256 DIV (mx - mn + 1) AS BIGINT)"),
        )
        wboff = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
        boffs = (
            bb.groupBy("bkt")
            .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
            .select(
                "bkt",
                F.coalesce(F.sum("sz").over(wboff), F.lit(0)).alias("off"),
            )
        )
        picked = (
            bb.join(F.broadcast(boffs), "bkt")
            .withColumn(
                "lr",
                F.row_number().over(
                    W.partitionBy("bkt").orderBy("sa", "sb")
                ),
            )
            .filter(F.col("off") + F.col("lr") <= F.col("r"))
            .select("sa", "sb")
        )
        return full.unionByName(picked)

    p1 = period_edges(True).withColumnRenamed(
        "sa", "sa1"
    ).withColumnRenamed("sb", "sb1")
    p2 = period_edges(False).withColumnRenamed(
        "sa", "sa2"
    ).withColumnRenamed("sb", "sb2")
    diff = p1.join(
        p2, (F.col("sa1") == F.col("sa2")) & (F.col("sb1") == F.col("sb2")), "full"
    )
    status = (
        F.when(F.col("sa1").isNull(), "new")
        .when(F.col("sa2").isNull(), "lost")
        .otherwise("kept")
    )
    return diff.select(
        F.coalesce(F.col("sa1"), F.col("sa2")).alias("s_a"),
        F.coalesce(F.col("sb1"), F.col("sb2")).alias("s_b"),
        status.alias("status"),
    )


# -------------------------------------------- q237 hard-negative mining

MINE_ANCHORS = 100


@register(
    "q237_hard_negative_mining",
    oracle=f"""
    WITH a AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id < {MINE_ANCHORS}
    ),
    pairs AS (
      SELECT a.vec_id AS anchor_id, a.label AS alabel,
             c.vec_id AS cand_id, c.label AS clabel,
             CAST(UNNEST(a.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM a, embeddings c
      WHERE c.vec_id <> a.vec_id
    ),
    scored AS (
      SELECT anchor_id, alabel, cand_id, clabel,
             (FLOOR(CAST(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
               AS cos
      FROM pairs GROUP BY anchor_id, alabel, cand_id, clabel
    ),
    pos AS (
      SELECT anchor_id, alabel, cand_id AS positive_id, cos AS pos_cos
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                 ORDER BY cos DESC, cand_id ASC) AS rn
        FROM scored WHERE clabel = alabel
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, cand_id AS negative_id, cos AS neg_cos
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                 ORDER BY cos DESC, cand_id ASC) AS rn
        FROM scored WHERE clabel <> alabel
      ) WHERE rn = 1
    )
    SELECT p.anchor_id, p.alabel AS label,
           p.positive_id, p.pos_cos,
           n.negative_id, n.neg_cos,
           (FLOOR(CAST(p.pos_cos - n.neg_cos AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS margin
    FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
    """,
)
def q237_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: for each anchor vector, the
    hardest POSITIVE (most-similar same-label vector) and the hardest
    NEGATIVE (most-similar different-label vector — the one a
    contrastive loss learns most from), with the margin between
    them. Negative-margin anchors sit inside another label's
    neighborhood — the triplets a fine-tuning run should sample
    first (q232 flags them as label-noise suspects; this op EMITS
    the training pairs).

    Same broadcast-anchor/streamed-corpus shape as q70; both argmax
    windows partition per anchor over the single scored exchange,
    with (cosine DESC, cand_id ASC) total orders.
    """
    emb = t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < MINE_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("alabel"),
    ).withColumn("qn", norm_double("qe"))
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("clabel"),
    ).withColumn("cn", norm_double("ce"))
    # norms PRECOMPUTED per side before the pair join (r3 sweep
    # find): inside the join, cosine recomputed BOTH array norms per
    # PAIR — 3x the array work. Factoring them into per-row columns
    # (evaluated once per corpus/query row under the join) leaves
    # only the dot product per pair. Bit-identical results: same
    # IEEE ops on the same inputs, just not repeated.
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    scored = (
        F.broadcast(a)
        .join(c, F.col("cand_id") != F.col("anchor_id"))
        .select("anchor_id", "alabel", "cand_id", "clabel", cosine.alias("cos"))
    )
    w = W.partitionBy("anchor_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    pos = (
        scored.filter(F.col("clabel") == F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("alabel").alias("label"),
            F.col("cand_id").alias("positive_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("clabel") != F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "label",
        "positive_id",
        "pos_cos",
        "negative_id",
        "neg_cos",
        dround(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    )


# ----------------------------------------- q238 ensemble dedup matrix


@register(
    "q238_dedup_ensemble_matrix",
    oracle=None,  # placeholder replaced below (needs dedup import)
)
def q238_dedup_ensemble_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble dedup decision matrix: the UNION of MinHash+LSH
    candidates (q62 — set-overlap signal) and SimHash band candidates
    (q212 — weighted-profile signal), each pair annotated with which
    detector(s) fired and its exact fingerprint Hamming distance —
    the reviewer table a production dedup pipeline emits before
    deletion, making detector disagreement (a pair only ONE signal
    caught) auditable instead of silent.

    Shape: both candidate generators run their normal reduced-pair
    plans; the matrix is a full-outer join of two small pair lists,
    then one fingerprint join for the common Hamming column. At
    100 TB the ensemble costs the sum of its detectors plus
    |pairs|-sized joins — detector reuse, not a new corpus pass.
    """
    from ..functions.columns import hamming_distance
    from .dedup import _minhash_pairs

    mh = _minhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("mh")
    )
    sh = q212_simhash_band_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("sa"), F.col("doc_b").alias("sb"), F.lit(1).alias("sh")
    )
    u = mh.join(
        sh, (F.col("doc_a") == F.col("sa")) & (F.col("doc_b") == F.col("sb")), "full"
    ).select(
        F.coalesce(F.col("doc_a"), F.col("sa")).alias("doc_a"),
        F.coalesce(F.col("doc_b"), F.col("sb")).alias("doc_b"),
        F.coalesce(F.col("mh"), F.lit(0)).cast("bigint").alias("by_minhash"),
        F.coalesce(F.col("sh"), F.lit(0)).cast("bigint").alias("by_simhash"),
    )
    fp = _simhash_fp(spark, sf_dir)
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"))
    return (
        u.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "by_minhash",
            "by_simhash",
            hamming_distance("sim_a", "sim_b").cast("bigint").alias("hamming"),
        )
    )


def _install_q238_oracle() -> None:
    """q238's oracle needs dedup's minhash CTE chain; registry entries
    are frozen dataclasses, so rebuild the spec with the oracle set."""
    from dataclasses import replace

    from ..registry import REGISTRY
    from .dedup import _minhash_oracle

    oracle = f"""
    WITH mh AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()})),
    shp AS (SELECT doc_a, doc_b FROM ({_simhash_oracle_pairs()})),
    u AS (
      SELECT COALESCE(mh.doc_a, shp.doc_a) AS doc_a,
             COALESCE(mh.doc_b, shp.doc_b) AS doc_b,
             CAST(CASE WHEN mh.doc_a IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS by_minhash,
             CAST(CASE WHEN shp.doc_a IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS by_simhash
      FROM mh FULL OUTER JOIN shp
        ON mh.doc_a = shp.doc_a AND mh.doc_b = shp.doc_b
    ),
    fp AS ({_simhash_fp_sql()})
    SELECT u.doc_a, u.doc_b, u.by_minhash, u.by_simhash,
           CAST(bit_count(xor(fa.sim, fb.sim)) AS BIGINT) AS hamming
    FROM u
    JOIN fp fa ON fa.doc_id = u.doc_a
    JOIN fp fb ON fb.doc_id = u.doc_b
    """
    REGISTRY["q238_dedup_ensemble_matrix"] = replace(
        REGISTRY["q238_dedup_ensemble_matrix"], oracle=oracle
    )


_install_q238_oracle()


# --------------------------------------- q239 LSH banding sweep audit


@register(
    "q239_lsh_banding_sweep",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS shingle
      FROM docs, UNNEST(range(len(w) - 2)) AS t(i)
    ),
    hashed AS (SELECT doc_id, md5(shingle) AS h1 FROM sh),
    sig AS (
      SELECT doc_id,
        MIN(CAST('0x' || substr(h1, 1, 4) AS BIGINT)) AS h0,
        MIN(CAST('0x' || substr(h1, 5, 4) AS BIGINT)) AS h1_,
        MIN(CAST('0x' || substr(h1, 9, 4) AS BIGINT)) AS h2,
        MIN(CAST('0x' || substr(h1, 13, 4) AS BIGINT)) AS h3,
        MIN(CAST('0x' || substr(h1, 17, 4) AS BIGINT)) AS h4,
        MIN(CAST('0x' || substr(h1, 21, 4) AS BIGINT)) AS h5,
        MIN(CAST('0x' || substr(h1, 25, 4) AS BIGINT)) AS h6,
        MIN(CAST('0x' || substr(h1, 29, 4) AS BIGINT)) AS h7
      FROM hashed GROUP BY doc_id
    ),
    b8 AS (  -- 8 bands x 1 row (most recall); string keys sidestep
             -- 64-bit packing overflow on wide bands
      SELECT 0 AS band, CAST(h0 AS VARCHAR) AS bkey, doc_id FROM sig
      UNION ALL SELECT 1, CAST(h1_ AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 2, CAST(h2 AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 3, CAST(h3 AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 4, CAST(h4 AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 5, CAST(h5 AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 6, CAST(h6 AS VARCHAR), doc_id FROM sig
      UNION ALL SELECT 7, CAST(h7 AS VARCHAR), doc_id FROM sig
    ),
    b4 AS (  -- 4 bands x 2 rows (the engine default)
      SELECT 0 AS band, h0 || '-' || h1_ AS bkey, doc_id FROM sig
      UNION ALL SELECT 1, h2 || '-' || h3, doc_id FROM sig
      UNION ALL SELECT 2, h4 || '-' || h5, doc_id FROM sig
      UNION ALL SELECT 3, h6 || '-' || h7, doc_id FROM sig
    ),
    b2 AS (  -- 2 bands x 4 rows (most precision)
      SELECT 0 AS band,
             h0 || '-' || h1_ || '-' || h2 || '-' || h3 AS bkey,
             doc_id FROM sig
      UNION ALL
      SELECT 1, h4 || '-' || h5 || '-' || h6 || '-' || h7, doc_id
      FROM sig
    ),
    c8 AS (
      SELECT COUNT(*) AS n FROM (
        SELECT DISTINCT a.doc_id, b.doc_id FROM b8 a
        JOIN b8 b ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id)
    ),
    c4 AS (
      SELECT COUNT(*) AS n FROM (
        SELECT DISTINCT a.doc_id, b.doc_id FROM b4 a
        JOIN b4 b ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id)
    ),
    c2 AS (
      SELECT COUNT(*) AS n FROM (
        SELECT DISTINCT a.doc_id, b.doc_id FROM b2 a
        JOIN b2 b ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id)
    )
    SELECT * FROM (
      SELECT '8x1' AS config, CAST((SELECT n FROM c8) AS BIGINT)
               AS n_candidates
      UNION ALL SELECT '4x2', CAST((SELECT n FROM c4) AS BIGINT)
      UNION ALL SELECT '2x4', CAST((SELECT n FROM c2) AS BIGINT)
    )
    """,
)
def q239_lsh_banding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding parameter sweep — the recall/precision tuning
    table for MinHash dedup: with 8 minhashes, candidate-pair counts
    under 8 bands x 1 row (threshold-curve ~J^1 per band: max
    recall, most false candidates), 4x2 (the engine's q62 default),
    and 2x4 (~J^4: high precision, recall only for strong dups).
    Monotone by construction: n(8x1) >= n(4x2) >= n(2x4) — the
    sweep quantifies what each step buys BEFORE committing a corpus
    pass to the wrong operating point.

    Shape: ONE signature pipeline (the q62 sketch — computed once,
    it is the same 8-int row re-banded three ways), three band-key
    shuffles over the small signature table, three bounded distinct
    counts. Candidate generation is count-only here — no pair
    materialization.
    """
    from .dedup import N_HASHES, _signatures

    sig = _signatures(spark, sf_dir).localCheckpoint(eager=True)

    def n_pairs(groups: list[list[int]]):
        bands = None
        for band, hs in enumerate(groups):
            # string keys: positional 16-bit packing overflows a long
            # beyond 3 chunks, and this audit never does key math
            key = F.concat_ws("-", *[F.col(f"h{h}").cast("string") for h in hs])
            b = sig.select(F.lit(band).alias("band"), key.alias("bkey"), "doc_id")
            bands = b if bands is None else bands.unionAll(b)
        a = bands.select("band", "bkey", F.col("doc_id").alias("da"))
        bb = bands.select(
            F.col("band").alias("band2"), F.col("bkey").alias("bkey2"),
            F.col("doc_id").alias("db"),
        )
        return (
            a.join(
                bb,
                (F.col("band") == F.col("band2"))
                & (F.col("bkey") == F.col("bkey2"))
                & (F.col("da") < F.col("db")),
            )
            .select("da", "db")
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        )

    h = list(range(N_HASHES))
    c8 = n_pairs([[i] for i in h]).select(F.lit("8x1").alias("config"), "n_candidates")
    c4 = n_pairs([h[i : i + 2] for i in range(0, 8, 2)]).select(
        F.lit("4x2").alias("config"), "n_candidates"
    )
    c2 = n_pairs([h[:4], h[4:]]).select(F.lit("2x4").alias("config"), "n_candidates")
    return c8.unionAll(c4).unionAll(c2)


# ------------------------------------- q240 policy propagation

RESTRICTED_SOURCE = "src0"


@register(
    "q240_policy_propagation",
    oracle=None,  # installed below (needs dedup's recursive cluster CTEs)
)
def q240_policy_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance-tag propagation through duplicate clusters: if ANY
    member of a near-dup cluster comes from a restricted source, the
    WHOLE cluster inherits the restriction (a near-copy of
    restricted text is restricted, whatever its own source claims) —
    the takedown/licensing semantics a corpus pipeline must apply
    transitively, not row-wise. Output per source: docs, directly
    restricted docs, and transitively caught docs (the ones a naive
    source filter would have missed).

    Shape: q64's connected-components labels (iterative min-label
    propagation over the reduced pair graph) joined to a per-cluster
    ANY-restricted flag (one aggregate over the label table), marker
    join back, per-source rollup. No new corpus pass beyond the
    clustering itself.
    """
    from .dedup import q64_dedup_clusters

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    labels = q64_dedup_clusters(spark, sf_dir)
    member = docs.join(labels, "doc_id")
    cluster_flag = (
        member.groupBy("cluster_id")
        .agg(
            F.max(
                F.when(F.col("source") == RESTRICTED_SOURCE, 1).otherwise(0)
            ).alias("restricted")
        )
    )
    marked = member.join(cluster_flag, "cluster_id").select(
        "source",
        F.when(F.col("source") == RESTRICTED_SOURCE, 1).otherwise(0).alias("direct"),
        F.col("restricted").alias("flagged"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("direct").cast("bigint").alias("n_direct"),
        F.sum("flagged").cast("bigint").alias("n_flagged"),
        (F.sum("flagged") - F.sum("direct")).cast("bigint").alias("n_transitive"),
    )


def _install_q240_oracle() -> None:
    from dataclasses import replace

    from ..registry import REGISTRY
    from .dedup import _clusters_ctes

    oracle = f"""
    WITH RECURSIVE {_clusters_ctes()},
    member AS (
      SELECT d.doc_id, d.source, c.cluster_id
      FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
    ),
    cflag AS (
      SELECT cluster_id,
             MAX(CASE WHEN source = '{RESTRICTED_SOURCE}' THEN 1 ELSE 0 END)
               AS restricted
      FROM member GROUP BY cluster_id
    )
    SELECT m.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN m.source = '{RESTRICTED_SOURCE}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_direct,
           CAST(SUM(f.restricted) AS BIGINT) AS n_flagged,
           CAST(SUM(f.restricted)
                - SUM(CASE WHEN m.source = '{RESTRICTED_SOURCE}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_transitive
    FROM member m JOIN cflag f ON f.cluster_id = m.cluster_id
    GROUP BY m.source
    """
    REGISTRY["q240_policy_propagation"] = replace(
        REGISTRY["q240_policy_propagation"], oracle=oracle
    )


_install_q240_oracle()


# ------------------------------------------ q241 span-corruption plan

MASK_PCT = 15  # target masked-token percentage


@register(
    "q241_span_corruption_plan",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i,
             CASE WHEN CAST(('0x' || substr(
                      md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
                      1, 7)) AS BIGINT) % 100 < {MASK_PCT}
                  THEN 1 ELSE 0 END AS masked
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    runs AS (
      SELECT doc_id, masked,
             CASE WHEN masked = 1 AND COALESCE(LAG(masked) OVER (
                    PARTITION BY doc_id ORDER BY i), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
      FROM toks
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(masked) AS BIGINT) AS n_masked,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           CAST(SUM(masked) AS DOUBLE) / COUNT(*) AS mask_rate
    FROM runs GROUP BY doc_id
    """,
)
def q241_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective corruption planning (BERT/T5-style): each
    token is masked iff md5(doc_id, position) % 100 < 15 — a pure
    hash, so the corruption pattern is REPRODUCIBLE across engines,
    runs, and partitionings (the q88 split rule applied
    token-wise; a stateful RNG would make every retry a different
    dataset). Contiguous masked runs merge into spans (T5 replaces
    each span with one sentinel); output per doc: token count,
    masked count, span count, realized mask rate.

    Shape: posexplode → hash → one LAG window partitioned by doc_id
    for span starts → per-doc aggregate. The mask decision is
    codegen arithmetic; nothing in the plan is corpus-order-
    dependent.
    """
    toks = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                ).cast("binary")
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    masked = (h % 100 < MASK_PCT).cast("int")
    wd = W.partitionBy("doc_id").orderBy("i")
    runs = toks.select("doc_id", "i", masked.alias("masked")).select(
        "doc_id",
        "masked",
        F.when(
            (F.col("masked") == 1)
            & (F.coalesce(F.lag("masked").over(wd), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("span_start"),
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("masked").cast("bigint").alias("n_masked"),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        (F.sum("masked").cast("double") / F.count(F.lit(1))).alias("mask_rate"),
    )


# ------------------------------------------ q242 epoch shuffle audit

SHUFFLE_SHARDS = 64


def _epoch_pos_sql(e: int) -> str:
    """DuckDB subquery: (doc_id, source, pos) — the sharded epoch-
    permutation position for epoch ``e``."""
    return f"""(
      WITH keyed AS (
        SELECT doc_id, source,
               md5('epoch{e}:' || CAST(doc_id AS VARCHAR)) AS h,
               CAST(('0x' || substr(md5('epoch{e}:' || CAST(doc_id AS VARCHAR)),
                     1, 7)) AS BIGINT) % {SHUFFLE_SHARDS} AS shard
        FROM documents
      ),
      ranked AS (
        SELECT doc_id, source, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
                 AS r_in_shard
        FROM keyed
      ),
      offsets AS (
        SELECT shard,
               COALESCE(SUM(COUNT(*)) OVER (ORDER BY shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS off
        FROM keyed GROUP BY shard
      )
      SELECT r.doc_id, r.source, o.off + r.r_in_shard AS pos
      FROM ranked r JOIN offsets o ON o.shard = r.shard
    )"""


@register(
    "q242_epoch_shuffle_audit",
    oracle=f"""
    WITH p1 AS {_epoch_pos_sql(1)},
    p2 AS {_epoch_pos_sql(2)}
    SELECT p1.source,
           COUNT(*) AS n_docs,
           CAST(SUM(ABS(p1.pos - p2.pos)) AS BIGINT) AS total_displacement,
           CAST(SUM(ABS(p1.pos - p2.pos)) AS DOUBLE) / COUNT(*)
             AS avg_displacement,
           CAST(MIN(p1.pos) AS BIGINT) AS earliest_epoch1_position
    FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
    GROUP BY p1.source
    """,
)
def q242_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-shuffling audit, in the SHARDED form that
    actually runs at 100 TB: epoch e's training order is (shard =
    hash_e % 64, rank of hash_e within shard), with each document's
    global position reconstructed as shard offset + in-shard rank.
    No global-order window ever touches corpus-sized data — in-shard
    ranks partition by shard, and the offset cumsum runs over the
    64-row shard-size aggregate (the engine's bounded-global-window
    rule). The permutation is a pure seeded hash, so a resumed job
    re-derives the identical order.

    The audit compares two epochs: per-source total/average position
    displacement (~n/3 for independent permutations — near-zero
    means epochs repeat an order, starving sample diversity) and
    each source's earliest epoch-1 position (interleaving check: no
    source ghettoized to the tail).
    """

    def epoch_pos(e: int) -> DataFrame:
        h = F.md5(
            F.concat(
                F.lit(f"epoch{e}:"), F.col("doc_id").cast("string")
            ).cast("binary")
        )
        shard = (
            F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % SHUFFLE_SHARDS
        )
        keyed = t(spark, sf_dir, "documents").select(
            "doc_id", "source", h.alias("h"), shard.alias("shard")
        )
        wr = W.partitionBy("shard").orderBy("h", "doc_id")
        ranked = keyed.select(
            "doc_id", "source", "shard", F.row_number().over(wr).alias("r")
        )
        wo = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
        offsets = (
            keyed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("sz"))
            .select(
                "shard", F.coalesce(F.sum("sz").over(wo), F.lit(0)).alias("off")
            )
        )
        return ranked.join(F.broadcast(offsets), "shard").select(
            "doc_id", "source", (F.col("off") + F.col("r")).alias(f"pos{e}")
        )

    p1 = epoch_pos(1)
    p2 = epoch_pos(2).select("doc_id", "pos2")
    joined = p1.join(p2, "doc_id")
    disp = F.abs(F.col("pos1") - F.col("pos2"))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(disp).cast("bigint").alias("total_displacement"),
        (F.sum(disp).cast("double") / F.count(F.lit(1))).alias("avg_displacement"),
        F.min("pos1").cast("bigint").alias("earliest_epoch1_position"),
    )


# ------------------------------------------ q243 token budget planner

BUDGET_TOKENS = 500_000  # target training tokens (sf-independent plan)
MIX_TEMP_NUM, MIX_TEMP_DEN = 7, 10  # temperature 0.7 as a rational


@register(
    "q243_token_budget_plan",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, n_tokens,
             (FLOOR(CAST(POWER(n_tokens, {MIX_TEMP_NUM} / {MIX_TEMP_DEN}.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
               AS w
      FROM src
    ),
    tot AS (SELECT SUM(w) AS sw FROM weighted)
    SELECT w.source, w.n_tokens,
           (FLOOR(CAST(w.w / t.sw AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mix_weight,
           CAST(FLOOR({BUDGET_TOKENS} * w.w / t.sw) AS BIGINT)
             AS budget_tokens,
           (FLOOR(CAST({BUDGET_TOKENS} * w.w / t.sw / w.n_tokens AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS epochs
    FROM weighted w CROSS JOIN tot t
    """,
)
def q243_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token budget planner: temperature-weighted
    source sampling (w ∝ tokens^0.7 — upweights small sources, the
    standard multi-source mixing rule) allocated against a fixed
    global token budget, with the implied EPOCH COUNT per source —
    the number every data-mixing decision actually turns on (epochs
    >> 1 on a small source means memorization risk; << 1 on a big
    one means wasted corpus).

    Shape: everything reduces to the |sources|-row aggregate before
    any arithmetic; POWER(x, 0.7) rounds at 1e-6 before the share
    division (q181's convention — cross-engine pow is the one
    non-exact step).
    """
    src = (
        fan_out(t(spark, sf_dir, "documents"))
        .select("source", F.size(F.split("text", " ")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )
    w = dround(F.pow(F.col("n_tokens"), F.lit(MIX_TEMP_NUM / MIX_TEMP_DEN)), 6)
    weighted = src.select("source", "n_tokens", w.alias("w"))
    tot = weighted.agg(F.sum("w").alias("sw"))
    return weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        dround(F.col("w") / F.col("sw"), 6).alias("mix_weight"),
        F.floor(BUDGET_TOKENS * F.col("w") / F.col("sw"))
        .cast("bigint")
        .alias("budget_tokens"),
        dround(
            BUDGET_TOKENS * F.col("w") / F.col("sw") / F.col("n_tokens"), 4
        ).alias("epochs"),
    )


# -------------------------------------- q244 watermark recommendation


@register(
    "q244_watermark_recommendation",
    oracle="""
    WITH ordered AS (
      SELECT event_type, ts,
             MAX(ts) OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
      FROM events
    ),
    lateness AS (
      SELECT event_type,
             CAST(date_diff('microsecond', ts, hwm) AS BIGINT) / 1000000.0
               AS late_s
      FROM ordered
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           (FLOOR(CAST(MAX(late_s) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS max_lateness_s,
           (FLOOR(CAST(quantile_cont(late_s, 0.99) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS p99_lateness_s
    FROM lateness GROUP BY event_type
    """,
)
def q244_watermark_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay sizing from observed disorder: replay each
    event_type's stream in arrival order (event_id — the ingest
    sequence), track the running event-time high-water mark, and
    measure every event's lateness behind it. The p99 lateness IS
    the watermark delay that would keep 99% of events inside the
    window state (q178 audits per-user disorder; this emits the
    per-stream OPERATING PARAMETER a `withWatermark` call needs).

    Shape: one running-MAX window per event_type over arrival order,
    then a bounded per-type aggregate; the exact-percentile runs on
    the per-type grain. Lateness is exact integer microseconds
    scaled to seconds (2-decimal-free: /1e6 is exact for µs counts
    < 2^53); only the interpolated p99 rounds.
    """
    ev = t(spark, sf_dir, "events")
    wh = W.partitionBy("event_type").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    lateness = ev.select(
        "event_type",
        (
            (
                F.unix_micros(F.max("ts").over(wh)) - F.unix_micros(F.col("ts"))
            )
            / 1_000_000.0
        ).alias("late_s"),
    )
    return lateness.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        dround(F.max("late_s"), 4).alias("max_lateness_s"),
        dround(F.percentile("late_s", F.lit(0.99)), 4).alias("p99_lateness_s"),
    )


# -------------------------------------- q245 temporal consistency audit


@register(
    "q245_temporal_consistency_audit",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ship_before_order,
           CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS anomaly_rate,
           CAST(MIN(date_diff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS min_lag_days,
           CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS max_lag_days
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q245_temporal_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table temporal-consistency audit: a lineitem shipping
    BEFORE its order exists is a causality violation — the
    referential-TIME check beside q109's referential-KEY check
    (dangling foreign keys). Per priority class: violation counts,
    rate, and the full ship-lag envelope. On this driver-generated
    fixture ~half of all lines violate (ship dates are drawn
    independently of order dates), which is exactly the kind of
    generator artifact this audit exists to surface before anyone
    trains on 'fulfillment latency' features (q159/q192 compute them
    assuming sane lags).

    Shape: one fact-fact equi-join (the orders side pruned to two
    columns) and a 5-row aggregate; lag arithmetic is exact integer
    days.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    viol = F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(viol).cast("bigint").alias("n_ship_before_order"),
        (F.sum(viol).cast("double") / F.count(F.lit(1))).alias("anomaly_rate"),
        F.min(lag).cast("bigint").alias("min_lag_days"),
        F.max(lag).cast("bigint").alias("max_lag_days"),
    )


# ---------------------------------------------- q247 k-anonymity audit

KANON_K = 5
KANON_LEN_BUCKET = 50


@register(
    "q247_k_anonymity_audit",
    oracle=f"""
    WITH cells AS (
      SELECT source, lang,
             CAST(n_chars // {KANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             COUNT(*) AS n
      FROM documents GROUP BY source, lang, len_bucket
    )
    SELECT source,
           COUNT(*) AS n_cells,
           CAST(SUM(CASE WHEN n < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_cells,
           CAST(SUM(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS n_risky_docs,
           CAST(SUM(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n) AS risky_doc_rate
    FROM cells GROUP BY source
    """,
)
def q247_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers: every (source, lang,
    length-bucket) equivalence class with fewer than k={KANON_K}
    members is a re-identification risk — a released record in a
    tiny class is effectively unique. Per source: class counts,
    risky classes, and the fraction of documents that would need
    suppression or generalization (coarser buckets) before release.
    The privacy gate a dataset-publication pipeline runs beside the
    contamination (q68) and PII-pattern (q146) checks.

    Shape: one aggregate to the quasi-identifier grain (bounded:
    |sources|×|langs|×|buckets|), one rollup to sources; integer
    arithmetic throughout with one exact ratio.
    """
    docs = t(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "source",
        "lang",
        F.floor(F.col("n_chars") / KANON_LEN_BUCKET).cast("bigint").alias(
            "len_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    risky = F.when(F.col("n") < KANON_K, F.col("n")).otherwise(0)
    risky_c = F.when(F.col("n") < KANON_K, 1).otherwise(0)
    return cells.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(risky_c).cast("bigint").alias("n_risky_cells"),
        F.sum(risky).cast("bigint").alias("n_risky_docs"),
        (F.sum(risky).cast("double") / F.sum("n")).alias("risky_doc_rate"),
    )


# ----------------------------------- q248 incremental session merge

SESSION_SPLIT = "2024-01-16"
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "q248_incremental_session_merge",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      SELECT user_id, value,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id
    """,
)
def q248_incremental_session_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sessionization with boundary-session merge — the
    batch-boundary problem every incremental pipeline hits: events
    arrive in two batches (split at {SESSION_SPLIT}), each batch is
    sessionized INDEPENDENTLY (the q56 lag/cumsum plan on a fraction
    of the data), and sessions straddling the boundary are healed by
    ONE merge rule: a user's last batch-A session merges with their
    first batch-B session iff the cross-boundary gap is within the
    30-minute session gap.

    THE ORACLE SESSIONIZES THE WHOLE STREAM AT ONCE — so the hash
    match is a PROOF that split-then-merge computes exactly what a
    full recompute would, which is what makes incremental
    sessionization trustworthy at 100 TB (re-sessionizing the full
    history per batch is the thing you cannot afford; only the
    per-user boundary sessions — 2 rows per user — need inspecting).
    """
    split = F.lit(SESSION_SPLIT).cast("timestamp")
    ev = t(spark, sf_dir, "events")

    def sessionize(evf: DataFrame) -> DataFrame:
        w = W.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        flagged = evf.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                    > SESSION_GAP_US
                ),
                1,
            )
            .otherwise(0)
            .alias("is_new"),
        )
        return (
            flagged.withColumn("sid", F.sum("is_new").over(wsum))
            .groupBy("user_id", "sid")
            .agg(
                F.min("ts").alias("s_start"),
                F.max("ts").alias("s_end"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
            )
        )

    sa = sessionize(ev.filter(F.col("ts") < split))
    sb = sessionize(ev.filter(F.col("ts") >= split))

    last_a = (
        sa.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("s_end").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("s_end").alias("a_end"))
    )
    first_b = (
        sb.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("s_start").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("s_start").alias("b_start"))
    )
    merges = last_a.join(first_b, "user_id").select(
        "user_id",
        (
            (F.unix_micros(F.col("b_start")) - F.unix_micros(F.col("a_end")))
            <= SESSION_GAP_US
        )
        .cast("int")
        .alias("merged"),
    )
    per_user = (
        sa.unionByName(sb)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("raw_sessions"),
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )
    return per_user.join(merges, "user_id", "left").select(
        "user_id",
        (F.col("raw_sessions") - F.coalesce(F.col("merged"), F.lit(0)))
        .cast("bigint")
        .alias("n_sessions"),
        "n_events",
        "sum_value",
    )


# --------------------------------------------- q249 two-stage rerank

RERANK_STAGE1_K = 20
RERANK_FINAL_K = 5


@register(
    "q249_two_stage_rerank",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CAST(UNNEST(q.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM q, embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    feats AS (
      SELECT query_id, cand_id,
             SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc,
             SUM((x - y) * (x - y)) AS l2sq
      FROM pairs GROUP BY query_id, cand_id
    ),
    stage1 AS (
      SELECT query_id, cand_id,
             (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cosine, l2sq,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC) AS rn
      FROM feats
    ),
    reranked AS (
      SELECT query_id, cand_id, cosine,
             (FLOOR(CAST(0.7 * cosine - 0.3 * SQRT(l2sq) / 8.0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS rerank_score
      FROM stage1 WHERE rn <= {RERANK_STAGE1_K}
    )
    SELECT query_id, cand_id, cosine, rerank_score,
           CAST(rn AS BIGINT) AS final_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rerank_score DESC, cand_id ASC) AS rn
      FROM reranked
    ) WHERE rn <= {RERANK_FINAL_K}
    """,
)
def q249_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve→re-rank — the production retrieval shape:
    stage 1 recalls top-{RERANK_STAGE1_K} per query by cheap cosine
    (JVM-side, corpus-wide); stage 2 re-scores ONLY those candidates
    with an expensive scorer through Arrow-batched ``mapInPandas`` —
    exactly where a cross-encoder model call would sit, receiving
    (query, candidate) feature batches. The stand-in scorer
    (0.7·cosine − 0.3·L2/8, deterministic and SQL-expressible) keeps
    the oracle exact while the PLUMBING — per-query candidate
    pruning before Python, bounded Arrow batches, typed return
    schema — is the real thing; swapping in a model changes one
    function body, not the plan.

    Scale: stage 2's cost is queries×{RERANK_STAGE1_K} rows, never
    corpus-sized — the whole point of staging.
    """
    from collections.abc import Iterator

    import pandas as pd

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    ).withColumn("qn", norm_double("qe"))
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    ).withColumn("cn", norm_double("ce"))
    # norms PRECOMPUTED per side before the pair join (r3 sweep
    # find): inside the join, cosine recomputed BOTH array norms per
    # PAIR — 3x the array work. Factoring them into per-row columns
    # (evaluated once per corpus/query row under the join) leaves
    # only the dot product per pair. Bit-identical results: same
    # IEEE ops on the same inputs, just not repeated.
    cosine = dround(
        dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
    )
    l2sq = F.aggregate(
        F.zip_with(
            F.col("qe"),
            F.col("ce"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w1 = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    stage1 = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id", cosine.alias("cosine"), l2sq.alias("l2sq")
        )
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= RERANK_STAGE1_K)
        .select("query_id", "cand_id", "cosine", "l2sq")
    )

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the cross-encoder slot: whole-batch vectorized scoring (a
        # model.predict(batch) drops in here unchanged)
        import numpy as np

        for pdf in batches:
            score = np.round(
                0.7 * pdf["cosine"].to_numpy()
                - 0.3 * np.sqrt(pdf["l2sq"].to_numpy()) / 8.0,
                6,
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf["cand_id"],
                    "cosine": pdf["cosine"],
                    "rerank_score": score,
                }
            )

    schema = (
        "query_id long, cand_id long, cosine double, rerank_score double"
    )
    reranked = stage1.mapInPandas(rerank, schema=schema)
    w2 = W.partitionBy("query_id").orderBy(
        F.col("rerank_score").desc(), F.col("cand_id").asc()
    )
    return (
        reranked.withColumn("final_rank", F.row_number().over(w2))
        .filter(F.col("final_rank") <= RERANK_FINAL_K)
        .select(
            "query_id",
            "cand_id",
            "cosine",
            "rerank_score",
            F.col("final_rank").cast("bigint").alias("final_rank"),
        )
    )


# ------------------------------------------ q251 source quality league

LEAGUE_STOPWORDS = ("the", "a", "of", "and")  # q81's gate words


@register(
    "q251_source_quality_league",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, i,
             string_split(text, ' ')[CAST(i + 1 AS INTEGER)] AS word
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    quality AS (
      SELECT d.source,
             (FLOOR(CAST(SUM((FLOOR(CAST(LEAST(1.0, s.n_tokens / 100.0)
                             * (1.0 - CAST(s.n_stop AS DOUBLE) / s.n_tokens) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)) / COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_quality
      FROM (
        SELECT doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN word IN {LEAGUE_STOPWORDS!r} THEN 1 ELSE 0 END)
                 AS n_stop
        FROM words GROUP BY doc_id
      ) s JOIN documents d ON d.doc_id = s.doc_id
      GROUP BY d.source
    ),
    dup AS (
      SELECT source,
             COUNT(*) AS n_docs,
             1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
               AS dup_rate
      FROM documents GROUP BY source
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC)
                 AS r
        FROM words GROUP BY word
      ) WHERE r <= {OOV_VOCAB_SIZE}
    ),
    oov AS (
      SELECT w.source,
             CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
      FROM words w LEFT JOIN vocab v ON w.word = v.word
      GROUP BY w.source
    ),
    blocks AS (
      SELECT doc_id, source,
             array_to_string(
               w[CAST(i * {BOILER_BLOCK_WORDS} + 1 AS INTEGER)
                 :CAST((i + 1) * {BOILER_BLOCK_WORDS} AS INTEGER)], ' ')
               AS block
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents) d,
           UNNEST(range((len(w) + {BOILER_BLOCK_WORDS - 1})
                        // {BOILER_BLOCK_WORDS})) AS r(i)
    ),
    bfreq AS (
      SELECT block, COUNT(DISTINCT doc_id) AS df FROM blocks GROUP BY block
    ),
    boiler AS (
      SELECT b.source,
             CAST(SUM(CASE WHEN f.df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS boiler_rate
      FROM blocks b JOIN bfreq f ON f.block = b.block
      GROUP BY b.source
    ),
    league AS (
      SELECT d.source, d.n_docs, q.avg_quality,
             (FLOOR(CAST(d.dup_rate AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS dup_rate,
             (FLOOR(CAST(o.oov_rate AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS oov_rate,
             (FLOOR(CAST(bl.boiler_rate AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS boiler_rate,
             (FLOOR(CAST(q.avg_quality - 0.5 * d.dup_rate - 0.5 * o.oov_rate
                   - 0.5 * bl.boiler_rate AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS league_score
      FROM dup d
      JOIN quality q ON q.source = d.source
      JOIN oov o ON o.source = d.source
      JOIN boiler bl ON bl.source = d.source
    )
    SELECT source, n_docs, avg_quality, dup_rate, oov_rate, boiler_rate,
           league_score,
           CAST(ROW_NUMBER() OVER (ORDER BY league_score DESC, source ASC)
                AS BIGINT) AS league_rank
    FROM league
    """,
)
def q251_source_quality_league(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality league table — the executive composition of
    the pipeline's individual gauges into ONE ranked readout: mean
    heuristic quality (q81's formula), exact-duplicate rate (q60's
    hash), out-of-vocabulary rate (q218), and boilerplate-block rate
    (q228), combined into a league score (quality minus half of each
    defect rate) and ranked. This is the table a data-sourcing
    review actually reads — per-metric queries exist for drill-down,
    the league decides which source's contract gets renegotiated.

    Shape: four independent |sources|-row aggregates (each the
    reduced form of its parent operator) joined on the tiny source
    key — composing pipeline signals costs four bounded joins, never
    another corpus pass per metric beyond the metric's own. Defect
    ratios are exact integer divisions; only the rounded-mean and
    the composite round (1e-4/1e-6).
    """
    docs = fan_out(t(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    # quality (q81 per-doc formula, averaged per source)
    per_doc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("word").isin(*LEAGUE_STOPWORDS), 1).otherwise(0)
        ).alias("n_stop"),
    )
    score = dround(
        F.least(F.lit(1.0), F.col("n_tokens") / 100.0)
        * (1.0 - F.col("n_stop").cast("double") / F.col("n_tokens")),
        6,
    )
    quality = (
        per_doc.join(t(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(dround(F.sum(score) / F.count(F.lit(1)), 4).alias("avg_quality"))
    )
    # exact-dup rate
    dup = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                1.0
                - F.count_distinct(F.md5(F.col("text").cast("binary"))).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )
    # OOV rate (q218 vocab)
    wv = W.orderBy(F.col("c").desc(), F.col("word").asc())
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("word", F.row_number().over(wv).alias("r"))
        .filter(F.col("r") <= OOV_VOCAB_SIZE)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    oov = (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            (
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("oov_rate")
        )
    )
    # boilerplate rate (q228 blocks)
    k = BOILER_BLOCK_WORDS
    blocks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(split(text, ' ')) + {k - 1})"
                f" DIV {k} - 1),"
                f" i -> concat_ws(' ', slice(split(text, ' '), i * {k} + 1, {k})))"
            )
        ).alias("block"),
    )
    bfreq = blocks.groupBy("block").agg(F.count_distinct("doc_id").alias("df"))
    boiler = (
        blocks.join(bfreq, "block")
        .groupBy("source")
        .agg(
            (
                F.sum(
                    F.when(F.col("df") >= BOILER_MIN_DOCS, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("boiler_rate")
        )
    )
    league = (
        dup.join(quality, "source")
        .join(oov, "source")
        .join(boiler, "source")
        .select(
            "source",
            "n_docs",
            "avg_quality",
            dround("dup_rate", 6).alias("dup_rate"),
            dround("oov_rate", 6).alias("oov_rate"),
            dround("boiler_rate", 6).alias("boiler_rate"),
            dround(
                F.col("avg_quality")
                - 0.5 * F.col("dup_rate")
                - 0.5 * F.col("oov_rate")
                - 0.5 * F.col("boiler_rate"),
                6,
            ).alias("league_score"),
        )
    )
    wr = W.orderBy(F.col("league_score").desc(), F.col("source").asc())
    return league.withColumn(
        "league_rank", F.row_number().over(wr).cast("bigint")
    )


# ---------------------------------------- q354 RAG chunking

RAG_CHUNK = 120  # chars per chunk
RAG_STRIDE = 90  # start-to-start distance (30-char overlap)


@register(
    "q354_rag_chunking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, n_chars,
             CAST(FLOOR((GREATEST(n_chars, 1) - 1) / {RAG_STRIDE})
                  AS BIGINT) AS k
      FROM documents
    ),
    chunks AS (
      SELECT d.doc_id,
             CAST(r.i AS BIGINT) AS chunk_idx,
             substr(d.text, CAST(r.i * {RAG_STRIDE} + 1 AS BIGINT),
                    {RAG_CHUNK}) AS chunk
      FROM d, UNNEST(range(0, d.k + 1)) r(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(LENGTH(chunk) AS BIGINT) AS chunk_len,
           substr(md5(chunk), 1, 16) AS chunk_id
    FROM chunks
    """,
)
def q354_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingest chunking: every document split into overlapping
    {RAG_CHUNK}-char windows on a {RAG_STRIDE}-char stride (the
    retrieval-corpus preparation upstream of embedding + indexing —
    q343/q344 consume exactly this grain), each chunk carrying a
    content-derived stable id (md5 prefix) so re-ingest dedups and
    incremental updates are hash-joins, not positional diffs.

    Chunk-start generation clamps the sequence stop to ≥0 BEFORE
    `sequence()` (the q260/q333 descending-sequence trap — Spark's
    sequence(0, -1) DESCENDS where DuckDB's range is empty); chunks
    are emitted via a bounded per-row explode, so the fan-out is
    len/stride, map-side, with no shuffle at all — at 100 TB this is
    a pure narrow transform feeding the embedding stage.
    """
    d = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "text",
        F.floor(
            (F.greatest(F.col("n_chars"), F.lit(1)) - 1) / RAG_STRIDE
        )
        .cast("bigint")
        .alias("k"),
    )
    chunks = d.select(
        "doc_id",
        F.explode(F.expr("sequence(0L, k)")).alias("chunk_idx"),
        "text",
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr(
            f"substring(text, cast(chunk_idx * {RAG_STRIDE} + 1 as int),"
            f" {RAG_CHUNK})"
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").cast("bigint").alias("chunk_len"),
        F.substring(F.md5(F.col("chunk").cast("binary")), 1, 16).alias(
            "chunk_id"
        ),
    )


# ---------------------------------------- q355 PMI collocations

PMI_MIN_COUNT = 5
PMI_TOPK = 20


@register(
    "q355_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    uni AS (
      SELECT u.w, COUNT(*) AS c FROM (
        SELECT UNNEST(tk) AS w FROM toks
      ) u GROUP BY u.w
    ),
    tot_u AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
    big AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2, COUNT(*) AS c
      FROM toks, UNNEST(range(1, len(tk))) r(i)
      GROUP BY tk[i], tk[i + 1]
    ),
    tot_b AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM big),
    scored AS (
      SELECT b.w1, b.w2, b.c,
             (FLOOR(CAST(LN((b.c / tb.n)
                      / ((u1.c / tu.n) * (u2.c / tu.n))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS pmi
      FROM big b
      JOIN uni u1 ON u1.w = b.w1
      JOIN uni u2 ON u2.w = b.w2
      CROSS JOIN tot_b tb CROSS JOIN tot_u tu
      WHERE b.c >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c AS BIGINT) AS n_pair, pmi,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rk
      FROM scored
    ) WHERE rk <= {PMI_TOPK}
    """,
)
def q355_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation extraction — the
    association-strength upgrade over raw bigram counts (q184 ranks
    by frequency, which surfaces stopword pairs; PMI = ln(p(xy) /
    p(x)p(y)) surfaces pairs that co-occur MORE than their unigram
    frequencies predict — the classic phrase-mining signal, with a
    min-count floor of {PMI_MIN_COUNT} to kill the low-count PMI
    explosion). Top-{PMI_TOPK} by (pmi DESC, pair).

    Plan: two parquet scans (one per count grain — a scan is cheaper
    than materializing corpus-sized token arrays to share one), each
    reducing immediately to vocabulary-sized aggregates;
    the PMI join runs bigram-table × two broadcast-able unigram
    lookups; all probabilities derive from integer counts so ln() on
    identical ratios is cross-engine stable (ROUND 6, q229
    precedent). 1-word docs contribute no bigrams on either engine
    (q333's clamp rule).
    """
    from pyspark.sql import Window as W

    toks = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot_u = uni.agg(F.sum("c").cast("double").alias("nu"))
    big = (
        toks.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(element_at(tk, i) AS w1,"
                    " element_at(tk, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot_b = big.agg(F.sum("c").cast("double").alias("nb"))
    scored = (
        big.filter(F.col("c") >= PMI_MIN_COUNT)
        # uni is unigram-type-grain (unbounded under Heaps' law) — no
        # broadcast hint; AQE decides. The 1-row totals stay hinted.
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_u))
        .select(
            "w1",
            "w2",
            "c",
            dround(
                F.log(
                    (F.col("c") / F.col("nb"))
                    / (
                        (F.col("c1") / F.col("nu"))
                        * (F.col("c2") / F.col("nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    # Top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps, no single-task global sort over the pair
    # table), THEN rank the k-row survivor set — the window's
    # single-partition shuffle only ever sees PMI_TOPK rows.
    topk = scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(PMI_TOPK)
    w = W.orderBy(F.col("pmi").desc(), "w1", "w2")
    return topk.withColumn(
        "rk", F.row_number().over(w).cast("bigint")
    ).select(
        "w1", "w2", F.col("c").cast("bigint").alias("n_pair"), "pmi", "rk"
    )


# ------------------------- q362 temperature-scaled data-mixing weights

MIX_ALPHA = 0.3        # sampling temperature (UnifiedQA/mT5-style)
MIX_TOKEN_BUDGET = 1_000_000  # training-token budget B


@register(
    "q362_mixing_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    powered AS (
      SELECT *, (FLOOR(CAST(exp({MIX_ALPHA!r} * ln(CAST(n_tokens AS DOUBLE))) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
               AS pw
      FROM per_source
    ),
    tot AS (
      SELECT CAST(SUM(CAST(pw AS DECIMAL(38,9))) AS DOUBLE) AS spw,
             CAST(SUM(n_tokens) AS DOUBLE) AS stok
      FROM powered
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           (FLOOR(CAST(p.n_tokens / t.stok AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS raw_share,
           (FLOOR(CAST(p.pw / t.spw AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS weight,
           (FLOOR(CAST({MIX_TOKEN_BUDGET} * (p.pw / t.spw) / p.n_tokens AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS effective_epochs
    FROM powered p, tot t
    """,
)
def q362_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing weights — the pretraining
    mixture design step (mT5 / multilingual-LM sampling, alpha =
    {MIX_ALPHA}): source i is sampled proportional to tokens_i^alpha,
    flattening the head so low-resource sources are not drowned out,
    and the resulting weight is converted to EFFECTIVE EPOCHS at a
    {MIX_TOKEN_BUDGET}-token budget (B*w_i/tokens_i) — the "how many
    times will this source repeat" overfitting-risk readout that
    decides whether the temperature is too aggressive. raw_share
    (alpha=1) sits beside it for contrast.

    tokens^alpha is exp(alpha*ln(x)) with identical op order on both
    engines and ROUND 9 before the source-count-sized normalization
    sum (decimal roundtrip, q357 idiom); token counts are exact
    BIGINTs. One corpus pass, source-sized output, every division
    guarded by construction (n_tokens >= n_docs >= 1).

    Scale: a single partial-aggregated groupBy on the source key;
    the mixture table is dimension-sized and broadcast-joined back
    only if a sampler materializes it — here it IS the output.
    """
    per_source = fan_out(t(spark, sf_dir, "documents")).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    powered = per_source.withColumn(
        "pw",
        dround(
            F.exp(F.lit(MIX_ALPHA) * F.log(F.col("n_tokens").cast("double"))),
            9,
        ),
    )
    tot = powered.agg(
        F.sum(F.col("pw").cast("decimal(38,9)")).cast("double").alias("spw"),
        F.sum("n_tokens").cast("double").alias("stok"),
    )
    return powered.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        dround(F.col("n_tokens") / F.col("stok"), 6).alias("raw_share"),
        dround(F.col("pw") / F.col("spw"), 6).alias("weight"),
        dround(
            F.lit(MIX_TOKEN_BUDGET)
            * (F.col("pw") / F.col("spw"))
            / F.col("n_tokens"),
            6,
        ).alias("effective_epochs"),
    )


# -------------------- q372 PPMI distributional word similarity

PPMI_WIN = 2       # symmetric context window
PPMI_TOPK = 10
PPMI_CTX_CAP = 1000  # scale rule: drop contexts shared by > CAP words


@register(
    "q372_ppmi_word_similarity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS i,
             string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    pairs AS (
      SELECT a.w AS w, b.w AS c
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id
        AND b.i BETWEEN a.i - {PPMI_WIN} AND a.i + {PPMI_WIN}
        AND b.i <> a.i
    ),
    nwc AS (SELECT w, c, COUNT(*) AS n FROM pairs GROUP BY w, c),
    nw AS (SELECT w, SUM(n) AS nw FROM nwc GROUP BY w),
    nc AS (SELECT c, SUM(n) AS nc FROM nwc GROUP BY c),
    nn AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM nwc),
    ctx_df AS (SELECT c, COUNT(*) AS df FROM nwc GROUP BY c),
    ppmi AS (
      SELECT x.w, x.c,
             (FLOOR(CAST(GREATEST(ln((x.n * t.nn) / (w1.nw * c1.nc)), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
               AS v
      FROM nwc x
      JOIN nw w1 ON w1.w = x.w
      JOIN nc c1 ON c1.c = x.c
      JOIN ctx_df d ON d.c = x.c
      CROSS JOIN nn t
      WHERE d.df <= {PPMI_CTX_CAP}
    ),
    norms AS (
      SELECT w, SQRT(CAST(SUM(CAST((FLOOR(CAST(v * v AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                          AS DOUBLE)) AS nrm
      FROM ppmi GROUP BY w
    ),
    dots AS (
      SELECT a.w AS w1, b.w AS w2,
             CAST(SUM(CAST((FLOOR(CAST(a.v * b.v AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                  AS DOUBLE) AS dot
      FROM ppmi a JOIN ppmi b ON a.c = b.c AND a.w < b.w
      GROUP BY a.w, b.w
    ),
    scored AS (
      SELECT d.w1, d.w2,
             (FLOOR(CAST(d.dot / NULLIF(na.nrm * nb.nrm, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cosine
      FROM dots d
      JOIN norms na ON na.w = d.w1
      JOIN norms nb ON nb.w = d.w2
    )
    SELECT w1, w2, cosine, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, w1, w2) AS rk
      FROM scored WHERE cosine IS NOT NULL
    ) WHERE rk <= {PPMI_TOPK}
    """,
)
def q372_ppmi_word_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional word similarity from PPMI context vectors —
    count-based word embeddings (Levy & Goldberg 2014 showed
    skip-gram factorizes exactly this matrix): every word's vector
    is its positive-PMI weighting over +-{PPMI_WIN}-window contexts,
    and word-pair cosine runs as an INVERTED-INDEX join on the
    shared context key (the q333 posting-list shape — never a vocab
    x vocab product). Contexts shared by more than {PPMI_CTX_CAP}
    words are dropped before the pair join (the q62 bucket-cap rule:
    stop-word-like contexts contribute ~zero PPMI but quadratic
    pairs).

    Cross-engine: counts are integers; ln() on identical ratios
    rounds at 1e-6 BEFORE use (PPMI values are themselves rounded,
    so dot/norm inputs are grid-identical); dot/norm sums use the
    decimal roundtrip; the final rank orders the ROUNDED cosine with
    a pair tie-break, and zero-norm words NULL out identically.

    Scale: token stream -> (w,c) count reduce (vocab^2-bounded with
    the window constant), then everything is vocabulary-grain. The
    top-{PPMI_TOPK} goes TakeOrdered before the tiny rank window.
    """
    from pyspark.sql import Window as W

    toks = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("ip", "w")
    ).select("doc_id", F.col("ip").cast("bigint").alias("i"), "w")
    a = toks.select("doc_id", F.col("i").alias("ai"), F.col("w").alias("w"))
    b = toks.select("doc_id", F.col("i").alias("bi"), F.col("w").alias("c"))
    pairs = a.join(b, "doc_id").filter(
        (F.col("bi") >= F.col("ai") - PPMI_WIN)
        & (F.col("bi") <= F.col("ai") + PPMI_WIN)
        & (F.col("bi") != F.col("ai"))
    )
    nwc = pairs.groupBy("w", "c").agg(F.count(F.lit(1)).alias("n"))
    nw = nwc.groupBy("w").agg(F.sum("n").alias("nw_"))
    nc = nwc.groupBy("c").agg(F.sum("n").alias("nc_"))
    nn = nwc.agg(F.sum("n").cast("double").alias("nn_"))
    ctx_df = nwc.groupBy("c").agg(F.count(F.lit(1)).alias("df"))
    ppmi = (
        # nw/nc/ctx_df are word/context-TYPE-grain (unbounded under
        # Heaps' law — the df<=cap filter bounds per-context fanout,
        # not the number of context types) — no broadcast hint; AQE
        # decides. The 1-row nn total stays hinted.
        nwc.join(nw, "w")
        .join(nc, "c")
        .join(ctx_df.filter(F.col("df") <= PPMI_CTX_CAP), "c")
        .crossJoin(F.broadcast(nn))
        .select(
            "w",
            "c",
            dround(
                F.greatest(
                    F.log(
                        (F.col("n") * F.col("nn_"))
                        / (F.col("nw_") * F.col("nc_"))
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("v"),
        )
    )
    norms = ppmi.groupBy("w").agg(
        F.sqrt(
            F.sum(dround(F.col("v") * F.col("v"), 9).cast("decimal(38,9)"))
            .cast("double")
        ).alias("nrm")
    )
    pa = ppmi.select(F.col("w").alias("w1"), "c", F.col("v").alias("va"))
    pb = ppmi.select(F.col("w").alias("w2"), "c", F.col("v").alias("vb"))
    dots = (
        pa.join(pb, "c")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.sum(
                dround(F.col("va") * F.col("vb"), 9).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("w").alias("w1"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("w").alias("w2"), F.col("nrm").alias("nb"))
    scored = (
        # na/nb are word-grain norm tables — no broadcast hint.
        dots.join(na, "w1")
        .join(nb, "w2")
        .select(
            "w1",
            "w2",
            dround(
                F.col("dot")
                / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    topk = scored.orderBy(
        F.col("cosine").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(PPMI_TOPK)
    wr = W.orderBy(F.col("cosine").desc(), "w1", "w2")
    return topk.withColumn(
        "rk", F.row_number().over(wr).cast("bigint")
    ).select("w1", "w2", "cosine", "rk")


# ------------------- q373 cross-document duplication length profile

DUPLEN_SIZES = (4, 8, 16, 32)


def _duplen_size_sql(s: int) -> str:
    return f"""
    SELECT {s} AS win_tokens, w.h
    FROM (
      SELECT t.doc_id,
             md5(string_agg(t2.w, ' ' ORDER BY t2.i)) AS h
      FROM (
        SELECT doc_id, CAST(r.i AS BIGINT) AS i,
               string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w,
               len(string_split(text, ' ')) AS nt
        FROM documents,
             UNNEST(range(len(string_split(text, ' ')))) AS r(i)
      ) t
      JOIN (
        SELECT doc_id, CAST(r.i AS BIGINT) AS i,
               string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w
        FROM documents,
             UNNEST(range(len(string_split(text, ' ')))) AS r(i)
      ) t2 ON t2.doc_id = t.doc_id
          AND t2.i BETWEEN t.i AND t.i + {s} - 1
      WHERE t.i + {s} <= t.nt
      GROUP BY t.doc_id, t.i
    ) w
    """


@register(
    "q373_duplication_length_profile",
    oracle=f"""
    WITH all_windows AS (
      {" UNION ALL ".join(_duplen_size_sql(s) for s in DUPLEN_SIZES)}
    ),
    per_hash AS (
      SELECT win_tokens, h, COUNT(*) AS occurrences
      FROM all_windows GROUP BY win_tokens, h
    )
    SELECT win_tokens AS window_tokens,
           CAST(SUM(occurrences) AS BIGINT) AS n_windows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN occurrences >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_hashes,
           CAST(SUM(CASE WHEN occurrences >= 2 THEN occurrences ELSE 0 END)
                AS BIGINT) AS n_dup_windows,
           (FLOOR(CAST(SUM(CASE WHEN occurrences >= 2 THEN occurrences
                          ELSE 0 END)
                 / CAST(NULLIF(SUM(occurrences), 0) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS dup_share
    FROM per_hash
    GROUP BY win_tokens
    """,
)
def q373_duplication_length_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplication LENGTH profile — how duplication decays with match
    length: q253's ExactSubstr machinery swept across a ladder of
    window sizes {DUPLEN_SIZES}, reporting per size the share of
    sliding token windows whose hash occurs more than once anywhere
    in the corpus. Short windows duplicate by chance (common
    phrases); long duplicated windows are true copies — the knee of
    this curve is how ExactSubstr's 50-token threshold (Lee et al.
    2021) gets CHOSEN, where q253 merely applies one point of it.

    Windows are md5-hashed BEFORE any shuffle (the q253 rule: the
    exchange carries 32-hex keys, never text); each ladder rung is a
    hash-grain aggregate; dup share is a ratio of exact integers.
    One token stream feeds all four rungs.

    Scale: per rung, windows ~= corpus tokens; the reduce keys are
    uniform hashes (no skew) and the per-hash aggregate is
    map-side-combinable. The ladder multiplies cost by
    |{DUPLEN_SIZES}| — production would binary-search the knee
    instead of materializing every rung.
    """
    docs = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    rungs = []
    for s in DUPLEN_SIZES:
        # in-row sliding windows: one hash per start position, no
        # join, no token-stream blow-up — the exchange carries only
        # (size, hash); clamp the sequence stop (q354 rule)
        wins = docs.filter(F.size("tk") >= s).select(
            F.lit(s).alias("win_tokens"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tk) - {s} + 1),"
                    f" i -> md5(cast(concat_ws(' ', slice(tk, i, {s}))"
                    f" as binary)))"
                )
            ).alias("h"),
        )
        rungs.append(wins)
    all_windows = rungs[0]
    for r in rungs[1:]:
        all_windows = all_windows.unionByName(r)
    per_hash = all_windows.groupBy("win_tokens", "h").agg(
        F.count(F.lit(1)).alias("occurrences")
    )
    dup = F.when(F.col("occurrences") >= 2, F.col("occurrences")).otherwise(0)
    return per_hash.groupBy(
        F.col("win_tokens").alias("window_tokens")
    ).agg(
        F.sum("occurrences").cast("bigint").alias("n_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.when(F.col("occurrences") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_hashes"),
        F.sum(dup).cast("bigint").alias("n_dup_windows"),
        dround(
            F.sum(dup)
            / F.nullif(F.sum("occurrences"), F.lit(0)).cast("double"),
            6,
        ).alias("dup_share"),
    )
