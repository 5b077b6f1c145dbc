"""Deduplication operators over ``documents`` — the LLM-pipeline
surface (BASELINE.json north star): exact dedup, n-gram Jaccard
near-dedup, MinHash+LSH candidate generation, SimHash fingerprints.

Hashing strategy: every hash is ``md5`` of a string — identical hex
output in Spark and DuckDB, so signatures/fingerprints hash-match in
the oracle. MinHash min-comparison is on fixed-length hex strings,
where lexicographic order == numeric order.

Scale notes (100 TB):
- Exact dedup groups on the full text; at scale you'd group on
  ``md5(text)`` (same partitioning, 32-byte shuffle keys) — shown in
  q60 via an md5 key so the shuffle never carries document bodies.
- Jaccard via inverted shingle index: the self-join is on shingle,
  so hot (high-document-frequency) shingles quadratically blow up
  candidate pairs. 5-word shingles keep DF low; a DF cap is the
  standard mitigation and the MinHash path (q62) is the scale
  default: O(docs × bands) instead of O(pairs).
- All joins here shuffle on hash/shingle keys — uniformly
  distributed by construction, no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, t

N_HASHES = 8  # minhash functions
N_BANDS = 4  # LSH bands (2 rows per band)
MAX_SHINGLE_DF = 50  # q61: drop shingles in more docs than this
MAX_LSH_BUCKET = 64  # q62: skip LSH buckets bigger than this (skew guard)
HI_NIBBLE = ("8", "9", "a", "b", "c", "d", "e", "f")


def _shingles(k: int) -> Column:
    """k-word shingles from pre-split column ``w`` (requires
    ``size(w) >= k`` filtered upstream)."""
    return F.expr(
        f"transform(sequence(0, size(w) - {k}), i -> concat_ws(' ', slice(w, i + 1, {k})))"
    )


def _shingle_df(
    spark: SparkSession, sf_dir: str, k: int, distinct: bool = True
) -> DataFrame:
    """Exploded k-word shingles. ``distinct=True`` (the set view)
    costs a shuffle — pass False for consumers whose aggregate is
    duplicate-insensitive (MIN for minhash signatures), which keeps
    the shingle stream entirely map-side."""
    docs = fan_out(
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= k)
    )
    sh = docs.select("doc_id", F.explode(_shingles(k)).alias("shingle"))
    return sh.distinct() if distinct else sh


def _sql_shingles(k: int) -> str:
    """DuckDB CTEs ``docs`` + ``sh``: distinct k-word shingles."""
    return f"""
    docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= {k}
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i+1:i+{k}], ' ') AS shingle
      FROM docs, UNNEST(range(len(w) - {k - 1})) AS t(i)
    )"""


@register(
    "q60_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY md5(text)
    """,
)
def q60_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.

    Grouping on md5(text) (not text) keeps shuffle keys at 32 bytes
    regardless of document size — the 100 TB-safe form.
    """
    return (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .select("keep_doc_id", "n_copies", "n_chars")
    )


@register(
    "q61_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_sql_shingles(5)},
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ),
    rare AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a
      JOIN rare r ON a.shingle = r.shingle
      JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def q61_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over 5-word shingles via an
    inverted index self-join (candidate pairs share ≥1 shingle, so
    no O(n²) cross join). Jaccard = |∩| / (|A| + |B| - |∩|).

    Hot shingles (document frequency > MAX_SHINGLE_DF) are dropped —
    the standard stop-shingle cap that bounds the quadratic
    per-shingle pair blowup at scale (a shingle in d docs contributes
    d² candidate pairs). The oracle applies the identical cap.

    Instead of an inverted-index SELF-JOIN (which plans the shingle
    pipeline twice more and shuffles it for both join sides), ONE
    groupBy(shingle) both measures document frequency and collects
    the posting list; the df cap bounds the list at MAX_SHINGLE_DF,
    so candidate pairs come from a bounded in-row double explode.
    The per-doc size branch shares the same distinct-shingle subtree
    (exchange reuse).
    """
    sh = _shingle_df(spark, sf_dir, 5)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    postings = (
        sh.groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    inter = (
        postings.select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def _minhash_pairs_ctes() -> str:
    """Shared DuckDB CTE chain ending in ``pairs(doc_a, doc_b)`` —
    the MinHash+LSH candidate pairs (used by q62 and the clustering
    oracles q64/q65).

    8 independent 16-bit hash functions = 4-hex-char chunks of ONE
    md5 digest (md5 is uniform per-chunk); MIN per chunk = minhash.
    One digest instead of two halves the hashing cost over the
    shingle stream — the dominant q62 term; 16-bit minhashes are
    ample for banding (band key = 32 bits, collision-negligible).
    Integer minhashes keep the agg buffer fixed-width (HashAggregate,
    not SortAggregate) and the band join key a single BIGINT.
    """
    sig_cols = ",\n        ".join(
        f"MIN(CAST('0x' || substr(h1, {i * 4 + 1}, 4) AS BIGINT))"
        f" AS h{i}"
        for i in range(N_HASHES)
    )
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band,"
        f" h{2 * b} * 65536 + h{2 * b + 1} AS bkey FROM sig"
        for b in range(N_BANDS)
    )
    return f"""{_sql_shingles(3)},
    hashed AS (
      SELECT doc_id, md5(shingle) AS h1 FROM sh
    ),
    sig AS (
      SELECT doc_id,
        {sig_cols}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    ),
    bsz AS (
      SELECT band, bkey, COUNT(*) AS n FROM bands GROUP BY band, bkey
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                  AND a.doc_id < b.doc_id
      JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey
                AND s.n <= {MAX_LSH_BUCKET}
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_pairs_ctes()}
    SELECT doc_a, doc_b FROM pairs
    """


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signatures (doc_id, h0..h7) — the shared
    sketch for LSH banding (q62/q64/q65) and signature-similarity
    estimation (q199).

    MIN is duplicate-insensitive, so the signature agg consumes the
    raw (non-distinct) shingle stream: no pre-shuffle of shingles,
    the only wide exchange is the groupBy(doc_id) itself.
    """
    sh = _shingle_df(spark, sf_dir, 3, distinct=False)
    return (
        sh.select(
            "doc_id",
            F.md5(F.col("shingle").cast("binary")).alias("h1"),
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.conv(F.substring("h1", i * 4 + 1, 4), 16, 10).cast("long")
                ).alias(f"h{i}")
                for i in range(N_HASHES)
            ]
        )
    )


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (doc_a < doc_b) — shared by q62
    (reported directly) and q64/q65 (clustered).

    The 8 hash functions are the 4-hex-char (16-bit) chunks of ONE
    md5 digest — md5 bits are independent/uniform, so each chunk is
    a valid minhash permutation at an eighth of the hashing cost and
    with NO row explosion (8 conditional MINs instead of an 8×
    explode+shuffle; chunking instead of per-seed hashing cut the
    sf0.1 bench time ~4×, and single-digest chunking halves the
    remaining md5 work). Chunks are parsed to BIGINT so the
    signature agg keeps a fixed-width buffer (HashAggregate, not
    SortAggregate) and each 2-row band packs into one 32-bit BIGINT
    join key.

    The scale path for fuzzy dedup: cost is O(docs × shingles) for
    signatures plus a self-join on band keys (uniform hash values →
    no skew), never O(docs²).
    """
    hashed = _signatures(spark, sf_dir)
    bands = hashed.select(
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
    # Pair generation via bucket-collect instead of a self-join: the
    # signature pipeline runs ONCE, one shuffle on (band, bkey), and
    # pairs are emitted JVM-side from each (small) bucket's sorted
    # doc list. A self-join would scan+hash the corpus twice.
    # Bucket-size cap (round-1 VERDICT task 4): a degenerate corpus
    # (e.g. millions of identical docs) concentrates one giant LSH
    # bucket whose collect_set and O(bucket²) pair emission would
    # land in a single task. The window count runs BEFORE collect_set
    # on the same (band, bkey) partitioning (one exchange, spillable
    # sort — bounded task memory even for a corpus-sized bucket), so
    # oversized buckets are dropped without ever materializing their
    # doc list. Near-dup groups that big should go through exact
    # dedup (q60) first; the oracle applies the identical cap.
    from pyspark.sql import Window

    bn = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
    buckets = (
        bands.withColumn("bn", bn)
        .filter((F.col("bn") >= 2) & (F.col("bn") <= MAX_LSH_BUCKET))
        .groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    return (
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


@register("q62_dedup_minhash_lsh", oracle=_minhash_oracle())
def q62_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs (see _minhash_pairs)."""
    return _minhash_pairs(spark, sf_dir)


def _clusters_ctes() -> str:
    """CTE chain ``pairs`` → ``clusters(doc_id, cluster_id)``:
    connected components over the candidate-pair graph via a
    recursive transitive-closure CTE (exact fixpoint — fine at
    oracle scale; the Spark side uses iterative min-label
    propagation, the scalable equivalent)."""
    return f"""{_minhash_pairs_ctes()},
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
      UNION SELECT doc_id, doc_id FROM documents
    ),
    reach(src, dst) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    )"""


def _propagate_labels(pairs: DataFrame, docs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Each round: every vertex takes the min label among itself and its
    neighbors; stop when no label changes. Rounds = graph diameter —
    small for dedup graphs (near-clique duplicate groups). At 100 TB
    scale the same loop runs with checkpointed DataFrames per round
    (lineage truncated via localCheckpoint) and converges in a
    handful of shuffles; the alternating large-star/small-star
    algorithm is the drop-in upgrade for adversarial diameters.
    """
    # Materialize the edge list ONCE before iterating: `sym` feeds
    # every propagation step AND every convergence count, so without
    # a checkpoint each driver action would re-run the whole
    # upstream candidate-pair pipeline (the MinHash/LSH stages cost
    # more than all the propagation rounds combined — measured 17 s
    # → 8 s for q64 at sf0.1). Same rule at 100 TB: the reduced
    # edge list is cheap to persist, the corpus-sized pipeline that
    # produced it is not.
    sym = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    # Propagate over GRAPH VERTICES only: singletons (the vast
    # majority of a deduped corpus) never change label, so carrying
    # them through every iteration would shuffle + checkpoint the
    # whole corpus per round for nothing. They join back once at the
    # end. The convergence count rides on the same checkpointed
    # frame (old label kept alongside new) instead of a second join
    # — one action per round, total per-round cost ∝ graph size.
    labels = sym.select("src").distinct().select(
        F.col("src").alias("doc_id"), F.col("src").alias("cluster_id")
    )

    def step(lbl: DataFrame) -> DataFrame:
        nbr_min = (
            sym.join(lbl, sym.src == lbl.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_lbl"))
        )
        return lbl.join(nbr_min, lbl.doc_id == nbr_min.dst, "left").select(
            "doc_id",
            F.col("cluster_id").alias("old_id"),
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("nbr_lbl"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )

    # TWO propagation steps per driver action: min-label propagation
    # is monotone (extra rounds after convergence are no-ops), so the
    # convergence check only needs to run every other round — halving
    # per-round job-scheduling latency, the dominant cost for small
    # graphs. The lazy checkpoint is materialized by the convergence
    # count itself (one action per double-round).
    for _ in range((max_iter + 1) // 2):
        stepped = step(
            step(labels).select("doc_id", "cluster_id")
        ).localCheckpoint(eager=False)
        changed = stepped.filter(F.col("cluster_id") != F.col("old_id")).count()
        labels = stepped.select("doc_id", "cluster_id")
        if changed == 0:
            break
    return docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )


@register(
    "q64_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_clusters_ctes()}
    SELECT doc_id, cluster_id FROM clusters
    """,
)
def q64_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the MinHash+LSH
    candidate-pair graph; every document labeled with the min doc_id
    of its component (singletons label themselves)."""
    pairs = _minhash_pairs(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return _propagate_labels(pairs, docs)


def _alternating_star_components(
    pairs: DataFrame, docs: DataFrame, max_iter: int = 25
) -> tuple[DataFrame, int]:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the adversarial-diameter upgrade over q64's min-label
    propagation (`_propagate_labels`), whose round count equals the
    graph diameter. The star operations rewire the edge set itself,
    so a path of length d collapses in O(log d) rounds:

    - large-star(u): connect every STRICTLY LARGER neighbor of u to
      m(u) = min(N(u) ∪ {u})
    - small-star(u): connect every neighbor ≤ u, and u itself, to the
      minimum among them

    Both are one groupBy (per-node min) + one join (re-emit edges) —
    no neighborhood lists are ever collected, so a hot node with 10M
    neighbors costs a 10M-row join, not a 10M-element array. Each
    round's edge set is localCheckpoint'ed (lineage would otherwise
    double per round). Convergence = edge multiset stable, detected
    by a (count, xor-of-hashes) signature — one tiny aggregate per
    round instead of a full set-difference join.

    Returns (labels, rounds): labels = (doc_id, cluster_id =
    component-min doc_id), every doc labeled (singletons themselves).
    """

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        smaller = sym.filter(F.col("v") < F.col("u"))
        mins = smaller.groupBy("u").agg(F.min("v").alias("m"))
        rewired = (
            smaller.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mins.select("u", F.col("m").alias("v")))
        )
        return rewired.filter(F.col("u") != F.col("v")).distinct()

    edges = (
        pairs.select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor fold: order-independent, constant memory (no
            # collect). A (count, xor) collision on CHANGED edges
            # would end iteration early, so a signature match is
            # confirmed below with one exact set-diff before breaking
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _signature(edges)
    rounds = 0
    for _ in range(max_iter):
        prev = edges
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        rounds += 1
        new_sig = _signature(edges)
        if new_sig == sig:
            # exact confirm (signature-collision guard): both sides
            # are distinct checkpointed sets with equal counts, so
            # one empty one-directional diff proves set equality.
            # Runs ONCE, at convergence, on the reduced edge list.
            if edges.exceptAll(prev).isEmpty():
                break
        sig = new_sig
    # converged: every edge points at its component min (star form)
    labels = (
        _sym(edges)
        .groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("cluster_id"))
        .select(F.col("u").alias("doc_id"), "cluster_id")
    )
    labeled = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return labeled, rounds


@register(
    "q340_dedup_clusters_star",
    oracle=f"""
    WITH RECURSIVE {_clusters_ctes()}
    SELECT doc_id, cluster_id FROM clusters
    """,
)
def q340_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via alternating large-star/small-star
    connected components — same answer as q64 (identical oracle: the
    recursive transitive-closure CTE), different algorithm: O(log d)
    rounds instead of O(d), which is the difference between 5 and 500
    shuffles on chain-shaped near-dup graphs (crawl chains, quote
    threads). See `_alternating_star_components` for the plan."""
    pairs = _minhash_pairs(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    labeled, _rounds = _alternating_star_components(pairs, docs)
    return labeled


@register(
    "q65_dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_clusters_ctes()}
    SELECT cluster_id, COUNT(*) AS n_members,
           COUNT(*) - 1 AS n_removed
    FROM clusters GROUP BY cluster_id
    """,
)
def q65_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document summary: one row per duplicate cluster with
    member count and how many docs dedup removes (keep-first
    policy: the representative is the min doc_id = cluster_id)."""
    return (
        q64_dedup_clusters(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - 1).alias("n_removed"),
        )
    )


def _simhash_oracle() -> str:
    nibbles = ", ".join(f"'{c}'" for c in HI_NIBBLE)
    bits = ",\n      ".join(
        f"CASE WHEN SUM(CASE WHEN substr(hw, {i + 1}, 1) IN ({nibbles})"
        f" THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END"
        for i in range(16)
    )
    return f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    h AS (SELECT doc_id, md5(word) AS hw FROM words)
    SELECT doc_id, CONCAT(
      {bits}
    ) AS simhash
    FROM h GROUP BY doc_id
    """


@register("q63_dedup_simhash", oracle=_simhash_oracle())
def q63_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document: each bit is the sign
    of the term-frequency-weighted vote of one md5 hex digit. Docs
    with small Hamming distance are near-dups; identical fingerprints
    bucket together for O(n) candidate generation.
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    h = words.select("doc_id", F.md5(F.col("word").cast("binary")).alias("hw"))
    votes = [
        F.sum(
            F.when(F.substring("hw", i + 1, 1).isin(*HI_NIBBLE), 1).otherwise(-1)
        )
        for i in range(16)
    ]
    bits = [F.when(v >= 0, "1").otherwise("0") for v in votes]
    return h.groupBy("doc_id").agg(F.concat(*bits).alias("simhash"))


@register(
    "q66_dedup_editdistance",
    oracle="""
    WITH cand AS (
      SELECT doc_id, text, n_chars, lang FROM documents WHERE doc_id < 200
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM cand a
    JOIN cand b
      ON a.lang = b.lang
     AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 10
    WHERE levenshtein(a.text, b.text) <= 20
    """,
)
def q66_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs with blocking: candidates must
    share a language and sit within a ±10-char length band before the
    O(len²) levenshtein runs.

    Blocking is the scale lever: the equi-join key (lang; in
    production, lang × length-bucket × minhash-band) bounds the
    quadratic comparison to within-block pairs, and |Δlen| ≤ 10 is a
    free lower bound on the distance itself (|Δlen| ≤ edit_dist).

    The distance itself is THRESHOLDED: ``levenshtein(a, b, 20)``
    runs the banded O(len·k) algorithm and bails to -1 past the
    bound, instead of filling the full O(len²) matrix only to
    discard distances > 20 — ~5× on this query's bench time, and
    the difference between feasible and not against long documents.
    """
    cand = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", "n_chars", "lang")
    )
    a = cand.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
        F.col("n_chars").alias("na"),
        "lang",
    )
    b = cand.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
        F.col("n_chars").alias("nb"),
        F.col("lang").alias("lang_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("na") - F.col("nb")) <= 10),
        )
        .withColumn(
            "edit_dist", F.levenshtein("ta", "tb", 20).cast("bigint")
        )
        .filter(F.col("edit_dist") >= 0)  # -1 = over threshold
        .select("doc_a", "doc_b", "edit_dist")
    )


@register(
    "q140_lsh_verified_pairs",
    oracle=f"""
    WITH {{pairs_ctes}},
    hsets AS (
      SELECT doc_id, md5(shingle) AS h FROM sh
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM hsets GROUP BY doc_id
    ),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN hsets a ON a.doc_id = p.doc_a
      JOIN hsets b ON b.doc_id = p.doc_b AND b.h = a.h
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.5
    """.format(pairs_ctes=_minhash_pairs_ctes()),
)
def q140_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of two-stage LSH dedup: exact shingle-set
    Jaccard computed ONLY for MinHash candidate pairs (q62), keeping
    pairs at ≥ 0.5 — the architecture production near-dedup actually
    ships (LSH recall pass → exact precision pass), completing the
    q61 (exhaustive exact) / q62 (candidates only) pair.

    Scale: the exact check touches O(candidates) pairs, not
    O(docs²); each side's shingle fingerprint set is collected once
    (fixed-width md5 hashes, never shingle text — q68's rule) and
    the intersection is an in-row array_intersect, so verification
    is two hash joins on doc ids plus codegen'd array math.
    """
    pairs = _minhash_pairs(spark, sf_dir)
    sh = _shingle_df(spark, sf_dir, 3)
    hsets = (
        sh.select("doc_id", F.md5(F.col("shingle").cast("binary")).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    a = hsets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    b = hsets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    scored = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ha", "hb")).alias("n_common"),
            F.size("ha").alias("na"),
            F.size("hb").alias("nb"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        scored.filter(F.col("n_common") > 0)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


@register(
    "q155_golden_record",
    oracle="""
    WITH scored AS (
      SELECT md5(text) AS th, doc_id, n_chars, source,
             ROW_NUMBER() OVER (PARTITION BY md5(text)
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    )
    SELECT th AS text_hash, doc_id AS golden_doc_id, n_chars, source
    FROM scored WHERE rk = 1
    """,
)
def q155_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record selection) for duplicate groups:
    within each exact-duplicate cluster, keep the most complete
    record (longest text, ties to the lowest doc_id) with its
    attributes — the master-data step after dedup detection (q60
    counts copies; this picks WHICH row survives, with a business
    rule).

    Implemented as a single aggregation argmax: MAX over
    struct(n_chars, -doc_id, ...) — struct comparison is
    lexicographic, so one partial+final hash aggregate replaces the
    rank-window + filter (no sort, half the shuffle width). The
    oracle spells the equivalent window form.
    """
    docs = t(spark, sf_dir, "documents")
    best = F.max(
        F.struct(
            F.col("n_chars").alias("n_chars"),
            (-F.col("doc_id")).alias("neg_doc_id"),
            F.col("source").alias("source"),
        )
    ).alias("best")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(best)
        .select(
            "text_hash",
            (-F.col("best.neg_doc_id")).alias("golden_doc_id"),
            F.col("best.n_chars").alias("n_chars"),
            F.col("best.source").alias("source"),
        )
    )


@register(
    "q160_source_dup_rate",
    oracle=f"""
    WITH {{pairs_ctes}},
    dup_docs AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION
      SELECT doc_b FROM pairs
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(dd.doc_id) AS n_near_dup,
           CAST(COUNT(dd.doc_id) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM documents d
    LEFT JOIN dup_docs dd ON dd.doc_id = d.doc_id
    GROUP BY d.source
    """.format(pairs_ctes=_minhash_pairs_ctes()),
)
def q160_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup health dashboard: per source, how many documents are
    involved in at least one MinHash near-dup candidate pair — the
    corpus-quality number a data team tracks per snapshot (a source
    whose dup_rate jumps is re-crawling itself).

    Builds on the q62 candidate machinery; the flagged-doc set is
    the pair endpoints de-duplicated (fixed-width ids), joined back
    with the q68-style LEFT-join marker so one aggregation yields
    totals and flagged counts together.
    """
    pairs = _minhash_pairs(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(dup_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_dup").alias("n_near_dup"),
            (F.count("is_dup").cast("double") / F.count(F.lit(1))).alias(
                "dup_rate"
            ),
        )
    )


@register(
    "q179_incremental_corpus_gate",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT MD5(text) AS h FROM documents
      WHERE source IN ('src0', 'src1')
    ),
    inc AS (
      SELECT lang, MD5(text) AS h FROM documents
      WHERE source NOT IN ('src0', 'src1')
    )
    SELECT i.lang,
           COUNT(*) AS incoming,
           COUNT(*) FILTER (WHERE hs.h IS NULL) AS novel,
           COUNT(*) FILTER (WHERE hs.h IS NOT NULL) AS already_seen
    FROM inc i LEFT JOIN hist hs ON i.h = hs.h
    GROUP BY i.lang
    """,
)
def q179_incremental_corpus_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup gate: of the incoming sources'
    documents, how many are novel vs already present in the
    historical corpus (by exact content hash)? This is the membership
    check an incremental pipeline runs so it only processes unseen
    documents — cross-corpus, unlike q60's within-corpus dedup.

    Both sides reduce to fixed-width md5 keys before the join (the
    document bodies never shuffle); the historical side is DISTINCT
    hashes only. The left join + conditional counts yields novel and
    seen in one pass.

    100 TB: the history side is the candidate for a broadcast bloom
    filter or a bucketed hash table; as an equi-join on uniform
    128-bit keys it has no skew by construction.
    """
    d = t(spark, sf_dir, "documents")
    hist = (
        d.filter(F.col("source").isin("src0", "src1"))
        .select(F.md5("text").alias("hh"))
        .distinct()
    )
    inc = d.filter(~F.col("source").isin("src0", "src1")).select(
        "lang", F.md5("text").alias("h")
    )
    return (
        inc.join(hist, F.col("h") == F.col("hh"), "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("incoming"),
            F.count_if(F.col("hh").isNull()).alias("novel"),
            F.count_if(F.col("hh").isNotNull()).alias("already_seen"),
        )
    )


# ----------------- q387 partition conductance of the near-dup graph


@register(
    "q387_dedup_partition_conductance",
    oracle=f"""
    WITH {_minhash_pairs_ctes()},
    src AS (SELECT doc_id, source FROM documents),
    edges AS (
      SELECT p.doc_a, p.doc_b, sa.source AS src_a, sb.source AS src_b
      FROM pairs p
      JOIN src sa ON sa.doc_id = p.doc_a
      JOIN src sb ON sb.doc_id = p.doc_b
    ),
    tot AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS vol_all FROM edges),
    per AS (
      SELECT source,
             CAST(SUM(deg) AS BIGINT) AS vol,
             CAST(SUM(cut) AS BIGINT) AS cut
      FROM (
        SELECT src_a AS source,
               CASE WHEN src_a = src_b THEN 2 ELSE 1 END AS deg,
               CASE WHEN src_a = src_b THEN 0 ELSE 1 END AS cut
        FROM edges WHERE src_a = src_b
        UNION ALL
        SELECT src_a, 1, 1 FROM edges WHERE src_a <> src_b
        UNION ALL
        SELECT src_b, 1, 1 FROM edges WHERE src_a <> src_b
      ) GROUP BY source
    )
    SELECT p.source,
           p.vol AS volume,
           p.cut AS cut_edges,
           (FLOOR(CAST(CAST(p.cut AS DOUBLE)
                 / NULLIF(CAST(LEAST(p.vol, t.vol_all - p.vol) AS DOUBLE),
                          0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS conductance
    FROM per p CROSS JOIN tot t
    """,
)
def q387_dedup_partition_conductance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conductance of the SOURCE partition over the verified near-dup
    graph — the graph-cut score for "do my corpus shards respect
    duplicate structure": phi(S) = cut(S) / min(vol(S), vol(V\\S))
    per source block, where the graph is q62's MinHash+LSH pair set.
    Low conductance means duplicates stay within a source (dedup can
    run shard-local, the 100 TB win); high conductance means
    cross-source duplication forces the global join. Complements
    q321 (modularity scores a COMMUNITY assignment) and q124 (vocab
    overlap measures CONTENT similarity, not duplicate edges).

    All counts are integers off the reduced edge list (degree = 2
    per intra edge, 1 per endpoint of a cut edge; vol(V) = 2|E|);
    the division is one exact ratio per source, NULLIF-guarded for
    isolated blocks.

    Scale: rides the bucketed pair generation (capped buckets, no
    quadratic stage); the conductance arithmetic is
    source-cardinality.
    """
    pairs = _minhash_pairs(spark, sf_dir)
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    edges = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("src_a"),
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("src_b"),
            ),
            "doc_b",
        )
    )
    tot = edges.agg(
        (2 * F.count(F.lit(1))).cast("bigint").alias("vol_all")
    )
    intra = edges.filter(F.col("src_a") == F.col("src_b")).select(
        F.col("src_a").alias("source"),
        F.lit(2).alias("deg"),
        F.lit(0).alias("cut"),
    )
    cut_a = edges.filter(F.col("src_a") != F.col("src_b")).select(
        F.col("src_a").alias("source"),
        F.lit(1).alias("deg"),
        F.lit(1).alias("cut"),
    )
    cut_b = edges.filter(F.col("src_a") != F.col("src_b")).select(
        F.col("src_b").alias("source"),
        F.lit(1).alias("deg"),
        F.lit(1).alias("cut"),
    )
    per = (
        intra.unionByName(cut_a)
        .unionByName(cut_b)
        .groupBy("source")
        .agg(
            F.sum("deg").cast("bigint").alias("volume"),
            F.sum("cut").cast("bigint").alias("cut_edges"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "volume",
        "cut_edges",
        dround(
            F.col("cut_edges").cast("double")
            / F.nullif(
                F.least(
                    F.col("volume"), F.col("vol_all") - F.col("volume")
                ).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("conductance"),
    )


# ------------------- q394 train/held-out near-dup leakage audit


@register(
    "q394_split_leakage_audit",
    oracle=f"""
    WITH {{pairs_ctes}},
    hsets AS (
      SELECT doc_id, md5(shingle) AS h FROM sh
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM hsets GROUP BY doc_id
    ),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN hsets a ON a.doc_id = p.doc_a
      JOIN hsets b ON b.doc_id = p.doc_b AND b.h = a.h
      GROUP BY p.doc_a, p.doc_b
    ),
    verified AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
            >= 0.5
    ),
    assigned AS (
      SELECT doc_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 7) AS BIGINT) % 10 < 8
                  THEN 'train' ELSE 'heldout' END AS split
      FROM documents
    ),
    flagged AS (
      SELECT v.doc_a, v.doc_b, aa.split AS sa, ab.split AS sb,
             CASE WHEN aa.split <> ab.split THEN 1 ELSE 0 END AS leaked,
             CASE WHEN aa.split <> ab.split THEN
               (CASE WHEN aa.split = 'heldout' THEN v.doc_a
                     ELSE v.doc_b END) END AS tainted_doc
      FROM verified v
      JOIN assigned aa ON aa.doc_id = v.doc_a
      JOIN assigned ab ON ab.doc_id = v.doc_b
    ),
    pair_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
             CAST(COALESCE(SUM(leaked), 0) AS BIGINT) AS n_leaked_pairs,
             CAST(COUNT(DISTINCT tainted_doc) AS BIGINT)
               AS n_tainted_heldout_docs
      FROM flagged
    ),
    doc_stats AS (
      SELECT CAST(SUM(CASE WHEN split = 'heldout' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_heldout_docs
      FROM assigned
    )
    SELECT p.n_dup_pairs, p.n_leaked_pairs,
           (FLOOR(CAST(CAST(p.n_leaked_pairs AS DOUBLE)
                 / NULLIF(p.n_dup_pairs, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS leak_rate,
           d.n_heldout_docs, p.n_tainted_heldout_docs,
           (FLOOR(CAST(CAST(p.n_tainted_heldout_docs AS DOUBLE)
                 / NULLIF(d.n_heldout_docs, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS taint_rate
    FROM pair_stats p, doc_stats d
    """.format(pairs_ctes=_minhash_pairs_ctes()),
)
def q394_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/held-out near-duplicate LEAKAGE audit — the eval-
    integrity gate run before any benchmark number is trusted: hash
    every document into q88's deterministic 80/20 split, then count
    verified near-dup pairs (q140's LSH-candidates -> exact-Jaccard
    >= 0.5 stage) that CROSS the split boundary. A held-out document
    with a training-set near-twin inflates eval scores without any
    exact-match contamination check firing; this op measures exactly
    that blind spot (leak_rate over dup pairs, taint_rate over the
    held-out set). The remediation — cluster-aware splitting (q64's
    components assigned as units) — is certified by re-running this
    audit and expecting 0.

    Determinism: split membership is the q88 pure key hash; the pair
    set is q62/q140's hash-derived candidates with exact integer
    Jaccard; all outputs are exact counts plus two NULLIF-guarded
    grid-rounded ratios.

    Scale: everything is the q140 plan (signatures once, banded
    bucket join, candidate-only verification) plus one broadcast-
    sized two-column split join and a global reduce — no new shuffle
    wider than the pair set itself.
    """
    pairs = q140_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    split_col = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7
                ),
                16,
                10,
            ).cast("long"),
            F.lit(10),
        )
        < 8,
        F.lit("train"),
    ).otherwise(F.lit("heldout"))
    assigned = t(spark, sf_dir, "documents").select(
        "doc_id", split_col.alias("split")
    )
    aa = assigned.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    ab = assigned.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    flagged = (
        pairs.join(aa, "doc_a")
        .join(ab, "doc_b")
        .select(
            F.when(F.col("sa") != F.col("sb"), 1).otherwise(0).alias("leaked"),
            F.when(
                F.col("sa") != F.col("sb"),
                F.when(F.col("sa") == "heldout", F.col("doc_a")).otherwise(
                    F.col("doc_b")
                ),
            ).alias("tainted_doc"),
        )
    )
    pair_stats = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"),
        F.coalesce(F.sum("leaked"), F.lit(0)).cast("bigint").alias(
            "n_leaked_pairs"
        ),
        F.countDistinct("tainted_doc").cast("bigint").alias(
            "n_tainted_heldout_docs"
        ),
    )
    doc_stats = assigned.agg(
        F.sum(F.when(F.col("split") == "heldout", 1).otherwise(0))
        .cast("bigint")
        .alias("n_heldout_docs")
    )
    return pair_stats.crossJoin(F.broadcast(doc_stats)).select(
        "n_dup_pairs",
        "n_leaked_pairs",
        dround(
            F.col("n_leaked_pairs").cast("double")
            / F.nullif(F.col("n_dup_pairs"), F.lit(0)),
            6,
        ).alias("leak_rate"),
        "n_heldout_docs",
        "n_tainted_heldout_docs",
        dround(
            F.col("n_tainted_heldout_docs").cast("double")
            / F.nullif(F.col("n_heldout_docs"), F.lit(0)),
            6,
        ).alias("taint_rate"),
    )


# ---------- q396 sketch-space source-overlap matrix + exact audit


@register(
    "q396_source_overlap_matrix",
    oracle=f"""
    WITH {{shingle_ctes}},
    srcsh AS (
      SELECT DISTINCT d.source, md5(s.shingle) AS h
      FROM sh s JOIN documents d ON d.doc_id = s.doc_id
    ),
    sizes AS (
      SELECT source, COUNT(*) AS n FROM srcsh GROUP BY source
    ),
    sigs AS (
      SELECT source,
        {", ".join(
            f"MIN(CAST('0x' || substr(h, {i * 4 + 1}, 4) AS BIGINT))"
            f" AS m{i}" for i in range(8))}
      FROM srcsh GROUP BY source
    ),
    common AS (
      SELECT a.source AS sa, b.source AS sb, COUNT(*) AS c
      FROM srcsh a JOIN srcsh b
        ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           (FLOOR(CAST(({" + ".join(
               f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
               for i in range(8))}) / 8.0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS est_jaccard,
           (FLOOR(CAST(CAST(COALESCE(c.c, 0) AS DOUBLE)
                 / (na.n + nb.n - COALESCE(c.c, 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS exact_jaccard,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           CAST(COALESCE(c.c, 0) AS BIGINT) AS n_common
    FROM sigs a
    JOIN sigs b ON a.source < b.source
    JOIN sizes na ON na.source = a.source
    JOIN sizes nb ON nb.source = b.source
    LEFT JOIN common c ON c.sa = a.source AND c.sb = b.source
    """.format(shingle_ctes=_sql_shingles(3)),
)
def q396_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source shingle-overlap matrix, SKETCH estimate and
    exact certification side by side — the corpus-composition
    question ('which feeds duplicate each other?') answered at the
    source grain before any doc-level dedup runs: per source, an
    8-component MinHash signature over the distinct 3-shingle set
    (64 bytes per source, mergeable — at 100 TB each ingest shard
    MINs its own partial signature and a k-row reduce finishes);
    est_jaccard = matching-component share, certified against the
    exact source-grain Jaccard from the inverted-index join. The
    source-grain complement of q387 (conductance of the doc-level
    near-dup graph) and q124 (vocab overlap): shingle-set overlap
    catches shared PASSAGES, not just shared words.

    Determinism: signatures are MINs of md5-chunk integers (exact,
    order-free); both Jaccards are exact integer ratios on the 1e-6
    grid.

    Scale: the sketch side is one map-side MIN reduce to |sources|
    rows then a broadcast-sized |sources|^2 join; the exact side's
    shingle-hash equi-join fans out at most C(|sources|, 2) rows per
    distinct hash (srcsh is DISTINCT per source), so it is bounded
    by source count, never corpus size — and at petabyte scale the
    exact stage is the audit you run on a sample while the sketch
    runs on everything.
    """
    sh = _shingle_df(spark, sf_dir, 3)
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    srcsh = (
        sh.join(src, "doc_id")
        .select("source", F.md5(F.col("shingle").cast("binary")).alias("h"))
        .distinct()
    )
    sizes = srcsh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sigs = srcsh.groupBy("source").agg(
        *[
            F.min(
                F.conv(F.substring("h", i * 4 + 1, 4), 16, 10).cast("long")
            ).alias(f"m{i}")
            for i in range(8)
        ]
    )
    a = sigs.select(
        F.col("source").alias("source_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(8)],
    )
    b = sigs.select(
        F.col("source").alias("source_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(8)],
    )
    common = (
        srcsh.alias("x")
        .join(
            srcsh.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(8)
    )
    na = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    cc = F.coalesce(F.col("c"), F.lit(0))
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .join(F.broadcast(common), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            dround(matches / F.lit(8.0), 6).alias("est_jaccard"),
            dround(
                cc.cast("double") / (F.col("n_a") + F.col("n_b") - cc), 6
            ).alias("exact_jaccard"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            cc.cast("bigint").alias("n_common"),
        )
    )
