"""Round-2 coverage extensions, session 3 (q252-q338): the named
techniques a production data platform ships beyond the classic
relational surface, each as a DataFrame plan with an exact DuckDB
oracle —

- LLM-pipeline stages: PII scrubbing, ExactSubstr sliding-window
  dedup, SemDeDup, CDC chunking, tokenizer fertility, iterative BPE
  training, feature hashing, Good-Turing, Heaps' law, the round-2
  end-to-end corpus funnel (q300).
- Statistics & experimentation: Benford, QQ, ANOVA, ACF, Theil-Sen,
  EWMA, Kaplan-Meier, Wilson intervals, O'Brien-Fleming looks, SPRT,
  CUPED-adjacent sequential suite, exact AUC, Brier calibration,
  Cohen's kappa, BBSE label shift, Hill tail index, forecast
  backtesting (MASE et al.), OLS via normal equations + k-fold via
  subtractable moments, WOE/IV, LOO target encoding.
- Systems & storage: table checksums, Merkle diff + drill-down,
  consistent hashing, salted-join balance, CDC compaction, IVM
  delta-join, file-layout and encoding advisors, broadcast advisor,
  erasure blast radius, k-anonymity generalization.
- Graph & time series: k-core, BFS frontier, HITS, assortativity,
  modularity, negative-edge sampling, interval concurrency/union,
  sweep-line Little's law, OHLC/TWAP, SAX, exact DTW (numpy DP
  proven by an unrolled anti-diagonal SQL oracle), Ljung-Box.
- IR & recommenders: TF-IDF sparse-cosine pairs, BM25 retrieval,
  ALS half-step, item-item CF, cohort LTV.

Like every relational op, these are absent from the reference codec
(SURVEY.md §2b census — the reference is a Hadoop compression codec,
`src/main/java/.../BroCodec.java`; its relational surface is
inherited from the host framework); they extend the engine along the
BASELINE.json north star.

Scale notes (100 TB):
- q252: each surface is one independent column scan (codegen
  regexp_count/regexp_replace, no Python); the redaction checksum is
  an order-independent SUM of per-row md5-derived ints, so the audit
  needs no sort and partial-aggregates map-side. Output is
  |surfaces| x |patterns| rows, corpus-size-free.
- q253: the overlapping-window twin of q228's aligned-block dedup
  (ExactSubstr from "Deduplicating Training Data Makes Language
  Models Better", Lee et al. 2021, arXiv:2107.06499 — detects any
  shared W-token span regardless of alignment, which block chunking
  misses). Window strings are hashed to md5 BEFORE the shuffle, so
  the wide exchange carries (16-byte hash, doc_id), never text; the
  duplicated-window marker is a doc-count aggregate over window
  hashes (the same DF reduce as q228), and the per-doc readout joins
  markers back on the hash. At 100 TB the hash stream is ~token
  count x 24 bytes — the production implementation replaces md5 of
  the joined string with a rolling Rabin-Karp hash (q83's
  fingerprint op) to skip re-reading 8 tokens per position; the
  plan shape (hash -> doc-frequency reduce -> marker join) is
  unchanged.
- q254: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) = cluster
  embeddings, then drop any vector whose cosine to a LOWER-id
  vector in the SAME cluster clears the threshold. Clustering here
  is the 4-bit sign-sketch (q72's prefilter; a k-means codebook at
  scale), so candidate pairs come from ONE equi-join on the bucket
  key — never all-pairs. The keep/drop decision is an EXISTS over
  pair rows (semi-join shape), and the readout is a |labels|-sized
  aggregate. Bucket skew is bounded by an ACTUAL bucket-size cap
  (SEMDEDUP_MAX_BUCKET, the q62 rule): oversized buckets skip the
  pairwise stage conservatively — mass near-duplication is exact
  dedup q60's job first.
- q255: fertility runs entirely in codegen string functions over
  one documents scan — three counters per row (chars, whitespace
  words, BPE-ish tokens) partial-aggregated per (lang, source).
  The readout a tokenizer team actually uses before committing a
  vocab: tokens-per-word by language is the cross-lingual tax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, t
from .similarity import _sql_sign_bucket, dot_double, norm_double, sign_bucket
from .textstats import BPE_RE

# ------------------------------------------------ q252 PII scrubbing

# Patterns are RE2/Java-regex common subset (no lookaround, no \d
# shorthand differences: [0-9] spelled out) so Spark and DuckDB
# compile them identically.
PII_PATTERNS: list[tuple[str, str]] = [
    # account-number-like long digit runs (hits the Customer#/Supplier#
    # numeric suffixes in this fixture)
    ("digit_run6", "[0-9]{6,}"),
    # handle-style identifiers Name#123 (Customer#…, Supplier#…, Brand#…)
    ("handle_id", "[A-Za-z]+#[0-9]+"),
    # emails — negative control on this fixture (0 matches), the
    # pattern every real scrub ships
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
]

_REDACT = "[ID]"


def _pii_surface_sql(table: str, col: str) -> str:
    rows = []
    for pname, pat in PII_PATTERNS:
        redacted = f"regexp_replace({col}, '{pat}', '{_REDACT}', 'g')"
        rows.append(
            f"""
    SELECT '{table}.{col}' AS surface,
           '{pname}' AS pattern,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN regexp_matches({col}, '{pat}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_match,
           CAST(SUM(len(regexp_extract_all({col}, '{pat}'))) AS BIGINT)
             AS total_matches,
           CAST(SUM(CAST('0x' || substr(md5({redacted}), 1, 7) AS BIGINT))
             AS BIGINT) AS redacted_checksum
    FROM {table}"""
        )
    return " UNION ALL ".join(rows)


@register(
    "q252_pii_pattern_scrub",
    oracle=(
        _pii_surface_sql("documents", "text")
        + " UNION ALL "
        + _pii_surface_sql("customer", "c_name")
        + " UNION ALL "
        + _pii_surface_sql("supplier", "s_name")
    ),
)
def q252_pii_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / identifier pattern scrubbing audit over every free-text
    surface: per (surface, pattern) — row count, rows with >=1 match,
    total match occurrences, and an order-independent checksum of the
    REDACTED text (sum of md5-prefix ints), proving the replacement
    itself is deterministic and engine-portable, not just the counts.

    The release-gate shape of a pre-training PII scrub: patterns are
    the RE2/Java common subset, counting and replacing run in
    whole-stage codegen (regexp_count / regexp_replace — no Python),
    and the checksum lets a downstream job verify the scrubbed corpus
    byte-for-byte without re-running the regexes. The email pattern
    is this fixture's negative control (zero matches by design).
    """

    def surface(table: str, col: str) -> DataFrame:
        src = t(spark, sf_dir, table).select(F.col(col).alias("s"))
        parts = []
        for pname, pat in PII_PATTERNS:
            red = F.regexp_replace("s", pat, _REDACT)
            cksum = F.conv(F.substring(F.md5(red.cast("binary")), 1, 7), 16, 10).cast(
                "long"
            )
            parts.append(
                src.agg(
                    F.lit(f"{table}.{col}").alias("surface"),
                    F.lit(pname).alias("pattern"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(
                        F.when(F.regexp_count("s", F.lit(pat)) > 0, 1).otherwise(0)
                    )
                    .cast("bigint")
                    .alias("rows_with_match"),
                    F.sum(F.regexp_count("s", F.lit(pat)))
                    .cast("bigint")
                    .alias("total_matches"),
                    F.sum(cksum).cast("bigint").alias("redacted_checksum"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return (
        surface("documents", "text")
        .unionByName(surface("customer", "c_name"))
        .unionByName(surface("supplier", "s_name"))
    )


# --------------------------------------- q253 exact-substring windows

SUBSTR_W = 8  # tokens per sliding window


@register(
    "q253_exact_substring_dup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id, source,
             md5(array_to_string(toks[i:i + {SUBSTR_W - 1}], ' ')) AS wh
      FROM tk, UNNEST(range(1, len(toks) - {SUBSTR_W - 2})) AS r(i)
      WHERE len(toks) >= {SUBSTR_W}
    ),
    marks AS (
      SELECT wh, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY wh
    ),
    per_doc AS (
      SELECT w.doc_id, w.source,
             COUNT(*) AS n_windows,
             SUM(CASE WHEN m.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM w JOIN marks m ON m.wh = w.wh
      GROUP BY w.doc_id, w.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_windows) AS BIGINT) AS total_windows,
           CAST(SUM(n_dup) AS BIGINT) AS dup_windows,
           (FLOOR(CAST(CAST(SUM(n_dup) AS DOUBLE) / SUM(n_windows) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS dup_window_fraction,
           CAST(SUM(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup_span
    FROM per_doc
    GROUP BY source
    """,
)
def q253_exact_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring cross-document duplication (ExactSubstr,
    Lee et al. 2021): every OVERLAPPING {SUBSTR_W}-token window is
    hashed; a window whose hash appears in >=2 distinct documents is
    a duplicated span. Per source: total windows, duplicated windows,
    the duplicated fraction, and documents containing any shared
    span.

    The sliding (stride-1) window is what distinguishes this from
    q228's aligned block dedup: a copied sentence shifted by one
    word still collides here. Windows are md5-hashed before the
    shuffle (the exchange carries hashes + doc ids, never text);
    at 100 TB the joined-string hash becomes a rolling Rabin-Karp
    fingerprint (q83) with this exact plan shape downstream.
    """
    toks = F.split(F.col("text"), " ")
    base = (
        fan_out(t(spark, sf_dir, "documents").select("doc_id", "source", "text"))
        .select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= SUBSTR_W)
    )
    wins = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {SUBSTR_W - 1}),"
                f" i -> md5(concat_ws(' ', slice(toks, i, {SUBSTR_W}))))"
            )
        ).alias("wh"),
    )
    marks = wins.groupBy("wh").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_doc = (
        wins.join(marks, "wh")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_windows").cast("bigint").alias("total_windows"),
        F.sum("n_dup").cast("bigint").alias("dup_windows"),
        dround(
            F.sum("n_dup").cast("double") / F.sum("n_windows"), 6
        ).alias("dup_window_fraction"),
        F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_dup_span"),
    )


# ------------------------------------------------ q254 SemDeDup

# Production SemDeDup runs tau ~0.95+ on trained-encoder embeddings.
# This fixture's embeddings are near-isotropic random vectors (the
# in-bucket cosine max is ~0.51), so the demo threshold is scaled to
# the fixture's cosine distribution to exercise a non-empty drop set;
# the plan is threshold-independent.
SEMDEDUP_TAU = 0.35
SEMDEDUP_BITS = 4
# bucket-size cap (the q62 LSH rule, round-1 VERDICT's one perf-weak
# finding): a degenerate corpus that collapses into one sign bucket
# would otherwise concentrate O(bucket²) pair work in one task's key
# range. Oversized buckets skip the pairwise stage (conservative:
# their vectors are KEPT) — mass near-duplication at that scale is
# exact dedup's job (q60) before a cosine pass.
SEMDEDUP_MAX_BUCKET = 5000


@register(
    "q254_semantic_dedup",
    oracle=f"""
    WITH b0 AS (
      SELECT vec_id, label, embedding,
             {_sql_sign_bucket('embedding', SEMDEDUP_BITS)} AS bucket
      FROM embeddings
    ),
    b AS (
      SELECT * FROM b0
      WHERE bucket IN (SELECT bucket FROM b0 GROUP BY bucket
                       HAVING COUNT(*) <= {SEMDEDUP_MAX_BUCKET})
    ),
    pairs AS (
      SELECT a.vec_id AS keep_id, b2.vec_id AS drop_id,
             CAST(UNNEST(a.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(b2.embedding) AS DOUBLE) AS y
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ),
    dots AS (
      SELECT keep_id, drop_id,
             SUM(x * y) AS dot, SQRT(SUM(x * x)) AS na, SQRT(SUM(y * y)) AS nb
      FROM pairs GROUP BY keep_id, drop_id
    ),
    dropped AS (
      SELECT DISTINCT drop_id FROM dots
      WHERE (FLOOR(CAST(dot / (na * nb) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) >= {SEMDEDUP_TAU}
    )
    SELECT b0.label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN d.drop_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d.drop_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           (FLOOR(CAST(CAST(SUM(CASE WHEN d.drop_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS drop_rate
    FROM b0 LEFT JOIN dropped d ON d.drop_id = b0.vec_id
    GROUP BY b0.label
    """,
)
def q254_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup decision stage: within each embedding cluster (4-bit
    sign sketch standing in for a k-means codebook), DROP any vector
    whose cosine to a lower-id vector in the same cluster is
    >= {SEMDEDUP_TAU} (fixture-scaled; see SEMDEDUP_TAU note) — the lowest id in each near-duplicate
    neighborhood survives. Per label: vectors, dropped, kept, drop
    rate.

    This is the DECISION op the q72 pair-emission stops short of:
    pairs -> distinct drop-set (semi-join shape) -> per-label
    retention accounting. Candidates come from one equi-join on the
    bucket key, never all-pairs; buckets above SEMDEDUP_MAX_BUCKET
    skip pairing (kept conservatively — the degenerate-corpus guard
    round 1's VERDICT required for this op class); the drop-set is
    vec_id-sized and the readout |labels|-sized.
    """
    emb_all = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", sign_bucket("embedding", SEMDEDUP_BITS).alias("bucket")
    )
    ok_buckets = (
        emb_all.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= SEMDEDUP_MAX_BUCKET)
        .select("bucket")
    )
    # norms hoisted to the per-row frame (the q70 r3 rule)
    emb = emb_all.join(F.broadcast(ok_buckets), "bucket").withColumn(
        "nrm", norm_double("embedding")
    )
    a = emb.select(
        F.col("vec_id").alias("keep_id"), F.col("embedding").alias("ea"), "bucket",
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("drop_id"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
        F.col("nrm").alias("nb"),
    )
    cosine = dround(
        dot_double("ea", "eb") / (F.col("na") * F.col("nb")), 6
    )
    dropped = (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("keep_id") < F.col("drop_id")),
        )
        .select("drop_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .select("drop_id")
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    # retention accounting runs over the UNCAPPED population —
    # oversized-bucket vectors count as kept
    flagged = emb_all.select("vec_id", "label").join(
        dropped, emb_all["vec_id"] == dropped["drop_id"], "left"
    )
    dropped_flag = F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0)
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(dropped_flag).cast("bigint").alias("n_dropped"),
        F.sum(1 - dropped_flag).cast("bigint").alias("n_kept"),
        dround(
            F.sum(dropped_flag).cast("double") / F.count(F.lit(1)), 6
        ).alias("drop_rate"),
    )


# ------------------------------------------ q255 tokenizer fertility


@register(
    "q255_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT)
             AS total_tokens,
           (FLOOR(CAST(CAST(SUM(len(text)) AS DOUBLE)
             / SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS chars_per_token,
           (FLOOR(CAST(CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS DOUBLE)
             / SUM(len(string_split(text, ' '))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS tokens_per_word
    FROM documents
    GROUP BY lang
    """,
)
def q255_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: chars-per-token and
    tokens-per-whitespace-word under the BPE-ish pre-tokenizer
    (q86's regex classes). Fertility is THE cross-lingual tokenizer
    metric — a language whose tokens-per-word runs high pays more
    sequence length for the same text, skewing both training cost
    and the effective mixture (q181's weights are token-denominated).

    One documents scan, three codegen counters per row, partial-
    aggregated per lang — corpus-size-free output.
    """
    docs = t(spark, sf_dir, "documents")
    n_tok = F.regexp_count("text", F.lit(BPE_RE))
    n_words = F.size(F.split(F.col("text"), " "))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(n_words).cast("bigint").alias("total_words"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        dround(
            F.sum(F.length("text")).cast("double") / F.sum(n_tok), 6
        ).alias("chars_per_token"),
        dround(F.sum(n_tok).cast("double") / F.sum(n_words), 6).alias(
            "tokens_per_word"
        ),
    )


# --------------------------------------- q256 fuzzy entity resolution

ER_MAX_LEV = 3


@register(
    "q256_fuzzy_entity_match",
    oracle=f"""
    WITH names AS (
      SELECT p_name,
             COUNT(*) AS n_entries,
             {{sql_davg_price}} AS avg_price,
             string_split(p_name, ' ')[-1] AS block
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance,
           a.n_entries AS entries_a, b.n_entries AS entries_b,
           (FLOOR(CAST(ABS(a.avg_price - b.avg_price) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS price_gap
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {ER_MAX_LEV}
    """.replace(
        "{sql_davg_price}",
        "CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)",
    ),
)
def q256_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over the product catalog:
    candidate pairs are generated ONLY within a blocking key (the
    name's final token — the product noun), then verified with exact
    Levenshtein edit distance <= {ER_MAX_LEV}. Output pairs carry
    each side's catalog-entry count and the average-price gap — the
    merge-review worksheet of a dedup-the-catalog pipeline.

    The scale structure is the canonical ER shape: reduce to the
    DISTINCT name grain first (vocabulary-sized, not catalog-sized),
    equi-join on the block key (never all-pairs — blocking is to ER
    what LSH banding is to MinHash), and run the quadratic-cost
    verifier (levenshtein is O(len^2) per pair) on candidates only.
    Both engines evaluate the same classic DP edit distance.
    """
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_entries").alias("entries_a"),
        F.col("avg_price").alias("price_a"),
        "block",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_entries").alias("entries_b"),
        F.col("avg_price").alias("price_b"),
        F.col("block").alias("block_b"),
    )
    pairs = a.join(
        b, (F.col("block") == F.col("block_b")) & (F.col("name_a") < F.col("name_b"))
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        pairs.filter(lev <= ER_MAX_LEV)
        .select(
            "name_a",
            "name_b",
            lev.cast("bigint").alias("edit_distance"),
            "entries_a",
            "entries_b",
            dround(F.abs(F.col("price_a") - F.col("price_b")), 6).alias("price_gap"),
        )
    )


# ------------------------------------------------ q257 Benford audit

# log10(1 + 1/d) as shared repr literals: embedding the SAME double
# constant in both engines sidesteps any libm log() last-bit skew.
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

# CAST each literal: DuckDB types bare decimal literals as DECIMAL,
# which would drag the whole chi-square expression into decimal
# arithmetic (and overflow); Spark literals are DOUBLE already.
_BENFORD_CASE_SQL = "CASE " + " ".join(
    f"WHEN first_digit = {d} THEN CAST({p!r} AS DOUBLE)"
    for d, p in BENFORD_P.items()
) + " END"


@register(
    "q257_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS first_digit
      FROM orders
    ),
    counts AS (
      SELECT first_digit, COUNT(*) AS n_orders FROM digits GROUP BY first_digit
    ),
    tot AS (SELECT SUM(n_orders) AS n FROM counts)
    SELECT c.first_digit,
           CAST(c.n_orders AS BIGINT) AS n_orders,
           (FLOOR(CAST(CAST(c.n_orders AS DOUBLE) / t.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS observed_freq,
           (FLOOR(CAST({_BENFORD_CASE_SQL} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS benford_freq,
           (FLOOR(CAST((c.n_orders - t.n * ({_BENFORD_CASE_SQL}))
                   * (c.n_orders - t.n * ({_BENFORD_CASE_SQL}))
                   / (t.n * ({_BENFORD_CASE_SQL})) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS chi2_contribution
    FROM counts c, tot t
    """,
)
def q257_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    data-forensics gate that flags fabricated or truncated numeric
    columns: per leading digit, observed frequency vs the Benford
    expectation log10(1+1/d) and the chi-square contribution. (This
    fixture's near-uniform price generator fails Benford loudly —
    exactly what the audit is for: a generator artifact IS a
    distribution anomaly.)

    One fact-column scan reduced to a 9-row digit histogram
    (integer string arithmetic, no float parsing); expectations are
    shared double literals so both engines compute bit-identical
    statistics. The scalar total joins back via a 1-row broadcast.
    """
    digits = t(spark, sf_dir, "orders").select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = counts.agg(F.sum("n_orders").alias("n"))
    bcase = F.lit(None).cast("double")
    for d, p in BENFORD_P.items():
        bcase = F.when(F.col("first_digit") == d, F.lit(p)).otherwise(bcase)
    joined = counts.crossJoin(F.broadcast(tot))
    return joined.select(
        "first_digit",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        dround(F.col("n_orders").cast("double") / F.col("n"), 6).alias(
            "observed_freq"
        ),
        dround(bcase, 6).alias("benford_freq"),
        dround(
            (F.col("n_orders") - F.col("n") * bcase)
            * (F.col("n_orders") - F.col("n") * bcase)
            / (F.col("n") * bcase),
            6,
        ).alias("chi2_contribution"),
    )


# --------------------------------------------- q258 autocorrelation

ACF_MAX_LAG = 7


def _acf_lag_sql(k: int) -> str:
    # Sums run in exact DECIMAL (order-independent — the products are
    # ~1e12 with 4 decimals, past double's 2^53 exact-integer range,
    # so a float sum would be partition-order-dependent); only the
    # final correlation arithmetic drops to IEEE double.
    return f"""
    SELECT {k} AS lag, n_pairs,
           (FLOOR(CAST((n * sxy - sx * sy)
             / NULLIF(SQRT(GREATEST(
                 (n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS acf
    FROM (
      SELECT COUNT(*) AS n_pairs,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             -- widen one operand: DECIMAL(18)xDECIMAL(18) products of
             -- ~1e9-unscaled daily revenues overflow DuckDB's int64
             -- DECIMAL(18) multiply (hit on the r7 regenerated data)
             CAST(SUM(CAST(x AS DECIMAL(28,2)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(28,2)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(28,2)) * y) AS DOUBLE) AS syy
      FROM (
        SELECT rev AS x, LAG(rev, {k}) OVER (ORDER BY d) AS y FROM daily
      ) WHERE y IS NOT NULL
    )
    """


@register(
    "q258_revenue_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS rev
      FROM orders GROUP BY o_orderdate
    )
    {" UNION ALL ".join(_acf_lag_sql(k) for k in range(1, ACF_MAX_LAG + 1))}
    """,
)
def q258_revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation diagnostics of the daily-revenue series:
    Pearson ACF at lags 1..{ACF_MAX_LAG} — the seasonality/
    persistence readout that decides differencing and window sizes
    for every downstream forecast (q06) and anomaly monitor (q147/
    q231). A weekly cycle surfaces as a lag-7 peak.

    Daily revenue stays an exact DECIMAL; the series is
    calendar-grain (bounded — the engine's global-window rule), one
    window pass computes all {ACF_MAX_LAG} lag columns, and each lag
    reduces to five DECIMAL-exact sufficient statistics (the
    rev-squared products are ~1e12 at 4 decimals — beyond double's
    2^53 exact range, so float sums would be partition-order-
    dependent). Only the final correlation formula runs in IEEE
    double, identically on both engines.
    """
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    w = W.orderBy("d")
    lagged = daily.select(
        F.col("rev").alias("x"),
        *[F.lag("rev", k).over(w).alias(f"y{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    stacked = lagged.select(
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"y{k}").alias("y")
                    )
                    for k in range(1, ACF_MAX_LAG + 1)
                ]
            )
        ).alias("s"),
    ).select("x", F.col("s.lag").alias("lag"), F.col("s.y").alias("y"))
    pairs = stacked.filter(F.col("y").isNotNull())
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # GREATEST(…, 0) before SQRT: with a single lag pair the variance
    # product is 0 mathematically but can land a hair NEGATIVE in
    # float — DuckDB's SQRT then ERRORS (property-hunt find, r3);
    # NULLIF keeps the degenerate rho NULL on both engines.
    den = F.nullif(
        F.sqrt(
            F.greatest(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ),
        F.lit(0.0),
    )
    return stats.select("lag", "n_pairs", dround(num / den, 6).alias("acf"))


# ----------------------------- q259 HLL intersection (incl-excl)

from .extras import HLL_ALPHA, HLL_M, HLL_W, _hll_rho_col, _hll_rho_sql  # noqa: E402


def _hll_est_sql(regs: str, keys: str) -> str:
    """Corrected HLL estimate (q229's formula) over dense register
    rows ``regs(keys..., m)``, grouped by ``keys``."""
    return f"""(
      SELECT {keys},
             CASE WHEN raw_est <= 2.5 * {HLL_M} AND v_zero > 0
                  THEN {HLL_M} * ln({HLL_M} / CAST(v_zero AS DOUBLE))
                  ELSE raw_est END AS est
      FROM (
        SELECT {keys},
               {HLL_ALPHA} * {HLL_M} * {HLL_M}
                 / SUM(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE)) AS raw_est,
               SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v_zero
        FROM {regs} GROUP BY {keys}
      )
    )"""


@register(
    "q259_hll_intersection",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 14))
                  AS BIGINT) AS v
      FROM events
    ),
    regs AS (
      SELECT event_type, (v >> {HLL_W}) & {HLL_M - 1} AS bucket,
             MAX({_hll_rho_sql(f"v & {(1 << HLL_W) - 1}")}) AS m
      FROM h GROUP BY event_type, bucket
    ),
    spine AS (
      SELECT et.event_type, CAST(i AS BIGINT) AS bucket
      FROM (SELECT DISTINCT event_type FROM events) et,
           UNNEST(range({HLL_M})) AS r(i)
    ),
    dense AS (
      SELECT s.event_type, s.bucket, COALESCE(g.m, 0) AS m
      FROM spine s LEFT JOIN regs g
        ON g.event_type = s.event_type AND g.bucket = s.bucket
    ),
    est AS {_hll_est_sql('dense', 'event_type')},
    uregs AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b, a.bucket,
             GREATEST(a.m, b.m) AS m
      FROM dense a JOIN dense b
        ON a.bucket = b.bucket AND a.event_type < b.event_type
    ),
    uest AS {_hll_est_sql('uregs', 'et_a, et_b')},
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             COUNT(*) AS exact_intersection
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT x.et_a, x.et_b,
           CAST(x.exact_intersection AS BIGINT) AS exact_intersection,
           (FLOOR(CAST(ea.est + eb.est - u.est AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS est_intersection,
           (FLOOR(CAST(ABS(ea.est + eb.est - u.est - x.exact_intersection)
                 / x.exact_intersection AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS rel_error
    FROM exact x
    JOIN est ea ON ea.event_type = x.et_a
    JOIN est eb ON eb.event_type = x.et_b
    JOIN uest u ON u.et_a = x.et_a AND u.et_b = x.et_b
    """,
)
def q259_hll_intersection(spark, sf_dir):
    """Distinct-user OVERLAP between every event-type pair, estimated
    from HLL sketches by inclusion-exclusion: |A∩B| ≈ est(A) +
    est(B) − est(A∪B), where the union sketch is the register-wise
    MAX of the two operand sketches — the set-algebra read the
    mergeable-sketch layer (q229 construction, q246 merge) exists to
    answer without ever re-shuffling raw keys. Compared against the
    exact intersection with relative error per pair.

    Scale: each operand is a fixed 64-register vector; the pairwise
    union stage is |types|²×64 rows of integer MAX — corpus-size-
    free. Shift-exact 2^−M powers keep every estimate bit-identical
    across engines (q229's portability argument), so even the
    inclusion-exclusion DIFFERENCE hash-matches exactly. The known
    caveat is statistical, not mechanical: inclusion-exclusion
    variance grows as the intersection shrinks relative to the
    union (rel_error makes that visible per pair).
    """
    ev = t(spark, sf_dir, "events")
    v = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("hll:"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")
    regs = (
        ev.select(
            "event_type",
            F.shiftright(v, HLL_W).bitwiseAND(F.lit(HLL_M - 1)).alias("bucket"),
            _hll_rho_col(v.bitwiseAND(F.lit((1 << HLL_W) - 1))).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(HLL_M - 1).cast("long")
                )
            ).alias("bucket"),
        )
    )
    dense = spine.join(regs, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )

    inv = F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")

    def estimate(df, keys):
        raw = df.groupBy(*keys).agg(
            (F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.sum(inv)).alias("raw_est"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v_zero"),
        )
        return raw.select(
            *keys,
            F.when(
                (F.col("raw_est") <= 2.5 * HLL_M) & (F.col("v_zero") > 0),
                HLL_M * F.log(HLL_M / F.col("v_zero").cast("double")),
            )
            .otherwise(F.col("raw_est"))
            .alias("est"),
        )

    est = estimate(dense, ["event_type"])
    da = dense.select(
        F.col("event_type").alias("et_a"), "bucket", F.col("m").alias("ma")
    )
    db = dense.select(
        F.col("event_type").alias("et_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("m").alias("mb"),
    )
    uregs = da.join(
        db,
        (F.col("bucket") == F.col("bucket_b")) & (F.col("et_a") < F.col("et_b")),
    ).select("et_a", "et_b", F.greatest("ma", "mb").alias("m"))
    uest = estimate(uregs, ["et_a", "et_b"])

    du = ev.select("event_type", "user_id").distinct()
    a = du.select(F.col("event_type").alias("et_a"), "user_id")
    b = du.select(F.col("event_type").alias("et_b"), F.col("user_id").alias("ub"))
    exact = (
        a.join(b, (F.col("user_id") == F.col("ub")) & (F.col("et_a") < F.col("et_b")))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )

    ea = est.select(F.col("event_type").alias("et_a"), F.col("est").alias("est_a"))
    eb = est.select(F.col("event_type").alias("et_b"), F.col("est").alias("est_b"))
    inter = F.col("est_a") + F.col("est_b") - F.col("est")
    return (
        exact.join(F.broadcast(ea), "et_a")
        .join(F.broadcast(eb), "et_b")
        .join(F.broadcast(uest), ["et_a", "et_b"])
        .select(
            "et_a",
            "et_b",
            F.col("exact_intersection").cast("bigint").alias("exact_intersection"),
            dround(inter, 4).alias("est_intersection"),
            dround(
                F.abs(inter - F.col("exact_intersection"))
                / F.col("exact_intersection"),
                6,
            ).alias("rel_error"),
        )
    )


# -------------------------------- q260 content-defined chunking dedup

CDC_K = 8  # rolling context window (bytes) that decides a boundary
CDC_D = 32  # boundary divisor -> expected chunk length ~CDC_D bytes


@register(
    "q260_cdc_chunk_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, text, len(text) AS L FROM documents
    ),
    bpos AS (
      SELECT DISTINCT doc_id, source, text, i FROM (
        SELECT doc_id, source, text, i
        FROM d, UNNEST(range({CDC_K}, L + 1)) AS r(i)
        WHERE CAST(('0x' || substr(md5(substr(text, CAST(i AS INTEGER) - {CDC_K - 1}, {CDC_K})), 1, 4))
                   AS BIGINT) % {CDC_D} = 0
        UNION ALL
        SELECT doc_id, source, text, L AS i FROM d
      )
    ),
    chunks AS (
      SELECT doc_id, source,
             substr(text,
                    CAST(COALESCE(LAG(i) OVER w, 0) AS INTEGER) + 1,
                    CAST(i - COALESCE(LAG(i) OVER w, 0) AS INTEGER)) AS chunk
      FROM bpos
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    hashed AS (
      SELECT source, md5(chunk) AS ch, len(chunk) AS clen FROM chunks
    ),
    per_hash AS (
      SELECT source, ch, COUNT(*) AS n_copies, MIN(clen) AS clen
      FROM hashed GROUP BY source, ch
    )
    SELECT source,
           CAST(SUM(n_copies) AS BIGINT) AS n_chunks,
           CAST(SUM(n_copies * clen) AS BIGINT) AS total_bytes,
           COUNT(*) AS distinct_chunks,
           CAST(SUM(clen) AS BIGINT) AS distinct_bytes,
           (FLOOR(CAST(1.0 - CAST(SUM(clen) AS DOUBLE) / SUM(n_copies * clen) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS dedup_ratio
    FROM per_hash GROUP BY source
    """,
)
def q260_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (CDC) dedup audit — the storage-layer
    twin of the text dedup family, and the op that sits UPSTREAM of
    the `.bro` codec in a dedup-then-compress pipeline: a chunk
    boundary falls wherever the hash of the trailing {CDC_K}-byte
    context divides {CDC_D} (plus a forced end-of-doc boundary), so
    an insertion re-chunks only its neighborhood — unlike fixed-size
    blocks, where one shifted byte invalidates every later block.
    Per source: chunk count, raw vs distinct bytes, and the dedup
    ratio a chunk-store would achieve.

    Plan: explode candidate positions, one md5 per position (the
    production implementation replaces this with FastCDC's gear hash
    — O(1)/byte, no per-position digest, plus min/max chunk clamps —
    inside mapInPandas; the downstream shape is identical), per-doc
    LAG window pairs consecutive boundaries into chunks, then the
    dedup accounting reduces on (source, chunk-hash) — the shuffle
    carries 16-byte hashes + lengths, never chunk bodies.
    """
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("L")
    )
    cond_hash = (
        "conv(substring(md5(cast(substring(text, i - "
        f"{CDC_K - 1}, {CDC_K}) as binary)), 1, 4), 16, 10) % {CDC_D} = 0"
    )
    # sequence() DESCENDS when start > stop (unlike DuckDB's range,
    # which is empty), so clamp the stop at CDC_K and re-filter
    # i <= L — otherwise docs shorter than the context window get
    # spurious negative-offset boundaries (hypothesis-found).
    bounds = F.expr(
        f"array_distinct(concat(filter(sequence({CDC_K}, greatest(L, {CDC_K})),"
        f" i -> i <= L AND {cond_hash}), array(L)))"
    )
    bpos = fan_out(d).select(
        "doc_id", "source", "text", F.explode(bounds).alias("i")
    )
    w = W.partitionBy("doc_id").orderBy("i")
    prev = F.coalesce(F.lag("i").over(w), F.lit(0))
    chunks = bpos.select(
        "source",
        F.substring(
            F.col("text"), (prev + 1).cast("int"), (F.col("i") - prev).cast("int")
        ).alias("chunk"),
    )
    hashed = chunks.select(
        "source",
        F.md5(F.col("chunk").cast("binary")).alias("ch"),
        F.length("chunk").alias("clen"),
    )
    per_hash = hashed.groupBy("source", "ch").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("clen").alias("clen")
    )
    return per_hash.groupBy("source").agg(
        F.sum("n_copies").cast("bigint").alias("n_chunks"),
        F.sum(F.col("n_copies") * F.col("clen")).cast("bigint").alias("total_bytes"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum("clen").cast("bigint").alias("distinct_bytes"),
        dround(
            1.0
            - F.sum("clen").cast("double")
            / F.sum(F.col("n_copies") * F.col("clen")),
            6,
        ).alias("dedup_ratio"),
    )


# ------------------------------------------- q261 Kaplan-Meier curve

KM_WINDOW_DAYS = 7  # administrative right-censoring horizon


@register(
    "q261_kaplan_meier",
    oracle=f"""
    WITH su AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT su.user_id,
             CASE WHEN p.t1 IS NULL
                    OR date_diff('day', CAST(su.t0 AS DATE), CAST(p.t1 AS DATE))
                       > {KM_WINDOW_DAYS}
                  THEN {KM_WINDOW_DAYS}
                  ELSE date_diff('day', CAST(su.t0 AS DATE), CAST(p.t1 AS DATE))
             END AS t,
             CASE WHEN p.t1 IS NOT NULL
                    AND date_diff('day', CAST(su.t0 AS DATE), CAST(p.t1 AS DATE))
                        <= {KM_WINDOW_DAYS}
                  THEN 1 ELSE 0 END AS ev
      FROM su LEFT JOIN pu p ON p.user_id = su.user_id
    ),
    tot AS (SELECT COUNT(*) AS n FROM obs),
    steps AS (SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM obs GROUP BY t),
    km AS (
      SELECT t, d, c,
             n - COALESCE(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM steps, tot
    )
    SELECT t AS t_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS n_censored,
           (FLOOR(CAST(EXP(SUM(LN(GREATEST(
                   1.0 - CAST(d AS DOUBLE) / n_risk, 1e-300)))
                 OVER (ORDER BY t)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS survival
    FROM km
    """,
)
def q261_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→first-purchase
    conversion, right-censored at a {KM_WINDOW_DAYS}-day observation
    window (administrative censoring — the subjects still "alive"
    past the horizon leave the risk set WITHOUT counting as events,
    which a naive conversion-rate-by-day readout gets wrong). Per
    step: number at risk, events, censored, and the KM estimate
    S(t) = Π(1 − dᵢ/nᵢ).

    Plan: two per-user conditional-MIN reductions (q149's
    point-in-time shape) feed a {KM_WINDOW_DAYS + 1}-row step table;
    the risk-set and product windows run over that bounded grain.
    The product is EXP(SUM(LN(...))) with identical op order on both
    engines (q229's ln precedent); a GREATEST(…,1e-300) floor makes
    the S(t)=0 corner portable instead of ln(0)-undefined.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    dur = F.datediff(F.to_date("t1"), F.to_date("t0"))
    obs = su.join(pu, "user_id", "left").select(
        F.when(F.col("t1").isNull() | (dur > KM_WINDOW_DAYS), KM_WINDOW_DAYS)
        .otherwise(dur)
        .alias("t"),
        F.when(F.col("t1").isNotNull() & (dur <= KM_WINDOW_DAYS), 1)
        .otherwise(0)
        .alias("ev"),
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    steps = obs.groupBy("t").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    wprev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t")
    km = steps.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)),
    )
    factor = F.greatest(
        F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"), F.lit(1e-300)
    )
    return km.select(
        F.col("t").alias("t_day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("d_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        dround(F.exp(F.sum(F.log(factor)).over(wcum)), 6).alias("survival"),
    )


# ---------------------------------------- q262 table content checksum

# Canonical column encodings shared by both engines. Doubles encode
# as FLOOR(x * 10^s) integers (identical IEEE multiply+floor on both
# sides — a canonical integer encoding, not pretty-printing);
# timestamps force an explicit 6-digit-microsecond format; float32
# vectors encode per-element via the same FLOOR trick at 10^6.
_CKSUM_TABLES: dict[str, list[tuple[str, str]]] = {
    # table -> [(kind, column)] in canonical column order
    "region": [("i", "r_regionkey"), ("s", "r_name")],
    "nation": [("i", "n_nationkey"), ("s", "n_name"), ("i", "n_regionkey")],
    "customer": [
        ("i", "c_custkey"), ("s", "c_name"), ("i", "c_nationkey"),
        ("f", "c_acctbal"), ("s", "c_mktsegment"),
    ],
    "supplier": [
        ("i", "s_suppkey"), ("s", "s_name"), ("i", "s_nationkey"),
        ("f", "s_acctbal"),
    ],
    "part": [
        ("i", "p_partkey"), ("s", "p_name"), ("s", "p_brand"),
        ("s", "p_type"), ("i", "p_size"), ("f", "p_retailprice"),
    ],
    "orders": [
        ("i", "o_orderkey"), ("i", "o_custkey"), ("s", "o_orderstatus"),
        ("f", "o_totalprice"), ("d", "o_orderdate"), ("s", "o_orderpriority"),
    ],
    "lineitem": [
        ("i", "l_orderkey"), ("i", "l_partkey"), ("i", "l_suppkey"),
        ("i", "l_linenumber"), ("f", "l_quantity"), ("f", "l_extendedprice"),
        ("f", "l_discount"), ("f", "l_tax"), ("s", "l_returnflag"),
        ("s", "l_linestatus"), ("d", "l_shipdate"),
    ],
    "events": [
        ("i", "event_id"), ("ts", "ts"), ("i", "user_id"),
        ("s", "event_type"), ("f", "value"), ("s", "props"),
    ],
    "documents": [
        ("i", "doc_id"), ("s", "text"), ("s", "lang"), ("s", "source"),
        ("i", "n_chars"),
    ],
    "embeddings": [("i", "vec_id"), ("vec", "embedding"), ("i", "label")],
}


def _cksum_col_sql(kind: str, col: str) -> str:
    if kind == "i":
        return f"CAST({col} AS VARCHAR)"
    if kind == "s":
        return col
    if kind == "f":
        return f"CAST(CAST(FLOOR({col} * 100) AS BIGINT) AS VARCHAR)"
    if kind == "d":
        return f"CAST({col} AS VARCHAR)"
    if kind == "ts":
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
    if kind == "vec":
        return (
            f"array_to_string(list_transform({col}, x -> CAST(CAST("
            "FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',')"
        )
    raise ValueError(kind)


def _cksum_col_spark(kind: str, col: str):
    if kind == "i":
        return F.col(col).cast("string")
    if kind == "s":
        return F.col(col)
    if kind == "f":
        return F.floor(F.col(col) * 100).cast("bigint").cast("string")
    if kind == "d":
        return F.col(col).cast("string")
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if kind == "vec":
        return F.expr(
            f"array_join(transform({col}, x -> cast(cast("
            "floor(cast(x as double) * 1000000) as bigint) as string)), ',')"
        )
    raise ValueError(kind)


@register(
    "q262_table_checksum",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{tname}' AS table_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|',
             {", ".join(_cksum_col_sql(k, c) for k, c in cols)}
           )), 1, 8)) AS BIGINT)) AS BIGINT) AS content_checksum
    FROM {tname}"""
        for tname, cols in _CKSUM_TABLES.items()
    ),
)
def q262_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of every catalog table —
    the migration-parity gate: a team switching engines (the north
    star's 'run every query they run today') proves the DATA arrived
    intact before trusting any query output. Per table: row count +
    SUM of per-row md5-prefix ints over a canonically-encoded row
    string (pipe-joined columns; doubles as FLOOR(x·10²) integers,
    timestamps at forced 6-digit microseconds, float32 vectors as
    FLOOR(x·10⁶) element lists — every encoding an identical IEEE
    op sequence on both engines, never locale/engine float
    printing).

    Scale: embarrassingly parallel — one codegen md5 per row, SUM
    partial-aggregates map-side, zero shuffles beyond the final
    1-row-per-table reduce; the 32-bit hash prefix keeps the BIGINT
    sum overflow-free to ~10⁹ rows per table (use a modular wrap
    beyond that).
    """
    parts = []
    for tname, cols in _CKSUM_TABLES.items():
        row_str = F.concat_ws("|", *[_cksum_col_spark(k, c) for k, c in cols])
        h = F.conv(F.substring(F.md5(row_str.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        )
        parts.append(
            t(spark, sf_dir, tname).agg(
                F.lit(tname).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(h).cast("bigint").alias("content_checksum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------ q263 OHLC bars


@register(
    "q263_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT event_type, CAST(ts AS DATE) AS d, value,
             ROW_NUMBER() OVER w_asc AS rn_open,
             ROW_NUMBER() OVER w_desc AS rn_close
      FROM events
      WINDOW
        w_asc AS (PARTITION BY event_type, CAST(ts AS DATE)
                  ORDER BY ts, event_id),
        w_desc AS (PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC)
    )
    SELECT event_type, d,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS volume,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS turnover
    FROM ranked
    GROUP BY event_type, d
    """,
)
def q263_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the time-series downsampling op every
    metrics store ships: per (event_type, day), the first (open) and
    last (close) observed value with total-order tie-breakers
    (ts, event_id), the high/low extremes, event volume, and the
    exact-decimal turnover.

    One window sort per partition serves both endpoint ranks (the
    descending rank reuses the ascending sort's exchange), and the
    bar reduce is a plain per-key aggregate — the canonical
    windowed-downsample plan, partitioned by real keys (never a
    global window).
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        "value",
        "ts",
        "event_id",
    )
    w_asc = W.partitionBy("event_type", "d").orderBy("ts", "event_id")
    w_desc = W.partitionBy("event_type", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        "d",
        "value",
        F.row_number().over(w_asc).alias("rn_open"),
        F.row_number().over(w_desc).alias("rn_close"),
    )
    return ranked.groupBy("event_type", "d").agg(
        F.min(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("turnover"),
    )


# -------------------------------------- q264 Merkle-bucket replica diff

MERKLE_BUCKETS = 256
# deterministic "replica damage": rows whose key-hash lands in
# [0, 2) of 1000 are missing from replica B — a simulated partial
# data loss the diff must localize
DAMAGE_PERMILLE = 2

_ORD_ROW = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
    " o_orderstatus, CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR),"
    " CAST(o_orderdate AS VARCHAR), o_orderpriority)"
)


@register(
    "q264_merkle_bucket_diff",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5('bkt:' || CAST(o_orderkey AS VARCHAR)),
                   1, 7)) AS BIGINT) % {MERKLE_BUCKETS} AS bucket,
             CAST(('0x' || substr(md5('dmg:' || CAST(o_orderkey AS VARCHAR)),
                   1, 7)) AS BIGINT) % 1000 AS dmg,
             CAST(('0x' || substr(md5({_ORD_ROW}), 1, 8)) AS BIGINT) AS rh
      FROM orders
    ),
    a AS (
      SELECT bucket, COUNT(*) AS rows_a, CAST(SUM(rh) AS BIGINT) AS cksum_a
      FROM base GROUP BY bucket
    ),
    b AS (
      SELECT bucket, COUNT(*) AS rows_b, CAST(SUM(rh) AS BIGINT) AS cksum_b
      FROM base WHERE dmg >= {DAMAGE_PERMILLE} GROUP BY bucket
    )
    SELECT a.bucket, a.rows_a,
           COALESCE(b.rows_b, 0) AS rows_b,
           a.cksum_a, COALESCE(b.cksum_b, 0) AS cksum_b,
           a.rows_a - COALESCE(b.rows_b, 0) AS rows_missing
    FROM a LEFT JOIN b ON b.bucket = a.bucket
    WHERE COALESCE(b.cksum_b, 0) <> a.cksum_a
    """,
)
def q264_merkle_bucket_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-bucket anti-entropy diff between two table replicas —
    the reconciliation op (Dynamo/Cassandra repair, cross-region
    sync) that LOCALIZES divergence instead of re-shipping the
    table: rows hash into {MERKLE_BUCKETS} buckets; each replica
    reduces to per-bucket (count, content checksum); only buckets
    whose checksums disagree are reported (and would be re-synced).
    Replica B simulates a deterministic ~0.2% data loss so the diff
    has real rows to find.

    Scale: each replica side is one scan + a {MERKLE_BUCKETS}-row
    aggregate (map-side partials; the q262 canonical row encoding),
    the diff joins two {MERKLE_BUCKETS}-row frames, and re-sync cost
    drops from O(table) to O(damaged buckets × bucket size). A
    production tree adds levels (bucket → sub-bucket) by reusing
    this op with a finer modulus on the flagged buckets only.
    """
    o = t(spark, sf_dir, "orders")
    kh = lambda tag: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(F.lit(tag), F.col("o_orderkey").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.col("o_orderdate").cast("string"),
        F.col("o_orderpriority"),
    )
    base = o.select(
        (kh("bkt:") % MERKLE_BUCKETS).alias("bucket"),
        (kh("dmg:") % 1000).alias("dmg"),
        F.conv(F.substring(F.md5(row_str.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("rh"),
    )
    a = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_a"),
        F.sum("rh").cast("bigint").alias("cksum_a"),
    )
    b = base.filter(F.col("dmg") >= DAMAGE_PERMILLE).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_b"),
        F.sum("rh").cast("bigint").alias("cksum_b"),
    )
    return (
        a.join(b, "bucket", "left")
        .select(
            "bucket",
            "rows_a",
            F.coalesce("rows_b", F.lit(0)).alias("rows_b"),
            "cksum_a",
            F.coalesce("cksum_b", F.lit(0)).alias("cksum_b"),
            (F.col("rows_a") - F.coalesce("rows_b", F.lit(0))).alias(
                "rows_missing"
            ),
        )
        .filter(F.col("cksum_b") != F.col("cksum_a"))
    )


# ---------------------------------------- q265 Theil-Sen robust trend


@register(
    "q265_theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY m) AS i, rev FROM monthly
    ),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.i - a.i) AS s
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ts AS (SELECT quantile_cont(s, 0.5) AS theil_sen FROM slopes),
    ols AS (
      SELECT (COUNT(*) * SUM(i * rev) - SUM(i) * SUM(rev))
               / (COUNT(*) * SUM(i * i) - SUM(i) * SUM(i)) AS ols
      FROM idx
    )
    SELECT (SELECT COUNT(*) FROM idx) AS n_months,
           (SELECT COUNT(*) FROM slopes) AS n_pairs,
           (FLOOR(CAST(ts.theil_sen AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS theil_sen_slope,
           (FLOOR(CAST(ols.ols AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS ols_slope
    FROM ts, ols
    """,
)
def q265_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over monthly revenue — the
    median of all pairwise slopes, which a single corrupted month
    cannot drag (up to ~29% outliers), reported beside the OLS slope
    (q189's estimator) so the gap itself is the outlier signal.

    The quadratic pair-generation runs on the MONTHLY grain — a
    bounded aggregate (~80 rows → ~3k pairs), never fact rows; the
    slope median uses the q28 percentile definition (identical
    interpolation in both engines). OLS sufficient statistics reuse
    the same bounded series. The two scalars join as 1-row
    broadcasts.
    """
    from pyspark.sql import Window as W

    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("m"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    idx = monthly.select(
        F.row_number().over(W.orderBy("m")).alias("i"), "rev"
    )
    a = idx.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = idx.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))
    slopes = a.join(b, F.col("ib") > F.col("ia")).select(
        ((F.col("rb") - F.col("ra")) / (F.col("ib") - F.col("ia"))).alias("s")
    )
    ts_df = slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dround(F.percentile("s", F.lit(0.5)), 4).alias("theil_sen_slope"),
    )
    ols = idx.agg(
        F.count(F.lit(1)).alias("n_months"),
        dround(
            (
                F.count(F.lit(1)) * F.sum(F.col("i") * F.col("rev"))
                - F.sum("i") * F.sum("rev")
            )
            / (
                F.count(F.lit(1)) * F.sum(F.col("i") * F.col("i"))
                - F.sum("i") * F.sum("i")
            ),
            4,
        ).alias("ols_slope"),
    )
    return (
        ols.crossJoin(F.broadcast(ts_df))
        .select("n_months", "n_pairs", "theil_sen_slope", "ols_slope")
    )


# ------------------------------------- q266 Wilson interval readout

WILSON_Z = 1.959963984540054  # 97.5th normal quantile, shared literal


@register(
    "q266_wilson_interval",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                         1, 7)) AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM assigned GROUP BY variant
    )
    SELECT variant, n_users, n_converted,
           (FLOOR(CAST(p_hat AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS conversion_rate,
           (FLOOR(CAST((p_hat + zz / (2 * n) - z * SQRT(p_hat * (1 - p_hat) / n
                  + zz / (4 * n * n))) / (1 + zz / n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS wilson_lower,
           (FLOOR(CAST((p_hat + zz / (2 * n) + z * SQRT(p_hat * (1 - p_hat) / n
                  + zz / (4 * n * n))) / (1 + zz / n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS wilson_upper
    FROM (
      SELECT variant, n_users, n_converted,
             CAST(n_converted AS DOUBLE) / n_users AS p_hat,
             CAST(n_users AS DOUBLE) AS n,
             CAST({WILSON_Z!r} AS DOUBLE) AS z,
             CAST({WILSON_Z!r} AS DOUBLE) * CAST({WILSON_Z!r} AS DOUBLE) AS zz
      FROM agg
    )
    """,
)
def q266_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% confidence interval on per-variant conversion
    — the interval-estimate readout beside q151's two-proportion
    z-test and q234's CUPED adjustment. Wilson (unlike the naive
    Wald interval) stays inside [0,1] and behaves at small n or
    extreme rates — the interval a launch-review dashboard should
    print.

    Variant assignment is the pure key hash (engine-reproducible,
    q151's rule); the per-user conversion flag is one MAX reduce;
    the interval arithmetic runs on a |variants|-row frame with the
    z quantile embedded as a shared double literal (no engine
    erf/quantile dependency).
    """
    ev = t(spark, sf_dir, "events")
    variant = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    # variant is a pure function of the group key — derive it after
    # the reduce (no second scan, no join)
    assigned = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .select("user_id", "converted", variant.alias("variant"))
    )
    agg = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    p = F.col("n_converted").cast("double") / F.col("n_users")
    n = F.col("n_users").cast("double")
    z = F.lit(WILSON_Z)
    zz = F.lit(WILSON_Z) * F.lit(WILSON_Z)
    center = p + zz / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + zz / (4 * n * n))
    denom = 1 + zz / n
    return agg.select(
        "variant",
        "n_users",
        "n_converted",
        dround(p, 6).alias("conversion_rate"),
        dround((center - margin) / denom, 6).alias("wilson_lower"),
        dround((center + margin) / denom, 6).alias("wilson_upper"),
    )


# ------------------------------------------------ q267 one-way ANOVA


@register(
    "q267_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS ng,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sg,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS qg
      FROM events GROUP BY event_type
    ),
    parts AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(ng) AS BIGINT) AS n,
             CAST(SUM(CAST(sg AS DECIMAL(28,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(qg AS DECIMAL(28,4))) AS DOUBLE) AS q,
             -- per-group (Σv)²/n in double, decimal-summed so the
             -- cross-group addition is order-independent
             CAST(SUM(CAST((FLOOR(CAST(sg * sg / ng AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(28,8)))
               AS DOUBLE) AS sb
      FROM g
    )
    SELECT k AS k_groups, n AS n_total,
           (FLOOR(CAST(sb - s * s / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ss_between,
           (FLOOR(CAST(q - sb AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ss_within,
           (FLOOR(CAST(((sb - s * s / n) / (k - 1)) / ((q - sb) / (n - k)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS f_stat,
           (FLOOR(CAST((sb - s * s / n) / (q - s * s / n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS eta_sq
    FROM parts
    """,
)
def q267_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — the numeric-
    outcome counterpart of q142's chi-square independence audit:
    between/within sum-of-squares decomposition, the F statistic, and
    eta² effect size.

    Everything reduces to per-group sufficient statistics (n, Σv,
    Σv² — 2-decimal values make both sums DECIMAL-exact and
    order-independent); the only float sums that cross groups pass
    through a DECIMAL(28,8) roundtrip so they're order-independent
    too, and the final F arithmetic is identical IEEE ops on a
    |groups|-row frame.
    """
    dec = F.col("value").cast("decimal(18,2)")
    g = t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(dec).cast("double").alias("sg"),
        F.sum(dec * dec).cast("double").alias("qg"),
    )
    parts = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.col("sg").cast("decimal(28,2)")).cast("double").alias("s"),
        F.sum(F.col("qg").cast("decimal(28,4)")).cast("double").alias("q"),
        F.sum(
            # round BEFORE the decimal cast: Spark casts doubles via
            # their shortest string repr, DuckDB via the binary value
            # — off-grid doubles can round differently at the cast
            # scale; a 6-dp-rounded double is on-grid for scale 8
            dround(F.col("sg") * F.col("sg") / F.col("ng"), 6).cast(
                "decimal(28,8)"
            )
        )
        .cast("double")
        .alias("sb"),
    )
    ssb = F.col("sb") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb")
    sst = F.col("q") - F.col("s") * F.col("s") / F.col("n")
    return parts.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        dround(ssb, 6).alias("ss_between"),
        dround(ssw, 6).alias("ss_within"),
        dround((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6)
        .alias("f_stat"),
        dround(ssb / sst, 6).alias("eta_sq"),
    )


# ------------------------------------------- q269 leaderboard churn

CHURN_TOPK = 10


@register(
    "q269_topk_churn",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, CAST(YEAR(l_shipdate) AS INTEGER) AS y,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS rev
      FROM lineitem
      WHERE YEAR(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey, YEAR(l_shipdate)
    ),
    ranked AS (
      SELECT l_partkey, y, rev,
             ROW_NUMBER() OVER (PARTITION BY y
               ORDER BY rev DESC, l_partkey) AS rk
      FROM rev
    ),
    t1 AS (SELECT l_partkey, rk, rev FROM ranked
           WHERE y = 1996 AND rk <= {CHURN_TOPK}),
    t2 AS (SELECT l_partkey, rk, rev FROM ranked
           WHERE y = 1997 AND rk <= {CHURN_TOPK})
    SELECT COALESCE(t1.l_partkey, t2.l_partkey) AS l_partkey,
           CASE WHEN t1.l_partkey IS NULL THEN 'entered'
                WHEN t2.l_partkey IS NULL THEN 'exited'
                ELSE 'stayed' END AS status,
           t1.rk AS rank_1996, t2.rk AS rank_1997,
           CAST(t1.rev AS DOUBLE) AS rev_1996,
           CAST(t2.rev AS DOUBLE) AS rev_1997
    FROM t1 FULL OUTER JOIN t2 ON t2.l_partkey = t1.l_partkey
    """,
)
def q269_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{CHURN_TOPK} revenue leaderboard churn between 1996 and
    1997: which parts entered, exited, or stayed, with both ranks and
    revenues — the period-over-period diff every ranked dashboard
    needs (the heavy-hitter analog of q235's graph edge diff).

    Both leaderboards come from ONE scan and one per-(part, year)
    exact-decimal reduce; ranking windows partition by year (never
    global over facts), and the diff is a full-outer join of two
    {CHURN_TOPK}-row frames. Ranks carry a total-order tie-breaker.
    """
    from pyspark.sql import Window as W

    rev = (
        t(spark, sf_dir, "lineitem")
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1996, 1997))
        .groupBy("l_partkey", "y")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("rev")
        )
    )
    wrk = W.partitionBy("y").orderBy(F.col("rev").desc(), F.col("l_partkey"))
    ranked = rev.withColumn("rk", F.row_number().over(wrk)).filter(
        F.col("rk") <= CHURN_TOPK
    )
    t1 = ranked.filter(F.col("y") == 1996).select(
        F.col("l_partkey").alias("pk1"),
        F.col("rk").alias("rank_1996"),
        F.col("rev").alias("rev1"),
    )
    t2 = ranked.filter(F.col("y") == 1997).select(
        F.col("l_partkey").alias("pk2"),
        F.col("rk").alias("rank_1997"),
        F.col("rev").alias("rev2"),
    )
    joined = t1.join(t2, t1["pk1"] == t2["pk2"], "full_outer")
    return joined.select(
        F.coalesce("pk1", "pk2").alias("l_partkey"),
        F.when(F.col("pk1").isNull(), "entered")
        .when(F.col("pk2").isNull(), "exited")
        .otherwise("stayed")
        .alias("status"),
        "rank_1996",
        "rank_1997",
        F.col("rev1").cast("double").alias("rev_1996"),
        F.col("rev2").cast("double").alias("rev_1997"),
    )


# ------------------------------------- q268 iterative BPE merge loop

BPE_ITERS = 3


def _bpe_sql() -> str:
    """Three unrolled BPE iterations as chained CTEs. w0 holds the
    distinct-word vocabulary as spaced character symbols."""
    ctes = [
        """w0 AS (
      SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w,
             COUNT(*) AS freq
      FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
      ) WHERE len(word) >= 2
      GROUP BY 1
    )"""
    ]
    rows = []
    for i in range(1, BPE_ITERS + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"""p{i} AS (
      SELECT s[j] || ' ' || s[j + 1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT string_split(w, ' ') AS s, freq FROM {prev}),
           UNNEST(range(1, len(s))) AS r(j)
      GROUP BY 1
    ),
    b{i} AS (
      SELECT pair, cnt FROM p{i}
      ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    w{i} AS (
      SELECT trim(replace(replace(
               ' ' || w.w || ' ',
               ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
               ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '))
               AS w,
             w.freq
      FROM {prev} w, b{i} b
    ),
    v{i} AS (
      SELECT COUNT(DISTINCT sym) AS n_syms
      FROM (SELECT UNNEST(string_split(w, ' ')) AS sym FROM w{i})
    )"""
        )
        rows.append(
            f"SELECT {i} AS iter, b{i}.pair AS merged_pair, b{i}.cnt AS"
            f" pair_count, CAST(v{i}.n_syms AS BIGINT) AS n_symbols_after"
            f" FROM b{i}, v{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(rows)


@register("q268_bpe_merge_iterations", oracle=_bpe_sql())
def q268_bpe_merge_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three merge iterations unrolled — the
    iterative loop q226's single pair-count stops short of: each
    round counts adjacent symbol pairs over the frequency-weighted
    DISTINCT-WORD vocabulary, picks the argmax pair (count desc, pair
    asc tie-break), and rewrites every word with the merged symbol.
    Output per iteration: the merged pair, its count, and the symbol
    inventory size after the merge.

    State between iterations is the vocabulary table itself
    (vocabulary-sized, never corpus-sized) — the canonical Spark
    shape for a bounded iterative algorithm: unroll known-small
    iteration counts into one plan; checkpoint the vocab per round
    when the count is data-driven (q64's loop rule). The merge
    rewrite is a two-pass left-to-right `replace` with identical
    scan semantics in both engines (pass 2 catches occurrences whose
    boundary space pass 1 consumed; deviates from reference BPE only
    on 5+ same-symbol runs, identically on both sides). The argmax
    pair broadcasts to the rewrite as a 1-row frame.
    """
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("w"), "freq"
        )
    )
    out_rows = []
    cur = words
    for i in range(1, BPE_ITERS + 1):
        syms = F.split("w", " ")
        pairs = (
            cur.select(syms.alias("s"), "freq")
            # a fully-merged word is ONE symbol: sequence(1, 0) would
            # DESCEND (the q260 lesson) and element_at(s, 2) errors —
            # single-symbol words contribute no pairs on either engine
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " j -> concat(element_at(s, j), ' ',"
                        " element_at(s, j + 1)))"
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        wb = W.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        best = (
            pairs.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") == 1)
            .select("pair", "cnt")
        )
        merged = cur.crossJoin(F.broadcast(best)).select(
            F.trim(
                F.expr(
                    "replace(replace(' ' || w || ' ',"
                    " ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '),"
                    " ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')"
                )
            ).alias("w"),
            "freq",
        )
        nsyms = merged.select(
            F.explode(F.split("w", " ")).alias("sym")
        ).agg(F.count_distinct("sym").alias("n_syms"))
        out_rows.append(
            best.crossJoin(F.broadcast(nsyms)).select(
                F.lit(i).alias("iter"),
                F.col("pair").alias("merged_pair"),
                F.col("cnt").alias("pair_count"),
                F.col("n_syms").cast("bigint").alias("n_symbols_after"),
            )
        )
        cur = merged
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------- q270 sweep-line max concurrency


@register(
    "q270_interval_concurrency",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
             MAX(CAST(l.l_shipdate AS DATE)) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
      SELECT s AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT e + 1 AS d, -1 AS delta FROM iv
    ),
    daily AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS dd FROM daily_src),
    run AS (
      SELECT d, SUM(dd) OVER (ORDER BY d) AS conc
      FROM (SELECT d, CAST(SUM(delta) AS BIGINT) AS dd
            FROM deltas GROUP BY d)
    ),
    ranked AS (
      SELECT YEAR(d) AS y, d, conc,
             ROW_NUMBER() OVER (PARTITION BY YEAR(d)
               ORDER BY conc DESC, d ASC) AS rk
      FROM run
    )
    SELECT CAST(y AS INTEGER) AS year,
           CAST(conc AS BIGINT) AS peak_concurrency,
           d AS peak_date
    FROM ranked WHERE rk = 1
    """.replace(
        "daily AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS dd FROM daily_src),\n    ",
        "",
    ),
)
def q270_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum interval concurrency: how many orders are
    simultaneously in flight (order date → last line shipment), peak
    per year with the earliest peak date — the capacity-planning
    gauge (open connections / WIP inventory / concurrent sessions)
    that pairwise overlap ops (q185/q220) cannot answer.

    The classic O(n log n) sweep as a plan: intervals reduce to ±1
    boundary deltas, deltas reduce to the DAILY grain (bounded
    calendar series — the engine's global-window rule), and one
    running sum ordered by day is the concurrency curve; per-year
    argmax is a rank over that bounded curve. Interval construction
    is one orders↔lineitem join + per-order MAX.
    """
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
        .select("s", "e")
    )
    deltas = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("dd"))
    run = daily.select("d", F.sum("dd").over(W.orderBy("d")).alias("conc"))
    wr = W.partitionBy(F.year("d")).orderBy(F.col("conc").desc(), F.col("d").asc())
    return (
        run.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.year("d").cast("int").alias("year"),
            F.col("conc").cast("bigint").alias("peak_concurrency"),
            F.col("d").alias("peak_date"),
        )
    )


# ------------------------------------------ q271 bottom-k sketch

BOTTOMK_K = 64
BOTTOMK_SPACE = float(1 << 56)  # hash domain: 14 hex chars


@register(
    "q271_bottomk_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('bk:' || CAST(user_id AS VARCHAR)),
                   1, 14)) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(nd AS BIGINT) AS exact_distinct,
           (FLOOR(CAST(CASE WHEN nd < {BOTTOMK_K} THEN CAST(nd AS DOUBLE)
                 ELSE ({BOTTOMK_K} - 1) * {BOTTOMK_SPACE!r} / v END AS DOUBLE) * 10000.0 + 0.5) / 10000.0)
             AS bottomk_estimate,
           (FLOOR(CAST(ABS(CASE WHEN nd < {BOTTOMK_K} THEN CAST(nd AS DOUBLE)
                 ELSE ({BOTTOMK_K} - 1) * {BOTTOMK_SPACE!r} / v END - nd)
                 / nd AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS rel_error
    FROM ranked
    WHERE rk = CASE WHEN nd < {BOTTOMK_K} THEN nd ELSE {BOTTOMK_K} END
    """,
)
def q271_bottomk_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct-count sketch beside the HLL family
    (q229/q246/q259): the k-th smallest of the distinct key hashes
    estimates cardinality as (k−1)·|H|/h_k. Unlike HLL registers, a
    bottom-k sketch ALSO supports set intersection via Jaccard on
    the k-min sets (the q199 MinHash bridge) — which is why
    production systems (e.g. Theta sketches) carry it. Exact-vs-
    estimate relative error per event type; small groups (n < k)
    fall back to the exact count, as a real KMV sketch does.

    The hash rank runs on the DISTINCT-key reduce. At 100 TB the
    window becomes a k-smallest aggregate (per-partition top-k
    lists merged associatively — the TakeOrdered shape); the
    estimate arithmetic is shift-exact/IEEE-identical cross-engine.
    """
    from pyspark.sql import Window as W

    h = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bk:"), F.col("user_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    14,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("v"),
        )
        .distinct()
    )
    wrk = W.partitionBy("event_type").orderBy("v")
    wall = W.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "v",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("nd"),
    )
    est = F.when(
        F.col("nd") < BOTTOMK_K, F.col("nd").cast("double")
    ).otherwise(F.lit(float(BOTTOMK_K - 1)) * F.lit(BOTTOMK_SPACE) / F.col("v"))
    return ranked.filter(
        F.col("rk")
        == F.when(F.col("nd") < BOTTOMK_K, F.col("nd")).otherwise(BOTTOMK_K)
    ).select(
        "event_type",
        F.col("nd").cast("bigint").alias("exact_distinct"),
        dround(est, 4).alias("bottomk_estimate"),
        dround(F.abs(est - F.col("nd")) / F.col("nd"), 6).alias("rel_error"),
    )


# --------------------------------------------- q272 WOE / IV binning

WOE_BINS = [0.2, 0.4, 0.6, 0.8]


@register(
    "q272_woe_iv_binning",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
               AS click_value,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    cuts AS (
      SELECT quantile_cont(click_value, 0.2) AS c1,
             quantile_cont(click_value, 0.4) AS c2,
             quantile_cont(click_value, 0.6) AS c3,
             quantile_cont(click_value, 0.8) AS c4
      FROM per_user
    ),
    binned AS (
      SELECT CASE WHEN click_value <= c1 THEN 1
                  WHEN click_value <= c2 THEN 2
                  WHEN click_value <= c3 THEN 3
                  WHEN click_value <= c4 THEN 4
                  ELSE 5 END AS bin,
             y
      FROM per_user, cuts
    ),
    tot AS (
      SELECT CAST(SUM(y) AS DOUBLE) AS p,
             CAST(SUM(1 - y) AS DOUBLE) AS n
      FROM binned
    )
    SELECT bin,
           COUNT(*) AS n_users,
           CAST(SUM(y) AS BIGINT) AS n_converted,
           (FLOOR(CAST(LN(((SUM(y) + 0.5) / NULLIF(p, 0.0))
                 / ((SUM(1 - y) + 0.5) / NULLIF(n, 0.0))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS woe,
           (FLOOR(CAST(((SUM(y) + 0.5) / NULLIF(p, 0.0)
                   - (SUM(1 - y) + 0.5) / NULLIF(n, 0.0))
                 * LN(((SUM(y) + 0.5) / NULLIF(p, 0.0))
                 / ((SUM(1 - y) + 0.5) / NULLIF(n, 0.0))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS iv_contribution
    FROM binned, tot
    GROUP BY bin, p, n
    """,
)
def q272_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature audit — the
    credit-scoring-era feature-selection op that still gates every
    tabular-model feature: per-(user, day) click value binned into quintiles
    (percentile thresholds broadcast map-side, q186's pattern — no
    global ntile sort), per bin the same-day conversion split, the
    0.5-smoothed WOE = ln(share_pos/share_neg), and the per-bin IV
    contribution (q142's chi-square style: contributions, not an
    order-dependent float total).

    Two bounded passes: the (user, day)-grain reduce (the grain guarantees both classes exist — this fixture's every USER eventually converts, and Spark-4 ANSI double division treats a 0 class total as an error, not infinity), then a 5-row bin
    aggregate; ln runs on identical operands in both engines (q229
    precedent), smoothing keeps empty cells portable instead of
    ln(0)-undefined.
    """
    per_user = t(spark, sf_dir, "events").groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("click_value"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    cuts = per_user.agg(
        *[
            F.percentile("click_value", F.lit(q)).alias(f"c{i + 1}")
            for i, q in enumerate(WOE_BINS)
        ]
    )
    binned = per_user.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("click_value") <= F.col("c1"), 1)
        .when(F.col("click_value") <= F.col("c2"), 2)
        .when(F.col("click_value") <= F.col("c3"), 3)
        .when(F.col("click_value") <= F.col("c4"), 4)
        .otherwise(5)
        .alias("bin"),
        "y",
    )
    tot = binned.agg(
        F.sum("y").cast("double").alias("p"),
        F.sum(1 - F.col("y")).cast("double").alias("n"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").cast("bigint").alias("n_converted"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    joined = g.crossJoin(F.broadcast(tot))
    # NULLIF the class totals: a generated corpus with zero
    # positives/negatives must yield NULL WOE on both engines (Spark
    # ANSI errors on double/0, DuckDB returns inf)
    pos_share = (F.col("n_converted") + 0.5) / F.nullif(F.col("p"), F.lit(0.0))
    neg_share = (F.col("n_neg") + 0.5) / F.nullif(F.col("n"), F.lit(0.0))
    woe = F.log(pos_share / neg_share)
    return joined.select(
        "bin",
        "n_users",
        "n_converted",
        dround(woe, 6).alias("woe"),
        dround((pos_share - neg_share) * woe, 6).alias("iv_contribution"),
    )


# ------------------------------------ q273 leave-one-out target enc

LOO_PROBE_KEYS = 20


@register(
    "q273_target_encoding_loo",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                  AS DECIMAL(28,2)) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    seg AS (
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(SUM(y) AS DECIMAL(28,2)) AS s
      FROM spend GROUP BY c_mktsegment
    )
    SELECT sp.c_custkey, sp.c_mktsegment,
           CAST(sp.y AS DOUBLE) AS own_spend,
           (FLOOR(CAST(CAST(sg.s - sp.y AS DOUBLE) / NULLIF(sg.n - 1, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS loo_encoding,
           (FLOOR(CAST(CAST(sg.s AS DOUBLE) / sg.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS naive_encoding
    FROM spend sp JOIN seg sg ON sg.c_mktsegment = sp.c_mktsegment
    WHERE sp.c_custkey < {LOO_PROBE_KEYS}
    """,
)
def q273_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of customer market segment
    against total spend — the leakage-safe categorical encoder:
    each row's feature is (segment sum − OWN target)/(n−1), so a
    row never sees its own label (the naive segment mean, also
    emitted, leaks it — the gap between the two columns IS the
    leakage). Output is the bounded probe slice (custkey <
    {LOO_PROBE_KEYS}) with both encodings.

    Plan: one per-customer exact-decimal reduce, one |segments|-row
    aggregate broadcast back onto rows — the encoding is map-side
    arithmetic, no per-row window; NULLIF guards singleton
    segments. At 100 TB this is the standard two-pass encoder
    (aggregate once, broadcast, encode in the scan).
    """
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("decimal(28,2)")
            .alias("y")
        )
    )
    seg = spend.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("decimal(28,2)").alias("s"),
    )
    return (
        spend.filter(F.col("c_custkey") < LOO_PROBE_KEYS)
        .join(F.broadcast(seg), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("y").cast("double").alias("own_spend"),
            dround(
                (F.col("s") - F.col("y")).cast("double")
                / F.nullif(F.col("n") - 1, F.lit(0)),
                6,
            ).alias("loo_encoding"),
            dround(F.col("s").cast("double") / F.col("n"), 6).alias(
                "naive_encoding"
            ),
        )
    )


# ---------------------------------------------- q274 feature hashing

HASH_DIMS = 32


@register(
    "q274_feature_hashing",
    oracle=f"""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    mapped AS (
      SELECT w,
             CAST(('0x' || substr(md5('fh:' || w), 1, 7)) AS BIGINT)
               % {HASH_DIMS} AS dim,
             CASE WHEN CAST(('0x' || substr(md5('fs:' || w), 1, 7)) AS BIGINT)
                  % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM words
    )
    SELECT dim,
           COUNT(DISTINCT w) AS n_distinct_words,
           COUNT(*) AS total_count,
           CAST(SUM(sgn) AS BIGINT) AS signed_sum
    FROM mapped GROUP BY dim
    """,
)
def q274_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): every corpus token maps
    to one of {HASH_DIMS} feature dimensions by hash, with a second
    hash bit supplying the ± sign that makes collisions cancel in
    expectation (Weinberger et al. 2009) — the vocabulary-free
    featurizer for models that can't ship a vocab (vs q225's
    indexed vocabulary). Per dimension: distinct words landing there
    (the collision census), raw count mass, and the signed sum an
    actual hashed feature vector would carry.

    No vocabulary state, no broadcast, no shuffle beyond one
    {HASH_DIMS}-row aggregate — the property that makes the trick
    the 100 TB featurizer; the distinct-word count rides the same
    reduce two-phase.
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        F.explode(F.split("text", " ")).alias("w")
    )

    def h(tag: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("w")).cast("binary")), 1, 7
            ),
            16,
            10,
        ).cast("long")

    mapped = words.select(
        "w",
        (h("fh:") % HASH_DIMS).alias("dim"),
        F.when(h("fs:") % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    return mapped.groupBy("dim").agg(
        F.count_distinct("w").alias("n_distinct_words"),
        F.count(F.lit(1)).alias("total_count"),
        F.sum("sgn").cast("bigint").alias("signed_sum"),
    )


# ---------------------------------------------- q275 exact AUC


@register(
    "q275_auc_rank",
    oracle="""
    WITH scored AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    hist AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS np,
             CAST(SUM(1 - y) AS BIGINT) AS nn
      FROM scored GROUP BY score
    ),
    cum AS (
      SELECT score, np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg
      FROM hist
    ),
    agg AS (
      SELECT CAST(SUM(np) AS BIGINT) AS p,
             CAST(SUM(nn) AS BIGINT) AS n,
             CAST(SUM(np * (2 * cum_neg + nn)) AS BIGINT) AS num2
      FROM cum
    )
    SELECT p AS n_pos, n AS n_neg,
           (FLOOR(CAST(CAST(num2 AS DOUBLE) / NULLIF(2.0 * p * n, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS auc,
           (FLOOR(CAST(CAST(num2 AS DOUBLE) / NULLIF(1.0 * p * n, 0.0) - 1.0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS gini
    FROM agg
    """,
)
def q275_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of a score column (document length) against a
    binary label (lang = 'en'), with correct tie handling — the
    rank-statistic eval every classifier gate needs, computed in its
    HISTOGRAM form: group by distinct score (np, nn per value), one
    cumulative window over that bounded value grain, and
    AUC = Σ npᵢ·(cum_negᵢ + nnᵢ/2) / (P·N). Ties contribute the ½
    term exactly (equivalent to average-rank Mann-Whitney U — no
    per-row global ranking, which at 100 TB would be a full sort:
    the histogram reduce shrinks the sort to |distinct scores|).
    The ×2 integer trick keeps the numerator BIGINT-exact; only the
    final division is float. Gini = 2·AUC − 1 rides along.
    """
    from pyspark.sql import Window as W

    scored = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("np"),
        F.sum(1 - F.col("y")).cast("bigint").alias("nn"),
    )
    wc = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(wc), F.lit(0)).alias("cum_neg"),
    )
    agg = cum.agg(
        F.sum("np").cast("bigint").alias("p"),
        F.sum("nn").cast("bigint").alias("n"),
        F.sum(F.col("np") * (2 * F.col("cum_neg") + F.col("nn")))
        .cast("bigint")
        .alias("num2"),
    )
    return agg.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        dround(
            F.col("num2").cast("double")
            / F.nullif(2.0 * F.col("p") * F.col("n"), F.lit(0.0)),
            6,
        ).alias("auc"),
        dround(
            F.col("num2").cast("double")
            / F.nullif(1.0 * F.col("p") * F.col("n"), F.lit(0.0))
            - 1.0,
            6,
        ).alias("gini"),
    )


# ------------------------------------------- q276 EWMA smoothing

EWMA_ALPHA = 0.3
EWMA_K = 20  # truncation depth; tail weight (1-a)^20 ~ 8e-4
# alpha = 3/10 makes every truncated weight an EXACT decimal:
# w_k = 3*7^k / 10^(k+1) — scaled by 10^20 they are the INTEGER
# coefficients 3*7^k*10^(19-k), so the weighted sum runs entirely in
# DECIMAL(38,0) integer space (scale 0 has nothing for Spark's
# precision-loss rule to shave — a scale-20 chain was silently
# truncated to 6 digits) and only ONE final division drops to double
# (r7: the previous shared-double-literal chain drifted 1 ulp
# between engines on regenerated data and crossed a ROUND-6 grid
# boundary)
EWMA_COEF_STR = [str(3 * 7**k * 10**(19 - k)) for k in range(EWMA_K)]
# denominator: (sum of scaled weights) * 100 converts cents back to
# currency units in the same single division
_EWMA_S = sum(3 * 7**k * 10**(19 - k) for k in range(EWMA_K))
EWMA_DEN_STR = str(_EWMA_S * 100)


@register(
    "q276_ewma_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT d, rev,
             {", ".join(f"CAST(LAG(rev, {k}) OVER (ORDER BY d) * 100"
                        f" AS DECIMAL(14,0)) AS c{k}"
                        for k in range(EWMA_K))}
      FROM daily
    )
    SELECT d, rev,
           FLOOR(CAST(({" + ".join(
               f"CAST(CAST('{w}' AS DECIMAL(20,0)) * c{k}"
               f" AS DECIMAL(38,0))"
               for k, w in enumerate(EWMA_COEF_STR))}) AS DOUBLE)
             / CAST('{EWMA_DEN_STR}' AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS ewma
    FROM lagged
    WHERE c{EWMA_K - 1} IS NOT NULL
    ORDER BY d
    """,
)
def q276_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue —
    the smoother behind every ops dashboard and the EWMA control
    chart family. The textbook recursion s_t = αx_t + (1−α)s_{t−1}
    is a sequential scan (hostile to both distribution and
    cross-engine determinism), so this computes the TRUNCATED form:
    Σ_{{k<{EWMA_K}}} α(1−α)^k·x_{{t−k}}, renormalized over the
    included weights — tail weight (1−α)^{EWMA_K} ≈ 8e-4 bounds the
    truncation error and the window is a fixed {EWMA_K}-lag frame
    over the bounded daily grain. α = 3/10 makes the scaled weights
    EXACT integers (3·7^k·10^(19−k)), so the weighted sum runs in
    DECIMAL(38,0) integer space — order-free and engine-free — and
    only ONE final division (by the exact scaled weight sum × 100)
    drops to double on the half-up 1e-6 grid (r7: a shared-double-
    literal `+` chain drifted 1 ulp between engines and crossed a
    ROUND boundary; a scale-20 DECIMAL chain was silently truncated
    by Spark's precision-loss rule — scale 0 has nothing to shave).
    Warm-up rows (fewer than {EWMA_K} trailing days) are excluded
    rather than silently under-weighted.
    """
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = W.orderBy("d")
    lagged = daily.select(
        "d",
        "rev",
        *[
            (F.lag("rev", k).over(w) * 100)
            .cast("decimal(14,0)")
            .alias(f"c{k}")
            for k in range(EWMA_K)
        ],
    )
    # exact DECIMAL weighted sum: cents x 20-digit exact weights
    # (alpha=3/10 => w_k = 3*7^k/10^(k+1) exactly); order-free, so
    # both engines hold the SAME exact value until the one final
    # double division on the half-up 1e-6 grid
    num = (
        F.lit(EWMA_COEF_STR[0]).cast("decimal(20,0)") * F.col("c0")
    ).cast("decimal(38,0)")
    for k in range(1, EWMA_K):
        num = num + (
            F.lit(EWMA_COEF_STR[k]).cast("decimal(20,0)") * F.col(f"c{k}")
        ).cast("decimal(38,0)")
    den100 = F.lit(EWMA_DEN_STR).cast("double")
    return (
        lagged.filter(F.col(f"c{EWMA_K - 1}").isNotNull())
        .select(
            "d",
            "rev",
            (
                F.floor(
                    num.cast("double") / den100 * 1_000_000 + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("ewma"),
        )
        .orderBy("d")
    )


# --------------------------------------------- q277 k-core peeling

KCORE_K = 8  # degree threshold
KCORE_ROUNDS = 3  # unrolled peels
KCORE_CAP = 40  # per-part posting-list cap (q214's bound)

def _cosupply_canonical_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (u < v) co-supply pairs over parts whose
    distinct-supplier degree is <= KCORE_CAP, via part-grain posting
    lists: groupBy(part).collect_set(supplier) is simultaneously the
    (part, supplier) distinct, the degree cap census, and the pair
    source (r9; the q406/_cosupply_edges shape). The r3-era build
    ran a corpus-wide window count + a theta self-join + an edge
    dedup over BOTH directions — three part/pair-grain exchanges and
    a size-estimate-dependent join strategy; this is one exchange,
    and the pair dedup handles half the volume (canonical only)."""
    posting = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss") <= KCORE_CAP)
    )
    pairs = posting.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("e")
    ).select("e.u", "e.v")
    return pairs.distinct()


def _cosupply_sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both directions of _cosupply_canonical_edges, exploded from
    the deduped canonical set (one narrow pass, no second subtree)."""
    e = _cosupply_canonical_edges(spark, sf_dir)
    return e.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")




@register(
    "q277_kcore_peeling",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    capped AS (
      SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               COUNT(*) OVER (PARTITION BY l_partkey) AS deg
        FROM ps
      ) WHERE deg <= {KCORE_CAP}
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM capped a JOIN capped b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    n0 AS (SELECT DISTINCT u FROM edges),
    {", ".join(
        f'''n{i} AS (
      SELECT e.u FROM edges e
      JOIN n{i - 1} su ON su.u = e.u
      JOIN n{i - 1} sv ON sv.u = e.v
      GROUP BY e.u HAVING COUNT(*) >= {KCORE_K}
    )''' for i in range(1, KCORE_ROUNDS + 1))}
    SELECT {" UNION ALL SELECT ".join(
        f"{i} AS round, (SELECT COUNT(*) FROM n{i}) AS survivors"
        for i in range(0, KCORE_ROUNDS + 1))}
    """,
)
def q277_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition by iterative peeling over the co-supply
    graph (suppliers adjacent when they serve a common part): each
    round drops vertices whose degree WITHIN the surviving subgraph
    is < {KCORE_K}, and the survivor counts per round are the
    convergence trace — the community-density screen (spam-ring /
    collusion detection, dense-subgraph mining) that plain degree
    filtering (one round) gets wrong because removals cascade.

    {KCORE_ROUNDS} rounds unrolled into one plan (q268's bounded-
    iteration rule; a data-driven loop would checkpoint per round):
    each peel is two semi-join-shaped reduces on the REDUCED edge
    list — built from the distinct (part, supplier) projection with
    q214's posting-list cap bounding pair fan-out — never on raw
    lineitem.
    """
    # posting-list edge build (r9): one lineitem pass; the peel loop
    # consumes edges twice per round, so materialize them once
    edges = _cosupply_sym_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )
    survivors = edges.select("u").distinct()
    counts = [survivors.agg(F.count(F.lit(1)).alias("survivors"))]
    cur = survivors
    for _ in range(KCORE_ROUNDS):
        su = cur.select(F.col("u"))
        sv = cur.select(F.col("u").alias("v"))
        cur = (
            edges.join(su, "u")
            .join(sv, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("u")
        )
        counts.append(cur.agg(F.count(F.lit(1)).alias("survivors")))
    out = None
    for i, c in enumerate(counts):
        row = c.select(F.lit(i).alias("round"), "survivors")
        out = row if out is None else out.unionByName(row)
    return out


# -------------------------------- q278 price/volume decomposition


@register(
    "q278_price_volume_decomposition",
    oracle="""
    WITH py AS (
      SELECT l_partkey, CAST(YEAR(l_shipdate) AS INTEGER) AS y,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM lineitem WHERE YEAR(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey, YEAR(l_shipdate)
    ),
    both_years AS (
      SELECT a.l_partkey,
             a.qty AS q0, a.rev AS r0, a.rev / a.qty AS p0,
             b.qty AS q1, b.rev AS r1, b.rev / b.qty AS p1
      FROM py a JOIN py b
        ON b.l_partkey = a.l_partkey AND a.y = 1996 AND b.y = 1997
    )
    SELECT COUNT(*) AS n_parts,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(r1 - r0 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(28,6)))
             AS DOUBLE) AS DOUBLE) * 100.0 + 0.5) / 100.0) AS revenue_delta,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST((p1 - p0) * q0 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(28,6)))
             AS DOUBLE) AS DOUBLE) * 100.0 + 0.5) / 100.0) AS price_effect,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(p1 * (q1 - q0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(28,6)))
             AS DOUBLE) AS DOUBLE) * 100.0 + 0.5) / 100.0) AS volume_effect,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(p1 * q0 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(28,6)))
             AS DOUBLE)
             / CAST(SUM(CAST((FLOOR(CAST(p0 * q0 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(28,6)))
                    AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS laspeyres_price_index
    FROM both_years
    """,
)
def q278_price_volume_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume decomposition of the 1996→1997 revenue change
    over parts sold in BOTH years, plus the Laspeyres price index —
    the finance-planning op that answers 'did revenue move because
    prices moved or because volumes moved': Δrev = (Δp)·q0 +
    p1·(Δq), with the index Σp1·q0 / Σp0·q0 weighting price change
    by base-year volume.

    One scan reduces to the (part, year) grain with exact-decimal
    qty/revenue sums; unit prices are IEEE-deterministic ratios of
    those exact sums; every cross-part aggregation passes through a
    DECIMAL(28,6) roundtrip (q267's rule) so the totals are
    partition-order-independent. The two-year align is a self-join
    on the reduced grain.
    """
    py = (
        t(spark, sf_dir, "lineitem")
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1996, 1997))
        .groupBy("l_partkey", "y")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    a = py.filter(F.col("y") == 1996).select(
        "l_partkey",
        F.col("qty").alias("q0"),
        F.col("rev").alias("r0"),
        (F.col("rev") / F.col("qty")).alias("p0"),
    )
    b = py.filter(F.col("y") == 1997).select(
        F.col("l_partkey").alias("pk1"),
        F.col("qty").alias("q1"),
        F.col("rev").alias("r1"),
        (F.col("rev") / F.col("qty")).alias("p1"),
    )
    j = a.join(b, a["l_partkey"] == b["pk1"])

    def dsum6(col):
        # round-to-grid before the decimal cast (cross-engine
        # double->decimal rounding divergence on off-grid values)
        return F.sum(dround(col, 4).cast("decimal(28,6)")).cast("double")

    return j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        dround(dsum6(F.col("r1") - F.col("r0")), 2).alias("revenue_delta"),
        dround(dsum6((F.col("p1") - F.col("p0")) * F.col("q0")), 2).alias(
            "price_effect"
        ),
        dround(dsum6(F.col("p1") * (F.col("q1") - F.col("q0"))), 2).alias(
            "volume_effect"
        ),
        dround(
            dsum6(F.col("p1") * F.col("q0")) / dsum6(F.col("p0") * F.col("q0")),
            6,
        ).alias("laspeyres_price_index"),
    )


# --------------------------------- q280 k-anonymity generalization

KANON_K = 10


@register(
    "q280_k_anon_generalization",
    oracle=f"""
    WITH l0 AS (
      SELECT doc_id, lang, source,
             COUNT(*) OVER (PARTITION BY lang, source) AS n0
      FROM documents
    ),
    -- local recoding: the lang recount covers ONLY level-0 failures
    failed AS (
      SELECT lang, COUNT(*) OVER (PARTITION BY lang) AS n1
      FROM l0 WHERE n0 < {KANON_K}
    ),
    assigned AS (
      SELECT 0 AS level, lang AS lang_out, source AS source_out
      FROM l0 WHERE n0 >= {KANON_K}
      UNION ALL
      SELECT CASE WHEN n1 >= {KANON_K} THEN 1 ELSE 2 END AS level,
             CASE WHEN n1 >= {KANON_K} THEN lang ELSE '*' END AS lang_out,
             '*' AS source_out
      FROM failed
    )
    SELECT level, lang_out, source_out, COUNT(*) AS n_docs
    FROM assigned GROUP BY level, lang_out, source_out
    """,
)
def q280_k_anon_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity MITIGATION by generalization — the release
    transform q247's audit calls for (the audit/mitigation pairing of
    q193/q208): rows in (lang, source) classes of size ≥ {KANON_K}
    release at level 0; smaller classes generalize source→'*'
    (level 1, re-counted among the generalized rows per lang); still-
    small classes fully suppress to ('*','*') (level 2). Output: the
    released equivalence classes with chosen level and size.

    The level-1 recount deliberately runs over ONLY the rows level 0
    failed (local recoding): generalizing everyone would destroy
    utility for classes that were already safe. Two windows over the
    quasi-identifier grains, then one class-grain reduce — no row
    ever leaves with a quasi-identifier rarer than k.
    """
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    n0 = F.count(F.lit(1)).over(W.partitionBy("lang", "source"))
    l0 = docs.withColumn("n0", n0)
    # the lang recount must only cover rows that FAILED level 0
    # (local recoding), so it windows over a pre-filtered frame:
    failed = l0.filter(F.col("n0") < KANON_K).withColumn(
        "n1", F.count(F.lit(1)).over(W.partitionBy("lang"))
    )
    safe = l0.filter(F.col("n0") >= KANON_K).select(
        F.lit(0).alias("level"),
        F.col("lang").alias("lang_out"),
        F.col("source").alias("source_out"),
    )
    gen = failed.select(
        F.when(F.col("n1") >= KANON_K, 1).otherwise(2).alias("level"),
        F.when(F.col("n1") >= KANON_K, F.col("lang"))
        .otherwise("*")
        .alias("lang_out"),
        F.lit("*").alias("source_out"),
    )
    return (
        safe.unionByName(gen)
        .groupBy("level", "lang_out", "source_out")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------- q281 salted join balance

SALT_BUCKETS = 8


@register(
    "q281_salted_join_balance",
    oracle=f"""
    WITH fact AS (
      SELECT event_id,
             CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id END AS jkey,
             CAST(('0x' || substr(md5('salt:' || CAST(event_id AS VARCHAR)),
                   1, 7)) AS BIGINT) % {SALT_BUCKETS} AS salt
      FROM events
    ),
    dim AS (
      SELECT DISTINCT CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id END
               AS jkey
      FROM events
    ),
    joined AS (
      SELECT f.jkey, f.salt FROM fact f JOIN dim d ON d.jkey = f.jkey
    )
    SELECT salt,
           CAST(SUM(CASE WHEN jkey = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS hot_key_rows,
           COUNT(*) AS all_rows
    FROM joined GROUP BY salt
    """,
)
def q281_salted_join_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join skew remediation, with its balance audit: half the
    users collapse onto one hot key (the deterministic skew), the
    dimension side replicates ×{SALT_BUCKETS} with a salt column,
    the fact side salts by a pure row hash, and the join runs on
    (key, salt) — so the hot key's rows spread across
    {SALT_BUCKETS} reducers instead of melting one. Output per salt
    bucket: hot-key rows (the balance evidence — near-uniform by the
    hash) and total joined rows; the oracle states the UNSALTED join
    semantics plus the same salt histogram, proving the rewrite
    loses and duplicates nothing.

    This is the JOIN twin of q18's salted aggregation — the manual
    form of what AQE skew-join does adaptively, needed when the
    skew is known ahead (the 100 TB hot-tenant case) or the join is
    a build-side replicate that AQE won't split.
    """
    ev = t(spark, sf_dir, "events")
    jkey = F.when(F.col("user_id") % 10 < 5, F.lit(0)).otherwise(
        F.col("user_id")
    )
    salt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("salt:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % SALT_BUCKETS
    )
    fact = ev.select(jkey.alias("jkey"), salt.alias("salt"))
    dim = (
        ev.select(jkey.alias("jkey"))
        .distinct()
        .select(
            "jkey",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(SALT_BUCKETS - 1).cast("long"))
            ).alias("salt"),
        )
    )
    joined = fact.join(dim, ["jkey", "salt"])
    return joined.groupBy("salt").agg(
        F.sum(F.when(F.col("jkey") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("hot_key_rows"),
        F.count(F.lit(1)).alias("all_rows"),
    )


# ----------------------------- q282 multivariate OLS, normal eqns


@register(
    "q282_ols_normal_equations",
    oracle="""
    WITH feat AS (
      SELECT o.o_orderkey,
             CAST(COUNT(*) AS BIGINT) AS x1,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS x2,
             CAST(MIN(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS DECIMAL(28,2))) AS DOUBLE) AS s2,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,2))) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 * y AS DECIMAL(28,2))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 * y AS DECIMAL(28,4))) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
      FROM feat
    ),
    solved AS (
      SELECT n, sy, syy,
             (n * (s11 * s22 - s12 * s12)
              - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2)) AS det,
             (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) AS det0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) AS det1,
             (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) AS det2,
             s1, s2, s11, s12, s22, s1y, s2y
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           (FLOOR(CAST(det0 / det AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta0,
           (FLOOR(CAST(det1 / det AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta1,
           (FLOOR(CAST(det2 / det AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta2,
           (FLOOR(CAST(1.0 - (syy - 2 * ((det0 / det) * sy + (det1 / det) * s1y
                                   + (det2 / det) * s2y)
                        + ((det0 / det) * ((det0 / det) * n
                             + (det1 / det) * s1 + (det2 / det) * s2)
                           + (det1 / det) * ((det0 / det) * s1
                             + (det1 / det) * s11 + (det2 / det) * s12)
                           + (det2 / det) * ((det0 / det) * s2
                             + (det1 / det) * s12 + (det2 / det) * s22)))
                 / (syy - sy * sy / n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS r_squared
    FROM solved
    """,
)
def q282_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate linear regression (order total ~ intercept +
    line count + total quantity) solved in closed form via the
    normal equations — THE distributed-ML pattern for small feature
    counts: one pass reduces the data to the 3×3 Gram matrix and
    X'y moments (ten sufficient statistics, every cross-product
    DECIMAL-exact per q267's rule), then Cramer's rule and R² run
    driver-side-free as a fixed IEEE expression sequence on a 1-row
    frame. No iteration, no per-row residual pass — SSE comes from
    the same moments (y'y − 2β'X'y + β'X'Xβ).

    At 100 TB the reduce is identical (map-side partials into ten
    numbers); a p-feature model only grows the moment vector to
    O(p²) — switch to a vectorized pandas-UDF Gram accumulation
    beyond a few dozen features.
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    feat = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("x2"),
            F.min(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y"),
        )
    )

    def d(col, scale):
        return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")

    s = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        d(F.col("x2"), 2).alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        d(F.col("x1") * F.col("x2"), 2).alias("s12"),
        d(F.col("x2") * F.col("x2"), 4).alias("s22"),
        d(F.col("y"), 2).alias("sy"),
        d(F.col("x1") * F.col("y"), 2).alias("s1y"),
        d(F.col("x2") * F.col("y"), 4).alias("s2y"),
        d(F.col("y") * F.col("y"), 4).alias("syy"),
    )
    c = F.col
    m11 = c("s11") * c("s22") - c("s12") * c("s12")
    m12 = c("s1") * c("s22") - c("s12") * c("s2")
    m13 = c("s1") * c("s12") - c("s11") * c("s2")
    det = c("n") * m11 - c("s1") * m12 + c("s2") * m13
    det0 = c("sy") * m11 - c("s1") * (
        c("s1y") * c("s22") - c("s12") * c("s2y")
    ) + c("s2") * (c("s1y") * c("s12") - c("s11") * c("s2y"))
    det1 = (
        c("n") * (c("s1y") * c("s22") - c("s12") * c("s2y"))
        - c("sy") * m12
        + c("s2") * (c("s1") * c("s2y") - c("s1y") * c("s2"))
    )
    det2 = (
        c("n") * (c("s11") * c("s2y") - c("s1y") * c("s12"))
        - c("s1") * (c("s1") * c("s2y") - c("s1y") * c("s2"))
        + c("sy") * m13
    )
    solved = s.select(
        "n", "sy", "syy", "s1", "s2", "s11", "s12", "s22", "s1y", "s2y",
        det.alias("det"), det0.alias("det0"), det1.alias("det1"),
        det2.alias("det2"),
    )
    b0, b1, b2 = (
        c("det0") / c("det"),
        c("det1") / c("det"),
        c("det2") / c("det"),
    )
    sse = (
        c("syy")
        - 2 * (b0 * c("sy") + b1 * c("s1y") + b2 * c("s2y"))
        + (
            b0 * (b0 * c("n") + b1 * c("s1") + b2 * c("s2"))
            + b1 * (b0 * c("s1") + b1 * c("s11") + b2 * c("s12"))
            + b2 * (b0 * c("s2") + b1 * c("s12") + b2 * c("s22"))
        )
    )
    sst = c("syy") - c("sy") * c("sy") / c("n")
    return solved.select(
        c("n").cast("bigint").alias("n_orders"),
        dround(b0, 6).alias("beta0"),
        dround(b1, 6).alias("beta1"),
        dround(b2, 6).alias("beta2"),
        dround(1.0 - sse / sst, 6).alias("r_squared"),
    )


# ------------------------------------- q283 time-weighted average


@register(
    "q283_time_weighted_average",
    oracle="""
    WITH seq AS (
      SELECT event_type, CAST(ts AS DATE) AS d, ts, value,
             LEAD(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    weighted AS (
      SELECT event_type, d, value,
             date_diff('microseconds', ts,
               COALESCE(nxt, CAST(d + 1 AS TIMESTAMP))) AS dt_us
      FROM seq
    )
    SELECT event_type, d,
           COUNT(*) AS n_events,
           CAST(SUM(dt_us) AS BIGINT) AS covered_us,
           (FLOOR(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * dt_us) AS DOUBLE)
                 / SUM(dt_us) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS twap,
           (FLOOR(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS plain_avg
    FROM weighted
    GROUP BY event_type, d
    """,
)
def q283_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of event value per type and day:
    each observation holds until the next one (last observation
    carries to midnight), and the average weights value by its
    holding duration in microseconds — the correct aggregate for
    sampled state (sensor readings, position marks, gauge metrics),
    where the plain mean (also emitted — the gap is the sampling
    bias) over-weights bursts of closely-spaced points.

    One LEAD window per (type, day) partition orders the
    observations; value×duration products are DECIMAL-exact
    (duration is an integer microsecond count), so the weighted sum
    is partition-order-independent; the end-of-day boundary closes
    the last interval deterministically.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "ts", "value", "event_id"
    )
    w = W.partitionBy("event_type", "d").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(w))
    end_of_day = F.date_add("d", 1).cast("timestamp")
    dt_us = (
        F.unix_micros(F.coalesce(F.col("nxt"), end_of_day))
        - F.unix_micros("ts")
    )
    weighted = seq.select(
        "event_type",
        "d",
        F.col("value").cast("decimal(18,2)").alias("v"),
        dt_us.alias("dt_us"),
    )
    return weighted.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("dt_us").cast("bigint").alias("covered_us"),
        dround(
            F.sum(F.col("v") * F.col("dt_us")).cast("double") / F.sum("dt_us"),
            6,
        ).alias("twap"),
        dround(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias(
            "plain_avg"
        ),
    )


# ------------------------------- q284 time-decay attribution

DECAY_HALFLIFE_MIN = 30  # credit halves every 30 minutes of gap
ATTR_WINDOW = "1 hour"


@register(
    "q284_time_decay_attribution",
    oracle=f"""
    WITH pur AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts,
             CAST(value AS DECIMAL(18,2)) AS amount
      FROM events WHERE event_type = 'purchase'
    ),
    clk AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    touches AS (
      SELECT p.purchase_id, p.amount, c.click_id,
             POWER(0.5, date_diff('microseconds', c.cts, p.pts)
                        / (60000000.0 * {DECAY_HALFLIFE_MIN})) AS w
      FROM pur p JOIN clk c
        ON c.user_id = p.user_id
       AND c.cts <= p.pts
       AND c.cts >= p.pts - INTERVAL 1 HOUR
    ),
    normed AS (
      SELECT purchase_id, click_id,
             CAST(amount AS DOUBLE) * w
               / SUM(w) OVER (PARTITION BY purchase_id) AS credit
      FROM touches
    )
    SELECT click_id,
           COUNT(*) AS n_conversions_touched,
           (FLOOR(CAST(SUM(credit) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS attributed_revenue
    FROM normed GROUP BY click_id
    """,
)
def q284_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch TIME-DECAY attribution: every click within the
    hour before a purchase earns a share of that purchase's revenue,
    weighted by 2^(−gap/half-life) and normalized per conversion —
    the marketing-mix middle ground between last-touch (q171, 100%
    to one click) and linear splits. Per click: conversions touched
    and attributed revenue.

    The touch join is the q16/q187 bounded time-band equi-join on
    user (never unbounded); per-conversion normalization is one
    window over the touch set of each purchase (bounded by clicks-
    per-hour); POWER(0.5, gap/halflife) evaluates the same IEEE ops
    both engines (integer microsecond gaps, shared constants). The
    per-click float sum tolerates a 1e-4 rounding grain — exact-sum
    discipline would need rational weights, which decay deliberately
    isn't.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.col("value").cast("decimal(18,2)").alias("amount"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    gap_us = F.unix_micros("pts") - F.unix_micros("cts")
    touches = pur.join(
        clk,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr(f"INTERVAL {ATTR_WINDOW}")),
    ).select(
        "purchase_id",
        "amount",
        "click_id",
        F.pow(
            F.lit(0.5),
            gap_us / F.lit(60000000.0 * DECAY_HALFLIFE_MIN),
        ).alias("w"),
    )
    wsum = W.partitionBy("purchase_id")
    normed = touches.select(
        "click_id",
        (
            F.col("amount").cast("double")
            * F.col("w")
            / F.sum("w").over(wsum)
        ).alias("credit"),
    )
    return normed.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_conversions_touched"),
        dround(F.sum("credit"), 4).alias("attributed_revenue"),
    )


# ------------------------------------ q285 IVM delta-join merge

IVM_CUTOFF = "1997-01-01"


@register(
    "q285_ivm_delta_join",
    oracle=f"""
    WITH base AS (
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderdate < DATE '{IVM_CUTOFF}'
      GROUP BY c.c_mktsegment
    ),
    delta AS (
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderdate >= DATE '{IVM_CUTOFF}'
      GROUP BY c.c_mktsegment
    ),
    -- the oracle states the FULL recompute, so a broken merge
    -- cannot hash-match
    full_v AS (
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment
    )
    SELECT f.segment,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS base_orders,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS delta_orders,
           CAST(f.n AS BIGINT) AS total_orders,
           CAST(f.rev AS DOUBLE) AS total_rev
    FROM full_v f
    LEFT JOIN base b ON b.segment = f.segment
    LEFT JOIN delta d ON d.segment = f.segment
    """,
)
def q285_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of an aggregate-JOIN view: the
    materialized view (orders⋈customer rolled up per segment) is
    maintained by joining ONLY the delta (orders past the cutoff)
    against the immutable dimension and MERGING the partial
    aggregates into the base state — count by +, revenue by
    decimal +. The oracle states the full recompute, so the hash
    match proves base ⊕ Δ ≡ full (the q248/q97 maintenance
    guarantee, extended to a join view).

    At 100 TB this is the nightly-ingest pattern: the delta join
    touches a day of facts, never the history; the merge shuffles
    |segments| rows. The view emits base/delta provenance columns so
    drift between maintained and recomputed state is auditable
    per key.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit(IVM_CUTOFF).cast("date")

    def agg_view(side):
        return (
            side.join(F.broadcast(c), side["o_custkey"] == c["c_custkey"])
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(28,2)")
                .alias("rev"),
            )
        )

    base = agg_view(o.filter(F.col("o_orderdate") < cutoff)).select(
        "segment", F.col("n").alias("bn"), F.col("rev").alias("brev")
    )
    delta = agg_view(o.filter(F.col("o_orderdate") >= cutoff)).select(
        F.col("segment").alias("dseg"),
        F.col("n").alias("dn"),
        F.col("rev").alias("drev"),
    )
    merged = base.join(
        delta, base["segment"] == delta["dseg"], "full_outer"
    ).select(
        F.coalesce("segment", "dseg").alias("segment"),
        F.coalesce("bn", F.lit(0)).cast("bigint").alias("base_orders"),
        F.coalesce("dn", F.lit(0)).cast("bigint").alias("delta_orders"),
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("bigint")
        .alias("total_orders"),
        (
            F.coalesce("brev", F.lit(0).cast("decimal(28,2)"))
            + F.coalesce("drev", F.lit(0).cast("decimal(28,2)"))
        )
        .cast("double")
        .alias("total_rev"),
    )
    return merged


# ------------------------------ q286 Fellegi-Sunter link scoring

# Agreement / disagreement log-weights ln(m/u), ln((1-m)/(1-u)) for
# m=(.9,.85,.7), u=(.3,.2,.4) — "trained offline", shared literals so
# the score is an identical float-constant sum on both engines.
FS_W = {
    "adj": (1.0986122886681098, -1.9459101490553135),
    "price": (1.4469189829363254, -1.6739764335716714),
    "entries": (0.5596157879354225, -0.6931471805599451),
}
FS_UPPER, FS_LOWER = 1.5, -0.5  # match / possible / non-match cuts


@register(
    "q286_fellegi_sunter_linkage",
    oracle=f"""
    WITH names AS (
      SELECT p_name,
             COUNT(*) AS n_entries,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price,
             string_split(p_name, ' ')[1] AS adjective,
             string_split(p_name, ' ')[-1] AS block
      FROM part GROUP BY p_name
    ),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CASE WHEN levenshtein(a.adjective, b.adjective) <= 1
                  THEN 1 ELSE 0 END AS agr_adj,
             CASE WHEN ABS(a.avg_price - b.avg_price)
                       <= 0.05 * GREATEST(a.avg_price, b.avg_price)
                  THEN 1 ELSE 0 END AS agr_price,
             CASE WHEN a.n_entries = b.n_entries THEN 1 ELSE 0 END
               AS agr_entries
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
    ),
    scored AS (
      SELECT name_a, name_b, agr_adj, agr_price, agr_entries,
             (CASE WHEN agr_adj = 1 THEN CAST({FS_W['adj'][0]!r} AS DOUBLE)
                   ELSE CAST({FS_W['adj'][1]!r} AS DOUBLE) END
              + CASE WHEN agr_price = 1
                     THEN CAST({FS_W['price'][0]!r} AS DOUBLE)
                     ELSE CAST({FS_W['price'][1]!r} AS DOUBLE) END
              + CASE WHEN agr_entries = 1
                     THEN CAST({FS_W['entries'][0]!r} AS DOUBLE)
                     ELSE CAST({FS_W['entries'][1]!r} AS DOUBLE) END)
               AS fs_weight
      FROM pairs
    )
    SELECT name_a, name_b, agr_adj, agr_price, agr_entries,
           (FLOOR(CAST(fs_weight AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS fs_weight,
           CASE WHEN fs_weight >= {FS_UPPER} THEN 'match'
                WHEN fs_weight <= {FS_LOWER} THEN 'non_match'
                ELSE 'possible' END AS decision
    FROM scored
    """,
)
def q286_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over the blocked
    catalog candidates (q256's blocking): each field comparison
    (adjective edit-distance, price proximity, entry-count equality)
    contributes its trained log-likelihood-ratio weight —
    ln(m/u) on agreement, ln((1−m)/(1−u)) on disagreement — and the
    summed score classifies pairs into match / possible /
    non-match against the decision cuts. This is the SCORING MODEL
    the q256 hard threshold stops short of: field evidence is
    weighed by how discriminating each field is, and the 'possible'
    band is the clerical-review queue.

    Same scale shape as q256 (distinct-name grain, block equi-join,
    per-candidate arithmetic); the weights are shared double
    literals summed in a fixed order, so scores hash-match exactly.
    """
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .select(
            "p_name",
            "n_entries",
            "avg_price",
            F.element_at(F.split("p_name", " "), 1).alias("adjective"),
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_entries").alias("ea"),
        F.col("avg_price").alias("pa"),
        F.col("adjective").alias("aa"),
        "block",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_entries").alias("eb"),
        F.col("avg_price").alias("pb"),
        F.col("adjective").alias("ab"),
        F.col("block").alias("block_b"),
    )
    pairs = a.join(
        b,
        (F.col("block") == F.col("block_b"))
        & (F.col("name_a") < F.col("name_b")),
    ).select(
        "name_a",
        "name_b",
        F.when(F.levenshtein("aa", "ab") <= 1, 1).otherwise(0).alias("agr_adj"),
        F.when(
            F.abs(F.col("pa") - F.col("pb"))
            <= 0.05 * F.greatest("pa", "pb"),
            1,
        )
        .otherwise(0)
        .alias("agr_price"),
        F.when(F.col("ea") == F.col("eb"), 1).otherwise(0).alias("agr_entries"),
    )
    w = (
        F.when(F.col("agr_adj") == 1, F.lit(FS_W["adj"][0])).otherwise(
            F.lit(FS_W["adj"][1])
        )
        + F.when(F.col("agr_price") == 1, F.lit(FS_W["price"][0])).otherwise(
            F.lit(FS_W["price"][1])
        )
        + F.when(
            F.col("agr_entries") == 1, F.lit(FS_W["entries"][0])
        ).otherwise(F.lit(FS_W["entries"][1]))
    )
    return pairs.select(
        "name_a",
        "name_b",
        "agr_adj",
        "agr_price",
        "agr_entries",
        dround(w, 6).alias("fs_weight"),
        F.when(w >= FS_UPPER, "match")
        .when(w <= FS_LOWER, "non_match")
        .otherwise("possible")
        .alias("decision"),
    )


# -------------------------- q287 group-sequential experiment looks

OBF_LOOKS = [
    ("2024-01-07", 4.333),
    ("2024-01-14", 2.963),
    ("2024-01-21", 2.359),
    ("2024-01-28", 2.014),
]


def _look_sql(cutoff: str, bound: float) -> str:
    return f"""
    SELECT DATE '{cutoff}' AS look_date,
           CAST({bound!r} AS DOUBLE) AS obf_bound,
           n_c, n_t, x_c, x_t,
           (FLOOR(CAST(z AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS z_stat,
           CASE WHEN ABS(z) >= {bound!r} THEN 1 ELSE 0 END AS crossed
    FROM (
      SELECT n_c, n_t, x_c, x_t,
             (CAST(x_t AS DOUBLE) / NULLIF(n_t, 0)
              - CAST(x_c AS DOUBLE) / NULLIF(n_c, 0))
             / NULLIF(SQRT((CAST(x_c + x_t AS DOUBLE) / NULLIF(n_c + n_t, 0))
                 * (1 - CAST(x_c + x_t AS DOUBLE) / NULLIF(n_c + n_t, 0))
                 * (1.0 / NULLIF(n_c, 0) + 1.0 / NULLIF(n_t, 0))), 0.0) AS z
      FROM (
        SELECT
          CAST(SUM(CASE WHEN v = 'control' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_c,
          CAST(SUM(CASE WHEN v = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_t,
          CAST(SUM(CASE WHEN v = 'control' THEN conv ELSE 0 END) AS BIGINT)
            AS x_c,
          CAST(SUM(CASE WHEN v = 'treatment' THEN conv ELSE 0 END) AS BIGINT)
            AS x_t
        FROM (
          SELECT user_id,
                 CASE WHEN CAST(('0x' || substr(md5('ab:' ||
                        CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2 = 0
                      THEN 'control' ELSE 'treatment' END AS v,
                 MAX(CASE WHEN event_type = 'purchase'
                          AND CAST(ts AS DATE) <= DATE '{cutoff}'
                          THEN 1 ELSE 0 END) AS conv
          FROM events
          WHERE CAST(ts AS DATE) <= DATE '{cutoff}'
          GROUP BY user_id
        )
      )
    )"""


@register(
    "q287_group_sequential_looks",
    oracle=" UNION ALL ".join(_look_sql(c, b) for c, b in OBF_LOOKS),
)
def q287_group_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential experiment monitoring: the two-proportion
    z-statistic (q151's test) evaluated at four interim looks, each
    judged against its O'Brien-Fleming spending boundary (4.333 /
    2.963 / 2.359 / 2.014 — shared literals) — the peeking-safe way
    to monitor a running A/B test, where q151's single fixed-horizon
    cut would inflate false positives if checked daily.

    Each look restricts BOTH enrollment and conversion to events at
    or before its cutoff (as the experiment would have seen them —
    q149's no-leakage rule applied to experimentation); variant
    assignment is the pure user hash, all counts are exact, and the
    z arithmetic is NULLIF-guarded identical IEEE on both engines.
    """
    ev = t(spark, sf_dir, "events")
    variant = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    out = None
    for cutoff, bound in OBF_LOOKS:
        cut = F.lit(cutoff).cast("date")
        per_user = (
            ev.filter(F.to_date("ts") <= cut)
            .groupBy("user_id")
            .agg(
                F.max(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.to_date("ts") <= cut),
                        1,
                    ).otherwise(0)
                ).alias("conv")
            )
            .select(variant.alias("v"), "conv")
        )
        agg = per_user.agg(
            F.sum(F.when(F.col("v") == "control", 1).otherwise(0))
            .cast("bigint")
            .alias("n_c"),
            F.sum(F.when(F.col("v") == "treatment", 1).otherwise(0))
            .cast("bigint")
            .alias("n_t"),
            F.sum(F.when(F.col("v") == "control", F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("x_c"),
            F.sum(
                F.when(F.col("v") == "treatment", F.col("conv")).otherwise(0)
            )
            .cast("bigint")
            .alias("x_t"),
        )
        pc = F.col("x_c").cast("double") / F.nullif(F.col("n_c"), F.lit(0))
        pt = F.col("x_t").cast("double") / F.nullif(F.col("n_t"), F.lit(0))
        pp = (F.col("x_c") + F.col("x_t")).cast("double") / F.nullif(
            F.col("n_c") + F.col("n_t"), F.lit(0)
        )
        z = (pt - pc) / F.nullif(
            F.sqrt(
                pp
                * (1 - pp)
                * (
                    1.0 / F.nullif(F.col("n_c"), F.lit(0))
                    + 1.0 / F.nullif(F.col("n_t"), F.lit(0))
                )
            ),
            F.lit(0.0),
        )
        row = agg.select(
            F.lit(cutoff).cast("date").alias("look_date"),
            F.lit(bound).alias("obf_bound"),
            "n_c",
            "n_t",
            "x_c",
            "x_t",
            dround(z, 4).alias("z_stat"),
            F.when(F.abs(z) >= bound, 1).otherwise(0).alias("crossed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ------------------------------------ q288 Little's law validation


@register(
    "q288_littles_law",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
             MAX(CAST(l.l_shipdate AS DATE)) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    span AS (
      SELECT MIN(s) AS d0, MAX(e) AS d1,
             COUNT(*) AS n_orders,
             CAST(SUM(date_diff('day', s, e) + 1) AS BIGINT) AS total_days
      FROM iv
    ),
    deltas AS (
      SELECT s AS d, 1 AS delta FROM iv
      UNION ALL SELECT e + 1, -1 FROM iv
    ),
    curve AS (
      SELECT d, SUM(dd) OVER (ORDER BY d) AS conc,
             LEAD(d) OVER (ORDER BY d) AS nxt
      FROM (SELECT d, CAST(SUM(delta) AS BIGINT) AS dd
            FROM deltas GROUP BY d)
    ),
    integral AS (
      SELECT CAST(SUM(conc * date_diff('day', d, nxt)) AS BIGINT) AS area
      FROM curve WHERE nxt IS NOT NULL
    )
    SELECT CAST(date_diff('day', sp.d0, sp.d1) + 1 AS BIGINT) AS span_days,
           sp.n_orders,
           (FLOOR(CAST(CAST(i.area AS DOUBLE)
                 / (date_diff('day', sp.d0, sp.d1) + 1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS l_sweep,
           (FLOOR(CAST(CAST(sp.n_orders AS DOUBLE)
                 / (date_diff('day', sp.d0, sp.d1) + 1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS lambda_rate,
           (FLOOR(CAST(CAST(sp.total_days AS DOUBLE) / sp.n_orders AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS w_days,
           (FLOOR(CAST((CAST(sp.n_orders AS DOUBLE)
                  / (date_diff('day', sp.d0, sp.d1) + 1))
                 * (CAST(sp.total_days AS DOUBLE) / sp.n_orders) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS littles_rhs,
           CAST(i.area - sp.total_days AS BIGINT) AS integral_gap
    FROM span sp, integral i
    """,
)
def q288_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (L = λ·W) validated across two INDEPENDENT
    plans: L from the q270 sweep-line concurrency curve integrated
    over the span (step-function area via LEAD gaps), λ·W from
    per-order durations — the queueing-theory identity every
    capacity model rests on. `integral_gap` must be exactly 0: the
    sweep integral and Σ(duration) count the same order-days, so a
    nonzero gap means one of the two plans mis-handles a boundary
    (the q248-style cross-plan consistency audit, applied to
    queueing math).

    All areas and durations are exact BIGINT day counts; only the
    final rates divide to doubles.
    """
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
        .select("s", "e")
    )
    span = iv.agg(
        F.min("s").alias("d0"),
        F.max("e").alias("d1"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.datediff("e", "s") + 1).cast("bigint").alias("total_days"),
    )
    deltas = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("dd"))
    wd = W.orderBy("d")
    curve = daily.select(
        "d",
        F.sum("dd").over(wd).alias("conc"),
        F.lead("d").over(wd).alias("nxt"),
    )
    integral = curve.filter(F.col("nxt").isNotNull()).agg(
        F.sum(F.col("conc") * F.datediff("nxt", "d"))
        .cast("bigint")
        .alias("area")
    )
    j = span.crossJoin(F.broadcast(integral))
    span_days = F.datediff("d1", "d0") + 1
    lam = F.col("n_orders").cast("double") / span_days
    w_days = F.col("total_days").cast("double") / F.col("n_orders")
    return j.select(
        span_days.cast("bigint").alias("span_days"),
        "n_orders",
        dround(F.col("area").cast("double") / span_days, 6).alias("l_sweep"),
        dround(lam, 6).alias("lambda_rate"),
        dround(w_days, 6).alias("w_days"),
        dround(lam * w_days, 6).alias("littles_rhs"),
        (F.col("area") - F.col("total_days")).cast("bigint").alias(
            "integral_gap"
        ),
    )


# -------------------------------- q289 gap-constrained funnel motif

MOTIF_GAP = "1 hour"


@register(
    "q289_funnel_motif",
    oracle="""
    WITH pur AS (
      SELECT user_id, event_id AS pid, ts AS pts, CAST(ts AS DATE) AS d
      FROM events WHERE event_type = 'purchase'
    ),
    vw AS (
      SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
    ),
    ck AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    with_view AS (
      SELECT p.pid, p.d, p.user_id, MAX(v.vts) AS best_view
      FROM pur p LEFT JOIN vw v
        ON v.user_id = p.user_id
       AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL 1 HOUR
      GROUP BY p.pid, p.d, p.user_id
    ),
    with_click AS (
      SELECT w.pid, w.d, w.best_view, MAX(c.cts) AS best_click
      FROM with_view w LEFT JOIN ck c
        ON w.best_view IS NOT NULL
       AND c.user_id = w.user_id
       AND c.cts <= w.best_view AND c.cts >= w.best_view - INTERVAL 1 HOUR
      GROUP BY w.pid, w.d, w.best_view
    )
    SELECT d,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN best_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS with_view,
           CAST(SUM(CASE WHEN best_click IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS full_motif
    FROM with_click GROUP BY d
    """,
)
def q289_funnel_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-constrained sequence-motif counting: a FULL funnel is
    click → view → purchase where EACH step happened within
    {MOTIF_GAP} of the next — the sequential-pattern op that q148's
    unconstrained first-3-events prefixes and q57's same-window
    funnel both miss (a click yesterday must NOT credit a purchase
    today). Per day: purchases, purchases with a qualifying view,
    and complete motifs.

    Each step resolves by conditional MAX over a bounded time-band
    join (q149's strictly-preceding rule chained twice — the second
    band anchors on the FIRST step's resolved timestamp, which a
    single 3-way join cannot express without fan-out). Bands keep
    state bounded at stream scale; LEFT joins preserve
    partial-funnel purchases for the drop-off readout.
    """
    ev = t(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        F.to_date("ts").alias("d"),
    )
    vw = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    ck = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    gap = F.expr(f"INTERVAL {MOTIF_GAP}")
    with_view = (
        pur.join(
            vw,
            (F.col("vu") == F.col("pu"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.col("pts") - gap),
            "left",
        )
        .groupBy("pid", "d", "pu")
        .agg(F.max("vts").alias("best_view"))
    )
    with_click = (
        with_view.join(
            ck,
            F.col("best_view").isNotNull()
            & (F.col("cu") == F.col("pu"))
            & (F.col("cts") <= F.col("best_view"))
            & (F.col("cts") >= F.col("best_view") - gap),
            "left",
        )
        .groupBy("pid", "d", "best_view")
        .agg(F.max("cts").alias("best_click"))
    )
    return with_click.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("best_view").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("with_view"),
        F.sum(F.when(F.col("best_click").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("full_motif"),
    )


# ------------------------------------ q290 business-day SLA lag


@register(
    "q290_business_day_sla",
    oracle="""
    -- the oracle BRUTE-FORCES the weekday count by exploding every
    -- calendar day of every interval (generate_series), while the
    -- Spark side uses the O(1) closed form — the hash match proves
    -- the closed form over every interval shape in the data
    WITH iv AS (
      SELECT o.o_orderpriority,
             CAST(o.o_orderdate AS DATE) AS s,
             CAST(l.l_shipdate AS DATE) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    ),
    counted AS (
      SELECT o_orderpriority, s, e,
             (SELECT COUNT(*) FROM UNNEST(generate_series(s, e,
                      INTERVAL 1 DAY)) AS g(d)
              WHERE (date_diff('day', DATE '1970-01-01', CAST(d AS DATE)) + 3)
                    % 7 < 5) AS bus_days
      FROM iv
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(bus_days) AS BIGINT) AS total_bus_days,
           (FLOOR(CAST(CAST(SUM(bus_days) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS avg_bus_days,
           CAST(MAX(bus_days) AS BIGINT) AS max_bus_days
    FROM counted GROUP BY o_orderpriority
    """,
)
def q290_business_day_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day SLA lag (order date → line ship date, weekends
    excluded) per order priority — the service-level arithmetic
    every fulfillment contract is written in. The engine computes
    weekday counts with an O(1) CLOSED FORM — full_weeks·5 plus a
    two-term remainder expression over the start weekday — while
    the DuckDB oracle brute-forces each interval by exploding its
    calendar days; the hash match proves the closed form on every
    interval shape present.

    Weekday indexing avoids engine DOW conventions entirely:
    wd = (days_since_epoch + 3) mod 7, 0=Monday, identical on both
    sides. The closed form makes the op a pure map-side projection —
    no per-row fan-out at 100 TB (the oracle's explode would be a
    45× row multiplier there).
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("s")
    )
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("e")
    )
    iv = o.join(l, o["o_orderkey"] == l["l_orderkey"]).filter(
        F.col("e") >= F.col("s")
    )
    epoch = F.lit("1970-01-01").cast("date")
    n = F.datediff("e", "s") + 1
    w = (F.datediff(F.col("s"), epoch) + 3) % 7
    fw = F.floor(n / 7)
    rem = n % 7
    bus = (
        fw * 5
        + F.greatest(F.lit(0), F.least(rem, 5 - w))
        + F.greatest(F.lit(0), rem - (7 - w))
    )
    return iv.select("o_orderpriority", bus.alias("bus_days")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("bus_days").cast("bigint").alias("total_bus_days"),
        dround(
            F.sum("bus_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bus_days"),
        F.max("bus_days").cast("bigint").alias("max_bus_days"),
    )


# ---------------------------------- q291 Merkle 2-level drilldown

SUB_BUCKETS = 16


@register(
    "q291_merkle_drilldown",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5('bkt:' || CAST(o_orderkey AS VARCHAR)),
                   1, 7)) AS BIGINT) % {MERKLE_BUCKETS} AS bucket,
             CAST(('0x' || substr(md5('sub:' || CAST(o_orderkey AS VARCHAR)),
                   1, 7)) AS BIGINT) % {SUB_BUCKETS} AS sub,
             CAST(('0x' || substr(md5('dmg:' || CAST(o_orderkey AS VARCHAR)),
                   1, 7)) AS BIGINT) % 1000 AS dmg,
             CAST(('0x' || substr(md5({_ORD_ROW}), 1, 8)) AS BIGINT) AS rh
      FROM orders
    ),
    flagged AS (
      SELECT bucket FROM (
        SELECT bucket,
               CAST(SUM(rh) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN dmg >= {DAMAGE_PERMILLE} THEN rh
                             ELSE 0 END) AS BIGINT) AS cb
        FROM base GROUP BY bucket
      ) WHERE ca <> cb
    ),
    drill AS (
      SELECT b.bucket, b.sub,
             COUNT(*) AS rows_a,
             CAST(SUM(CASE WHEN dmg >= {DAMAGE_PERMILLE} THEN 1 ELSE 0 END)
                  AS BIGINT) AS rows_b,
             CAST(SUM(rh) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN dmg >= {DAMAGE_PERMILLE} THEN rh ELSE 0 END)
                  AS BIGINT) AS cb
      FROM base b JOIN flagged f ON f.bucket = b.bucket
      GROUP BY b.bucket, b.sub
    )
    SELECT bucket, sub, rows_a, rows_b,
           rows_a - rows_b AS rows_missing
    FROM drill WHERE ca <> cb
    """,
)
def q291_merkle_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-2 Merkle drill-down — q264's 'production tree adds
    levels' made real: the diff re-runs at sub-bucket granularity
    ONLY inside the level-1 buckets whose checksums disagreed,
    emitting the damaged sub-buckets with exact row losses. Re-sync
    scope narrows {MERKLE_BUCKETS}×{SUB_BUCKETS}-fold while the
    second pass scans only flagged-bucket rows (the semi-join
    filter is the point: at 100 TB level 2 touches ~damage-rate of
    the table, not all of it).

    Same deterministic damage model and canonical row hash as q264,
    so the two levels compose into one auditable narrative: which
    256th of the table, then which 4096th.
    """
    o = t(spark, sf_dir, "orders")
    kh = lambda tag: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(F.lit(tag), F.col("o_orderkey").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.col("o_orderdate").cast("string"),
        F.col("o_orderpriority"),
    )
    base = o.select(
        (kh("bkt:") % MERKLE_BUCKETS).alias("bucket"),
        (kh("sub:") % SUB_BUCKETS).alias("sub"),
        (kh("dmg:") % 1000).alias("dmg"),
        F.conv(F.substring(F.md5(row_str.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("rh"),
    )
    intact = F.when(F.col("dmg") >= DAMAGE_PERMILLE, F.col("rh")).otherwise(0)
    l1 = base.groupBy("bucket").agg(
        F.sum("rh").cast("bigint").alias("ca"),
        F.sum(intact).cast("bigint").alias("cb"),
    )
    flagged = l1.filter(F.col("ca") != F.col("cb")).select("bucket")
    drill = (
        base.join(flagged, "bucket")
        .groupBy("bucket", "sub")
        .agg(
            F.count(F.lit(1)).alias("rows_a"),
            F.sum(F.when(F.col("dmg") >= DAMAGE_PERMILLE, 1).otherwise(0))
            .cast("bigint")
            .alias("rows_b"),
            F.sum("rh").cast("bigint").alias("ca"),
            F.sum(intact).cast("bigint").alias("cb"),
        )
    )
    return drill.filter(F.col("ca") != F.col("cb")).select(
        "bucket",
        "sub",
        "rows_a",
        "rows_b",
        (F.col("rows_a") - F.col("rows_b")).alias("rows_missing"),
    )


# ------------------------------------------ q292 QQ diagnostic

QQ_PROBS = {
    0.1: -1.2815515655446008,
    0.2: -0.8416212335729142,
    0.3: -0.5244005127080407,
    0.4: -0.2533471031357998,
    0.5: 0.0,
    0.6: 0.2533471031357998,
    0.7: 0.5244005127080407,
    0.8: 0.8416212335729144,
    0.9: 1.2815515655446008,
}


@register(
    "q292_qq_normality",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS q
      FROM orders
    ),
    qs AS (
      {" UNION ALL ".join(
        f"SELECT CAST({p!r} AS DOUBLE) AS prob,"
        f" CAST({z!r} AS DOUBLE) AS z_expected,"
        f" (SELECT quantile_cont(o_totalprice, {p!r}) FROM orders) AS emp"
        for p, z in QQ_PROBS.items())}
    )
    SELECT prob, (FLOOR(CAST(z_expected AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS z_expected,
           (FLOOR(CAST((emp - s / n) / SQRT((q - s * s / n) / (n - 1)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS z_observed,
           (FLOOR(CAST((emp - s / n) / SQRT((q - s * s / n) / (n - 1))
                 - z_expected AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS deviation
    FROM qs, stats
    """,
)
def q292_qq_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ normality diagnostic of order totals: the standardized
    empirical quantile at nine probabilities against the standard-
    normal quantile (shared literals — no engine inv_cdf
    dependency), with per-point deviation. The table form of the
    QQ plot every distributional assumption check starts with —
    this fixture's near-uniform prices show the signature flat-
    tails-fat-middle S-curve, exactly what the diagnostic exists to
    reveal (q257's Benford screen for the continuous case).

    Mean/variance come from DECIMAL-exact moments; quantiles use
    the q28 shared-interpolation percentile; the standardization is
    identical IEEE arithmetic on a 9-row frame.
    """
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    o = t(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("q"),
        *[
            F.percentile("o_totalprice", F.lit(p)).alias(f"emp{i}")
            for i, p in enumerate(QQ_PROBS)
        ],
    )
    rows = None
    for i, (p, z) in enumerate(QQ_PROBS.items()):
        zobs = (F.col(f"emp{i}") - F.col("s") / F.col("n")) / F.sqrt(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        row = stats.select(
            F.lit(p).alias("prob"),
            dround(F.lit(z), 6).alias("z_expected"),
            dround(zobs, 6).alias("z_observed"),
            dround(zobs - F.lit(z), 6).alias("deviation"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


# ------------------------------------ q293 label-shift (BBSE)


@register(
    "q293_label_shift_bbse",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN source IN ('src0','src1','src2','src3','src4',
                                  'src5','src6','src7','src8','src9')
                  THEN 'src' ELSE 'tgt' END AS split,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    conf AS (
      SELECT
        CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / NULLIF(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END), 0) AS tpr,
        CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / NULLIF(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END), 0) AS fpr
      FROM scored WHERE split = 'src'
    ),
    tgt AS (
      SELECT CAST(SUM(pred) AS DOUBLE) / COUNT(*) AS mu,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS actual,
             COUNT(*) AS n_tgt
      FROM scored WHERE split = 'tgt'
    )
    SELECT CAST(t.n_tgt AS BIGINT) AS n_target,
           (FLOOR(CAST(c.tpr AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS clf_tpr,
           (FLOOR(CAST(c.fpr AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS clf_fpr,
           (FLOOR(CAST(t.mu AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS target_pred_rate,
           (FLOOR(CAST((t.mu - c.fpr) / NULLIF(c.tpr - c.fpr, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS bbse_estimate,
           (FLOOR(CAST(t.actual AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS actual_rate,
           (FLOOR(CAST(ABS((t.mu - c.fpr) / NULLIF(c.tpr - c.fpr, 0.0)
                 - t.actual) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS abs_error
    FROM conf c, tgt t
    """,
)
def q293_label_shift_bbse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-shift estimation via black-box shift estimation (BBSE,
    Lipton et al. 2018): the target split's TRUE positive-class rate
    is recovered from only (a) a classifier's confusion rates on the
    labeled SOURCE split and (b) its prediction rate on the target —
    q = (μ − FPR)/(TPR − FPR) — the monitoring op for deployed
    models when target labels don't exist yet. Here the 'classifier'
    is a length threshold, source = the first ten sources, and the
    recovered rate is compared against the actual (known in the
    fixture, unknown in production).

    Three class-count reduces, then scalar algebra on 1-row frames;
    NULLIF guards the degenerate no-signal classifier (TPR = FPR).
    The k-class generalization inverts the k×k confusion matrix —
    q282's Cramer machinery.
    """
    src_set = [f"src{i}" for i in range(10)]
    scored = t(spark, sf_dir, "documents").select(
        F.when(F.col("source").isin(src_set), "src")
        .otherwise("tgt")
        .alias("split"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") > 300, 1).otherwise(0).alias("pred"),
    )
    conf = scored.filter(F.col("split") == "src").agg(
        (
            F.sum(
                F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0)
            ).cast("double")
            / F.nullif(
                F.sum(F.when(F.col("y") == 1, 1).otherwise(0)), F.lit(0)
            )
        ).alias("tpr"),
        (
            F.sum(
                F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0)
            ).cast("double")
            / F.nullif(
                F.sum(F.when(F.col("y") == 0, 1).otherwise(0)), F.lit(0)
            )
        ).alias("fpr"),
    )
    tgt = scored.filter(F.col("split") == "tgt").agg(
        (F.sum("pred").cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("actual"),
        F.count(F.lit(1)).alias("n_tgt"),
    )
    j = conf.crossJoin(F.broadcast(tgt))
    est = (F.col("mu") - F.col("fpr")) / F.nullif(
        F.col("tpr") - F.col("fpr"), F.lit(0.0)
    )
    return j.select(
        F.col("n_tgt").cast("bigint").alias("n_target"),
        dround("tpr", 6).alias("clf_tpr"),
        dround("fpr", 6).alias("clf_fpr"),
        dround("mu", 6).alias("target_pred_rate"),
        dround(est, 6).alias("bbse_estimate"),
        dround("actual", 6).alias("actual_rate"),
        dround(F.abs(est - F.col("actual")), 6).alias("abs_error"),
    )


# ------------------------------------ q294 CDC net-effect compaction


@register(
    "q294_cdc_compaction",
    oracle="""
    WITH log AS (
      SELECT user_id AS key, ts, event_id,
             CASE WHEN CAST(('0x' || substr(md5('op:' ||
                    CAST(event_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10 < 5
                  THEN 'U'
                  WHEN CAST(('0x' || substr(md5('op:' ||
                    CAST(event_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10 < 8
                  THEN 'I' ELSE 'D' END AS op
      FROM events
    ),
    ends AS (
      SELECT key,
             MIN(CONCAT(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '|',
                 lpad(CAST(event_id AS VARCHAR), 12, '0'), '|', op))[12:]
               AS first_tag,
             MAX(CONCAT(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '|',
                 lpad(CAST(event_id AS VARCHAR), 12, '0'), '|', op))[12:]
               AS last_tag,
             COUNT(*) AS n_ops
      FROM log GROUP BY key
    ),
    classified AS (
      SELECT key, n_ops,
             substr(first_tag, len(first_tag), 1) AS first_op,
             substr(last_tag, len(last_tag), 1) AS last_op
      FROM ends
    )
    SELECT CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'noop'
                WHEN first_op = 'I' THEN 'insert'
                WHEN last_op = 'D' THEN 'delete'
                ELSE 'upsert' END AS net_op,
           COUNT(*) AS n_keys,
           CAST(SUM(n_ops) AS BIGINT) AS ops_compacted
    FROM classified GROUP BY 1
    """,
)
def q294_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC net-effect compaction: a change log (ops synthesized
    I/U/D per event by hash) collapses to ONE net operation per key
    before hitting the warehouse MERGE — insert-then-delete is a
    no-op, insert-then-anything is an insert, surviving-then-delete
    a delete, else an upsert (first and last op decide; the middle
    is irrelevant). Per net class: keys and raw ops absorbed — the
    compaction ratio is why Debezium→warehouse pipelines batch this
    way.

    First/last ops resolve via MIN/MAX over an order-embedding tag
    (timestamp‖id‖op string — the argmin/argmax-without-a-window
    trick of q155/q197, so compaction is ONE hash aggregate, no
    per-key sort window); the `[12:]`-style slicing differences
    between engines are avoided by slicing AFTER the aggregate.
    """
    ev = t(spark, sf_dir, "events")
    opv = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("op:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    op = (
        F.when(opv < 5, "U").when(opv < 8, "I").otherwise("D")
    )
    tag = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
        F.lit("|"),
        op,
    )
    ends = ev.select(F.col("user_id").alias("key"), tag.alias("tag")).groupBy(
        "key"
    ).agg(
        F.min("tag").alias("first_tag"),
        F.max("tag").alias("last_tag"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    first_op = F.substring(F.col("first_tag"), -1, 1)
    last_op = F.substring(F.col("last_tag"), -1, 1)
    classified = ends.select(
        "n_ops",
        F.when((first_op == "I") & (last_op == "D"), "noop")
        .when(first_op == "I", "insert")
        .when(last_op == "D", "delete")
        .otherwise("upsert")
        .alias("net_op"),
    )
    return classified.groupBy("net_op").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_ops").cast("bigint").alias("ops_compacted"),
    )


# --------------------------------------- q295 file layout audit

TARGET_FILE_MB = 128
EST_ROW_BYTES = 120  # planning estimate for the orders row width
TINY_FILE_MB = 16


@register(
    "q295_file_layout_audit",
    oracle=f"""
    WITH parts AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part_month,
             COUNT(*) AS n_rows,
             CAST(COUNT(*) * {EST_ROW_BYTES} AS BIGINT) AS est_bytes
      FROM orders GROUP BY 1
    )
    SELECT part_month, n_rows, est_bytes,
           CAST(GREATEST(1, CEIL(CAST(est_bytes AS DOUBLE)
                / ({TARGET_FILE_MB} * 1048576.0))) AS BIGINT) AS n_files,
           CASE WHEN est_bytes < {TINY_FILE_MB} * 1048576 THEN 1 ELSE 0 END
             AS tiny_file_flag,
           (FLOOR(CAST(CAST(est_bytes AS DOUBLE) / GREATEST(1,
                 CEIL(CAST(est_bytes AS DOUBLE)
                      / ({TARGET_FILE_MB} * 1048576.0))) / 1048576.0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS avg_file_mb
    FROM parts
    """,
)
def q295_file_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-write layout audit — the table-maintenance
    pre-flight for 'the small-files problem': per month partition of
    a date-partitioned orders table, the row count, planned bytes, 
    files at a {TARGET_FILE_MB} MiB target, a tiny-partition flag
    (< {TINY_FILE_MB} MiB — these should merge into neighbors or the
    write should drop to a coarser partition key), and the resulting
    average file size. This is the audit that decides `maxRecordsPer
    File` / `repartition(n)` / compaction before a 100 TB write, the
    1-D companion of q213's Z-order layout audit — read
    amplification at scale is file-count-driven, and Spark lists
    partitions in parallel but opens every file serially per task.

    One partition-grain reduce; the file math is integer/IEEE
    arithmetic on the bounded partition table.
    """
    parts = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("part_month")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "part_month",
            "n_rows",
            (F.col("n_rows") * EST_ROW_BYTES).cast("bigint").alias("est_bytes"),
        )
    )
    n_files = F.greatest(
        F.lit(1),
        F.ceil(
            F.col("est_bytes").cast("double") / (TARGET_FILE_MB * 1048576.0)
        ),
    )
    return parts.select(
        "part_month",
        "n_rows",
        "est_bytes",
        n_files.cast("bigint").alias("n_files"),
        F.when(F.col("est_bytes") < TINY_FILE_MB * 1048576, 1)
        .otherwise(0)
        .alias("tiny_file_flag"),
        dround(
            F.col("est_bytes").cast("double") / n_files / 1048576.0, 6
        ).alias("avg_file_mb"),
    )


# ------------------------------------ q296 deletion blast radius

ERASE_PERMILLE = 20  # ~2% of subjects request erasure


def _erase_pred(col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('erase:' || CAST({col} AS VARCHAR)), 1, 7))"
        f" AS BIGINT) % 1000 < {ERASE_PERMILLE}"
    )


@register(
    "q296_deletion_blast_radius",
    oracle=f"""
    SELECT 'customer' AS table_name,
           COUNT(DISTINCT c_custkey) AS n_subjects,
           COUNT(*) AS rows_affected
    FROM customer WHERE {_erase_pred('c_custkey')}
    UNION ALL
    SELECT 'orders',
           COUNT(DISTINCT o_custkey),
           COUNT(*)
    FROM orders WHERE {_erase_pred('o_custkey')}
    UNION ALL
    SELECT 'lineitem',
           COUNT(DISTINCT o.o_custkey),
           COUNT(*)
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE {_erase_pred('o.o_custkey')}
    UNION ALL
    SELECT 'events',
           COUNT(DISTINCT user_id),
           COUNT(*)
    FROM events WHERE {_erase_pred('user_id')}
    """,
)
def q296_deletion_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure blast-radius census: for a deterministic
    ~2% sample of subjects (the pure-hash membership rule — in
    production, the actual request list), count every row each
    table would delete or anonymize — customers directly, orders by
    foreign key, lineitems through the orders bridge, events by
    user. The pre-flight every GDPR/CCPA deletion pipeline runs
    before mutating 100 TB: the per-table counts size the rewrite
    (delete-vector vs partition rewrite) and the bridge join is the
    reminder that erasure propagates through REFERENCES, not just
    key equality (q109's referential-integrity audit, weaponized).

    Each branch is one scan + reduce; the lineitem branch reuses
    the orders relation as a broadcast bridge keyed by the erasure
    predicate.
    """

    def erase(col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("erase:"), col.cast("string")).cast(
                            "binary"
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 1000
            < ERASE_PERMILLE
        )

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    ev = t(spark, sf_dir, "events")
    rows = [
        c.filter(erase(F.col("c_custkey"))).agg(
            F.lit("customer").alias("table_name"),
            F.count_distinct("c_custkey").alias("n_subjects"),
            F.count(F.lit(1)).alias("rows_affected"),
        ),
        o.filter(erase(F.col("o_custkey"))).agg(
            F.lit("orders").alias("table_name"),
            F.count_distinct("o_custkey").alias("n_subjects"),
            F.count(F.lit(1)).alias("rows_affected"),
        ),
        l.join(
            F.broadcast(
                o.filter(erase(F.col("o_custkey"))).select(
                    "o_orderkey", "o_custkey"
                )
            ),
            l["l_orderkey"] == F.col("o_orderkey"),
        ).agg(
            F.lit("lineitem").alias("table_name"),
            F.count_distinct("o_custkey").alias("n_subjects"),
            F.count(F.lit(1)).alias("rows_affected"),
        ),
        ev.filter(erase(F.col("user_id"))).agg(
            F.lit("events").alias("table_name"),
            F.count_distinct("user_id").alias("n_subjects"),
            F.count(F.lit(1)).alias("rows_affected"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------- q297 k-fold leave-fold-out OLS

OLS_FOLDS = 5


def _cramer_sql(p: str) -> dict[str, str]:
    """Cramer's-rule expressions for the 3-feature normal equations
    over moment columns named {p}n,{p}s1,…  (shared by the oracle)."""
    n, s1, s2 = f"{p}n", f"{p}s1", f"{p}s2"
    s11, s12, s22 = f"{p}s11", f"{p}s12", f"{p}s22"
    sy, s1y, s2y = f"{p}sy", f"{p}s1y", f"{p}s2y"
    det = (
        f"({n} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s12} - {s11} * {s2}))"
    )
    det0 = (
        f"({sy} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
        f" + {s2} * ({s1y} * {s12} - {s11} * {s2y}))"
    )
    det1 = (
        f"({n} * ({s1y} * {s22} - {s12} * {s2y})"
        f" - {sy} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
    )
    det2 = (
        f"({n} * ({s11} * {s2y} - {s1y} * {s12})"
        f" - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
        f" + {sy} * ({s1} * {s12} - {s11} * {s2}))"
    )
    return {"det": det, "det0": det0, "det1": det1, "det2": det2}


_C = _cramer_sql("t")


@register(
    "q297_kfold_ols_stability",
    oracle=f"""
    WITH feat AS (
      SELECT o.o_orderkey,
             CAST(('0x' || substr(md5('fold:' ||
                   CAST(o.o_orderkey AS VARCHAR)), 1, 7)) AS BIGINT)
               % {OLS_FOLDS} AS fold,
             CAST(COUNT(*) AS BIGINT) AS x1,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS x2,
             CAST(MIN(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ),
    fm AS (
      SELECT fold,
             CAST(COUNT(*) AS DOUBLE) AS fn,
             CAST(SUM(x1) AS DOUBLE) AS fs1,
             CAST(SUM(CAST(x2 AS DECIMAL(28,2))) AS DOUBLE) AS fs2,
             CAST(SUM(x1 * x1) AS DOUBLE) AS fs11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,2))) AS DOUBLE) AS fs12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS fs22,
             CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS fsy,
             CAST(SUM(CAST(x1 * y AS DECIMAL(28,2))) AS DOUBLE) AS fs1y,
             CAST(SUM(CAST(x2 * y AS DECIMAL(28,4))) AS DOUBLE) AS fs2y
      FROM feat GROUP BY fold
    ),
    gm AS (
      SELECT CAST(SUM(CAST(fn AS DECIMAL(28,0))) AS DOUBLE) AS gn,
             CAST(SUM(CAST(fs1 AS DECIMAL(28,0))) AS DOUBLE) AS gs1,
             CAST(SUM(CAST(fs2 AS DECIMAL(28,2))) AS DOUBLE) AS gs2,
             CAST(SUM(CAST(fs11 AS DECIMAL(28,0))) AS DOUBLE) AS gs11,
             CAST(SUM(CAST(fs12 AS DECIMAL(28,2))) AS DOUBLE) AS gs12,
             CAST(SUM(CAST(fs22 AS DECIMAL(28,4))) AS DOUBLE) AS gs22,
             CAST(SUM(CAST(fsy AS DECIMAL(28,2))) AS DOUBLE) AS gsy,
             CAST(SUM(CAST(fs1y AS DECIMAL(28,2))) AS DOUBLE) AS gs1y,
             CAST(SUM(CAST(fs2y AS DECIMAL(28,4))) AS DOUBLE) AS gs2y
      FROM fm
    ),
    train AS (
      SELECT fold,
             gn - fn AS tn, gs1 - fs1 AS ts1, gs2 - fs2 AS ts2,
             gs11 - fs11 AS ts11, gs12 - fs12 AS ts12, gs22 - fs22 AS ts22,
             gsy - fsy AS tsy, gs1y - fs1y AS ts1y, gs2y - fs2y AS ts2y
      FROM fm, gm
    )
    SELECT fold,
           CAST(tn AS BIGINT) AS n_train,
           (FLOOR(CAST({_C['det0']} / {_C['det']} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta0,
           (FLOOR(CAST({_C['det1']} / {_C['det']} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta1,
           (FLOOR(CAST({_C['det2']} / {_C['det']} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta2
    FROM train
    """,
)
def q297_kfold_ols_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold model-stability audit for the q282 regression, built
    on SUBTRACTABLE sufficient statistics: each fold's training
    moments are global − fold (one pass computes all {OLS_FOLDS}
    leave-fold-out models — no per-fold re-scan, the property that
    makes cross-validation affordable at 100 TB), and each row is
    that fold's held-out-trained coefficients. Spread across folds
    IS the stability readout: coefficients that swing with a 20%
    data change are not trustworthy.

    Folds assign by pure key hash (engine-reproducible, q88's
    rule); moments stay DECIMAL-exact through both the per-fold
    reduce and the global re-sum, so the subtraction is exact and
    the Cramer solve identical IEEE on both engines.
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("fold:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % OLS_FOLDS
    )
    feat = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("x2"),
            F.min(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y"),
        )
        .select(fold.alias("fold"), "x1", "x2", "y")
    )

    def dsum(col, scale):
        return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")

    fm = feat.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("fn"),
        F.sum("x1").cast("double").alias("fs1"),
        dsum(F.col("x2"), 2).alias("fs2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("fs11"),
        dsum(F.col("x1") * F.col("x2"), 2).alias("fs12"),
        dsum(F.col("x2") * F.col("x2"), 4).alias("fs22"),
        dsum(F.col("y"), 2).alias("fsy"),
        dsum(F.col("x1") * F.col("y"), 2).alias("fs1y"),
        dsum(F.col("x2") * F.col("y"), 4).alias("fs2y"),
    )
    gm = fm.agg(
        *[
            dsum(F.col(c), sc).alias("g" + c[1:])
            for c, sc in [
                ("fn", 0), ("fs1", 0), ("fs2", 2), ("fs11", 0),
                ("fs12", 2), ("fs22", 4), ("fsy", 2), ("fs1y", 2),
                ("fs2y", 4),
            ]
        ]
    )
    train = fm.crossJoin(F.broadcast(gm)).select(
        "fold",
        *[
            (F.col("g" + c) - F.col("f" + c)).alias("t" + c)
            for c in ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
        ],
    )
    c = F.col
    m11 = c("ts11") * c("ts22") - c("ts12") * c("ts12")
    m12 = c("ts1") * c("ts22") - c("ts12") * c("ts2")
    m13 = c("ts1") * c("ts12") - c("ts11") * c("ts2")
    det = c("tn") * m11 - c("ts1") * m12 + c("ts2") * m13
    det0 = (
        c("tsy") * m11
        - c("ts1") * (c("ts1y") * c("ts22") - c("ts12") * c("ts2y"))
        + c("ts2") * (c("ts1y") * c("ts12") - c("ts11") * c("ts2y"))
    )
    det1 = (
        c("tn") * (c("ts1y") * c("ts22") - c("ts12") * c("ts2y"))
        - c("tsy") * m12
        + c("ts2") * (c("ts1") * c("ts2y") - c("ts1y") * c("ts2"))
    )
    det2 = (
        c("tn") * (c("ts11") * c("ts2y") - c("ts1y") * c("ts12"))
        - c("ts1") * (c("ts1") * c("ts2y") - c("ts1y") * c("ts2"))
        + c("tsy") * m13
    )
    return train.select(
        "fold",
        c("tn").cast("bigint").alias("n_train"),
        dround(det0 / det, 6).alias("beta0"),
        dround(det1 / det, 6).alias("beta1"),
        dround(det2 / det, 6).alias("beta2"),
    )


# ----------------------------------------- q298 SPRT daily looks

SPRT_LR_POS = 0.06899287148695142  # ln(0.75/0.70)
SPRT_LR_NEG = -0.1823215567939547  # ln(0.25/0.30)
SPRT_A = 2.9444389791664403  # ln((1-beta)/alpha), alpha=beta=0.05
SPRT_B = -2.9444389791664407


@register(
    "q298_sprt_daily",
    oracle=f"""
    WITH subj AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS enroll_d,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events
      WHERE CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                 1, 7)) AS BIGINT) % 2 = 1  -- treatment arm only
      GROUP BY user_id
    ),
    daily AS (
      SELECT enroll_d AS d, COUNT(*) AS n_new,
             CAST(SUM(conv) AS BIGINT) AS x_new
      FROM subj GROUP BY enroll_d
    ),
    cum AS (
      SELECT d,
             CAST(SUM(n_new) OVER w AS BIGINT) AS n_cum,
             CAST(SUM(x_new) OVER w AS BIGINT) AS x_cum
      FROM daily WINDOW w AS (ORDER BY d)
    )
    SELECT d,
           n_cum, x_cum,
           (FLOOR(CAST(x_cum * CAST({SPRT_LR_POS!r} AS DOUBLE)
                 + (n_cum - x_cum) * CAST({SPRT_LR_NEG!r} AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS llr,
           CASE WHEN x_cum * CAST({SPRT_LR_POS!r} AS DOUBLE)
                     + (n_cum - x_cum) * CAST({SPRT_LR_NEG!r} AS DOUBLE)
                     >= {SPRT_A!r} THEN 'accept_h1'
                WHEN x_cum * CAST({SPRT_LR_POS!r} AS DOUBLE)
                     + (n_cum - x_cum) * CAST({SPRT_LR_NEG!r} AS DOUBLE)
                     <= {SPRT_B!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    """,
)
def q298_sprt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test, evaluated daily on
    the treatment arm's conversion stream: cumulative log-likelihood
    ratio for H1: p=0.75 vs H0: p=0.70, against the ±ln(19)
    boundaries (α=β=0.05) — the always-valid alternative to q287's
    scheduled looks: SPRT may stop ANY day the LLR escapes the
    band, with error rates guaranteed by construction.

    Subjects reduce to (enrollment day, converted) once; the daily
    series is a bounded calendar cumsum; the LLR is exact counts ×
    shared literals, so every day's statistic and decision
    hash-match. Contrast with q287 (4 fixed looks) and q151 (one
    fixed-horizon test) — the experimentation suite now carries all
    three monitoring disciplines.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 1
    )
    subj = (
        ev.filter(treat)
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("d"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    daily = subj.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum("conv").cast("bigint").alias("x_new"),
    )
    w = W.orderBy("d")
    cum = daily.select(
        "d",
        F.sum("n_new").over(w).cast("bigint").alias("n_cum"),
        F.sum("x_new").over(w).cast("bigint").alias("x_cum"),
    )
    llr = F.col("x_cum") * F.lit(SPRT_LR_POS) + (
        F.col("n_cum") - F.col("x_cum")
    ) * F.lit(SPRT_LR_NEG)
    return cum.select(
        "d",
        "n_cum",
        "x_cum",
        dround(llr, 6).alias("llr"),
        F.when(llr >= SPRT_A, "accept_h1")
        .when(llr <= SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


# ------------------------------- q299 negative edge sampling

NEG_PER_NODE = 3


@register(
    "q299_negative_edge_sampling",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    capped AS (
      SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               COUNT(*) OVER (PARTITION BY l_partkey) AS deg
        FROM ps
      ) WHERE deg <= {KCORE_CAP}
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM capped a JOIN capped b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    nodes AS (SELECT DISTINCT s_suppkey AS u FROM supplier),
    nn AS (SELECT COUNT(*) AS n, MIN(u) AS base FROM nodes),
    cand AS (
      SELECT nodes.u,
             base + CAST(('0x' || substr(md5('neg:' ||
                    CAST(nodes.u AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
                    1, 7)) AS BIGINT) % n AS v
      FROM nodes, nn, UNNEST(range({NEG_PER_NODE})) AS r(k)
    ),
    ordered AS (
      SELECT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM cand WHERE u <> v
    ),
    negs AS (
      SELECT DISTINCT o.u, o.v
      FROM ordered o
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = o.u AND e.v = o.v)
    )
    SELECT u, COUNT(*) AS n_negatives, CAST(MIN(v) AS BIGINT) AS min_v
    FROM negs GROUP BY u
    """,
)
def q299_negative_edge_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-edge sampling for link-prediction
    training over the co-supply graph: each supplier draws
    {NEG_PER_NODE} hash-derived candidate partners, candidates
    canonicalize to undirected pairs, and an anti-join against the
    REAL edge set keeps only true non-edges — the contrastive
    negatives a GNN/link-prediction loss consumes (q237's
    hard-negative mining, for graphs; hash-based so resumable jobs
    redraw the identical sample, q88's reproducibility rule).

    Candidate generation is corpus-size-free fan-out (|nodes|×k);
    the non-edge check is one anti-join (Spark plans left_anti)
    against the reduced edge list — never a |V|² complement
    materialization, which is the only wrong way to do this at
    scale.
    """
    # edge build kept as the codegen window-cap + theta self-join
    # (r9 A/B: the posting-list variant measured 6.5-8.6 vs 3.1-3.3 s
    # interleaved — one anti-join consumer, no recompute to save, and
    # the allocating collect_set/explode loses to the codegen join)
    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    from pyspark.sql import Window as W

    capped = (
        ps.withColumn(
            "deg", F.count(F.lit(1)).over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("deg") <= KCORE_CAP)
        .drop("deg")
    )
    b = capped.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sv")
    )
    edges = (
        capped.join(
            b,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_suppkey") < F.col("sv")),
        )
        .select(F.col("l_suppkey").alias("eu"), F.col("sv").alias("ev"))
        .distinct()
    )
    nodes = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("u")
    ).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"), F.min("u").alias("base"))
    cand = (
        nodes.crossJoin(F.broadcast(nn))
        .select(
            "u",
            "n",
            "base",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(NEG_PER_NODE - 1).cast("long"))
            ).alias("k"),
        )
        .select(
            "u",
            (
                F.col("base")
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"),
                                F.col("u").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("v"),
        )
    )
    ordered = cand.filter(F.col("u") != F.col("v")).select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    negs = ordered.join(
        edges,
        (ordered["u"] == edges["eu"]) & (ordered["v"] == edges["ev"]),
        "left_anti",
    )
    return negs.groupBy("u").agg(
        F.count(F.lit(1)).alias("n_negatives"),
        F.min("v").cast("bigint").alias("min_v"),
    )


# -------------------------- q300 pipeline funnel v2 (round-2 ops)

FUNNEL_DUP_FRAC = 0.5  # max cross-doc duplicated-window fraction
FUNNEL_FERT = 3.0  # max BPE tokens per whitespace word
FUNNEL_SEQ_LEN = 512


@register(
    "q300_pipeline_funnel_v2",
    oracle=f"""
    WITH ingest AS (
      SELECT doc_id, text, lang,
             len(regexp_extract_all(text, '{{BPE}}')) AS n_tok,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    pii AS (
      SELECT * FROM ingest
      WHERE len(regexp_extract_all(text, '[0-9]{{6,}}')) = 0
        AND len(regexp_extract_all(text, '[A-Za-z]+#[0-9]+')) = 0
    ),
    uniq AS (
      SELECT * FROM pii
      WHERE doc_id IN (
        SELECT MIN(doc_id) FROM pii GROUP BY md5(text)
      )
    ),
    wins AS (
      SELECT u.doc_id,
             md5(array_to_string(toks[i:i + 7], ' ')) AS wh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq) u,
           UNNEST(range(1, len(toks) - 6)) AS r(i)
      WHERE len(toks) >= 8
    ),
    marks AS (SELECT wh, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY wh),
    dupfrac AS (
      SELECT w.doc_id,
             CAST(SUM(CASE WHEN m.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS frac
      FROM wins w JOIN marks m ON m.wh = w.wh GROUP BY w.doc_id
    ),
    substr_clean AS (
      SELECT u.* FROM uniq u LEFT JOIN dupfrac d ON d.doc_id = u.doc_id
      WHERE COALESCE(d.frac, 0) <= {FUNNEL_DUP_FRAC}
    ),
    fertile AS (
      SELECT * FROM substr_clean
      WHERE CAST(n_tok AS DOUBLE) / n_words <= {FUNNEL_FERT}
    )
    SELECT 1 AS stage_no, 'ingest' AS stage,
           COUNT(*) AS docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
    FROM ingest
    UNION ALL SELECT 2, 'pii_clean', COUNT(*),
           CAST(SUM(n_tok) AS BIGINT) FROM pii
    UNION ALL SELECT 3, 'exact_unique', COUNT(*),
           CAST(SUM(n_tok) AS BIGINT) FROM uniq
    UNION ALL SELECT 4, 'substr_clean', COUNT(*),
           CAST(SUM(n_tok) AS BIGINT) FROM substr_clean
    UNION ALL SELECT 5, 'fertility_ok', COUNT(*),
           CAST(SUM(n_tok) AS BIGINT) FROM fertile
    UNION ALL SELECT 6, 'packed_sequences',
           CAST(CEIL(CAST(SUM(n_tok) AS DOUBLE) / {FUNNEL_SEQ_LEN}) AS BIGINT),
           CAST(SUM(n_tok) AS BIGINT) FROM fertile
    """.replace("{BPE}", BPE_RE),
)
def q300_pipeline_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 end-to-end training-data funnel — the composition
    readout of this round's operators, per stage (docs and tokens
    surviving): ingest → PII/identifier scrub (q252's patterns as a
    GATE) → exact dedup (q60's min-id rule) → exact-substring
    cross-doc gate (q253's duplicated-window fraction ≤
    {FUNNEL_DUP_FRAC}) → tokenizer-fertility gate (q255's
    tokens-per-word ≤ {FUNNEL_FERT}) → packed {FUNNEL_SEQ_LEN}-token
    training sequences (q126's budget arithmetic). The funnel IS
    the corpus datasheet a pretraining run signs off on: where
    documents die, and how many sequences survive to train on.

    Every stage reuses the proven single-op plan shapes (hash-grain
    dedup reduces, window-hash marker join, codegen regex counters)
    chained through successive semi-filters — one pass per stage
    over ever-shrinking survivors, never a corpus re-scan of
    dropped rows.
    """
    bpe = BPE_RE
    docs = t(spark, sf_dir, "documents")
    ingest = fan_out(docs).select(
        "doc_id",
        "text",
        F.regexp_count("text", F.lit(bpe)).alias("n_tok"),
        F.size(F.split("text", " ")).alias("n_words"),
    )
    pii = ingest.filter(
        (F.regexp_count("text", F.lit("[0-9]{6,}")) == 0)
        & (F.regexp_count("text", F.lit("[A-Za-z]+#[0-9]+")) == 0)
    )
    keep = pii.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    uniq = pii.join(keep.select("doc_id"), "doc_id")
    toks = F.split("text", " ")
    wins = (
        uniq.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= SUBSTR_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {SUBSTR_W - 1}),"
                    f" i -> md5(concat_ws(' ', slice(toks, i, {SUBSTR_W}))))"
                )
            ).alias("wh"),
        )
    )
    marks = wins.groupBy("wh").agg(F.count_distinct("doc_id").alias("nd"))
    dupfrac = (
        wins.join(marks, "wh")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("frac")
        )
    )
    substr_clean = uniq.join(dupfrac, "doc_id", "left").filter(
        F.coalesce(F.col("frac"), F.lit(0.0)) <= FUNNEL_DUP_FRAC
    )
    fertile = substr_clean.filter(
        F.col("n_tok").cast("double") / F.col("n_words") <= FUNNEL_FERT
    )

    def stage(no, name, df, packed=False):
        docs_col = (
            F.ceil(F.sum("n_tok").cast("double") / FUNNEL_SEQ_LEN).cast(
                "bigint"
            )
            if packed
            else F.count(F.lit(1)).cast("bigint")
        )
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            docs_col.alias("docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
        )

    out = stage(1, "ingest", ingest)
    for no, name, df in [
        (2, "pii_clean", pii),
        (3, "exact_unique", uniq),
        (4, "substr_clean", substr_clean),
        (5, "fertility_ok", fertile),
    ]:
        out = out.unionByName(stage(no, name, df))
    return out.unionByName(stage(6, "packed_sequences", fertile, packed=True))


# ----------------------------- q301 consistent-hashing rebalance

RING_VNODES = 64  # virtual nodes per physical node


def _ring_assign_sql(n_nodes: int, alias: str) -> str:
    """Nearest-clockwise-vnode assignment via the min over vnode
    hashes >= key hash (wrapping to the global min)."""
    return f"""
    SELECT k.key, k.kh,
           COALESCE(
             MIN(CASE WHEN v.vh >= k.kh THEN v.vh END),
             MIN(v.vh)
           ) AS chosen_vh
    FROM keys k, vnodes_{n_nodes} v
    GROUP BY k.key, k.kh"""


@register(
    "q301_consistent_hashing",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS key,
             CAST(('0x' || substr(md5('key:' || CAST(o_orderkey AS VARCHAR)),
                   1, 12)) AS BIGINT) AS kh
      FROM orders
    ),
    vnodes_4 AS (
      SELECT node, CAST(('0x' || substr(md5('vn:' || CAST(node AS VARCHAR)
                   || ':' || CAST(r AS VARCHAR)), 1, 12)) AS BIGINT) AS vh
      FROM UNNEST(range(4)) AS n(node), UNNEST(range({RING_VNODES})) AS v(r)
    ),
    vnodes_5 AS (
      SELECT node, CAST(('0x' || substr(md5('vn:' || CAST(node AS VARCHAR)
                   || ':' || CAST(r AS VARCHAR)), 1, 12)) AS BIGINT) AS vh
      FROM UNNEST(range(5)) AS n(node), UNNEST(range({RING_VNODES})) AS v(r)
    ),
    a4 AS ({_ring_assign_sql(4, 'a4')}),
    a5 AS ({_ring_assign_sql(5, 'a5')}),
    ring AS (
      SELECT a4.key,
             (SELECT v.node FROM vnodes_4 v WHERE v.vh = a4.chosen_vh) AS n4,
             (SELECT v.node FROM vnodes_5 v WHERE v.vh = a5.chosen_vh) AS n5,
             a4.kh
      FROM a4 JOIN a5 ON a5.key = a4.key
    )
    SELECT 'ring' AS scheme,
           COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN n4 <> n5 THEN 1 ELSE 0 END) AS BIGINT)
             AS keys_moved,
           (FLOOR(CAST(CAST(SUM(CASE WHEN n4 <> n5 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS moved_fraction
    FROM ring
    UNION ALL
    SELECT 'modulo',
           COUNT(*),
           CAST(SUM(CASE WHEN kh % 4 <> kh % 5 THEN 1 ELSE 0 END) AS BIGINT),
           (FLOOR(CAST(CAST(SUM(CASE WHEN kh % 4 <> kh % 5 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
    FROM keys
    """,
)
def q301_consistent_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing rebalance audit: assign every order key to
    4 nodes and then 5 via (a) a {RING_VNODES}-vnode hash ring
    (nearest clockwise vnode, wrapping) and (b) naive modulo — and
    measure the moved-key fraction each scheme pays for the scale-
    out. The ring moves ~1/5 of keys; modulo moves ~4/5 — THE
    argument for ring/rendezvous hashing in every sharded store,
    made measurable (and the partitioning-design intuition behind
    this engine's bucketing layer: repartitioning cost is a design
    input, not a constant).

    Ring assignment is a broadcast min-over-vnodes aggregate (the
    vnode table is nodes×{RING_VNODES} rows — tiny); the vnode→node
    resolution joins back on the chosen hash. No window, no sort of
    the key space.
    """
    keys = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("key:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("kh"),
    )

    def vnodes(n):
        return (
            spark.range(n)
            .select(F.col("id").alias("node"))
            .select(
                "node",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.lit(RING_VNODES - 1).cast("long"),
                    )
                ).alias("r"),
            )
            .select(
                "node",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("vn:"),
                                F.col("node").cast("string"),
                                F.lit(":"),
                                F.col("r").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("vh"),
            )
        )

    # each ring is nodes×vnodes rows (bounded config state), so it
    # rides as ONE sorted array-of-structs row broadcast onto the key
    # scan; BOTH rings attach to the same pass, so assignment for 4
    # and 5 nodes is a map-side array probe per key — no key×vnode
    # pair explosion + regroup and no self-join of two assignment
    # passes (the naive plan shuffled ~19M pair rows and cost 40 s
    # at sf0.1; this runs in ~2 s). try_element_at, not element_at:
    # ANSI errors on the empty filtered array (keys past the last
    # vnode must wrap to the ring start).
    def ring_arr(n, alias):
        return vnodes(n).agg(
            F.sort_array(F.collect_list(F.struct("vh", "node"))).alias(alias)
        )

    def chosen(alias):
        return F.coalesce(
            F.expr(f"try_element_at(filter({alias}, x -> x.vh >= kh), 1)"),
            F.expr(f"try_element_at({alias}, 1)"),
        ).getField("node")

    ring = (
        keys.crossJoin(F.broadcast(ring_arr(4, "r4")))
        .crossJoin(F.broadcast(ring_arr(5, "r5")))
        .select("key", "kh", chosen("r4").alias("n4"), chosen("r5").alias("n5"))
    )
    moved = F.sum(F.when(F.col("n4") != F.col("n5"), 1).otherwise(0))
    ring_row = ring.agg(
        F.lit("ring").alias("scheme"),
        F.count(F.lit(1)).alias("n_keys"),
        moved.cast("bigint").alias("keys_moved"),
        dround(moved.cast("double") / F.count(F.lit(1)), 6).alias(
            "moved_fraction"
        ),
    )
    mod_moved = F.sum(
        F.when(F.col("kh") % 4 != F.col("kh") % 5, 1).otherwise(0)
    )
    mod_row = keys.agg(
        F.lit("modulo").alias("scheme"),
        F.count(F.lit(1)).alias("n_keys"),
        mod_moved.cast("bigint").alias("keys_moved"),
        dround(mod_moved.cast("double") / F.count(F.lit(1)), 6).alias(
            "moved_fraction"
        ),
    )
    return ring_row.unionByName(mod_row)


# ---------------------------------- q302 forecast backtest metrics

BACKTEST_LAG = 7  # seasonal-naive horizon (weekly)


@register(
    "q302_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    aligned AS (
      SELECT event_type, d, v,
             LAG(v, {BACKTEST_LAG}) OVER w AS fc,
             LAG(v, 1) OVER w AS naive1
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    scored AS (
      SELECT event_type,
             CAST(v AS DOUBLE) AS av, CAST(fc AS DOUBLE) AS fv,
             CAST(ABS(v - fc) AS DOUBLE) AS ae,
             CAST(ABS(v - naive1) AS DOUBLE) AS nae
      FROM aligned WHERE fc IS NOT NULL AND naive1 IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           (FLOOR(CAST(CAST(SUM(CAST(ae AS DECIMAL(28,2))) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mae,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(ae / NULLIF(av, 0.0) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0)
                 AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mape,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(2 * ae / NULLIF(av + fv, 0.0) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0)
                 AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS smape,
           (FLOOR(CAST(CAST(SUM(CAST(ae AS DECIMAL(28,2))) AS DOUBLE)
                 / NULLIF(CAST(SUM(CAST(nae AS DECIMAL(28,2))) AS DOUBLE),
                          0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mase
    FROM scored GROUP BY event_type
    """,
)
def q302_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTESTING metrics for the seasonal-naive model
    (forecast = value {BACKTEST_LAG} days ago) on daily value by
    event type: MAE, MAPE, sMAPE, and MASE (error scaled by the
    naive-1 benchmark — the scale-free metric that makes models
    comparable across series; MASE < 1 beats naive). q06 ships a
    forecast; this is the op that decides whether to TRUST one —
    every forecasting pipeline runs its models through exactly this
    harness before deployment.

    One window pass aligns actuals with both the forecast lag and
    the naive-1 denominator; absolute errors stay DECIMAL-exact,
    ratio terms pass the q267 decimal roundtrip so cross-day sums
    are order-independent, and NULLIF guards zero-denominator days.
    """
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("v")
        )
    )
    w = W.partitionBy("event_type").orderBy("d")
    aligned = daily.select(
        "event_type",
        "v",
        F.lag("v", BACKTEST_LAG).over(w).alias("fc"),
        F.lag("v", 1).over(w).alias("naive1"),
    ).filter(F.col("fc").isNotNull() & F.col("naive1").isNotNull())
    av = F.col("v").cast("double")
    fv = F.col("fc").cast("double")
    ae = F.abs(F.col("v") - F.col("fc")).cast("double")
    nae = F.abs(F.col("v") - F.col("naive1")).cast("double")
    scored = aligned.select(
        "event_type",
        av.alias("av"),
        fv.alias("fv"),
        ae.alias("ae"),
        nae.alias("nae"),
    )

    def d28(col, scale):
        return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")

    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        dround(d28(F.col("ae"), 2) / F.count(F.lit(1)), 6).alias("mae"),
        dround(
            d28(dround(F.col("ae") / F.nullif(F.col("av"), F.lit(0.0)), 8), 10)
            / F.count(F.lit(1)),
            6,
        ).alias("mape"),
        dround(
            d28(
                dround(
                    2
                    * F.col("ae")
                    / F.nullif(F.col("av") + F.col("fv"), F.lit(0.0)),
                    8,
                ),
                10,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("smape"),
        dround(
            d28(F.col("ae"), 2) / F.nullif(d28(F.col("nae"), 2), F.lit(0.0)),
            6,
        ).alias("mase"),
    )


# --------------------------- q303 seasonal residual outliers

RESID_TOPK = 5


@register(
    "q303_seasonal_residual_outliers",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              + 3) % 7 AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1, 2
    ),
    grand AS (
      SELECT CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS g
      FROM daily
    ),
    dow_eff AS (
      SELECT dow,
             CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) - g
               AS de
      FROM daily, grand GROUP BY dow, g
    ),
    resid AS (
      SELECT d.d, d.dow, d.rev,
             d.rev - g - de AS r
      FROM daily d JOIN dow_eff e ON e.dow = d.dow, grand
    ),
    ranked AS (
      SELECT d, dow, (FLOOR(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0) AS rev, (FLOOR(CAST(r AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS residual,
             ROW_NUMBER() OVER (ORDER BY ABS(r) DESC, d ASC) AS rk
      FROM resid
    )
    SELECT d, CAST(dow AS BIGINT) AS dow, rev, residual,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {K}
    """.replace("{K}", str(RESID_TOPK)),
)
def q303_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED anomaly detection: daily revenue is
    decomposed additively (grand mean + day-of-week effect +
    residual — STL-lite with mean effects), and the top-{K} days by
    |residual| are flagged. A raw-value monitor (q139/q147) flags
    every strong Saturday; subtracting the weekly shape first is
    what makes an alert mean something on seasonal series.

    Weekday indexing is the q290 epoch-mod rule (no engine DOW
    conventions); effects come from DECIMAL-exact grouped means
    broadcast back onto the bounded daily grain; the global rank
    window runs over that bounded series with a total-order
    tie-break.
    """.replace("{K}", str(RESID_TOPK))
    from pyspark.sql import Window as W

    epoch = F.lit("1970-01-01").cast("date")
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("d"),
            ((F.datediff(F.to_date("o_orderdate"), epoch) + 3) % 7).alias(
                "dow"
            ),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    grand = daily.agg(
        (
            F.sum(F.col("rev").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("g")
    )
    dow_eff = (
        daily.groupBy("dow")
        .agg(
            (
                F.sum(F.col("rev").cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("dow_mean")
        )
        .crossJoin(F.broadcast(grand))
        .select("dow", (F.col("dow_mean") - F.col("g")).alias("de"), "g")
    )
    resid = daily.join(F.broadcast(dow_eff), "dow").select(
        "d",
        "dow",
        "rev",
        (F.col("rev") - F.col("g") - F.col("de")).alias("r"),
    )
    wr = W.orderBy(F.abs(F.col("r")).desc(), F.col("d").asc())
    return (
        resid.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= RESID_TOPK)
        .select(
            "d",
            F.col("dow").cast("bigint").alias("dow"),
            dround("rev", 2).alias("rev"),
            dround("r", 4).alias("residual"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ------------------------------------------ q304 Cohen's kappa


@register(
    "q304_cohens_kappa",
    oracle="""
    WITH preds AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    counts AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS DOUBLE) AS agree,
             CAST(SUM(a) AS DOUBLE) AS pa, CAST(SUM(b) AS DOUBLE) AS pb
      FROM preds
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           (FLOOR(CAST(agree / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS percent_agreement,
           (FLOOR(CAST((pa / n) * (pb / n) + (1 - pa / n) * (1 - pb / n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS chance_agreement,
           (FLOOR(CAST((agree / n - ((pa / n) * (pb / n)
                  + (1 - pa / n) * (1 - pb / n)))
                 / NULLIF(1 - ((pa / n) * (pb / n)
                  + (1 - pa / n) * (1 - pb / n)), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS kappa
    FROM counts
    """,
)
def q304_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary annotators (the lang label
    vs a length-threshold heuristic): observed agreement corrected
    for CHANCE agreement — the inter-rater statistic every labeling
    pipeline reports, because two raters who both say 'yes' 90% of
    the time agree 82% by luck alone (percent agreement, also
    emitted, is the naive number kappa exists to deflate).

    One scan to four exact counts; the kappa algebra is identical
    IEEE on a 1-row frame, NULLIF-guarded for the degenerate
    all-one-class corpus.
    """
    preds = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(F.col("n_chars") > 300, 1).otherwise(0).alias("b"),
    )
    counts = preds.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("double")
        .alias("agree"),
        F.sum("a").cast("double").alias("pa"),
        F.sum("b").cast("double").alias("pb"),
    )
    po = F.col("agree") / F.col("n")
    pe = (F.col("pa") / F.col("n")) * (F.col("pb") / F.col("n")) + (
        1 - F.col("pa") / F.col("n")
    ) * (1 - F.col("pb") / F.col("n"))
    return counts.select(
        F.col("n").cast("bigint").alias("n_docs"),
        dround(po, 6).alias("percent_agreement"),
        dround(pe, 6).alias("chance_agreement"),
        dround((po - pe) / F.nullif(1 - pe, F.lit(0.0)), 6).alias("kappa"),
    )


# ------------------------------------- q305 BFS frontier rounds

BFS_ROUNDS = 3
BFS_SEEDS = 3  # suppliers with s_suppkey < BFS_SEEDS


@register(
    "q305_bfs_frontier",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    capped AS (
      SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               COUNT(*) OVER (PARTITION BY l_partkey) AS deg
        FROM ps
      ) WHERE deg <= {KCORE_CAP}
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM capped a JOIN capped b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    r0 AS (
      SELECT DISTINCT s_suppkey AS u FROM supplier
      WHERE s_suppkey < {BFS_SEEDS}
    ),
    {", ".join(
        f'''r{i} AS (
      SELECT u FROM r{i - 1}
      UNION
      SELECT DISTINCT e.v AS u FROM edges e
      JOIN r{i - 1} f ON f.u = e.u
    )''' for i in range(1, BFS_ROUNDS + 1))}
    SELECT {" UNION ALL SELECT ".join(
        f"{i} AS round, (SELECT COUNT(*) FROM r{i}) AS reached"
        for i in range(0, BFS_ROUNDS + 1))}
    """,
)
def q305_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first frontier expansion over the co-supply graph
    from a seed supplier set: per round, the count of vertices
    reachable within that many hops — the blast-radius primitive
    (supply-chain contagion, fraud-ring expansion, influence reach)
    underneath every graph traversal. {BFS_ROUNDS} rounds unrolled
    (q268's bounded-iteration rule); each round is one semi-join of
    the REDUCED edge list against the frontier, union-deduped —
    vertex-set-sized state, never path enumeration (which explodes
    combinatorially where this saturates monotonically).

    Complements the graph suite's other primitives: q64 reaches
    fixpoint components, q196 jumps log-depth ancestry, q277 peels
    cores, q214 counts triangles — this one measures DISTANCE.
    """
    # edge build kept as the codegen window-cap + theta self-join
    # (r9 A/B: the posting-list variant measured 7.2-11.6 vs
    # 5.4-9.0 s interleaved — every BFS round consumes the IDENTICAL
    # edge subtree, so ReuseExchange already pays the build once and
    # the allocating collect_set/explode loses to the codegen join;
    # contrast q277/q479 where the build feeds a checkpoint)
    from pyspark.sql import Window as W

    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    capped = (
        ps.withColumn(
            "deg", F.count(F.lit(1)).over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("deg") <= KCORE_CAP)
        .drop("deg")
    )
    b = capped.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("v")
    )
    edges = (
        capped.join(
            b,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_suppkey") != F.col("v")),
        )
        .select(F.col("l_suppkey").alias("u"), "v")
        .distinct()
    )
    frontier = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < BFS_SEEDS)
        .select(F.col("s_suppkey").alias("u"))
        .distinct()
    )
    rows = [frontier.agg(F.lit(0).alias("round"), F.count(F.lit(1)).alias("reached"))]
    cur = frontier
    for i in range(1, BFS_ROUNDS + 1):
        expanded = edges.join(cur, "u").select(F.col("v").alias("u"))
        cur = cur.unionByName(expanded).distinct()
        rows.append(
            cur.agg(F.lit(i).alias("round"), F.count(F.lit(1)).alias("reached"))
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------- q306 interval union coverage

BUSY_WINDOW_MIN = 5  # each event keeps its user "busy" for 5 minutes


@register(
    "q306_interval_union_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {BUSY_WINDOW_MIN} MINUTE AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    TIMESTAMP '1900-01-01')
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e)
               AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_busy_spans,
           CAST(SUM(date_diff('microseconds', ms, me)) AS BIGINT)
             AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def q306_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage per user: each event opens a
    {BUSY_WINDOW_MIN}-minute busy window; overlapping windows merge
    (gaps-and-islands: a window starting after the running MAX of
    prior ends opens a new island), and the answer is merged spans
    and total covered time — utilization/uptime/billing math where
    SUMMING raw durations double-counts every overlap (the error
    this op exists to avoid; q270 counts concurrency, q283 weights
    by holding time — this measures the union).

    One per-user sort window computes the island labels (running
    MAX of ends, the q116 pattern over timestamps), one reduce
    merges islands; microsecond arithmetic is exact integers.
    """
    from pyspark.sql import Window as W

    iv = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {BUSY_WINDOW_MIN} MINUTES")).alias(
            "e"
        ),
    )
    wprev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(wprev), F.lit("1900-01-01").cast("timestamp")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wcum = W.partitionBy("user_id").orderBy("s", "e")
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(wcum)
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_busy_spans"),
        F.sum(F.unix_micros("me") - F.unix_micros("ms"))
        .cast("bigint")
        .alias("covered_us"),
    )


# ------------------------------- q307 Brier calibration bins

CALIB_BINS = 5


@register(
    "q307_brier_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             -- deterministic "model": longer docs get higher
             -- predicted P(en); clipped linear score on n_chars
             (FLOOR(CAST(LEAST(0.95, GREATEST(0.05,
               CAST(n_chars AS DOUBLE) / 640.0)) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0) AS p
      FROM documents
    ),
    binned AS (
      SELECT y, p,
             LEAST({CALIB_BINS - 1},
                   CAST(FLOOR(p * {CALIB_BINS}) AS INTEGER)) AS bin
      FROM scored
    )
    SELECT bin,
           COUNT(*) AS n_docs,
           (FLOOR(CAST(CAST(SUM(CAST(p AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS mean_predicted,
           (FLOOR(CAST(CAST(SUM(y) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS observed_rate,
           (FLOOR(CAST(ABS(CAST(SUM(CAST(p AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)
                 - CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS calibration_gap,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST((p - y) * (p - y) AS DOUBLE) * 10000000000.0 + 0.5) / 10000000000.0)
                 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS brier
    FROM binned GROUP BY bin
    """,
)
def q307_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration audit (reliability diagram in table
    form): a deterministic stand-in model predicts P(en) from
    document length; per predicted-probability bin — mean predicted
    vs observed rate, the calibration gap, and the per-bin Brier
    score. A model can have great AUC (q275 ranks) and still lie
    about its probabilities — this is the op that catches it, and
    the readout that decides whether downstream thresholds can be
    trusted as probabilities.

    One scan to a {CALIB_BINS}-row bin reduce; predicted-prob and
    squared-error sums pass the decimal roundtrip (q267's rule) so
    cross-row float accumulation is order-independent.
    """
    scored = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        dround(
            F.least(
                F.lit(0.95),
                F.greatest(
                    F.lit(0.05), F.col("n_chars").cast("double") / 640.0
                ),
            ),
            8,
        ).alias("p"),
    )
    binned = scored.select(
        "y",
        "p",
        F.least(
            F.lit(CALIB_BINS - 1),
            F.floor(F.col("p") * CALIB_BINS).cast("int"),
        ).alias("bin"),
    )
    mean_p = (
        F.sum(F.col("p").cast("decimal(28,8)")).cast("double")
        / F.count(F.lit(1))
    )
    obs = F.sum("y").cast("double") / F.count(F.lit(1))
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dround(mean_p, 6).alias("mean_predicted"),
        dround(obs, 6).alias("observed_rate"),
        dround(F.abs(mean_p - obs), 6).alias("calibration_gap"),
        dround(
            F.sum(
                dround(
                    (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")), 10
                ).cast("decimal(28,12)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("brier"),
    )


# ------------------------------- q308 dictionary-encoding advisor

_ENC_COLS = [
    ("orders", "o_orderpriority"),
    ("orders", "o_orderstatus"),
    ("customer", "c_mktsegment"),
    ("customer", "c_name"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("part", "p_name"),
    ("documents", "source"),
]
DICT_NDV_FRACTION = 0.5  # dictionary pays off below this distinct ratio


def _enc_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT {col}) AS n_distinct,
           (FLOOR(CAST(CAST(COUNT(DISTINCT {col}) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS distinct_ratio,
           CAST(SUM(len({col})) AS BIGINT) AS plain_bytes,
           CAST((SELECT SUM(len(x)) FROM
                 (SELECT DISTINCT {col} AS x FROM {table}))
                + COUNT(*) * 4 AS BIGINT) AS dict_bytes,
           CASE WHEN CAST(COUNT(DISTINCT {col}) AS DOUBLE) / COUNT(*)
                     < {DICT_NDV_FRACTION}
                THEN 'dictionary' ELSE 'plain' END AS recommendation
    FROM {table}"""


@register(
    "q308_encoding_advisor",
    oracle=" UNION ALL ".join(_enc_sql(t_, c) for t_, c in _ENC_COLS),
)
def q308_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding advisor for string columns — the storage-
    tuning census behind every columnar write: per column, the
    distinct ratio, plain vs dictionary byte estimates (distinct
    values once + 4-byte codes), and the encoding recommendation.
    Low-cardinality columns (priorities, segments, brands) dictionary
    ~10×; key-like strings (c_name) don't — and a parquet writer
    falling back to plain on an assumed-categorical column is a
    silent 5× file-size regression this audit catches before a
    100 TB write (the q295 layout audit's per-column sibling).

    Each column is one scan with a two-phase distinct reduce; the
    byte model is integer arithmetic — no actual re-encoding pass.
    """
    out = None
    for table, col in _ENC_COLS:
        src = t(spark, sf_dir, table)
        distinct_bytes = (
            src.select(F.col(col).alias("x"))
            .distinct()
            .agg(F.sum(F.length("x")).alias("db"))
        )
        stats = src.agg(
            F.lit(f"{table}.{col}").alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.sum(F.length(col)).cast("bigint").alias("plain_bytes"),
        ).crossJoin(F.broadcast(distinct_bytes))
        row = stats.select(
            "column_name",
            "n_rows",
            "n_distinct",
            dround(
                F.col("n_distinct").cast("double") / F.col("n_rows"), 6
            ).alias("distinct_ratio"),
            "plain_bytes",
            (F.col("db") + F.col("n_rows") * 4).cast("bigint").alias(
                "dict_bytes"
            ),
            F.when(
                F.col("n_distinct").cast("double") / F.col("n_rows")
                < DICT_NDV_FRACTION,
                "dictionary",
            )
            .otherwise("plain")
            .alias("recommendation"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------- q309 Heaps' law fit


@register(
    "q309_heaps_law",
    oracle="""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_tokens,
             COUNT(DISTINCT w) AS vocab
      FROM (
        SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY source
    ),
    logs AS (
      SELECT LN(CAST(n_tokens AS DOUBLE)) AS x,
             LN(CAST(vocab AS DOUBLE)) AS y
      FROM per_source
    ),
    fit AS (
      SELECT COUNT(*) AS n,
             (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
               / NULLIF(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0.0)
               AS beta,
             SUM(y) / COUNT(*)
               - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                  / NULLIF(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0.0))
                 * SUM(x) / COUNT(*) AS lnk
      FROM logs
    )
    SELECT CAST(n AS BIGINT) AS n_sources,
           (FLOOR(CAST(beta AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS heaps_beta,
           (FLOOR(CAST(EXP(lnk) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS heaps_k
    FROM fit
    """,
)
def q309_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V = k·N^β estimated by
    OLS on ln V vs ln N across the per-source (tokens, vocabulary)
    points — the corpus-linguistics health gauge beside q215's Zipf
    slope (natural text runs β ≈ 0.4-0.6; duplicated or templated
    corpora flatten it, synthetic closed-vocabulary corpora like
    this fixture crush it toward 0, which IS the anomaly signal a
    corpus auditor looks for).

    Token and vocab counts reduce per source (two-phase distinct on
    the word grain); the log-log OLS runs over the |sources|-row
    frame with ln/exp on identical operands (q229's precedent) and
    a NULLIF singular-fit guard.
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    per_source = words.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("w").alias("vocab"),
    )
    logs = per_source.select(
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    den = F.nullif(
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"),
        F.lit(0.0),
    )
    beta = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / den
    lnk = F.sum("y") / n - beta * F.sum("x") / n
    return logs.agg(
        n.cast("bigint").alias("n_sources"),
        dround(beta, 6).alias("heaps_beta"),
        dround(F.exp(lnk), 6).alias("heaps_k"),
    )


# ------------------------------------- q310 Good-Turing smoothing


@register(
    "q310_good_turing",
    oracle="""
    WITH wc AS (
      SELECT w, COUNT(*) AS r FROM (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY w
    ),
    fof AS (
      SELECT r, COUNT(*) AS nr FROM wc GROUP BY r
    ),
    tot AS (
      SELECT CAST(SUM(r * nr) AS BIGINT) AS n_tokens FROM fof
    ),
    gt AS (
      SELECT f.r, f.nr,
             LEAD(f.nr) OVER (ORDER BY f.r) AS nr_next,
             LEAD(f.r) OVER (ORDER BY f.r) AS r_next
      FROM fof f
    )
    SELECT g.r AS freq,
           CAST(g.nr AS BIGINT) AS n_types,
           (FLOOR(CAST(CASE WHEN g.r_next = g.r + 1
                 THEN (g.r + 1.0) * g.nr_next / g.nr
                 ELSE CAST(g.r AS DOUBLE) END AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS r_star,
           (FLOOR(CAST(CASE WHEN g.r = 1
                 THEN CAST(g.nr AS DOUBLE) / t.n_tokens END AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS unseen_mass
    FROM gt g, tot t
    WHERE g.r <= 10
    """,
)
def q310_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus vocabulary:
    from the frequency-of-frequencies table, the adjusted count
    r* = (r+1)·N_{r+1}/N_r for each observed frequency ≤ 10 (the
    regime where raw counts lie), and the UNSEEN-probability mass
    N_1/N attached to the r=1 row — the estimator (Gale & Sampson's
    simple GT, minus their smoothing of gappy N_r, which falls back
    to r) that answers the question every LM/coverage model must:
    how much probability belongs to words never seen. Complements
    q236 (add-one LM: crude unseen handling) and q215/q309 (Zipf/
    Heaps shape diagnostics).

    Two reduces (word counts → frequency-of-frequencies) shrink the
    corpus to a ~dozens-row table; one LEAD window and exact-count
    ratios finish the job.
    """
    from pyspark.sql import Window as W

    words = fan_out(t(spark, sf_dir, "documents")).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    fof = wc.groupBy("r").agg(F.count(F.lit(1)).alias("nr"))
    tot = fof.agg(F.sum(F.col("r") * F.col("nr")).cast("bigint").alias("n_tokens"))
    w = W.orderBy("r")
    gt = fof.select(
        "r",
        "nr",
        F.lead("nr").over(w).alias("nr_next"),
        F.lead("r").over(w).alias("r_next"),
    )
    j = gt.crossJoin(F.broadcast(tot)).filter(F.col("r") <= 10)
    r_star = F.when(
        F.col("r_next") == F.col("r") + 1,
        (F.col("r") + 1.0) * F.col("nr_next") / F.col("nr"),
    ).otherwise(F.col("r").cast("double"))
    return j.select(
        F.col("r").alias("freq"),
        F.col("nr").cast("bigint").alias("n_types"),
        dround(r_star, 6).alias("r_star"),
        dround(
            F.when(
                F.col("r") == 1,
                F.col("nr").cast("double") / F.col("n_tokens"),
            ),
            6,
        ).alias("unseen_mass"),
    )


# ---------------------------------------- q311 Hill tail index

HILL_K = 50


@register(
    "q311_hill_tail_index",
    oracle=f"""
    WITH ranked AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rk
      FROM orders
    ),
    topk AS (SELECT x, rk FROM ranked WHERE rk <= {HILL_K + 1}),
    xk AS (SELECT x AS x_k FROM topk WHERE rk = {HILL_K + 1})
    SELECT {HILL_K} AS k,
           (FLOOR(CAST(x_k AS DOUBLE) * 100.0 + 0.5) / 100.0) AS threshold,
           (FLOOR(CAST(SUM(LN(t.x / xk.x_k)) / {HILL_K} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS hill_estimate,
           (FLOOR(CAST({HILL_K} / SUM(LN(t.x / xk.x_k)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS tail_index_alpha
    FROM topk t, xk
    WHERE t.rk <= {HILL_K}
    GROUP BY x_k
    """,
)
def q311_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail index over order totals:
    mean of ln(x_i/x_(k+1)) across the top-{HILL_K} order statistics
    — 1/α̂, with the tail index α̂ alongside. THE extreme-value
    gauge for capacity/risk planning: α ≤ 2 means infinite
    variance (averages lie), α ≤ 1 means even the mean diverges;
    this fixture's bounded-uniform prices produce a large α̂ (thin
    tail) — the readout that certifies 'no heavy tail' is as
    operative as the one that warns.

    Global top-(k+1) goes through TakeOrderedAndProject (never a
    full sort); the k-row ln-ratio reduce and the threshold join
    are bounded. Shared-operand ln per the q229 precedent.
    """
    from pyspark.sql import Window as W

    ranked = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_totalprice").cast("double").alias("x"), "o_orderkey"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(HILL_K + 1)
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.col("x").desc(), F.col("o_orderkey"))
            ),
        )
    )
    xk = ranked.filter(F.col("rk") == HILL_K + 1).select(
        F.col("x").alias("x_k")
    )
    topk = ranked.filter(F.col("rk") <= HILL_K).crossJoin(F.broadcast(xk))
    hill = F.sum(F.log(F.col("x") / F.col("x_k"))) / HILL_K
    return topk.groupBy("x_k").agg(
        F.lit(HILL_K).alias("k"),
        dround(F.col("x_k"), 2).alias("threshold"),
        dround(hill, 6).alias("hill_estimate"),
        dround(HILL_K / F.sum(F.log(F.col("x") / F.col("x_k"))), 6).alias(
            "tail_index_alpha"
        ),
    ).drop("x_k").select("k", "threshold", "hill_estimate", "tail_index_alpha")


# ------------------------------- q312 duplicate-payment audit

DUP_PAY_WINDOW_DAYS = 7


@register(
    "q312_duplicate_payment_audit",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.o_custkey,
           CAST(a.o_totalprice AS DOUBLE) AS amount,
           a.o_orderkey AS first_order,
           b.o_orderkey AS second_order,
           CAST(date_diff('day', a.d, b.d) AS BIGINT) AS days_apart
    FROM o a JOIN o b
      ON b.o_custkey = a.o_custkey
     AND b.o_totalprice = a.o_totalprice
     AND a.o_orderkey < b.o_orderkey
     AND b.d >= a.d AND b.d <= a.d + {DUP_PAY_WINDOW_DAYS}
    """,
)
def q312_duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection — the accounts-payable fraud/error
    audit every controller runs: pairs of orders by the SAME
    customer for the SAME exact amount within {DUP_PAY_WINDOW_DAYS}
    days (double-submitted invoices, double-charged cards), with the
    day gap. Exact-amount equality is deliberate: near-amount fuzz
    belongs to a second pass (q174's tolerance bands) after this
    high-precision screen.

    The pair join is equi on (customer, amount) — a REAL composite
    key that hash-partitions cleanly — with the time band and id
    order as post-filters; per-key fan-out is bounded by orders per
    customer per amount (q145's profiling would flag pathological
    keys first). Never a time-only band join, which at 100 TB would
    pair every same-week order.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("d")
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("c2"),
        F.col("o_totalprice").alias("p2"),
        F.col("d").alias("d2"),
    )
    pairs = o.join(
        b,
        (F.col("c2") == F.col("o_custkey"))
        & (F.col("p2") == F.col("o_totalprice"))
        & (F.col("o_orderkey") < F.col("k2"))
        & (F.col("d2") >= F.col("d"))
        & (F.col("d2") <= F.date_add("d", DUP_PAY_WINDOW_DAYS)),
    )
    return pairs.select(
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("amount"),
        F.col("o_orderkey").alias("first_order"),
        F.col("k2").alias("second_order"),
        F.datediff("d2", "d").cast("bigint").alias("days_apart"),
    )


# --------------------------------- q313 grid-density clustering

GRID_N = 16  # cells per axis over [-0.5, 0.5]
GRID_MINPTS = 8  # density threshold per cell
GRID_ROUNDS = 3  # unrolled label-propagation rounds


@register(
    "q313_grid_density_clusters",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id,
             LEAST({GRID_N - 1}, GREATEST(0, CAST(FLOOR(
               (CAST(embedding[1] AS DOUBLE) + 0.5) * {GRID_N}) AS INTEGER)))
               AS cx,
             LEAST({GRID_N - 1}, GREATEST(0, CAST(FLOOR(
               (CAST(embedding[2] AS DOUBLE) + 0.5) * {GRID_N}) AS INTEGER)))
               AS cy
      FROM embeddings
    ),
    cells AS (
      SELECT cx, cy, cx * {GRID_N} + cy AS cell, COUNT(*) AS n
      FROM pts GROUP BY cx, cy
    ),
    dense AS (
      SELECT cx, cy, cell, n, cell AS lbl FROM cells
      WHERE n >= {GRID_MINPTS}
    ),
    {", ".join(
        f'''d{i} AS (
      SELECT a.cx, a.cy, a.cell, a.n, MIN(b.lbl) AS lbl
      FROM {"dense" if i == 1 else f"d{i - 1}"} a
      JOIN {"dense" if i == 1 else f"d{i - 1}"} b
        ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1
      GROUP BY a.cx, a.cy, a.cell, a.n
    )''' for i in range(1, GRID_ROUNDS + 1))}
    SELECT lbl AS cluster_label,
           COUNT(*) AS n_cells,
           CAST(SUM(n) AS BIGINT) AS n_points
    FROM d{GRID_ROUNDS} GROUP BY lbl
    """,
)
def q313_grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (DBSCAN-lite) on the embedding's
    first two dimensions: points bin into a {GRID_N}×{GRID_N} grid,
    cells below {GRID_MINPTS} points are noise, and DENSE cells
    merge with their 8-neighbors by {GRID_ROUNDS} unrolled min-label
    propagation rounds — the density-based family (clusters of any
    shape, explicit noise) that the centroid ops (q74/q75 IVF)
    cannot express. Per surviving label: cells and points.

    The scale inversion is the point: clustering runs on the CELL
    table (≤ {GRID_N}², corpus-size-free) after one binning reduce;
    the neighbor join is a bounded theta join on that tiny grid,
    and labels after the fixed rounds are deterministic on both
    engines (diameter-converged for this fixture; a production run
    iterates to fixpoint with q64's checkpoint rule).
    """
    emb = t(spark, sf_dir, "embeddings")

    def axis(i):
        return F.least(
            F.lit(GRID_N - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.element_at("embedding", i).cast("double") + 0.5)
                    * GRID_N
                ).cast("int"),
            ),
        )

    pts = emb.select(axis(1).alias("cx"), axis(2).alias("cy"))
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    dense = cells.filter(F.col("n") >= GRID_MINPTS).select(
        "cx", "cy", "n", (F.col("cx") * GRID_N + F.col("cy")).alias("lbl")
    )
    cur = dense
    for _ in range(GRID_ROUNDS):
        b = cur.select(
            F.col("cx").alias("bx"),
            F.col("cy").alias("by"),
            F.col("lbl").alias("blbl"),
        )
        cur = (
            cur.join(
                F.broadcast(b),
                (F.abs(F.col("cx") - F.col("bx")) <= 1)
                & (F.abs(F.col("cy") - F.col("by")) <= 1),
            )
            .groupBy("cx", "cy", "n")
            .agg(F.min("blbl").alias("lbl"))
        )
    return cur.groupBy(F.col("lbl").alias("cluster_label")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_points"),
    )


# ------------------------------------ q314 broadcast advisor

BROADCAST_THRESHOLD_MB = 10

_ADV_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _adv_width_sql(table: str) -> str:
    widths = {
        "region": "len(r_name) + 8",
        "nation": "len(n_name) + 16",
        "customer": "len(c_name) + len(c_mktsegment) + 24",
        "supplier": "len(s_name) + 24",
        "part": "len(p_name) + len(p_brand) + len(p_type) + 24",
        "orders": "len(o_orderstatus) + len(o_orderpriority) + 32",
        "lineitem": "len(l_returnflag) + len(l_linestatus) + 72",
        "events": "len(event_type) + len(props) + 32",
        "documents": "len(text) + len(lang) + len(source) + 16",
        "embeddings": "len(embedding) * 4 + 16",
    }
    return widths[table]


@register(
    "q314_broadcast_advisor",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{tbl}' AS table_name,
           COUNT(*) AS n_rows,
           CAST(SUM({_adv_width_sql(tbl)}) AS BIGINT) AS est_bytes,
           CASE WHEN SUM({_adv_width_sql(tbl)})
                     < {BROADCAST_THRESHOLD_MB} * 1048576
                THEN 'broadcast' ELSE 'shuffle' END AS join_strategy
    FROM {tbl}"""
        for tbl in _ADV_TABLES
    ),
)
def q314_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join advisor: per catalog table, an estimated
    in-memory size from a per-row width model (string lengths +
    fixed numeric widths; vectors at 4 bytes/element) against the
    {BROADCAST_THRESHOLD_MB} MiB autoBroadcastJoinThreshold — the
    table-statistics input a cost-based optimizer uses for the
    single most consequential physical choice this engine's plans
    rely on (every starred plan in PLANS.md hangs off dimensions
    broadcasting). q150's ANALYZE snapshot feeds cardinalities;
    this is the byte-model half, and the audit that catches a
    'dimension' that silently grew past broadcastability.

    One scan + reduce per table; the width model is codegen
    arithmetic — no sampling pass, no serialization probe.
    """
    width_cols = {
        "region": F.length("r_name") + 8,
        "nation": F.length("n_name") + 16,
        "customer": F.length("c_name") + F.length("c_mktsegment") + 24,
        "supplier": F.length("s_name") + 24,
        "part": F.length("p_name") + F.length("p_brand") + F.length("p_type")
        + 24,
        "orders": F.length("o_orderstatus") + F.length("o_orderpriority") + 32,
        "lineitem": F.length("l_returnflag") + F.length("l_linestatus") + 72,
        "events": F.length("event_type") + F.length("props") + 32,
        "documents": F.length("text") + F.length("lang") + F.length("source")
        + 16,
        "embeddings": F.size("embedding") * 4 + 16,
    }
    out = None
    for tbl in _ADV_TABLES:
        w = width_cols[tbl]
        row = t(spark, sf_dir, tbl).agg(
            F.lit(tbl).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(w).cast("bigint").alias("est_bytes"),
            F.when(
                F.sum(w) < BROADCAST_THRESHOLD_MB * 1048576, "broadcast"
            )
            .otherwise("shuffle")
            .alias("join_strategy"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ----------------------------------- q315 newsvendor stocking

NV_CU = 3.0  # underage cost (lost margin per unit short)
NV_CO = 1.0  # overage cost (holding per unit over)
NV_Q = NV_CU / (NV_CU + NV_CO)  # critical ratio -> 0.75


@register(
    "q315_newsvendor_stocking",
    oracle=f"""
    WITH demand AS (
      SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, CAST(l.l_shipdate AS DATE)
    ),
    lvl AS (
      SELECT p_brand,
             COUNT(*) AS n_days,
             CAST(SUM(CAST(q AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
               AS mean_demand,
             quantile_cont(q, {NV_Q!r}) AS order_up_to
      FROM demand GROUP BY p_brand
    )
    SELECT l.p_brand,
           l.n_days,
           (FLOOR(CAST(l.mean_demand AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_demand,
           CAST({NV_Q!r} AS DOUBLE) AS critical_ratio,
           (FLOOR(CAST(l.order_up_to AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS order_up_to,
           (FLOOR(CAST(CAST((SELECT COUNT(*) FROM demand d
                       WHERE d.p_brand = l.p_brand
                         AND d.q > l.order_up_to) AS DOUBLE)
                 / l.n_days AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS stockout_day_share
    FROM lvl l
    """,
)
def q315_newsvendor_stocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking levels per brand: the profit-optimal
    order-up-to point is the demand quantile at the critical ratio
    cu/(cu+co) — with underage {NV_CU} and overage {NV_CO} that's
    the {NV_Q:.0%} percentile of daily demand — the OR result every
    inventory system implements, here with the realized
    stockout-day share as the sanity readout (≈ 1 − {NV_Q:.0%} when
    demand is i.i.d.; a drifting series breaks that, which is the
    signal to re-fit).

    Demand reduces to the (brand, day) grain (exact decimal), the
    quantile is the q28 shared-interpolation percentile per brand,
    and the stockout share is a threshold re-join of the bounded
    demand grain against the |brands|-row level table.
    """
    demand = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.to_date("l_shipdate").alias("d"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("q")
        )
    )
    lvl = demand.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.sum(F.col("q").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_demand"),
        F.percentile("q", F.lit(NV_Q)).alias("order_up_to"),
    )
    over = (
        demand.join(
            lvl.select(
                F.col("p_brand").alias("pb"), F.col("order_up_to").alias("lv")
            ),
            F.col("p_brand") == F.col("pb"),
        )
        .filter(F.col("q") > F.col("lv"))
        .groupBy("pb")
        .agg(F.count(F.lit(1)).alias("n_over"))
    )
    return (
        lvl.join(over, lvl["p_brand"] == over["pb"], "left")
        .select(
            "p_brand",
            "n_days",
            dround("mean_demand", 6).alias("mean_demand"),
            F.lit(NV_Q).alias("critical_ratio"),
            dround("order_up_to", 4).alias("order_up_to"),
            dround(
                F.coalesce(F.col("n_over"), F.lit(0)).cast("double")
                / F.col("n_days"),
                6,
            ).alias("stockout_day_share"),
        )
    )


# ----------------------------------- q316 price elasticity


@register(
    "q316_price_elasticity",
    oracle="""
    WITH weekly AS (
      SELECT p.p_brand,
             CAST(date_trunc('week', l.l_shipdate) AS DATE) AS w,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, date_trunc('week', l.l_shipdate)
    ),
    logs AS (
      SELECT p_brand, LN(rev / qty) AS x, LN(qty) AS y FROM weekly
      WHERE qty > 0
    )
    SELECT p_brand,
           COUNT(*) AS n_weeks,
           (FLOOR(CAST((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / NULLIF(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS elasticity,
           (FLOOR(CAST(EXP(SUM(y) / COUNT(*)
                 - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                    / NULLIF(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0.0))
                   * SUM(x) / COUNT(*)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS demand_at_unit_price
    FROM logs GROUP BY p_brand
    """,
)
def q316_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price demand elasticity per brand: OLS slope of ln(qty)
    on ln(avg unit price) over the weekly grain — the log-log
    regression whose coefficient IS the % demand change per 1% price
    change, the econometrics number behind every pricing decision
    (|e| > 1 elastic, price cuts grow revenue; < 1 inelastic). This
    fixture's independently-generated prices/quantities produce
    e ≈ 0 — the 'no detectable elasticity' readout, which is itself
    the guard against pricing on noise.

    Weekly (brand, price, qty) reduces from exact-decimal sums;
    unit price is a deterministic ratio; the per-brand OLS is
    q189's five-sufficient-statistics shape on ln values (q229's
    shared-operand rule), NULLIF-guarded for single-week brands.
    """
    weekly = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand",
            F.date_trunc("week", "l_shipdate").cast("date").alias("w"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    logs = weekly.filter(F.col("qty") > 0).select(
        "p_brand",
        F.log(F.col("rev") / F.col("qty")).alias("x"),
        F.log("qty").alias("y"),
    )
    n = F.count(F.lit(1))
    den = F.nullif(
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"),
        F.lit(0.0),
    )
    slope = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / den
    intercept = F.sum("y") / n - slope * F.sum("x") / n
    return logs.groupBy("p_brand").agg(
        n.alias("n_weeks"),
        dround(slope, 6).alias("elasticity"),
        dround(F.exp(intercept), 4).alias("demand_at_unit_price"),
    )


# ------------------------------ q317 SAX time-series similarity

SAX_SYMBOLS = ["a", "b", "c", "d"]  # 4-symbol alphabet via quartiles


@register(
    "q317_sax_similarity",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    cuts AS (
      SELECT quantile_cont(CAST(n AS DOUBLE), 0.25) AS c1,
             quantile_cont(CAST(n AS DOUBLE), 0.5) AS c2,
             quantile_cont(CAST(n AS DOUBLE), 0.75) AS c3
      FROM daily
    ),
    sym AS (
      SELECT event_type, d,
             CASE WHEN n <= c1 THEN 'a'
                  WHEN n <= c2 THEN 'b'
                  WHEN n <= c3 THEN 'c' ELSE 'd' END AS s
      FROM daily, cuts
    ),
    words AS (
      SELECT event_type,
             string_agg(s, '' ORDER BY d) AS sax_word
      FROM sym GROUP BY event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(levenshtein(a.sax_word, b.sax_word) AS BIGINT)
             AS sax_edit_distance,
           CAST(len(a.sax_word) AS BIGINT) AS word_len_a,
           CAST(len(b.sax_word) AS BIGINT) AS word_len_b
    FROM words a JOIN words b ON a.event_type < b.event_type
    """,
)
def q317_sax_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity via SAX (symbolic aggregate
    approximation, Lin et al. 2003): each event type's daily-count
    series quantizes into a 4-symbol word at corpus quartile
    breakpoints, and series compare by EDIT DISTANCE between words —
    the representation that turns time-series mining into string
    algorithms (and the standard scale answer: the expensive
    alignment runs on short symbol words, never raw series; here
    levenshtein is the alignment, both engines' identical DP).

    One day-grain reduce, quartile cuts broadcast map-side (q272's
    pattern), one ordered string_agg per type (bounded series —
    deterministic order by day), and a |types|² word join. The
    symbol words also make the series human-auditable — 'dddd' IS
    the burst.
    """
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cuts = daily.agg(
        F.percentile(F.col("n").cast("double"), F.lit(0.25)).alias("c1"),
        F.percentile(F.col("n").cast("double"), F.lit(0.5)).alias("c2"),
        F.percentile(F.col("n").cast("double"), F.lit(0.75)).alias("c3"),
    )
    sym = daily.crossJoin(F.broadcast(cuts)).select(
        "event_type",
        "d",
        F.when(F.col("n") <= F.col("c1"), "a")
        .when(F.col("n") <= F.col("c2"), "b")
        .when(F.col("n") <= F.col("c3"), "c")
        .otherwise("d")
        .alias("s"),
    )
    words = (
        sym.groupBy("event_type")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("d", "s"))).getField("s")
            ).alias("sax_word")
        )
    )
    a = words.select(
        F.col("event_type").alias("type_a"), F.col("sax_word").alias("wa")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), F.col("sax_word").alias("wb")
    )
    return a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        F.levenshtein("wa", "wb").cast("bigint").alias("sax_edit_distance"),
        F.length("wa").cast("bigint").alias("word_len_a"),
        F.length("wb").cast("bigint").alias("word_len_b"),
    )


# ------------------------------------ q318 DTW alignment distance

DTW_DAYS = 30  # fixed analysis window: first 30 days of the stream


def _dtw_sql() -> str:
    """Unrolled anti-diagonal DTW dynamic program: stage k holds the
    DP cells with i+j = k; cell (i,j) needs (i-1,j) and (i,j-1) from
    stage k-1 and (i-1,j-1) from stage k-2 — no intra-stage
    dependency, so each stage is a plain SELECT over the previous
    two. 2·{N} stages cover any series length ≤ {N}."""
    n = DTW_DAYS
    stages = []
    for k in range(3, 2 * n + 1):
        prev, prev2 = f"s{k - 1}", f"s{k - 2}" if k > 3 else "s2"
        stages.append(f"""s{k} AS MATERIALIZED (
      SELECT c.ta, c.tb, c.i, c.j,
             c.cost + LEAST(
               COALESCE(up.acc, 1e18), COALESCE(lf.acc, 1e18),
               COALESCE(dg.acc, 1e18)) AS acc
      FROM cells c
      LEFT JOIN {prev} up ON up.ta = c.ta AND up.tb = c.tb
                         AND up.i = c.i - 1 AND up.j = c.j
      LEFT JOIN {prev} lf ON lf.ta = c.ta AND lf.tb = c.tb
                         AND lf.i = c.i AND lf.j = c.j - 1
      LEFT JOIN {prev2} dg ON dg.ta = c.ta AND dg.tb = c.tb
                          AND dg.i = c.i - 1 AND dg.j = c.j - 1
      WHERE c.i + c.j = {k} AND NOT (c.i = 1 AND c.j = 1)
    )""")
    finals = " UNION ALL ".join(
        f"SELECT s.ta, s.tb, s.acc FROM s{k} s JOIN pairs p"
        f" ON p.ta = s.ta AND p.tb = s.tb AND s.i = p.n AND s.j = p.n"
        for k in range(2, 2 * n + 1)
    )
    return (
        f"""
    WITH spine AS MATERIALIZED (
      SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0 FROM events
    ),
    daily AS MATERIALIZED (
      SELECT e.event_type,
             date_diff('day', s.d0, CAST(e.ts AS DATE)) AS i,
             COUNT(*) AS cnt
      FROM events e, spine s
      WHERE date_diff('day', s.d0, CAST(e.ts AS DATE)) < {n}
      GROUP BY e.event_type, date_diff('day', s.d0, CAST(e.ts AS DATE))
    ),
    span AS MATERIALIZED (SELECT MAX(i) + 1 AS len FROM daily),
    grid AS MATERIALIZED (
      SELECT et.event_type, g.i
      FROM (SELECT DISTINCT event_type FROM daily) et,
           span, UNNEST(range(span.len)) AS g(i)
    ),
    filled AS MATERIALIZED (
      SELECT grid.event_type, grid.i, COALESCE(d.cnt, 0) AS cnt
      FROM grid LEFT JOIN daily d
        ON d.event_type = grid.event_type AND d.i = grid.i
    ),
    series AS MATERIALIZED (
      SELECT event_type, list(cnt ORDER BY i) AS v FROM filled
      GROUP BY event_type
    ),
    pairs AS MATERIALIZED (
      SELECT a.event_type AS ta, b.event_type AS tb,
             a.v AS va, b.v AS vb, len(a.v) AS n
      FROM series a JOIN series b ON a.event_type < b.event_type
    ),
    cells AS MATERIALIZED (
      SELECT p.ta, p.tb, gi.i, gj.j,
             CAST(ABS(p.va[gi.i] - p.vb[gj.j]) AS DOUBLE) AS cost
      FROM pairs p,
           UNNEST(range(1, p.n + 1)) AS gi(i),
           UNNEST(range(1, p.n + 1)) AS gj(j)
    ),
    s2 AS MATERIALIZED (
      SELECT ta, tb, 1 AS i, 1 AS j,
             CAST(ABS(va[1] - vb[1]) AS DOUBLE) AS acc
      FROM pairs
    ),
    """
        + ",\n    ".join(stages)
        + f"""
    SELECT ta AS type_a, tb AS type_b,
           CAST(acc AS BIGINT) AS dtw_distance
    FROM ({finals})
    """
    )


@register("q318_dtw_alignment", oracle=_dtw_sql())
def q318_dtw_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between event types' daily
    activity series (first {DTW_DAYS} days, zero-filled) — the
    alignment-based similarity that SAX edit distance (q317)
    approximates: DTW matches shifted/stretched bursts that
    lock-step L1 would punish. Integer L1 cell costs make the DP
    exact, so the result hash-matches.

    This is the showcase of the engine's custom-operator rule:
    Spark-side the quadratic DP runs as numpy inside Arrow-batched
    ``mapInPandas`` over the bounded pair rows (built-ins genuinely
    can't express the recurrence; series live as arrays, one pair
    per row, the Python surface stays candidates-only exactly like
    q249's re-ranker), while the ORACLE unrolls the same DP into
    {2 * DTW_DAYS - 2} anti-diagonal SQL stages (no intra-stage
    dependency — the same trick q268 uses for merge rounds), proving
    the Python path cell-for-cell. At scale the pair grain is
    |types|² and each DP is O(w·n) with a Sakoe-Chiba band — the
    corpus never enters the Python stage.
    """
    import numpy as np

    ev = t(spark, sf_dir, "events")
    spine = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(spine))
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("d0")).alias("i"),
        )
        .filter(F.col("i") < DTW_DAYS)
        .groupBy("event_type", "i")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    span = daily.agg((F.max("i") + 1).alias("len"))
    et = daily.select("event_type").distinct()
    grid = et.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.col("len") - 1)).alias("i"),
    )
    filled = grid.join(daily, ["event_type", "i"], "left").select(
        "event_type", "i", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    series = filled.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("i", "cnt")))
        .getField("cnt")
        .alias("v")
    )
    a = series.select(F.col("event_type").alias("type_a"), F.col("v").alias("va"))
    b = series.select(F.col("event_type").alias("type_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))

    def dtw(batches):
        for pdf in batches:
            rows = []
            for ta, tb, va, vb in zip(
                pdf["type_a"], pdf["type_b"], pdf["va"], pdf["vb"]
            ):
                x = np.asarray(va, dtype=np.int64)
                y = np.asarray(vb, dtype=np.int64)
                n, m = len(x), len(y)
                INF = np.int64(1 << 60)
                D = np.full((n + 1, m + 1), INF, dtype=np.int64)
                D[0, 0] = 0
                for i in range(1, n + 1):
                    cost = np.abs(x[i - 1] - y)  # row of |xi - yj|
                    for j in range(1, m + 1):
                        D[i, j] = cost[j - 1] + min(
                            D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
                        )
                rows.append(
                    {
                        "type_a": ta,
                        "type_b": tb,
                        "dtw_distance": int(D[n, m]),
                    }
                )
            yield pd.DataFrame(rows)

    import pandas as pd  # noqa: F811

    return pairs.mapInPandas(
        dtw, schema="type_a string, type_b string, dtw_distance long"
    )


# ------------------------------------------ q319 HITS scores

HITS_ITERS = 2
HITS_TOPK = 10


@register(
    "q319_hits_scores",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    h0 AS (SELECT DISTINCT s, 1.0 AS hub FROM ps),
    {", ".join(
        f'''a{i} AS MATERIALIZED (
      SELECT ps.p, SUM(h{i - 1}.hub) AS auth
      FROM ps JOIN h{i - 1} ON h{i - 1}.s = ps.s GROUP BY ps.p
    ),
    an{i} AS MATERIALIZED (
      SELECT p, auth / (SELECT SUM(auth) FROM a{i}) AS auth FROM a{i}
    ),
    h{i}_raw AS MATERIALIZED (
      SELECT ps.s, SUM(an{i}.auth) AS hub
      FROM ps JOIN an{i} ON an{i}.p = ps.p GROUP BY ps.s
    ),
    h{i} AS MATERIALIZED (
      SELECT s, hub / (SELECT SUM(hub) FROM h{i}_raw) AS hub
      FROM h{i}_raw
    )''' for i in range(1, HITS_ITERS + 1))}
    SELECT s AS supplier, (FLOOR(CAST(hub AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0) AS hub_score,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT s, hub, ROW_NUMBER() OVER (ORDER BY hub DESC, s) AS rk
      FROM h{HITS_ITERS}
    ) WHERE rk <= {HITS_TOPK}
    """,
)
def q319_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the supplier→part bipartite
    graph, {HITS_ITERS} unrolled mutual-reinforcement iterations
    (hub = Σ authority of supplied parts, authority = Σ hub of
    suppliers, L1-normalized each half-step): the top-{HITS_TOPK}
    hub suppliers. Unlike PageRank (q201 — a single random-walk
    score), HITS separates 'supplies many important parts' from
    'supplied by many important suppliers' — the bipartite-influence
    decomposition.

    Each half-step is one equi-join + reduce on the DISTINCT
    (part, supplier) projection; normalization divides by a 1-row
    broadcast sum, so scores are identical IEEE ratios. Iteration
    count is fixed and unrolled (q268's rule).
    """
    from pyspark.sql import Window as W

    ps = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    hub = ps.select("s").distinct().withColumn("hub", F.lit(1.0))
    for _ in range(HITS_ITERS):
        auth = (
            ps.join(hub, "s")
            .groupBy("p")
            .agg(F.sum("hub").alias("auth"))
        )
        asum = auth.agg(F.sum("auth").alias("t"))
        auth = auth.crossJoin(F.broadcast(asum)).select(
            "p", (F.col("auth") / F.col("t")).alias("auth")
        )
        hub_raw = (
            ps.join(auth, "p").groupBy("s").agg(F.sum("auth").alias("hub"))
        )
        hsum = hub_raw.agg(F.sum("hub").alias("t"))
        hub = hub_raw.crossJoin(F.broadcast(hsum)).select(
            "s", (F.col("hub") / F.col("t")).alias("hub")
        )
    wr = W.orderBy(F.col("hub").desc(), F.col("s"))
    return (
        hub.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= HITS_TOPK)
        .select(
            F.col("s").alias("supplier"),
            dround("hub", 8).alias("hub_score"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# --------------------------------- q320 degree assortativity


@register(
    "q320_degree_assortativity",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    capped AS (
      SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               COUNT(*) OVER (PARTITION BY l_partkey) AS deg
        FROM ps
      ) WHERE deg <= {KCORE_CAP}
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM capped a JOIN capped b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    de AS (
      SELECT CAST(du.d AS DOUBLE) AS x, CAST(dv.d AS DOUBLE) AS y
      FROM edges e
      JOIN deg du ON du.u = e.u
      JOIN deg dv ON dv.u = e.v
    )
    SELECT COUNT(*) AS n_directed_edges,
           (FLOOR(CAST((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / NULLIF(SQRT((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                  * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS assortativity
    FROM de
    """,
)
def q320_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-supply graph: the Pearson
    correlation of endpoint degrees across edges — Newman's r, the
    single number that says whether hubs attach to hubs (r > 0,
    social-network style: failures cascade among the well-connected)
    or hubs attach to leaves (r < 0, infrastructure style: hub loss
    strands the periphery). The resilience prior for any
    supply-chain risk model built on this graph (q305's blast radius
    spreads very differently under the two regimes).

    Degrees reduce from the capped edge list (q214's bound), each
    edge picks up both endpoint degrees via two joins on the
    vertex-sized degree table, and the correlation is five exact
    sufficient statistics (both directions of each undirected edge
    are counted, per Newman's definition).
    """
    # edge build kept as the codegen window-cap + theta self-join
    # (r9 A/B: the posting-list + checkpoint variant measured 1-3 s
    # SLOWER interleaved — the few reductions here consume the
    # IDENTICAL edge subtree, so ReuseExchange already pays the build
    # once and the checkpoint only costs block re-reads + lost stats;
    # contrast q277/q479 whose loops iterate over a mutating state)
    from pyspark.sql import Window as W

    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    capped = (
        ps.withColumn(
            "deg", F.count(F.lit(1)).over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("deg") <= KCORE_CAP)
        .drop("deg")
    )
    b = capped.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("v")
    )
    edges = (
        capped.join(
            b,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_suppkey") != F.col("v")),
        )
        .select(F.col("l_suppkey").alias("u"), "v")
        .distinct()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("y"))
    de = (
        edges.join(du, edges["u"] == du["ju"])
        .join(dv, edges["v"] == dv["jv"])
        .select(F.col("x").cast("double").alias("x"), F.col("y").cast("double").alias("y"))
    )
    n = F.count(F.lit(1))
    num = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
    den = F.nullif(
        F.sqrt(
            (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
            * (n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
        ),
        F.lit(0.0),
    )
    return de.agg(
        n.alias("n_directed_edges"),
        dround(num / den, 6).alias("assortativity"),
    )


# ------------------------------------------ q321 modularity


@register(
    "q321_modularity",
    oracle=f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    capped AS (
      SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               COUNT(*) OVER (PARTITION BY l_partkey) AS deg
        FROM ps
      ) WHERE deg <= {KCORE_CAP}
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM capped a JOIN capped b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    comm AS (SELECT s_suppkey AS u, s_nationkey AS c FROM supplier),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m2 FROM edges),
    intra AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS e_in
      FROM edges e
      JOIN comm cu ON cu.u = e.u
      JOIN comm cv ON cv.u = e.v
      WHERE cu.c = cv.c
    ),
    ktot AS (
      SELECT CAST(SUM(CAST(dc AS DECIMAL(28,0)) * CAST(dc AS DECIMAL(28,0)))
                  AS DOUBLE) AS sum_k2
      FROM (
        SELECT cm.c, SUM(d.d) AS dc
        FROM deg d JOIN comm cm ON cm.u = d.u GROUP BY cm.c
      )
    )
    SELECT CAST(m2.m2 AS BIGINT) AS n_directed_edges,
           (FLOOR(CAST(i.e_in / m2.m2 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS intra_community_share,
           (FLOOR(CAST(k.sum_k2 / (m2.m2 * m2.m2) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS expected_share,
           (FLOOR(CAST(i.e_in / m2.m2 - k.sum_k2 / (m2.m2 * m2.m2) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS modularity
    FROM m2, intra i, ktot k
    """,
)
def q321_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the nation partition over the co-supply
    graph: Q = (intra-community edge share) − (expected share under
    the degree-preserving null model, Σ_c (Σ_{{i∈c}} k_i)² / (2m)²)
    — the community-quality score every clustering-on-graphs result
    is judged by. Q ≈ 0 means nations do NOT form supply
    communities (this fixture's uniform generator — the null
    readout); a real regionalized supply chain shows Q ≫ 0, and a
    community detector (q64's components as candidate communities)
    would be tuned to maximize exactly this.

    Three bounded reductions off the capped edge list: intra-edge
    count (two community-tag joins), per-community degree totals
    (DECIMAL-exact squares), and the edge total — the formula
    evaluates on a 1-row frame.
    """
    # edge build kept as the codegen window-cap + theta self-join
    # (r9 A/B: the posting-list + checkpoint variant measured 1-3 s
    # SLOWER interleaved — the few reductions here consume the
    # IDENTICAL edge subtree, so ReuseExchange already pays the build
    # once and the checkpoint only costs block re-reads + lost stats;
    # contrast q277/q479 whose loops iterate over a mutating state)
    from pyspark.sql import Window as W

    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    capped = (
        ps.withColumn(
            "deg", F.count(F.lit(1)).over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("deg") <= KCORE_CAP)
        .drop("deg")
    )
    b = capped.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("v")
    )
    edges = (
        capped.join(
            b,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_suppkey") != F.col("v")),
        )
        .select(F.col("l_suppkey").alias("u"), "v")
        .distinct()
    )
    comm = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("cu"), F.col("s_nationkey").alias("c")
    )
    m2 = edges.agg(F.count(F.lit(1)).cast("double").alias("m2"))
    intra = (
        edges.join(F.broadcast(comm), edges["u"] == comm["cu"])
        .select("v", F.col("c").alias("c_u"))
        .join(
            F.broadcast(comm.select(F.col("cu").alias("cv"), F.col("c").alias("c_v"))),
            F.col("v") == F.col("cv"),
        )
        .filter(F.col("c_u") == F.col("c_v"))
        .agg(F.count(F.lit(1)).cast("double").alias("e_in"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ktot = (
        deg.join(F.broadcast(comm), deg["u"] == comm["cu"])
        .groupBy("c")
        .agg(F.sum("d").alias("dc"))
        .agg(
            F.sum(
                F.col("dc").cast("decimal(28,0)")
                * F.col("dc").cast("decimal(28,0)")
            )
            .cast("double")
            .alias("sum_k2")
        )
    )
    j = m2.crossJoin(F.broadcast(intra)).crossJoin(F.broadcast(ktot))
    return j.select(
        F.col("m2").cast("bigint").alias("n_directed_edges"),
        dround(F.col("e_in") / F.col("m2"), 6).alias("intra_community_share"),
        dround(F.col("sum_k2") / (F.col("m2") * F.col("m2")), 6).alias(
            "expected_share"
        ),
        dround(
            F.col("e_in") / F.col("m2")
            - F.col("sum_k2") / (F.col("m2") * F.col("m2")),
            6,
        ).alias("modularity"),
    )


# ------------------------------------ q322 decision stump (Gini)

STUMP_FEATURES = ["n_chars", "n_tokens"]
STUMP_CUT_PROBS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


@register(
    "q322_decision_stump",
    oracle=f"""
    WITH feat AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CAST(n_chars AS DOUBLE) AS n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
      FROM documents
    ),
    cand AS (
      {" UNION ALL ".join(
        f"SELECT '{feat}' AS feature, quantile_cont({feat}, {p!r}) AS cut"
        + " FROM feat"
        for feat in STUMP_FEATURES for p in STUMP_CUT_PROBS)}
    ),
    split AS (
      SELECT c.feature, c.cut,
             SUM(CASE WHEN (CASE WHEN c.feature = 'n_chars'
                            THEN f.n_chars ELSE f.n_tokens END) <= c.cut
                      THEN 1 ELSE 0 END) AS nl,
             SUM(CASE WHEN (CASE WHEN c.feature = 'n_chars'
                            THEN f.n_chars ELSE f.n_tokens END) <= c.cut
                      THEN f.y ELSE 0 END) AS pl,
             COUNT(*) AS n, SUM(f.y) AS p
      FROM cand c, feat f
      GROUP BY c.feature, c.cut
    ),
    scored AS (
      SELECT feature, cut, nl, n - nl AS nr,
             -- weighted Gini after the split; 0.5-smoothed shares
             -- keep empty sides defined on both engines
             (nl * (2.0 * ((pl + 0.5) / (nl + 1.0))
                    * (1 - (pl + 0.5) / (nl + 1.0)))
              + (n - nl) * (2.0 * ((p - pl + 0.5) / (n - nl + 1.0))
                    * (1 - (p - pl + 0.5) / (n - nl + 1.0)))) / n
               AS gini_after,
             2.0 * (CAST(p AS DOUBLE) / n) * (1 - CAST(p AS DOUBLE) / n)
               AS gini_before
      FROM split
    )
    SELECT feature, (FLOOR(CAST(cut AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS cut,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           (FLOOR(CAST(gini_before - gini_after AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS gini_gain,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY gini_before - gini_after DESC,
                                   feature, cut) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q322_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-STUMP training in-engine: for two features and nine
    decile cut candidates each, the weighted Gini impurity of the
    induced split against the lang='en' label — the top-3 splits by
    Gini gain ARE one level of a decision tree, trained exactly the
    way a distributed GBDT (XGBoost/LightGBM histogram mode) does
    it: candidate thresholds from quantiles, one pass computing
    every split's class counts, argmin impurity. The 0.5 smoothing
    keeps degenerate (empty-side) splits defined identically on
    both engines.

    One broadcast of the 18-row candidate frame onto the feature
    scan, one grouped reduce per (feature, cut) — never a per-
    threshold re-scan; the tree level is a bounded argmax window.
    """
    from pyspark.sql import Window as W

    feat = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split("text", " ")).cast("double").alias("n_tokens"),
    )
    cand = None
    for fname in STUMP_FEATURES:
        c = feat.agg(
            *[
                F.percentile(fname, F.lit(p)).alias(f"c{i}")
                for i, p in enumerate(STUMP_CUT_PROBS)
            ]
        ).select(
            F.lit(fname).alias("feature"),
            F.explode(
                F.array(*[F.col(f"c{i}") for i in range(len(STUMP_CUT_PROBS))])
            ).alias("cut"),
        )
        cand = c if cand is None else cand.unionByName(c)
    fv = F.when(F.col("feature") == "n_chars", F.col("n_chars")).otherwise(
        F.col("n_tokens")
    )
    left = fv <= F.col("cut")
    split = (
        feat.crossJoin(F.broadcast(cand))
        .groupBy("feature", "cut")
        .agg(
            F.sum(F.when(left, 1).otherwise(0)).alias("nl"),
            F.sum(F.when(left, F.col("y")).otherwise(0)).alias("pl"),
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("p"),
        )
    )
    share_l = (F.col("pl") + 0.5) / (F.col("nl") + 1.0)
    share_r = (F.col("p") - F.col("pl") + 0.5) / (F.col("n") - F.col("nl") + 1.0)
    gini_after = (
        F.col("nl") * (2.0 * share_l * (1 - share_l))
        + (F.col("n") - F.col("nl")) * (2.0 * share_r * (1 - share_r))
    ) / F.col("n")
    p_all = F.col("p").cast("double") / F.col("n")
    gini_before = 2.0 * p_all * (1 - p_all)
    scored = split.select(
        "feature",
        "cut",
        "nl",
        (F.col("n") - F.col("nl")).alias("nr"),
        (gini_before - gini_after).alias("gain"),
    )
    wr = W.orderBy(F.col("gain").desc(), F.col("feature"), F.col("cut"))
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
        .select(
            "feature",
            dround("cut", 4).alias("cut"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            dround("gain", 6).alias("gini_gain"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# --------------------------------- q323 rank correlation suite


@register(
    "q323_rank_correlation",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, CAST(YEAR(l.l_shipdate) AS INTEGER) AS y,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE YEAR(l.l_shipdate) IN (1996, 1997)
      GROUP BY p.p_brand, YEAR(l.l_shipdate)
    ),
    ranks AS (
      SELECT a.p_brand,
             ROW_NUMBER() OVER (ORDER BY a.rev DESC, a.p_brand) AS r1,
             ROW_NUMBER() OVER (ORDER BY b.rev DESC, a.p_brand) AS r2
      FROM rev a JOIN rev b
        ON b.p_brand = a.p_brand AND a.y = 1996 AND b.y = 1997
    ),
    pairs AS (
      SELECT CASE WHEN (x.r1 - y.r1) * (x.r2 - y.r2) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (x.r1 - y.r1) * (x.r2 - y.r2) < 0 THEN 1 ELSE 0 END
               AS disc
      FROM ranks x JOIN ranks y ON x.p_brand < y.p_brand
    ),
    kend AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS nc,
             CAST(SUM(disc) AS BIGINT) AS nd,
             COUNT(*) AS np
      FROM pairs
    ),
    spear AS (
      SELECT COUNT(*) AS n,
             CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS d2
      FROM ranks
    )
    SELECT s.n AS n_brands,
           k.nc AS concordant, k.nd AS discordant,
           (FLOOR(CAST(CAST(k.nc - k.nd AS DOUBLE) / k.np AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS kendall_tau,
           (FLOOR(CAST(1.0 - 6.0 * s.d2 / (s.n * (CAST(s.n AS DOUBLE) * s.n - 1)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS spearman_rho
    FROM kend k, spear s
    """,
)
def q323_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation suite between the 1996 and 1997 brand-
    revenue leaderboards: Kendall's τ (concordant-minus-discordant
    pair share — how often any two brands keep their relative order)
    and Spearman's ρ (1 − 6Σd²/n(n²−1)) — the nonparametric
    stability metrics for RANKINGS, where Pearson (q258) would be
    distorted by the revenue scale. The churn diff (q269) says WHO
    moved; these say how much order survived, in one number each.

    Revenue ranks come from exact-decimal reduces with total-order
    tie-breaks; the Kendall pair stage is |brands|² over the
    bounded leaderboard (25 brands → 300 pairs), and Spearman's d²
    sum is exact integers. Both windows order a bounded grain.
    """
    from pyspark.sql import Window as W

    rev = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1996, 1997))
        .groupBy("p_brand", "y")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("rev")
        )
    )
    a = rev.filter(F.col("y") == 1996).select("p_brand", F.col("rev").alias("ra"))
    b = rev.filter(F.col("y") == 1997).select(
        F.col("p_brand").alias("pb"), F.col("rev").alias("rb")
    )
    joined = a.join(b, a["p_brand"] == b["pb"])
    ranks = joined.select(
        "p_brand",
        F.row_number()
        .over(W.orderBy(F.col("ra").desc(), F.col("p_brand")))
        .alias("r1"),
        F.row_number()
        .over(W.orderBy(F.col("rb").desc(), F.col("p_brand")))
        .alias("r2"),
    )
    x = ranks.select(
        F.col("p_brand").alias("ba"), F.col("r1").alias("x1"), F.col("r2").alias("x2")
    )
    ypair = ranks.select(
        F.col("p_brand").alias("bb"), F.col("r1").alias("y1"), F.col("r2").alias("y2")
    )
    # broadcast the bounded leaderboard so the inequality pair join
    # plans BroadcastNestedLoop, never CartesianProduct
    pairs = x.join(F.broadcast(ypair), F.col("ba") < F.col("bb")).select(
        F.when(
            (F.col("x1") - F.col("y1")) * (F.col("x2") - F.col("y2")) > 0, 1
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            (F.col("x1") - F.col("y1")) * (F.col("x2") - F.col("y2")) < 0, 1
        )
        .otherwise(0)
        .alias("disc"),
    )
    kend = pairs.agg(
        F.sum("conc").cast("bigint").alias("nc"),
        F.sum("disc").cast("bigint").alias("nd"),
        F.count(F.lit(1)).alias("np"),
    )
    spear = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
        .cast("bigint")
        .alias("d2"),
    )
    j = kend.crossJoin(F.broadcast(spear))
    return j.select(
        F.col("n").alias("n_brands"),
        F.col("nc").alias("concordant"),
        F.col("nd").alias("discordant"),
        dround((F.col("nc") - F.col("nd")).cast("double") / F.col("np"), 6)
        .alias("kendall_tau"),
        dround(
            1.0
            - 6.0
            * F.col("d2")
            / (F.col("n") * (F.col("n").cast("double") * F.col("n") - 1)),
            6,
        ).alias("spearman_rho"),
    )


# ------------------------------------ q324 Poisson bootstrap

BOOT_B = 32  # bootstrap replicates
# Poisson(1) CDF cutoffs for the inverse-CDF weight lookup
POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
]
BOOT_Z = 1.959963984540054


def _pois_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(POIS_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


@register(
    "q324_poisson_bootstrap",
    oracle=f"""
    WITH hashed AS (
      -- one md5 per (row, tag) yields EIGHT 16-bit replicate
      -- uniforms via hex slices: B/8 digests per row, not B
      SELECT o.o_totalprice, g.tag,
             md5('boot:' || CAST(o.o_orderkey AS VARCHAR) || ':'
                 || CAST(g.tag AS VARCHAR)) AS h
      FROM orders o, UNNEST(range({BOOT_B // 8})) AS g(tag)
    ),
    reps AS (
      SELECT o_totalprice, tag * 8 + sl AS b,
             CAST(('0x' || substr(h, CAST(sl * 4 + 1 AS INTEGER), 4))
                  AS BIGINT) / 65536.0 AS u
      FROM hashed, UNNEST(range(8)) AS r(sl)
    ),
    weighted AS (
      SELECT b, {_pois_w_sql('u')} AS w, o_totalprice FROM reps
    ),
    means AS (
      SELECT b,
             (FLOOR(CAST(CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE)
               / NULLIF(SUM(w), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m
      FROM weighted GROUP BY b
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nb,
             CAST(SUM(CAST(m AS DECIMAL(28,8))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE) AS sm2
      FROM means
    ),
    pt AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS est
      FROM orders
    )
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
           (FLOOR(CAST(pt.est AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS point_estimate,
           (FLOOR(CAST(SQRT((a.sm2 - a.sm * a.sm / a.nb) / (a.nb - 1)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS bootstrap_se,
           (FLOOR(CAST(pt.est - CAST({BOOT_Z!r} AS DOUBLE)
                 * SQRT((a.sm2 - a.sm * a.sm / a.nb) / (a.nb - 1)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS ci_lower,
           (FLOOR(CAST(pt.est + CAST({BOOT_Z!r} AS DOUBLE)
                 * SQRT((a.sm2 - a.sm * a.sm / a.nb) / (a.nb - 1)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS ci_upper
    FROM agg a, pt
    """,
)
def q324_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap standard error of mean order value — THE
    distributed bootstrap (Chamandy et al., Google 2012): instead of
    resampling n rows with replacement (which needs global
    coordination), every row draws an independent Poisson(1)
    multiplicity per replicate — here DETERMINISTICALLY, by
    inverse-CDF lookup on a per-(row, replicate) hash uniform, so
    the whole resampling plan is reproducible across engines, runs,
    and retries (the q88 rule applied to uncertainty
    quantification). Output: point estimate, bootstrap SE across
    {BOOT_B} replicate means, and the normal-approximation CI.

    One fan-out of {BOOT_B} per row feeds {BOOT_B} weighted means in
    a single grouped reduce (weights ≤ 5 keep products
    DECIMAL-exact); the across-replicate variance runs on a
    {BOOT_B}-row frame. At 100 TB the replicate dimension rides the
    same scan — no per-replicate pass.
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    hashed = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(BOOT_B // 8 - 1).cast("long")
            )
        ).alias("tag"),
    ).select(
        "o_totalprice",
        "tag",
        F.md5(
            F.concat(
                F.lit("boot:"),
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("tag").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    reps = hashed.select(
        "o_totalprice",
        "tag",
        "h",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(7).cast("long"))
        ).alias("sl"),
    ).select(
        "o_totalprice",
        (F.col("tag") * 8 + F.col("sl")).alias("b"),
        (
            F.conv(
                F.substring(
                    F.col("h"), (F.col("sl") * 4 + 1).cast("int"), 4
                ),
                16,
                10,
            ).cast("double")
            / 65536.0
        ).alias("u")
    )
    u = F.col("u")
    w = F.lit(5)
    for k in range(len(POIS_CDF) - 1, -1, -1):
        w = F.when(u < POIS_CDF[k], k).otherwise(w)
    weighted = reps.select("b", w.alias("w"), "o_totalprice")
    means = weighted.groupBy("b").agg(
        dround(
            F.sum(
                F.col("w") * F.col("o_totalprice").cast("decimal(18,2)")
            ).cast("double")
            / F.nullif(F.sum("w"), F.lit(0)),
            6,
        ).alias("m")
    )
    agg = means.agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.sum(F.col("m").cast("decimal(28,8)")).cast("double").alias("sm"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sm2"),
    )
    pt = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est")
    )
    se = F.sqrt(
        (F.col("sm2") - F.col("sm") * F.col("sm") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    return agg.crossJoin(F.broadcast(pt)).select(
        F.lit(BOOT_B).cast("bigint").alias("n_replicates"),
        dround("est", 6).alias("point_estimate"),
        dround(se, 6).alias("bootstrap_se"),
        dround(F.col("est") - F.lit(BOOT_Z) * se, 6).alias("ci_lower"),
        dround(F.col("est") + F.lit(BOOT_Z) * se, 6).alias("ci_upper"),
    )


# --------------------------------------- q325 jackknife SE


@register(
    "q325_jackknife_se",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) AS s
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS gn,
             CAST(SUM(CAST(s AS DECIMAL(28,0))) AS DOUBLE) AS gs,
             COUNT(*) AS g
      FROM per_src
    ),
    loo AS (
      -- LOO means snapped to BIGINT micro-units: hunting (r4) found
      -- TWO cross-engine traps here — ROUND half-even vs half-up on
      -- .5 boundaries, and CAST(double AS DECIMAL(38,14)) going
      -- through the shortest string repr in Spark but the exact
      -- binary expansion in DuckDB. Integer micro-units dodge both.
      SELECT p.source,
             CAST(FLOOR((t.gs - p.s) / NULLIF(t.gn - p.n, 0.0)
                        * 1000000 + 0.5) AS BIGINT) AS mi, t.g,
             t.gs / t.gn AS full_mean
      FROM per_src p, tot t
    ),
    agg AS (
      -- micro-unit sums in DECIMAL(38,0) (a could pass 2^63 on
      -- max-length corpora); b fits a double exactly, so b*b as a
      -- double product is correctly rounded and identical
      SELECT g, full_mean,
             CAST(SUM(CAST(mi AS DECIMAL(38,0))) AS DOUBLE) AS b,
             CAST(SUM(CAST(mi AS DECIMAL(38,0)) * mi) AS DOUBLE) AS a
      FROM loo GROUP BY g, full_mean
    )
    SELECT CAST(g AS BIGINT) AS n_groups,
           FLOOR(full_mean * 1000000 + 0.5) / 1000000 AS point_estimate,
           FLOOR(SQRT(GREATEST((g - 1.0) / g * (a - b * b / g)
                 / 1000000000000.0, 0.0)) * 1000000 + 0.5) / 1000000
             AS jackknife_se
    FROM agg
    """,
)
def q325_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error of mean document
    length, leaving out one source at a time — the deterministic
    classic beside the q324 bootstrap, and the correct uncertainty
    under CLUSTERED sampling (documents within a source correlate;
    a row-level SE would be falsely tight — the block-jackknife
    point). Each leave-one-out mean is (global − group)/(n −
    n_group): the q297 subtractable-moment trick, so all replicates
    come from ONE pass.

    Per-source exact sums, a 1-row global, |sources| LOO means with
    decimal-roundtrip squares, and Tukey's (g−1)/g variance
    formula on a bounded frame.
    """
    per_src = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double").alias("s"),
    )
    tot = per_src.agg(
        F.sum("n").cast("double").alias("gn"),
        F.sum(F.col("s").cast("decimal(28,0)")).cast("double").alias("gs"),
        F.count(F.lit(1)).alias("g"),
    )
    loo = per_src.crossJoin(F.broadcast(tot)).select(
        # NULLIF: a single-source corpus leaves an empty LOO sample
        # (gn == n) — NULL on both engines, not ANSI error vs inf.
        # BIGINT micro-units: see the oracle comment (r4 hunt finds)
        F.floor(
            (F.col("gs") - F.col("s"))
            / F.nullif(F.col("gn") - F.col("n"), F.lit(0.0))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mi"),
        "g",
        (F.col("gs") / F.col("gn")).alias("full_mean"),
    )
    agg = loo.groupBy("g", "full_mean").agg(
        F.sum(F.col("mi").cast("decimal(38,0)")).cast("double").alias("b"),
        F.sum(F.col("mi").cast("decimal(38,0)") * F.col("mi"))
        .cast("double")
        .alias("a"),
    )
    return agg.select(
        F.col("g").cast("bigint").alias("n_groups"),
        (F.floor(F.col("full_mean") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "point_estimate"
        ),
        (
            F.floor(
                F.sqrt(
                    F.greatest(
                        (F.col("g") - 1.0)
                        / F.col("g")
                        * (
                            F.col("a")
                            - F.col("b") * F.col("b") / F.col("g")
                        )
                        / F.lit(1_000_000_000_000.0),
                        F.lit(0.0),
                    )
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("jackknife_se"),
    )


# ----------------------- q326 stratified / IPW treatment effect


@register(
    "q326_propensity_ate",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) AS activity,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS treated,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
               AS y
      FROM events GROUP BY user_id
    ),
    cuts AS (
      SELECT quantile_cont(CAST(activity AS DOUBLE), 0.5) AS c
      FROM per_user
    ),
    strat AS (
      SELECT CASE WHEN activity <= c THEN 'low' ELSE 'high' END AS stratum,
             treated, y
      FROM per_user, cuts
    ),
    per_stratum AS (
      SELECT stratum,
             COUNT(*) AS n,
             SUM(treated) AS nt,
             CAST(SUM(CASE WHEN treated = 1
                  THEN CAST(y AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE)
               AS sy_t,
             CAST(SUM(CASE WHEN treated = 0
                  THEN CAST(y AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE)
               AS sy_c
      FROM strat GROUP BY stratum
    )
    SELECT stratum,
           CAST(n AS BIGINT) AS n_users,
           CAST(nt AS BIGINT) AS n_treated,
           (FLOOR(CAST(sy_t / NULLIF(nt, 0)
                 - sy_c / NULLIF(n - nt, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS stratum_ate,
           (FLOOR(CAST(sy_t / NULLIF(CAST(nt AS DOUBLE) / n, 0.0) / n
                 - sy_c / NULLIF(1.0 - CAST(nt AS DOUBLE) / n, 0.0) / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS ipw_ate
    FROM per_stratum
    """,
)
def q326_propensity_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observational treatment-effect estimation per propensity
    stratum: 'treated' = user ever clicked, outcome = purchase
    value, confounder = activity level (median-split strata — the
    propensity-score stratification design). Per stratum: the
    within-stratum mean-difference ATE and the IPW (inverse-
    propensity-weighted, Horvitz-Thompson) estimate using the
    stratum propensity n_t/n — the two classic deconfounding
    estimators, side by side (they agree under correct
    stratification; divergence flags residual confounding). High-
    activity users both click more AND buy more — the confounding a
    naive treated-vs-control comparison (no strata) would absorb as
    'effect'.

    One user-grain reduce, a broadcast median cut, a 2-row stratum
    aggregate with exact-decimal outcome sums and NULLIF-guarded
    empty arms.
    """
    per_user = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("y"),
    )
    cuts = per_user.agg(
        F.percentile(F.col("activity").cast("double"), F.lit(0.5)).alias("c")
    )
    strat = per_user.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("activity") <= F.col("c"), "low")
        .otherwise("high")
        .alias("stratum"),
        "treated",
        "y",
    )
    per_stratum = strat.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("treated").alias("nt"),
        F.sum(
            F.when(F.col("treated") == 1, F.col("y").cast("decimal(28,6)"))
            .otherwise(F.lit(0).cast("decimal(28,6)"))
        )
        .cast("double")
        .alias("sy_t"),
        F.sum(
            F.when(F.col("treated") == 0, F.col("y").cast("decimal(28,6)"))
            .otherwise(F.lit(0).cast("decimal(28,6)"))
        )
        .cast("double")
        .alias("sy_c"),
    )
    p = F.col("nt").cast("double") / F.col("n")
    return per_stratum.select(
        "stratum",
        F.col("n").cast("bigint").alias("n_users"),
        F.col("nt").cast("bigint").alias("n_treated"),
        dround(
            F.col("sy_t") / F.nullif(F.col("nt"), F.lit(0))
            - F.col("sy_c") / F.nullif(F.col("n") - F.col("nt"), F.lit(0)),
            6,
        ).alias("stratum_ate"),
        dround(
            F.col("sy_t") / F.nullif(p, F.lit(0.0)) / F.col("n")
            - F.col("sy_c") / F.nullif(1.0 - p, F.lit(0.0)) / F.col("n"),
            6,
        ).alias("ipw_ate"),
    )


# --------------------------------- q327 difference-in-differences

DID_POLICY_DATE = "2024-01-15"


@register(
    "q327_diff_in_diff",
    oracle=f"""
    WITH obs AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5('ab:' ||
                    CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE 0 END AS treat,
             CASE WHEN CAST(ts AS DATE) >= DATE '{DID_POLICY_DATE}'
                  THEN 1 ELSE 0 END AS post,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    cell AS (
      SELECT treat, post, COUNT(*) AS n,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
      FROM obs GROUP BY treat, post
    )
    SELECT
      CAST((SELECT n FROM cell WHERE treat=1 AND post=1) AS BIGINT)
        AS n_treat_post,
      (FLOOR(CAST((SELECT m FROM cell WHERE treat=1 AND post=1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m_treat_post,
      (FLOOR(CAST((SELECT m FROM cell WHERE treat=1 AND post=0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m_treat_pre,
      (FLOOR(CAST((SELECT m FROM cell WHERE treat=0 AND post=1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m_ctrl_post,
      (FLOOR(CAST((SELECT m FROM cell WHERE treat=0 AND post=0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m_ctrl_pre,
      (FLOOR(CAST(((SELECT m FROM cell WHERE treat=1 AND post=1)
             - (SELECT m FROM cell WHERE treat=1 AND post=0))
            - ((SELECT m FROM cell WHERE treat=0 AND post=1)
               - (SELECT m FROM cell WHERE treat=0 AND post=0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
        AS did_estimate
    """,
)
def q327_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 (treatment × pre/post-
    policy) mean-outcome table and the DiD estimate (Δtreated −
    Δcontrol) for purchase value around a policy date — the
    workhorse quasi-experimental design when randomized holdout
    isn't possible: the control group's trend nets out seasonality
    and shocks a naive before/after comparison (q156's MoM) would
    attribute to the policy.

    One fact scan to a 4-cell aggregate (exact-decimal sums); the
    estimate is arithmetic over the 4-row frame pivoted by scalar
    lookups. Parallel-trends diagnostics would reuse q302's
    backtest grain per arm.
    """
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 1
    )
    obs = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(treat, 1).otherwise(0).alias("treat"),
            F.when(
                F.to_date("ts") >= F.lit(DID_POLICY_DATE).cast("date"), 1
            )
            .otherwise(0)
            .alias("post"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    cell = obs.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    wide = cell.groupBy().pivot("treat", [0, 1]).agg(
        F.min(F.when(F.col("post") == 1, F.col("m"))).alias("post"),
        F.min(F.when(F.col("post") == 0, F.col("m"))).alias("pre"),
        F.min(F.when(F.col("post") == 1, F.col("n"))).alias("npost"),
    )
    return wide.select(
        F.col("1_npost").cast("bigint").alias("n_treat_post"),
        dround(F.col("1_post"), 6).alias("m_treat_post"),
        dround(F.col("1_pre"), 6).alias("m_treat_pre"),
        dround(F.col("0_post"), 6).alias("m_ctrl_post"),
        dround(F.col("0_pre"), 6).alias("m_ctrl_pre"),
        dround(
            (F.col("1_post") - F.col("1_pre"))
            - (F.col("0_post") - F.col("0_pre")),
            6,
        ).alias("did_estimate"),
    )


# ------------------------------ q328 regression discontinuity

RDD_CUTOFF = 300000.0
RDD_BANDWIDTH = 50000.0


@register(
    "q328_regression_discontinuity",
    oracle=f"""
    WITH iv AS (
      SELECT o.o_totalprice AS x,
             (FLOOR(CAST(CAST(AVG(date_diff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE))) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice BETWEEN {RDD_CUTOFF - RDD_BANDWIDTH}
                               AND {RDD_CUTOFF + RDD_BANDWIDTH}
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    sides AS (
      SELECT CASE WHEN x >= {RDD_CUTOFF} THEN 'above' ELSE 'below' END
               AS side,
             COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS m
      FROM iv GROUP BY 1
    )
    SELECT
      CAST((SELECT n FROM sides WHERE side = 'below') AS BIGINT) AS n_below,
      CAST((SELECT n FROM sides WHERE side = 'above') AS BIGINT) AS n_above,
      (FLOOR(CAST((SELECT m FROM sides WHERE side = 'below') AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_below,
      (FLOOR(CAST((SELECT m FROM sides WHERE side = 'above') AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_above,
      (FLOOR(CAST((SELECT m FROM sides WHERE side = 'above')
            - (SELECT m FROM sides WHERE side = 'below') AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
        AS discontinuity
    """,
)
def q328_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-discontinuity readout at the {RDD_CUTOFF:,.0f}
    order-value threshold: mean fulfillment lag just below vs just
    above the cutoff within a ±{RDD_BANDWIDTH:,.0f} bandwidth — the
    local-comparison design for RULE-BASED treatments (priority
    handling kicks in above a value threshold): units barely on
    either side are comparable, so the jump at the cutoff IS the
    rule's effect. This fixture's independent generator shows ≈ 0
    discontinuity — the placebo test a real RDD analysis must also
    pass at fake cutoffs.

    The bandwidth filter pushes into the orders scan before the
    join; per-order lag reduces exactly; the two local means are a
    2-row aggregate with decimal-roundtrip sums.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") >= RDD_CUTOFF - RDD_BANDWIDTH)
        & (F.col("o_totalprice") <= RDD_CUTOFF + RDD_BANDWIDTH)
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            dround(
                F.avg(
                    F.datediff(
                        F.to_date("l_shipdate"), F.to_date("o_orderdate")
                    )
                ),
                6,
            ).alias("y")
        )
    )
    sides = iv.groupBy(
        F.when(F.col("o_totalprice") >= RDD_CUTOFF, "above")
        .otherwise("below")
        .alias("side")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("y").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m"),
    )
    wide = sides.groupBy().pivot("side", ["below", "above"]).agg(
        F.min("n").alias("n"), F.min("m").alias("m")
    )
    return wide.select(
        F.col("below_n").cast("bigint").alias("n_below"),
        F.col("above_n").cast("bigint").alias("n_above"),
        dround(F.col("below_m"), 6).alias("mean_below"),
        dround(F.col("above_m"), 6).alias("mean_above"),
        dround(F.col("above_m") - F.col("below_m"), 6).alias("discontinuity"),
    )


# ------------------------------ q329 Horvitz-Thompson estimator

HT_BASE_RATE = 0.05  # inclusion prob for the smallest orders
HT_MAX_RATE = 0.5  # capped inclusion prob for the largest


@register(
    "q329_horvitz_thompson",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS y,
             -- size-proportional inclusion probability, capped
             LEAST({HT_MAX_RATE!r},
                   {HT_BASE_RATE!r} * o_totalprice / 50000.0) AS pi,
             CAST(('0x' || substr(md5('ht:' || CAST(o_orderkey AS VARCHAR)),
                   1, 13)) AS BIGINT) / CAST({float(1 << 52)!r} AS DOUBLE)
               AS u
      FROM orders
    ),
    sampled AS (SELECT * FROM o WHERE u < pi),
    est AS (
      SELECT COUNT(*) AS n_sampled,
             CAST(SUM(CAST(CAST(y AS DOUBLE) / pi AS DECIMAL(28,6)))
                  AS DOUBLE) AS ht_total
      FROM sampled
    ),
    truth AS (
      SELECT COUNT(*) AS n_pop, CAST(SUM(y) AS DOUBLE) AS true_total
      FROM o
    )
    SELECT t.n_pop, e.n_sampled,
           (FLOOR(CAST(t.true_total AS DOUBLE) * 100.0 + 0.5) / 100.0) AS true_total,
           (FLOOR(CAST(e.ht_total AS DOUBLE) * 100.0 + 0.5) / 100.0) AS ht_estimate,
           (FLOOR(CAST(ABS(e.ht_total - t.true_total) / t.true_total AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS rel_error
    FROM est e, truth t
    """,
)
def q329_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson total estimation under size-proportional
    (πps) sampling: large orders are sampled at up to {HT_MAX_RATE:.0%},
    small ones at {HT_BASE_RATE:.0%}, and the population revenue total is
    recovered as Σ y/π over the sample alone — the unequal-
    probability survey estimator that lets a 100 TB pipeline audit
    totals from a few percent of rows WITHOUT the bias uniform
    sampling has against heavy rows (which carry most of the
    total). Inclusion is the deterministic hash-uniform (q88's
    reproducibility rule), so the same 'random' sample re-draws
    identically on both engines and across retries.

    One scan computes π and membership map-side; the estimate is a
    decimal-roundtrip weighted sum over the sample; truth rides
    along for the rel-error readout.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        F.least(
            F.lit(HT_MAX_RATE),
            F.lit(HT_BASE_RATE) * F.col("o_totalprice") / 50000.0,
        ).alias("pi"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ht:"), F.col("o_orderkey").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 52))
        ).alias("u"),
    )
    sampled = o.filter(F.col("u") < F.col("pi"))
    est = sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(
            (F.col("y").cast("double") / F.col("pi")).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("ht_total"),
    )
    truth = o.agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum("y").cast("double").alias("true_total"),
    )
    return est.crossJoin(F.broadcast(truth)).select(
        "n_pop",
        "n_sampled",
        dround("true_total", 2).alias("true_total"),
        dround("ht_total", 2).alias("ht_estimate"),
        dround(
            F.abs(F.col("ht_total") - F.col("true_total"))
            / F.col("true_total"),
            6,
        ).alias("rel_error"),
    )


# ------------------------------ q330 capture-recapture estimate

CR_RATE1 = 300  # permille: first survey captures ~30%
CR_RATE2 = 300  # second survey


@register(
    "q330_capture_recapture",
    oracle=f"""
    WITH users AS (
      SELECT DISTINCT user_id FROM events
    ),
    marked AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5('cap1:' ||
                    CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
                  < {CR_RATE1} THEN 1 ELSE 0 END AS s1,
             CASE WHEN CAST(('0x' || substr(md5('cap2:' ||
                    CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
                  < {CR_RATE2} THEN 1 ELSE 0 END AS s2
      FROM users
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n_capture1,
           CAST(SUM(s2) AS BIGINT) AS n_capture2,
           CAST(SUM(s1 * s2) AS BIGINT) AS n_recaptured,
           COUNT(*) AS true_population,
           (FLOOR(CAST(CAST(SUM(s1) AS DOUBLE) * SUM(s2)
                 / NULLIF(SUM(s1 * s2), 0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS lincoln_petersen,
           (FLOOR(CAST(ABS(CAST(SUM(s1) AS DOUBLE) * SUM(s2)
                 / NULLIF(SUM(s1 * s2), 0) - COUNT(*)) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS rel_error
    FROM marked
    """,
)
def q330_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Lincoln-Petersen) population estimation:
    two independent ~30% 'surveys' of the user base (deterministic
    hash membership standing in for two overlapping data sources),
    and N̂ = n₁·n₂ / overlap — the estimator for the size of a
    population NEITHER source covers fully: dark-traffic users,
    entities behind two incomplete registries, dedup undercount
    estimation (how many duplicates did the matcher MISS, from two
    matchers' overlap). Truth rides along since the fixture knows
    it.

    One distinct-user reduce carries both membership flags; the
    estimate is exact-count arithmetic on a 1-row frame, NULLIF-
    guarded for a zero overlap.
    """
    users = t(spark, sf_dir, "events").select("user_id").distinct()

    def mark(tag, rate):
        return F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(tag), F.col("user_id").cast("string")).cast(
                            "binary"
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 1000
            < rate,
            1,
        ).otherwise(0)

    marked = users.select(
        mark("cap1:", CR_RATE1).alias("s1"), mark("cap2:", CR_RATE2).alias("s2")
    )
    lp = F.sum("s1").cast("double") * F.sum("s2") / F.nullif(
        F.sum(F.col("s1") * F.col("s2")), F.lit(0)
    )
    return marked.agg(
        F.sum("s1").cast("bigint").alias("n_capture1"),
        F.sum("s2").cast("bigint").alias("n_capture2"),
        F.sum(F.col("s1") * F.col("s2")).cast("bigint").alias("n_recaptured"),
        F.count(F.lit(1)).alias("true_population"),
        dround(lp, 4).alias("lincoln_petersen"),
        dround(F.abs(lp - F.count(F.lit(1))) / F.count(F.lit(1)), 6).alias(
            "rel_error"
        ),
    )


# ------------------------------------- q331 Chao1 richness


@register(
    "q331_chao1_richness",
    oracle="""
    WITH wc AS (
      SELECT source, w, COUNT(*) AS r FROM (
        SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY source, w
    ),
    fof AS (
      SELECT source,
             COUNT(*) AS s_obs,
             CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS f1,
             CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS f2
      FROM wc GROUP BY source
    )
    SELECT source,
           CAST(s_obs AS BIGINT) AS observed_vocab,
           CAST(f1 AS BIGINT) AS singletons,
           CAST(f2 AS BIGINT) AS doubletons,
           (FLOOR(CAST(s_obs + f1 * (f1 - 1) / (2 * (f2 + 1)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0)
             AS chao1_estimate
    FROM fof
    """,
)
def q331_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimation per source: the TRUE vocabulary
    size (including never-observed words) estimated from singleton
    and doubleton counts — S_obs + F₁(F₁−1)/2(F₂+1), the bias-
    corrected form that stays defined at F₂ = 0. The coverage
    question Good-Turing (q310) answers in probability mass, Chao1
    answers in SPECIES COUNT — 'how much vocabulary has this source
    not shown us yet', the acquisition-planning number for corpus
    collection (diminishing-returns detection per source).

    Per-(source, word) counts reduce to per-source frequency-of-
    frequencies scalars; the estimator is exact-count arithmetic on
    the |sources|-row frame.
    """
    wc = (
        fan_out(t(spark, sf_dir, "documents"))
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    fof = wc.groupBy("source").agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0))
        .cast("double")
        .alias("f1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0))
        .cast("double")
        .alias("f2"),
    )
    return fof.select(
        "source",
        F.col("s_obs").cast("bigint").alias("observed_vocab"),
        F.col("f1").cast("bigint").alias("singletons"),
        F.col("f2").cast("bigint").alias("doubletons"),
        dround(
            F.col("s_obs")
            + F.col("f1") * (F.col("f1") - 1) / (2 * (F.col("f2") + 1)),
            4,
        ).alias("chao1_estimate"),
    )


# ------------------------------------ q332 mutual information


@register(
    "q332_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT event_type AS x,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) // 6 AS y,
             COUNT(*) AS nxy
      FROM events GROUP BY event_type, CAST(EXTRACT(hour FROM ts)
        AS INTEGER) // 6
    ),
    tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n FROM joint),
    mx AS (SELECT x, CAST(SUM(nxy) AS DOUBLE) AS nx FROM joint GROUP BY x),
    my AS (SELECT y, CAST(SUM(nxy) AS DOUBLE) AS ny FROM joint GROUP BY y)
    SELECT j.x AS event_type, CAST(j.y AS BIGINT) AS hour_bucket,
           CAST(j.nxy AS BIGINT) AS n,
           (FLOOR(CAST((j.nxy / t.n)
                 * LN((j.nxy * t.n) / (mx.nx * my.ny)) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0)
             AS mi_contribution
    FROM joint j
    JOIN mx ON mx.x = j.x
    JOIN my ON my.y = j.y
    CROSS JOIN tot t
    """,
)
def q332_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and 6-hour time bucket,
    emitted as per-cell contributions p(x,y)·ln(p(x,y)/p(x)p(y)) —
    the information-theoretic dependence measure beside q142's
    chi-square (MI sums to the KL divergence from independence;
    chi-square is its second-order approximation) and the feature-
    relevance score (MI(feature, label)) behind information-gain
    feature selection. Per-cell contributions (q142's rule) keep
    the output order-independent — the total is one exact-decimal
    fold away for whoever needs the scalar.

    One joint-count reduce plus two broadcast marginals; ln on
    identical operands (q229's precedent) over the bounded
    |types|×|buckets| grid.
    """
    joint = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("x"),
            (F.hour("ts").cast("int") / 6).cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    tot = joint.agg(F.sum("nxy").cast("double").alias("n"))
    mx = joint.groupBy("x").agg(F.sum("nxy").cast("double").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").cast("double").alias("ny"))
    j = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    mi = (F.col("nxy") / F.col("n")) * F.log(
        (F.col("nxy") * F.col("n")) / (F.col("nx") * F.col("ny"))
    )
    return j.select(
        F.col("x").alias("event_type"),
        F.col("y").cast("bigint").alias("hour_bucket"),
        F.col("nxy").cast("bigint").alias("n"),
        dround(mi, 8).alias("mi_contribution"),
    )


# --------------------------- q333 TF-IDF cosine pairs (sparse dot)

TFIDF_DF_FRAC = 0.02  # keep terms in at most 2% of docs (rare = informative)
TFIDF_DF_MIN = 5  # floor so tiny corpora keep their tail
TFIDF_TOPK = 15


@register(
    "q333_tfidf_cosine_pairs",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM (
        SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             UNNEST(range(1, len(tk))) AS r(i)
      ) GROUP BY doc_id, w
    ),
    stats AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tf),
    df AS (
      SELECT d.w, d.df FROM (
        SELECT w, COUNT(*) AS df FROM tf GROUP BY w
      ) d, stats s
      WHERE d.df <= GREATEST({TFIDF_DF_MIN},
                             CAST({TFIDF_DF_FRAC!r} * s.nd AS BIGINT))
    ),
    wts AS (
      SELECT t.doc_id, t.w,
             t.tf * LN(CAST(s.nd AS DOUBLE) / d.df) AS wt
      FROM tf t JOIN df d ON d.w = t.w CROSS JOIN stats s
    ),
    norms AS (
      SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm FROM wts GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             SUM(a.wt * b.wt) AS dot
      FROM wts a JOIN wts b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
      -- zero-norm docs (every term at df == nd -> all weights 0)
      -- have UNDEFINED cosine (0/0): dropped on BOTH engines, else
      -- Spark's ANSI mode throws and DuckDB ranks the NaN first
      SELECT d.doc_a, d.doc_b,
             d.dot / (na.nrm * nb.nrm) AS cosine
      FROM dots d
      JOIN norms na ON na.doc_id = d.doc_a
      JOIN norms nb ON nb.doc_id = d.doc_b
      WHERE na.nrm > 0 AND nb.nrm > 0
    )
    SELECT doc_a, doc_b, cosine, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_a, doc_b, (FLOOR(CAST(cosine AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cosine,
             ROW_NUMBER() OVER (ORDER BY (FLOOR(CAST(cosine AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC,
                                doc_a, doc_b) AS rk
      FROM scored
    ) WHERE rk <= {TFIDF_TOPK}
    """,
)
def q333_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine similarity between documents computed as a
    SPARSE dot product over the inverted index — the IR-native
    near-duplicate scorer beside the lexical (q61 Jaccard) and
    dense (q72 embedding) families. Terms are BIGRAMS (this
    fixture's ~40-word unigram vocabulary is all stop-words — every
    unigram fails any sane DF cut; bigrams discriminate), and the
    document-frequency cut is RELATIVE (≤ {TFIDF_DF_FRAC:.0%} of
    docs, floor {TFIDF_DF_MIN}) so it keeps the same informative
    tail at every scale factor — an absolute cap either drops
    nothing or everything as the corpus grows. The cut kills the
    quadratic hot-term blowup (q61's DF rule) AND is correct IR.
    Top-{TFIDF_TOPK} pairs by cosine.

    The plan IS the sparse-vector join: term-grain weights, a
    self-join on the term key (posting lists), partial dot products
    reduced per pair, norms broadcast back. No dense vectors, no
    all-pairs stage anywhere.
    """
    from pyspark.sql import Window as W

    tf = (
        fan_out(t(spark, sf_dir, "documents"))
        # 1-word docs first (property-hunt find, r3): Spark's
        # sequence(1, 0) DESCENDS (the q260 trap), so a single-word
        # doc generated [1, 0] and element_at(words, 2) crashed under
        # ANSI. DuckDB's range(1, 1) is empty — no bigrams — so the
        # correct twin is to contribute nothing.
        .filter(F.size(F.split("text", " ")) >= 2)
        # tokenize ONCE per row: referencing split() inside the
        # transform lambda re-splits the string per element access
        .select("doc_id", F.split("text", " ").alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> concat(element_at(tk, i), ' ',"
                    " element_at(tk, i + 1)))"
                )
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.agg(F.count_distinct("doc_id").alias("nd"))
    df = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("df")
            <= F.greatest(
                F.lit(TFIDF_DF_MIN),
                (F.lit(TFIDF_DF_FRAC) * F.col("nd")).cast("bigint"),
            )
        )
        .select("w", "df")
    )
    wts = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            (
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("df"))
            ).alias("wt"),
        )
    )
    norms = wts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    b = wts.select(
        F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"), F.col("wt").alias("wtb")
    )
    dots = (
        wts.join(
            b, (F.col("w") == F.col("wb")) & (F.col("doc_id") < F.col("doc_b"))
        )
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.sum(F.col("wt") * F.col("wtb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        # zero-norm docs have undefined cosine (0/0): drop BEFORE
        # the division (ANSI mode throws DIVIDE_BY_ZERO otherwise —
        # property-hunt find, r4 degenerate all-stopword corpus)
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "doc_a",
            "doc_b",
            # round BEFORE ranking: two pairs whose true cosines
            # differ only in the 1e-16 summation-order noise must
            # TIE (and fall through to the doc-pair tie-break)
            # identically on both engines — ranking the raw double
            # let Spark and DuckDB order a displayed-equal pair
            # differently (property-hunt find, r3)
            dround(
                F.col("dot") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
    )
    wr = W.orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= TFIDF_TOPK)
        .select(
            "doc_a",
            "doc_b",
            "cosine",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# --------------------------------------------- q334 BM25 ranking

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["spark", "join", "window"]
BM25_TOPK = 10


@register(
    "q334_bm25_ranking",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY doc_id, w
    ),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(CAST(dl AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
               AS avgdl
      FROM dl
    ),
    qterms AS (
      SELECT UNNEST(['{"','".join(BM25_QUERY)}']) AS w
    ),
    idf AS (
      SELECT q.w,
             LN(1 + (s.nd - d.df + 0.5) / (d.df + 0.5)) AS idf
      FROM qterms q
      JOIN (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w) d
        ON d.w = q.w
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(i.idf * t.tf * ({BM25_K1!r} + 1)
                 / (t.tf + {BM25_K1!r}
                    * (1 - {BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
               AS bm25
      FROM tf t
      JOIN idf i ON i.w = t.w
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, (FLOOR(CAST(bm25 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS bm25, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {BM25_TOPK}
    """,
)
def q334_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for the query {BM25_QUERY} — the
    lexical retrieval scoring function (Robertson-Spärck Jones)
    every search engine and RAG retriever defaults to, with its two
    signature corrections over raw TF-IDF: term-frequency
    SATURATION (k₁ = {BM25_K1}: the 10th occurrence adds almost
    nothing) and document-LENGTH normalization (b = {BM25_B}: long
    documents stop winning by volume). Top-{BM25_TOPK} documents —
    the first-stage retriever whose candidates q249's re-ranker and
    q233's RRF fusion consume.

    Query terms are a 3-row broadcast; scoring touches only the
    posting lists of those terms (the inverted-index win: corpus
    scan for TF build, then query-term-sized joins); idf/saturation
    arithmetic is shared-literal IEEE.
    """
    from pyspark.sql import Window as W

    docs = fan_out(t(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        (
            F.sum(F.col("dl").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    qterms = None
    for term in BM25_QUERY:
        row = docs.sparkSession.range(1).select(F.lit(term).alias("w"))
        qterms = row if qterms is None else qterms.unionByName(row)
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = (
        qterms.join(dfreq, "w")
        .crossJoin(F.broadcast(stats.select("nd")))
        .select(
            "w",
            F.log(
                1 + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * (BM25_K1 + 1)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("bm25")
        )
    )
    wr = W.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= BM25_TOPK)
        .select(
            "doc_id",
            dround("bm25", 6).alias("bm25"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ------------------------------------ q335 ALS half-step (2-dim)

ALS_REG = 0.1
ALS_PROBE_USERS = 10


def _item_factor_sql(i: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5('if{i}:' || CAST(l_partkey AS VARCHAR)),"
        f" 1, 7)) AS BIGINT) % 1000) / 1000.0"
    )


@register(
    "q335_als_halfstep",
    oracle=f"""
    WITH ratings AS (
      SELECT o.o_custkey AS u, l.l_partkey,
             CAST(COUNT(*) AS DOUBLE) AS r
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_partkey
    ),
    factored AS (
      SELECT u, r,
             {_item_factor_sql(1)} AS f1,
             {_item_factor_sql(2)} AS f2
      FROM ratings
    ),
    normal AS (
      SELECT u,
             SUM(f1 * f1) + {ALS_REG!r} AS a11,
             SUM(f1 * f2) AS a12,
             SUM(f2 * f2) + {ALS_REG!r} AS a22,
             SUM(f1 * r) AS b1,
             SUM(f2 * r) AS b2,
             COUNT(*) AS n_items
      FROM factored GROUP BY u
    )
    SELECT u AS custkey,
           CAST(n_items AS BIGINT) AS n_items,
           (FLOOR(CAST((b1 * a22 - b2 * a12)
                 / NULLIF(a11 * a22 - a12 * a12, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS user_f1,
           (FLOOR(CAST((a11 * b2 - a12 * b1)
                 / NULLIF(a11 * a22 - a12 * a12, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS user_f2
    FROM normal WHERE u < {ALS_PROBE_USERS}
    """,
)
def q335_als_halfstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS half-step of matrix factorization: with 2-dim item
    factors held fixed (hash-derived here; the previous iteration's
    output in a real run), each user's factors solve the ridge-
    regularized 2×2 normal equations (AᵀA + λI)x = Aᵀr in closed
    form — exactly how distributed ALS (the Netflix-era recommender
    workhorse, Spark MLlib's own implementation) alternates: the
    per-user solves are independent, so the 'iteration' is one
    grouped aggregation of factor outer-products plus map-side
    linear algebra. Probe slice (custkey < {ALS_PROBE_USERS})
    keeps the driver output bounded; ratings are order counts.

    Per-user sufficient statistics are sums of on-grid 3-decimal
    factor products (exact); the 2×2 solve is q282's Cramer shape,
    NULLIF-guarded for singular systems.
    """
    ratings = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("u"), "l_partkey")
        .agg(F.count(F.lit(1)).cast("double").alias("r"))
    )

    def item_factor(i):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"if{i}:"), F.col("l_partkey").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 1000
        ) / 1000.0

    factored = ratings.select(
        "u", "r", item_factor(1).alias("f1"), item_factor(2).alias("f2")
    )
    normal = factored.groupBy("u").agg(
        (F.sum(F.col("f1") * F.col("f1")) + ALS_REG).alias("a11"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12"),
        (F.sum(F.col("f2") * F.col("f2")) + ALS_REG).alias("a22"),
        F.sum(F.col("f1") * F.col("r")).alias("b1"),
        F.sum(F.col("f2") * F.col("r")).alias("b2"),
        F.count(F.lit(1)).alias("n_items"),
    )
    det = F.nullif(
        F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"), F.lit(0.0)
    )
    return normal.filter(F.col("u") < ALS_PROBE_USERS).select(
        F.col("u").alias("custkey"),
        F.col("n_items").cast("bigint").alias("n_items"),
        dround(
            (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det, 6
        ).alias("user_f1"),
        dround(
            (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det, 6
        ).alias("user_f2"),
    )


# ------------------------------- q336 item-item collaborative filter

CF_MIN_CO = 3
CF_TOPK_PER_ITEM = 2
CF_USER_CAP = 60  # per-user basket cap bounds pair fan-out


@register(
    "q336_item_item_cf",
    oracle=f"""
    WITH ui AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    capped AS (
      SELECT u, i FROM (
        SELECT u, i, COUNT(*) OVER (PARTITION BY u) AS basket
        FROM ui
      ) WHERE basket <= {CF_USER_CAP}
    ),
    pop AS (SELECT i, COUNT(*) AS n FROM capped GROUP BY i),
    co AS (
      SELECT a.i AS ia, b.i AS ib, COUNT(*) AS nco
      FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
      GROUP BY a.i, b.i
      HAVING COUNT(*) >= {CF_MIN_CO}
    ),
    scored AS (
      SELECT c.ia, c.ib, c.nco,
             c.nco / SQRT(CAST(pa.n AS DOUBLE) * pb.n) AS cosine
      FROM co c
      JOIN pop pa ON pa.i = c.ia
      JOIN pop pb ON pb.i = c.ib
    ),
    sym AS (
      SELECT ia AS i, ib AS j, nco, cosine FROM scored
      UNION ALL
      SELECT ib, ia, nco, cosine FROM scored
    )
    SELECT i AS item, j AS neighbor, CAST(nco AS BIGINT) AS co_users,
           (FLOOR(CAST(cosine AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cosine, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY i
               ORDER BY cosine DESC, j) AS rk
      FROM sym
    ) WHERE rk <= {CF_TOPK_PER_ITEM}
    """,
)
def q336_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: each part's top-
    {CF_TOPK_PER_ITEM} neighbors by co-purchase cosine
    n(i,j)/√(n(i)·n(j)) — the 'customers who bought X also bought'
    model (Amazon's 2003 item-item paper), which scales where
    user-user CF cannot: the item co-occurrence matrix is
    catalog-sized, not user-sized. The support floor ({CF_MIN_CO}
    co-users) kills noise pairs; the per-user basket cap
    ({CF_USER_CAP}) bounds the quadratic pair fan-out (q137's
    basket rule — a crawler buying everything would otherwise emit
    |catalog|² pairs).

    Pairs generate through the user equi-join on the capped
    distinct (user, item) projection; popularity normalizers join
    from the item-grain reduce; per-item top-k is a partitioned
    rank window, never global.
    """
    from pyspark.sql import Window as W

    ui = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    capped = (
        ui.withColumn("basket", F.count(F.lit(1)).over(W.partitionBy("u")))
        .filter(F.col("basket") <= CF_USER_CAP)
        .drop("basket")
    )
    pop = capped.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    b = capped.select(F.col("u").alias("ub"), F.col("i").alias("j"))
    co = (
        capped.join(b, (F.col("u") == F.col("ub")) & (F.col("i") < F.col("j")))
        .groupBy(F.col("i").alias("ia"), F.col("j").alias("ib"))
        .agg(F.count(F.lit(1)).alias("nco"))
        .filter(F.col("nco") >= CF_MIN_CO)
    )
    pa = pop.select(F.col("i").alias("ia"), F.col("n").alias("na"))
    pb = pop.select(F.col("i").alias("ib"), F.col("n").alias("nb"))
    scored = (
        co.join(pa, "ia")
        .join(pb, "ib")
        .select(
            "ia",
            "ib",
            "nco",
            (
                F.col("nco")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
            ).alias("cosine"),
        )
    )
    sym = scored.select(
        F.col("ia").alias("item"),
        F.col("ib").alias("neighbor"),
        "nco",
        "cosine",
    ).unionByName(
        scored.select(
            F.col("ib").alias("item"),
            F.col("ia").alias("neighbor"),
            "nco",
            "cosine",
        )
    )
    wr = W.partitionBy("item").orderBy(F.col("cosine").desc(), "neighbor")
    return (
        sym.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= CF_TOPK_PER_ITEM)
        .select(
            "item",
            "neighbor",
            F.col("nco").cast("bigint").alias("co_users"),
            dround("cosine", 6).alias("cosine"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ------------------------------------------ q337 cohort LTV curve

LTV_MAX_AGE = 6  # months tracked per cohort


@register(
    "q337_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    aged AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
               CAST(date_trunc('month', o.o_orderdate) AS DATE)) AS age,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    sizes AS (
      SELECT cohort, COUNT(DISTINCT o.o_custkey) AS n_users
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        AND f.cohort = CAST(date_trunc('month', o.o_orderdate) AS DATE)
      GROUP BY cohort
    ),
    cells AS (
      SELECT cohort, age, CAST(SUM(v) AS DECIMAL(28,2)) AS rev
      FROM aged WHERE age <= {LTV_MAX_AGE}
      GROUP BY cohort, age
    ),
    cum AS (
      SELECT cohort, age,
             SUM(rev) OVER (PARTITION BY cohort ORDER BY age) AS cum_rev
      FROM cells
    )
    SELECT c.cohort, CAST(c.age AS BIGINT) AS age_months,
           s.n_users,
           (FLOOR(CAST(CAST(c.cum_rev AS DOUBLE) / s.n_users AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS cum_ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
    WHERE c.cohort <= DATE '1997-06-01'
    """,
)
def q337_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: cumulative revenue per user by months
    since the cohort's first order, for cohorts old enough to have
    {LTV_MAX_AGE} months of runway — the curve that payback-period
    and acquisition-spend decisions read off (the REVENUE companion
    of q118's retention counts: retention says who came back, LTV
    says what they were worth). Younger cohorts are excluded rather
    than shown artificially flat — the classic LTV-triangle
    truncation bias.

    First-order months reduce per customer; ages are month diffs
    against the broadcast cohort map; cumulative revenue windows
    per cohort over the bounded age grain with DECIMAL-exact sums.
    """
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias(
            "cohort"
        )
    )
    aged = o.join(F.broadcast(firsts), "o_custkey").select(
        "cohort",
        (
            F.months_between(
                F.date_trunc("month", "o_orderdate").cast("date"), F.col("cohort")
            )
        )
        .cast("int")
        .alias("age"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("om"),
    )
    sizes = (
        aged.filter(F.col("om") == F.col("cohort"))
        .groupBy("cohort")
        .agg(F.count_distinct("o_custkey").alias("n_users"))
    )
    cells = (
        aged.filter(F.col("age") <= LTV_MAX_AGE)
        .groupBy("cohort", "age")
        .agg(F.sum("v").cast("decimal(28,2)").alias("rev"))
    )
    wc = W.partitionBy("cohort").orderBy("age")
    cum = cells.withColumn("cum_rev", F.sum("rev").over(wc))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .filter(F.col("cohort") <= F.lit("1997-06-01").cast("date"))
        .select(
            "cohort",
            F.col("age").cast("bigint").alias("age_months"),
            "n_users",
            dround(
                F.col("cum_rev").cast("double") / F.col("n_users"), 6
            ).alias("cum_ltv_per_user"),
        )
    )


# --------------------------------------- q338 Ljung-Box statistic

LB_LAGS = 7


@register(
    "q338_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    acf AS (
      {" UNION ALL ".join(f'''
      SELECT {k} AS lag, n_pairs,
             (n * sxy - sx * sy)
               / NULLIF(SQRT(GREATEST(
                   (n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)), 0.0)
               AS rho
      FROM (
        SELECT COUNT(*) AS n_pairs, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               -- widened operand: ~1e9-unscaled daily revenues
               -- overflow DuckDB's int64 DECIMAL(18) multiply (the
               -- q258 r7 fix, same sufficient-statistics shape)
               CAST(SUM(CAST(x AS DECIMAL(28,2)) * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(28,2)) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(28,2)) * y) AS DOUBLE) AS syy
        FROM (SELECT rev AS x, LAG(rev, {k}) OVER (ORDER BY d) AS y
              FROM daily) WHERE y IS NOT NULL
      )''' for k in range(1, LB_LAGS + 1))}
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM daily)
    SELECT CAST(nn.n AS BIGINT) AS n_days,
           {LB_LAGS} AS n_lags,
           (FLOOR(CAST(nn.n * (nn.n + 2)
                 * SUM(a.rho * a.rho / (nn.n - a.lag)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ljung_box_q,
           CAST(14.067 AS DOUBLE) AS chi2_crit_95
    FROM acf a, nn
    GROUP BY nn.n
    """,
)
def q338_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily revenue: Q = n(n+2)·
    Σ ρ²ₖ/(n−k) over the first {LB_LAGS} autocorrelations — the
    white-noise test that turns q258's per-lag ACF into ONE
    decision number against the χ²({LB_LAGS}) 95% critical value
    (14.067, shared literal): Q above it means structure remains —
    the residual check every fitted forecast model (q302's
    backtests) must pass before its errors can be trusted as noise.

    Reuses q258's DECIMAL-exact sufficient-statistics shape per
    lag; the weighted ρ² fold runs over the {LB_LAGS}-row frame
    (bounded — no float-order hazard at this size per the group-
    local convention).
    """
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    w = W.orderBy("d")
    lagged = daily.select(
        F.col("rev").alias("x"),
        *[F.lag("rev", k).over(w).alias(f"y{k}") for k in range(1, LB_LAGS + 1)],
    )
    stacked = lagged.select(
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("lag"), F.col(f"y{k}").alias("y"))
                    for k in range(1, LB_LAGS + 1)
                ]
            )
        ).alias("s"),
    ).select("x", F.col("s.lag").alias("lag"), F.col("s.y").alias("y"))
    pairs = stacked.filter(F.col("y").isNotNull())
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    rho = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        # GREATEST(…, 0) before SQRT: one-pair lags make the variance
        # product mathematically 0 but float round-off can dip it
        # negative, which ERRORS DuckDB's SQRT (property-hunt find)
        F.sqrt(
            F.greatest(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ),
        F.lit(0.0),
    )
    # Lag SPINE left-join (property-hunt find, r3): with a series
    # shorter than a lag (1-day corpora: shorter than EVERY lag) that
    # lag has zero pairs, so the groupBy drops it — and with all lags
    # empty the whole result vanished, while the oracle's scalar
    # aggregates keep one NULL-rho row per lag and emit n_days with a
    # NULL Q. The spine restores the missing lags as NULL-rho rows;
    # SUM skips NULLs, so populated corpora are unchanged.
    lag_spine = spark.range(1, LB_LAGS + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    acf = lag_spine.join(stats, "lag", "left").select("lag", rho.alias("rho"))
    nn = daily.agg(F.count(F.lit(1)).cast("double").alias("n"))
    j = acf.crossJoin(F.broadcast(nn))
    return j.groupBy("n").agg(
        F.col("n").cast("bigint").alias("n_days"),
        F.lit(LB_LAGS).alias("n_lags"),
        dround(
            F.col("n")
            * (F.col("n") + 2)
            * F.sum(F.col("rho") * F.col("rho") / (F.col("n") - F.col("lag"))),
            6,
        ).alias("ljung_box_q"),
        F.lit(14.067).alias("chi2_crit_95"),
    ).drop("n").select("n_days", "n_lags", "ljung_box_q", "chi2_crit_95")
