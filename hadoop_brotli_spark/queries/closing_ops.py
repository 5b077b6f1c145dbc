"""Round-2 coverage extensions, batch 3: PII/identifier pattern
scrubbing, exact-substring (sliding-window) cross-document
duplication, SemDeDup-style semantic dedup decisions, and tokenizer
fertility — the remaining named stages of a production LLM
training-data pipeline.

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
  aggregate. Bucket skew is bounded by the same cap argument as
  q62/q212 (oversized buckets mean mass near-duplication that exact
  dedup q60 removes first).
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
from ._util import fan_out, t
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
           ROUND(CAST(SUM(n_dup) AS DOUBLE) / SUM(n_windows), 6)
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
        F.round(
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


@register(
    "q254_semantic_dedup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_sql_sign_bucket('embedding', SEMDEDUP_BITS)} AS bucket
      FROM embeddings
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
      WHERE ROUND(dot / (na * nb), 6) >= {SEMDEDUP_TAU}
    )
    SELECT b.label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN d.drop_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d.drop_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN d.drop_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS drop_rate
    FROM b LEFT JOIN dropped d ON d.drop_id = b.vec_id
    GROUP BY b.label
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
    bucket key, never all-pairs; the drop-set is vec_id-sized and
    the readout |labels|-sized.
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", sign_bucket("embedding", SEMDEDUP_BITS).alias("bucket")
    )
    a = emb.select(
        F.col("vec_id").alias("keep_id"), F.col("embedding").alias("ea"), "bucket"
    )
    b = emb.select(
        F.col("vec_id").alias("drop_id"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
    )
    cosine = F.round(
        dot_double("ea", "eb") / (norm_double("ea") * norm_double("eb")), 6
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
    flagged = emb.select("vec_id", "label").join(
        dropped, emb["vec_id"] == dropped["drop_id"], "left"
    )
    dropped_flag = F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0)
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(dropped_flag).cast("bigint").alias("n_dropped"),
        F.sum(1 - dropped_flag).cast("bigint").alias("n_kept"),
        F.round(
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
           ROUND(CAST(SUM(len(text)) AS DOUBLE)
             / SUM(len(regexp_extract_all(text, '{BPE_RE}'))), 6)
             AS chars_per_token,
           ROUND(CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS DOUBLE)
             / SUM(len(string_split(text, ' '))), 6) AS tokens_per_word
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
        F.round(
            F.sum(F.length("text")).cast("double") / F.sum(n_tok), 6
        ).alias("chars_per_token"),
        F.round(F.sum(n_tok).cast("double") / F.sum(n_words), 6).alias(
            "tokens_per_word"
        ),
    )
