"""Text-analysis operators over ``documents``: token statistics,
quality scoring, corpus-trained character-n-gram language ID,
rolling-hash document fingerprinting, per-source corpus stats.

All arithmetic stays on integers (token counts, char counts) until a
final division, so ratios are bit-identical across engines.

Scale notes (100 TB): every operator here is scan → narrow transform
→ one hash aggregation; the language-ID profile (q82) is a tiny
aggregate (langs × top-20 trigrams) broadcast back against the
corpus — classic map-side-join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, t

STOPWORDS = ("the", "a", "of", "and")
PROFILE_K = 20  # trigrams per language profile


@register(
    "q80_token_stats",
    oracle="""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT word) AS n_uniq_tokens,
           CAST(SUM(LENGTH(word)) AS DOUBLE) / COUNT(*) AS avg_token_len,
           CAST(COUNT(DISTINCT word) AS DOUBLE) / COUNT(*) AS ttr
    FROM words GROUP BY doc_id
    """,
)
def q80_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer): totals, uniques, mean
    token length, type-token ratio."""
    words = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_uniq_tokens"),
        (F.sum(F.length("word")).cast("double") / F.count(F.lit(1))).alias(
            "avg_token_len"
        ),
        (F.countDistinct("word").cast("double") / F.count(F.lit(1))).alias("ttr"),
    )


@register(
    "q81_quality_score",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    stats AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN word IN {STOPWORDS!r} THEN 1 ELSE 0 END) AS n_stop
      FROM words GROUP BY doc_id
    )
    SELECT s.doc_id, d.lang, s.n_tokens,
           CAST(s.n_stop AS DOUBLE) / s.n_tokens AS stopword_ratio,
           (FLOOR(CAST(LEAST(1.0, s.n_tokens / 100.0)
             * (1.0 - CAST(s.n_stop AS DOUBLE) / s.n_tokens) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS quality_score
    FROM stats s JOIN documents d ON d.doc_id = s.doc_id
    """,
)
def q81_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score: length credit (saturating at
    100 tokens) discounted by stopword density — the shape of
    C4/Gopher-style quality filters, exact-arithmetic for the oracle."""
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    stats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("word").isin(*STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    score = dround(
        F.least(F.lit(1.0), F.col("n_tokens") / 100.0) * (1.0 - stop_ratio), 6
    )
    return (
        stats.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            stop_ratio.alias("stopword_ratio"),
            score.alias("quality_score"),
        )
    )


@register(
    "q82_lang_id_ngram",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang, substr(text, i + 1, 3) AS tri
      FROM documents, UNNEST(range(length(text) - 2)) AS u(i)
    ),
    profile_counts AS (
      SELECT lang, tri, COUNT(*) AS cnt
      FROM grams GROUP BY lang, tri
    ),
    profile AS (
      SELECT lang, tri, cnt FROM (
        SELECT lang, tri, cnt,
               ROW_NUMBER() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, tri ASC
               ) AS rk
        FROM profile_counts
      ) WHERE rk <= {PROFILE_K}
    ),
    doc_tris AS (
      SELECT DISTINCT doc_id, lang AS true_lang, tri FROM grams
    ),
    scores AS (
      SELECT d.doc_id, d.true_lang, p.lang AS cand_lang,
             CAST(SUM(p.cnt) AS BIGINT) AS score
      FROM doc_tris d JOIN profile p ON p.tri = d.tri
      GROUP BY d.doc_id, d.true_lang, p.lang
    ),
    best AS (
      SELECT doc_id, true_lang, cand_lang AS predicted_lang, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC
             ) AS rk
      FROM scores
    )
    SELECT doc_id, true_lang, predicted_lang, score
    FROM best WHERE rk = 1
    """,
)
def q82_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID, trained on the corpus itself:
    build top-20 trigram profiles per lang, score each document by
    summed profile counts of its distinct trigrams, argmax.

    The profile is a tiny aggregate → broadcast joined back against
    the exploded corpus (map-side join at scale). Integer scores
    keep the argmax exact.

    Plan shape (r5 restructure — the old shared (doc, lang, tri)
    pre-aggregate exchanged at DOCUMENT grain, the biggest relation
    in the query): the profile branch now partial-aggregates the
    exploded trigram stream straight to (lang, tri) VOCABULARY grain
    before its exchange (map-side combine eats the fan-out), and the
    scores branch explodes per-document ``array_distinct`` trigrams
    (in-row dedup, no shuffle) into the broadcast profile join, so
    its exchange is doc x cand_lang after partial agg. No doc-grain
    trigram relation ever crosses the wire — the property that
    survives a 100x corpus.
    """
    docs = fan_out(
        t(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    )
    tri_expr = (
        "transform(sequence(1, length(text) - 2),"
        " i -> substring(text, i, 3))"
    )
    # profile branch: full trigram stream -> (lang, tri) counts.
    # Partial aggregation reduces to vocabulary grain pre-shuffle.
    profile_counts = (
        docs.select(
            "lang", F.explode(F.expr(tri_expr)).alias("tri")
        )
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wprof = W.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("tri").asc())
    profile = (
        profile_counts.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= PROFILE_K)
        .select(F.col("lang").alias("cand_lang"), "tri", "cnt")
    )
    # scores branch: per-doc DISTINCT trigrams dedup in-row (array
    # codegen, zero shuffle), then probe the broadcast profile
    # (bounded: PROFILE_K x #langs rows).
    doc_tris = docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.array_distinct(F.expr(tri_expr))).alias("tri"),
    )
    scores = (
        doc_tris.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("cnt").alias("score"))
    )
    wbest = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id", "true_lang", F.col("cand_lang").alias("predicted_lang"), "score"
        )
    )


@register(
    "q83_doc_fingerprint",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 4
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i+1:i+4], ' ') AS shingle
      FROM docs, UNNEST(range(len(w) - 3)) AS t(i)
    ),
    fp AS (
      SELECT doc_id, MIN(md5(shingle)) AS fingerprint
      FROM sh GROUP BY doc_id
    )
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_bucket
    FROM fp
    """,
)
def q83_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint (winnowing, window = whole doc): the
    min md5 over 4-word shingles. Equal fingerprints → near-certain
    overlap; ``n_bucket`` surfaces collision clusters."""
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 4)
    )
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 4), i -> concat_ws(' ', slice(w, i + 1, 4)))"
            )
        ).alias("shingle"),
    ).distinct()
    fp = sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle").cast("binary"))).alias("fingerprint")
    )
    return fp.select(
        "doc_id",
        "fingerprint",
        F.count(F.lit(1)).over(W.partitionBy("fingerprint")).alias("n_bucket"),
    )


@register(
    "q84_corpus_stats",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY source, lang
    """,
)
def q84_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus statistics — integer-exact."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "q86_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT)
             AS n_subtokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT)
             AS n_alpha,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT)
             AS n_punct
    FROM documents
    """,
)
def q86_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting: pre-tokenizer classes (alpha
    runs / digit runs / single punctuation), the standard byte-pair
    pre-segmentation shape — all inside codegen via
    ``regexp_extract_all`` (no explode: per-row array lengths)."""
    docs = t(spark, sf_dir, "documents")

    def n_matches(pattern: str):
        return F.size(F.regexp_extract_all("text", F.lit(pattern), 0)).cast("bigint")

    return docs.select(
        "doc_id",
        n_matches(BPE_RE).alias("n_subtokens"),
        n_matches("[a-zA-Z]+").alias("n_alpha"),
        n_matches("[0-9]+").alias("n_num"),
        n_matches("[^a-zA-Z0-9 ]").alias("n_punct"),
    )


@register(
    "q87_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
      FROM documents, UNNEST(range(1, len(text) + 1)) AS r(i)
    ),
    hist AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    agg AS (
      SELECT doc_id, SUM(c) AS n, SUM(c * log2(c)) AS s
      FROM hist GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_total,
           (FLOOR(CAST(log2(n) - s / n AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS char_entropy
    FROM agg
    """,
)
def q87_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/boilerplate quality signal (low entropy = repeated
    chars, high = noise).

    Uses the algebraic form H = log2(n) - sum(c*log2(c))/n so both
    engines evaluate the identical expression over exact integer
    counts; rounded to 4 to absorb summation-order ULPs.
    """
    docs = t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        "text",
    ).select("doc_id", F.col("text").substr(F.col("i"), F.lit(1)).alias("ch"))
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        hist.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log2("c")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_chars_total"),
            dround(F.log2("n") - F.col("s") / F.col("n"), 4).alias("char_entropy"),
        )
    )


@register(
    "q88_data_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
               % 10 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM assigned GROUP BY 1, 2
    """,
)
def q88_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment: hash the stable key
    (never RNG) into 10 buckets → 80/10/10 split, counted per lang.

    Hash-based splits are the reproducible-sampling pattern for
    training pipelines: membership is a pure function of the key, so
    re-runs, backfills, and cross-system checks agree exactly —
    unlike df.sample(), whose RNG is partition-layout-dependent.
    """
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7), 16, 10).cast(
            "long"
        ),
        F.lit(10),
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q146_regex_extract_family",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 's[a-z]+')) AS BIGINT)
             AS n_s_words,
           regexp_extract(text, 's[a-z]+') AS first_s_word,
           CAST(len(list_distinct(regexp_extract_all(text, 's[a-z]+')))
                AS BIGINT) AS n_distinct_s_words,
           regexp_matches(text, 'join [a-z]+ scan') AS has_join_scan,
           regexp_replace(text, 's[a-z]+', '_', 'g') LIKE '%_ _%'
             AS has_adjacent_s_words
    FROM documents
    """,
)
def q146_regex_extract_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family over document text: extract-all with
    count and distinct count, first match, boolean pattern test, and
    global replace — the text-wrangling surface corpus filters are
    built from.

    Patterns stick to portable character-class syntax (identical
    semantics in Java regex and RE2); both engines return '' (not
    NULL) for a no-match extract, which the oracle relies on.

    Scale: pure row-local codegen'd string work — no shuffle, no
    Python; column pruning reaches the scan.
    """
    docs = t(spark, sf_dir, "documents")
    pat = "s[a-z]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("bigint").alias(
            "n_s_words"
        ),
        F.regexp_extract("text", pat, 0).alias("first_s_word"),
        F.size(F.array_distinct(F.regexp_extract_all("text", F.lit(pat), 0)))
        .cast("bigint")
        .alias("n_distinct_s_words"),
        F.col("text").rlike("join [a-z]+ scan").alias("has_join_scan"),
        F.regexp_replace("text", pat, "_").like("%_ _%").alias(
            "has_adjacent_s_words"
        ),
    )


@register(
    "q176_filter_rule_attribution",
    oracle="""
    WITH scored AS (
      SELECT source,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS wc,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS mwl,
             CAST(LENGTH(text)
                  - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))
                  AS DOUBLE) / LENGTH(text) AS digit_frac
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE NOT (wc BETWEEN 20 AND 2000))
             AS fail_wordcount,
           COUNT(*) FILTER (WHERE NOT (mwl BETWEEN 3 AND 12))
             AS fail_wordlen,
           COUNT(*) FILTER (WHERE NOT (digit_frac < 0.2))
             AS fail_digits,
           COUNT(*) FILTER (WHERE wc BETWEEN 20 AND 2000
                              AND mwl BETWEEN 3 AND 12
                              AND digit_frac < 0.2) AS pass_all
    FROM scored GROUP BY source
    """,
)
def q176_filter_rule_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus filter-rule attribution: for each quality rule
    (word-count bounds, mean word length, digit fraction — the
    Gopher-style heuristics), how many documents each rule rejects
    per source, plus the all-rules survivor count. Rule attribution
    is what tells a pipeline owner WHICH gate is eating their data.

    All three signals are length arithmetic on the single-spaced
    text (no explode, no tokenizer UDF): word count = spaces + 1,
    mean word length = letters/words, digit fraction via one
    regexp_replace. One scan, one conditional-count aggregate —
    Catalyst keeps the whole thing in codegen.

    100 TB: per-row string ops + a |sources|-group agg; the text
    column prunes away after the projection.
    """
    d = t(spark, sf_dir, "documents")
    wc = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    letters = F.length(F.regexp_replace("text", " ", ""))
    mwl = letters.cast("double") / wc
    digit_frac = (
        F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("double") / F.length("text")
    scored = d.select(
        "source", wc.alias("wc"), mwl.alias("mwl"), digit_frac.alias("digit_frac")
    )
    r1 = F.col("wc").between(20, 2000)
    r2 = F.col("mwl").between(3, 12)
    r3 = F.col("digit_frac") < 0.2
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(~r1).alias("fail_wordcount"),
        F.count_if(~r2).alias("fail_wordlen"),
        F.count_if(~r3).alias("fail_digits"),
        F.count_if(r1 & r2 & r3).alias("pass_all"),
    )


@register(
    "q181_mixture_weights",
    oracle="""
    WITH src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_chars,
             POWER(CAST(n_chars AS DOUBLE), 0.7) AS raw_w
      FROM src
    )
    SELECT source, n_docs, n_chars,
           (FLOOR(CAST(raw_w / SUM(raw_w) OVER () AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mix_weight
    FROM w
    """,
)
def q181_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture weights: the data-mixing step
    of a training pipeline — sample sources proportional to
    size^alpha (alpha=0.7 flattens the natural distribution so small
    sources aren't drowned).

    Per-source sizes are one aggregate; the normalization is a window
    over the |sources|-row result (bounded — a global window here is
    fine because it runs on the aggregate, never on raw rows, the
    same rule as q131). Weight rounded to 6dp on both engines to
    absorb pow()'s last-ULP platform variance.
    """
    d = t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    raw_w = F.pow(F.col("n_chars").cast("double"), 0.7)
    w = src.select("source", "n_docs", "n_chars", raw_w.alias("raw_w"))
    return w.select(
        "source",
        "n_docs",
        "n_chars",
        dround(
            F.col("raw_w") / F.sum("raw_w").over(W.partitionBy()), 6
        ).alias("mix_weight"),
    )


@register(
    "q182_length_bucket_padding",
    oracle="""
    WITH b AS (
      SELECT CAST(POWER(2, CEIL(LOG2(n_chars))) AS BIGINT) AS bucket,
             n_chars
      FROM documents
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(bucket - n_chars) AS BIGINT) AS padding_chars,
           CAST(SUM(bucket - n_chars) AS DOUBLE)
             / CAST(SUM(bucket) AS BIGINT) AS waste_frac
    FROM b GROUP BY bucket
    """,
)
def q182_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: assign each document to its
    power-of-two length bucket and measure the padding a fixed-shape
    batcher would waste per bucket — the sizing input for sequence
    bucketing in a training data loader.

    Bucket assignment is per-row arithmetic (log2/ceil/pow of
    integers < 2^53 — exact in IEEE double on both engines); the
    aggregate is integer-exact. One scan, |buckets| groups.
    """
    d = t(spark, sf_dir, "documents")
    bucket = F.pow(F.lit(2), F.ceil(F.log2("n_chars"))).cast("bigint")
    b = d.select(bucket.alias("bucket"), "n_chars")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("bucket") - F.col("n_chars")).cast("bigint").alias(
            "padding_chars"
        ),
        (
            F.sum(F.col("bucket") - F.col("n_chars")).cast("double")
            / F.sum("bucket").cast("bigint")
        ).alias("waste_frac"),
    )


@register(
    "q183_vocabulary_stats",
    oracle="""
    WITH words AS (
      SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT w) AS vocab_size,
           CAST(COUNT(DISTINCT w) AS DOUBLE) / COUNT(*) AS type_token_ratio
    FROM words GROUP BY source
    """,
)
def q183_vocabulary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics: token count, vocabulary size,
    and type/token ratio — the lexical-diversity probe that flags
    TEMPLATE-generated or degenerate sources before training.

    Tokenization is a JVM-side split+explode; COUNT DISTINCT goes
    through Spark's two-phase distinct expansion on (source, word) —
    fixed-width-ish keys, partial aggregation collapses repeats
    map-side, so the shuffle carries at most |sources|×|vocab| rows
    regardless of corpus size.
    """
    d = t(spark, sf_dir, "documents")
    words = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    return words.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("vocab_size"),
        (F.countDistinct("w").cast("double") / F.count(F.lit(1))).alias(
            "type_token_ratio"
        ),
    )


@register(
    "q184_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT STRING_SPLIT(text, ' ') AS ws FROM documents
    ),
    bigrams AS (
      SELECT UNNEST(LIST_ZIP(ws[:LEN(ws)-1], ws[2:])) AS p FROM toks
    ),
    counted AS (
      SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS n
      FROM bigrams GROUP BY 1, 2
    )
    SELECT w1, w2, n FROM counted
    ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 20
    """,
)
def q184_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams with a total-order tie-break — the
    n-gram frequency table behind collocation mining and degenerate-
    phrase detection.

    Bigrams come from zipping the token array with its tail
    (arrays_zip + slice — one explode of n-1 pairs per doc, all
    JVM-side, no self-join). Counts are exact integers; the global
    top-20 goes through orderBy+limit → TakeOrderedAndProject
    (per-partition top-k, driver merges k·p rows, never a full sort
    to one task).
    """
    d = t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))).alias("w1"),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))).alias("w2"),
    )
    bigrams = d.select(F.explode(pairs).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    return (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


@register(
    "q188_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             -LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
                       AS BIGINT) + 1) / 268435456.0)
               / n_chars AS es_key
      FROM documents
    )
    SELECT doc_id, source, n_chars, (FLOOR(CAST(es_key AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS es_key
    FROM keyed
    ORDER BY es_key ASC, doc_id ASC
    LIMIT 20
    """,
)
def q188_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): key = -ln(u)/w with u a pure hash of the
    stable doc key and w = n_chars; the k smallest keys ARE a
    length-weighted sample. Reproducible across engines, runs, and
    partitionings — same reason q88 hashes instead of RNG — and
    top-k-able, which real weighted reservoir sampling needs.

    u = (hash7hex + 1)/2^28 ∈ (0, 1], so ln is finite; selection by
    continuous keys cannot tie (distinct hashes), and the emitted
    key is rounded for cross-engine display. The top-k runs as
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    d = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(268435456.0)
    es_key = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .orderBy(F.col("es_key").asc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id", "source", "n_chars", dround("es_key", 9).alias("es_key")
        )
    )


@register(
    "q191_langid_confusion",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang, substr(text, i + 1, 3) AS tri
      FROM documents, UNNEST(range(length(text) - 2)) AS u(i)
    ),
    profile_counts AS (
      SELECT lang, tri, COUNT(*) AS cnt
      FROM grams GROUP BY lang, tri
    ),
    profile AS (
      SELECT lang, tri, cnt FROM (
        SELECT lang, tri, cnt,
               ROW_NUMBER() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, tri ASC
               ) AS rk
        FROM profile_counts
      ) WHERE rk <= {PROFILE_K}
    ),
    doc_tris AS (
      SELECT DISTINCT doc_id, lang AS true_lang, tri FROM grams
    ),
    scores AS (
      SELECT d.doc_id, d.true_lang, p.lang AS cand_lang, SUM(p.cnt) AS score
      FROM doc_tris d JOIN profile p ON p.tri = d.tri
      GROUP BY d.doc_id, d.true_lang, p.lang
    ),
    best AS (
      SELECT doc_id, true_lang, cand_lang AS predicted_lang,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC
             ) AS rk
      FROM scores
    )
    SELECT true_lang, predicted_lang, COUNT(*) AS n_docs
    FROM best WHERE rk = 1
    GROUP BY true_lang, predicted_lang
    """,
)
def q191_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix for the in-engine
    language identifier (q82): true lang × predicted lang counts —
    the in-pipeline model-quality readout (precision/recall fall out
    of the row/column sums).

    Reuses the q82 plan wholesale (same profile broadcast, same
    argmax) and adds one bounded |langs|² aggregate on top —
    evaluation as a query, no exported predictions, no second
    system.
    """
    preds = q82_lang_id_ngram(spark, sf_dir)
    return preds.groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ------------------------------------------------ tokenizer building

VOCAB_INDEX_SIZE = 50  # dense-id vocabulary size
ENCODE_DOC_LIMIT = 50  # docs whose encoding prefix is emitted
ENCODE_PREFIX = 8  # first N token ids shown per doc


@register(
    "q225_vocab_indexing",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, i, string_split(text, ' ')[CAST(i + 1 AS INTEGER)] AS word
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    vocab AS (
      SELECT word,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC) - 1 AS tok
      FROM words GROUP BY word
      QUALIFY tok < {VOCAB_INDEX_SIZE}
    ),
    encoded AS (
      SELECT w.doc_id, w.i,
             CAST(COALESCE(v.tok, {VOCAB_INDEX_SIZE}) AS VARCHAR) AS tid
      FROM words w LEFT JOIN vocab v ON w.word = v.word
      WHERE w.doc_id < {ENCODE_DOC_LIMIT}
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN tid = '{VOCAB_INDEX_SIZE}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unk,
           string_agg(tid, '-' ORDER BY i) FILTER (i < {ENCODE_PREFIX})
             AS encoded_prefix
    FROM encoded GROUP BY doc_id
    """,
)
def q225_vocab_indexing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary indexing — the corpus→token-ids step of a
    pretraining pipeline, entirely in-engine: dense token ids are
    assigned by global frequency rank (ties on the word — a total
    order), documents re-encode as id sequences via a broadcast
    vocab join, and out-of-vocab words map to the UNK id (= vocab
    size). Output per document (first 50): token count, UNK count,
    and the first-8-id encoding as a '-'-joined string (scalar —
    array outputs crash the driver's canonicalizer by contract).

    Scale shape: the vocab is a top-K over the word aggregate;
    encoding is a broadcast-hash left join against the token stream
    (zero corpus shuffle); the per-doc re-assembly groups on doc_id
    with an ORDER-pinned string_agg (position-explicit on both
    engines, so the sequence is partition-order-free).
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "word")
    )
    wv = W.orderBy(F.col("c").desc(), F.col("word").asc())
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("word", (F.row_number().over(wv) - 1).alias("tok"))
        .filter(F.col("tok") < VOCAB_INDEX_SIZE)
    )
    encoded = (
        words.filter(F.col("doc_id") < ENCODE_DOC_LIMIT)
        .join(F.broadcast(vocab), "word", "left")
        .select(
            "doc_id",
            "i",
            F.coalesce(F.col("tok"), F.lit(VOCAB_INDEX_SIZE))
            .cast("string")
            .alias("tid"),
        )
    )
    prefix = F.concat_ws(
        "-",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("i") < ENCODE_PREFIX, F.struct("i", "tid"))
                )
            ),
            lambda s: s["tid"],
        ),
    )
    return encoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == str(VOCAB_INDEX_SIZE), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unk"),
        prefix.alias("encoded_prefix"),
    )


@register(
    "q226_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT string_split(text, ' ')[CAST(i + 1 AS INTEGER)] AS word
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    wc AS (
      SELECT word, COUNT(*) AS n FROM words
      WHERE len(word) >= 2 GROUP BY word
    ),
    pairs AS (
      SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, n
      FROM wc, UNNEST(range(1, len(word))) AS r(i)
    ),
    agg AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
      FROM pairs GROUP BY pair
    )
    SELECT pair, pair_count FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair ASC) AS rn
      FROM agg
    ) WHERE rn <= 20
    """,
)
def q226_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration — the adjacent-symbol-pair count
    that decides the next merge: every adjacent character pair inside
    every word, weighted by the word's corpus frequency; top-20 by
    count (ties on the pair string).

    The BPE-at-scale trick is in the shape: pairs are counted over
    the DISTINCT-WORD aggregate (vocabulary-sized) weighted by word
    counts — never by re-scanning the corpus per iteration. A full
    BPE trainer loops this plan, applying the winning merge to the
    vocab between rounds (the iterative-loop pattern of q64/q201).
    """
    words = fan_out(t(spark, sf_dir, "documents")).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    # length >= 2 guard: Spark's sequence(1, 0) DESCENDS (it does not
    # return empty like DuckDB's range), so 1-char words must not
    # reach the transform
    wc = (
        words.filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = wc.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    agg = pairs.groupBy("pair").agg(F.sum("n").cast("bigint").alias("pair_count"))
    w = W.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        agg.select("pair", "pair_count", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


# ------------------------------------------ bigram LM perplexity gate

LM_TRAIN_MOD = 10  # md5(doc_id) % 10 < 8 -> train, else score
LM_TRAIN_LT = 8


@register(
    "q236_bigram_lm_score",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                  AS BIGINT) % {LM_TRAIN_MOD} AS bucket
      FROM documents
    ),
    train_words AS (
      SELECT doc_id, i,
             string_split(text, ' ')[CAST(i + 1 AS INTEGER)] AS w
      FROM split, UNNEST(range(len(string_split(text, ' ')))) AS r(i)
      WHERE bucket < {LM_TRAIN_LT}
    ),
    train_bigrams AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
      FROM train_words a
      JOIN train_words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      GROUP BY a.w, b.w
    ),
    train_unigrams AS (
      SELECT w AS w1, COUNT(*) AS c1 FROM train_words GROUP BY w
    ),
    vocab AS (SELECT COUNT(*) AS v FROM train_unigrams),
    score_words AS (
      SELECT doc_id, i,
             string_split(text, ' ')[CAST(i + 1 AS INTEGER)] AS w
      FROM split, UNNEST(range(len(string_split(text, ' ')))) AS r(i)
      WHERE bucket >= {LM_TRAIN_LT}
    ),
    score_bigrams AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM score_words a
      JOIN score_words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    ),
    scored AS (
      -- NULLIF: an (adversarially) empty train split has v = 0, and
      -- ln(x/0) must be NULL on both engines, not inf/ANSI-error
      SELECT s.doc_id,
             ln((COALESCE(tb.c12, 0) + 1.0)
                / NULLIF(COALESCE(tu.c1, 0) + (SELECT v FROM vocab), 0))
               AS lp
      FROM score_bigrams s
      LEFT JOIN train_bigrams tb ON tb.w1 = s.w1 AND tb.w2 = s.w2
      LEFT JOIN train_unigrams tu ON tu.w1 = s.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           (FLOOR(CAST(-SUM(lp) / COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q236_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine bigram language-model quality scoring — the
    perplexity-style filter gate (CCNet scores documents with a
    reference LM and drops the worst): an add-one-smoothed bigram LM
    is trained on the hash-split 80% of the corpus and every held-out
    document is scored by its average negative log-probability
    (monotone in perplexity; high = unusual/degenerate text).

    Shape: the "model" IS two aggregates — bigram and unigram count
    tables (vocabulary²-bounded, not corpus-bounded) — joined onto
    the held-out bigram stream; smoothing makes unseen bigrams
    finite. ln() rounds at 1e-4 (q87's precedent). The train/score
    membership is the q88 hash rule, so the split reproduces
    everywhere. A production variant swaps the count tables for a
    KenLM scorer inside mapInPandas with the identical plan shape.
    """
    docs = fan_out(t(spark, sf_dir, "documents"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long")
        % LM_TRAIN_MOD
    )
    words = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.posexplode(F.split("text", " ")).alias("i", "w"),
    )
    bigrams = (
        words.alias("a")
        .join(
            words.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
        )
    )
    train_bi = (
        bigrams.filter(F.col("bucket") < LM_TRAIN_LT)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    train_uni = (
        words.filter(F.col("bucket") < LM_TRAIN_LT)
        .groupBy(F.col("w").alias("w1"))
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = train_uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        bigrams.filter(F.col("bucket") >= LM_TRAIN_LT)
        # train_bi / train_uni are vocabulary-grain (unbounded under
        # Heaps' law) — no broadcast hint; AQE decides. The 1-row
        # `vocab` aggregate stays hinted (always broadcastable).
        .join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            # empty-train guard: denominator 0 -> NULL lp (ANSI-safe)
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1.0)
                / F.when(
                    (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")) != 0,
                    F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"),
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        dround(-F.sum("lp") / F.count(F.lit(1)), 4).alias("avg_neg_logprob"),
    )


# ------------------------------------------- q345 text health audit

# Planted artifact strings (by doc_id % 5) — the corpus fixture is
# clean ASCII, so the audit is exercised against KNOWN dirt planted
# identically on both engines; class 4 stays clean.
_REPL = "\ufffd"
_NBSP = "\u00a0"
_ZWSP = "\u200b"
_MOJI = "\u00c3\u00a9"  # 'A-tilde + copyright-e' pair: UTF-8 e-acute read as latin-1
_CTRL = "\x07"

_HEALTH_PLANT = {
    0: _REPL * 2,        # replacement chars (decode loss)
    1: _NBSP + _ZWSP,    # invisible characters
    2: _MOJI,            # mojibake signature
    3: _CTRL,            # stray C0 control char
}


def _sql_chr(s: str) -> str:
    """DuckDB expression producing the exact marker string."""
    return " || ".join(f"chr({ord(c)})" for c in s)


def _health_plant_sql() -> str:
    cases = " ".join(
        f"WHEN doc_id % 5 = {k} THEN text || {_sql_chr(v)}"
        for k, v in _HEALTH_PLANT.items()
    )
    return f"CASE {cases} ELSE text END"


def _sql_has(col: str, marker: str) -> str:
    return (
        f"CASE WHEN contains({col}, {_sql_chr(marker)}) THEN 1 ELSE 0 END"
    )


@register(
    "q345_text_health_audit",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, source, {_health_plant_sql()} AS t
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_sql_has('t', _REPL)}) AS BIGINT) AS n_replacement,
           CAST(SUM({_sql_has('t', _NBSP)}) AS BIGINT) AS n_nbsp,
           CAST(SUM({_sql_has('t', _ZWSP)}) AS BIGINT) AS n_zero_width,
           CAST(SUM({_sql_has('t', _MOJI)}) AS BIGINT) AS n_mojibake,
           CAST(SUM({_sql_has('t', _CTRL)}) AS BIGINT) AS n_control,
           (FLOOR(CAST(CAST(SUM(CASE WHEN {_sql_has('t', _REPL)} = 0
                            AND {_sql_has('t', _NBSP)} = 0
                            AND {_sql_has('t', _ZWSP)} = 0
                            AND {_sql_has('t', _MOJI)} = 0
                            AND {_sql_has('t', _CTRL)} = 0
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS clean_rate
    FROM planted GROUP BY source
    """,
)
def q345_text_health_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health audit — the byte-level text QA gate a crawl
    pipeline runs before tokenization: per source, how many documents
    carry decode-loss replacement chars (U+FFFD), invisible
    characters (NBSP, zero-width space), mojibake signatures (UTF-8
    e-acute re-decoded as latin-1), or stray C0 control characters —
    and the clean rate.

    The fixture corpus is clean ASCII, so stage 1 PLANTS each
    artifact class deterministically by doc_id % 5 with the identical
    expression on both engines; the audit stage — the operator under
    test — must then recover exactly the planted per-source counts.
    Detection is plain substring containment, which whole-stage-
    codegens; no regex needed for fixed markers.

    Scale: one pass over the corpus, |sources|-group aggregate;
    marker checks are per-row codegen string ops — no shuffle beyond
    the final tiny groupBy.
    """
    plant = F.col("text")
    for k, v in _HEALTH_PLANT.items():
        plant = F.when(
            F.col("doc_id") % 5 == k, F.concat(F.col("text"), F.lit(v))
        ).otherwise(plant)
    docs = t(spark, sf_dir, "documents").select("source", plant.alias("t"))

    def has(marker: str):
        return F.when(F.contains("t", F.lit(marker)), 1).otherwise(0)

    dirty = (
        has(_REPL) + has(_NBSP) + has(_ZWSP) + has(_MOJI) + has(_CTRL)
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(has(_REPL)).cast("bigint").alias("n_replacement"),
        F.sum(has(_NBSP)).cast("bigint").alias("n_nbsp"),
        F.sum(has(_ZWSP)).cast("bigint").alias("n_zero_width"),
        F.sum(has(_MOJI)).cast("bigint").alias("n_mojibake"),
        F.sum(has(_CTRL)).cast("bigint").alias("n_control"),
        dround(
            F.sum(F.when(dirty == 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("clean_rate"),
    )


# -------------------------------------- q346 padding-waste advisor

PAD_BUCKETS = 4


@register(
    "q346_padding_waste_advisor",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    g AS (SELECT MAX(n_tok) AS gmax FROM lens),
    bucketed AS (
      SELECT l.doc_id, l.n_tok,
             LEAST({PAD_BUCKETS} - 1,
                   CAST(FLOOR((l.n_tok - 1) /
                        CEIL(CAST(g.gmax AS DOUBLE) / {PAD_BUCKETS}))
                        AS BIGINT)) AS bucket
      FROM lens l CROSS JOIN g
    ),
    per_bucket AS (
      SELECT 'bucketed' AS strategy, bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MAX(n_tok) AS BIGINT) AS pad_to,
             CAST(SUM(n_tok) AS BIGINT) AS useful_tokens,
             CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
               AS padded_tokens
      FROM bucketed GROUP BY bucket
    ),
    global_strat AS (
      SELECT 'global' AS strategy, CAST(-1 AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MAX(n_tok) AS BIGINT) AS pad_to,
             CAST(SUM(n_tok) AS BIGINT) AS useful_tokens,
             CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
               AS padded_tokens
      FROM lens
    ),
    both_s AS (
      SELECT * FROM per_bucket UNION ALL SELECT * FROM global_strat
    )
    SELECT strategy, bucket, n_docs, pad_to, useful_tokens, padded_tokens,
           (FLOOR(CAST(CAST(padded_tokens AS DOUBLE)
                 / (useful_tokens + padded_tokens) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS waste_rate
    FROM both_s
    """,
)
def q346_padding_waste_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching advisor: how much compute fixed-length
    padding burns, and what {PAD_BUCKETS}-way length bucketing
    recovers — the measurement behind bucketed batching / packed
    sequences in every training dataloader. Strategy 'global' pads
    every document to the corpus max length; 'bucketed' pads only to
    the max within each equal-width length bucket. Output: per-bucket
    doc counts, pad targets, useful vs padded tokens, waste rate.

    Plan: one token-length pass; the global max is a 1-row broadcast
    (no window); bucket assignment is map-side arithmetic; both
    strategies aggregate from the same tiny reduced frame. At 100 TB
    the length histogram is corpus-sized but the aggregate state is
    {PAD_BUCKETS}+1 rows.
    """
    lens = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    g = lens.agg(F.max("n_tok").alias("gmax"))
    bucketed = lens.crossJoin(F.broadcast(g)).select(
        "n_tok",
        F.least(
            F.lit(PAD_BUCKETS - 1),
            F.floor(
                (F.col("n_tok") - 1)
                / F.ceil(F.col("gmax").cast("double") / PAD_BUCKETS)
            ),
        )
        .cast("bigint")
        .alias("bucket"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("n_tok").cast("bigint").alias("pad_to"),
        F.sum("n_tok").cast("bigint").alias("useful_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint")
        .alias("padded_tokens"),
    ).select(F.lit("bucketed").alias("strategy"), "*")
    global_strat = lens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("n_tok").cast("bigint").alias("pad_to"),
        F.sum("n_tok").cast("bigint").alias("useful_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint")
        .alias("padded_tokens"),
    ).select(
        F.lit("global").alias("strategy"),
        F.lit(-1).cast("bigint").alias("bucket"),
        "n_docs", "pad_to", "useful_tokens", "padded_tokens",
    )
    both_s = per_bucket.unionByName(global_strat)
    return both_s.select(
        "strategy", "bucket", "n_docs", "pad_to", "useful_tokens",
        "padded_tokens",
        dround(
            F.col("padded_tokens").cast("double")
            / (F.col("useful_tokens") + F.col("padded_tokens")),
            6,
        ).alias("waste_rate"),
    )


# ----------------------------------------- q360 RAKE keyword extraction

RAKE_STOP = ("a", "the", "data", "value", "key", "row")
RAKE_MAX_LEN = 3
RAKE_TOPK = 15


def _dsum9(col):
    """Order-independent sum of grid-rounded doubles (q357 idiom)."""
    return F.sum(dround(col, 9).cast("decimal(38,9)")).cast("double")


@register(
    "q360_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS idx,
             string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    ns AS (
      SELECT doc_id, idx, w,
             idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY idx) AS grp
      FROM toks WHERE w NOT IN {RAKE_STOP!r}
    ),
    runs AS (
      SELECT doc_id, grp, COUNT(*) AS plen,
             string_agg(w, ' ' ORDER BY idx) AS phrase
      FROM ns GROUP BY doc_id, grp
    ),
    kept AS (SELECT * FROM runs WHERE plen <= {RAKE_MAX_LEN}),
    members AS (
      SELECT ns.w, kept.plen
      FROM ns JOIN kept ON ns.doc_id = kept.doc_id AND ns.grp = kept.grp
    ),
    wstats AS (
      SELECT w, COUNT(*) AS freq, SUM(plen) AS deg FROM members GROUP BY w
    ),
    distinct_phrases AS (
      SELECT phrase, COUNT(*) AS n_occurrences FROM kept GROUP BY phrase
    ),
    pscore AS (
      SELECT dp.phrase, dp.n_occurrences,
             (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(CAST(ws.deg AS DOUBLE) / ws.freq AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                                 AS DECIMAL(38,9))) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS score
      FROM distinct_phrases dp,
           UNNEST(string_split(dp.phrase, ' ')) AS u(pw)
      JOIN wstats ws ON ws.w = u.pw
      GROUP BY dp.phrase, dp.n_occurrences
    )
    SELECT phrase, CAST(n_occurrences AS BIGINT) AS n_occurrences, score,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, phrase) AS rk
      FROM pscore
    ) WHERE rk <= {RAKE_TOPK}
    """,
)
def q360_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — the unsupervised
    keyphrase miner: candidate phrases are maximal stopword-delimited
    token runs (gaps-and-islands on the token index; runs longer than
    {RAKE_MAX_LEN} dropped on both engines), each word is scored
    degree/frequency over the candidate set (degree = summed lengths
    of the phrases containing it — co-occurrence-weighted), and a
    phrase scores the sum of its word scores. Complements q184's raw
    frequency (which surfaces common pairs) and q355's PMI (pair
    association): RAKE surfaces multi-word CONTENT phrases.

    Shape: token stream -> per-doc island windows (partitioned by
    doc_id, no global sort) -> phrase-instance aggregate -> DISTINCT-
    phrase grain (phrase-vocabulary-sized, not corpus-sized) whose
    member explode re-joins the broadcastable word-score table;
    per-phrase word-score sums use the decimal roundtrip, and the
    global top-{RAKE_TOPK} goes orderBy+limit -> TakeOrderedAndProject
    before the {RAKE_TOPK}-row rank window.
    """
    toks = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("ip", "w")
    ).select("doc_id", F.col("ip").cast("bigint").alias("idx"), "w")
    wn = W.partitionBy("doc_id").orderBy("idx")
    ns = (
        toks.filter(~F.col("w").isin(*RAKE_STOP))
        .withColumn("grp", F.col("idx") - F.row_number().over(wn))
    )
    runs = ns.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx").alias("i"),
                                            F.col("w").alias("w")))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
    )
    kept = runs.filter(F.col("plen") <= RAKE_MAX_LEN)
    members = ns.join(
        kept.select("doc_id", "grp", "plen"), ["doc_id", "grp"]
    ).select("w", "plen")
    wstats = members.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    distinct_phrases = kept.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    pscore = (
        distinct_phrases.select(
            "phrase",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("pw"),
        )
        # wstats is word-grain (unbounded under Heaps' law) — no
        # broadcast hint; AQE decides.
        .join(
            wstats.select(F.col("w").alias("pw"), "freq", "deg"),
            "pw",
        )
        .groupBy("phrase", "n_occurrences")
        .agg(
            dround(
                _dsum9(F.col("deg").cast("double") / F.col("freq")), 6
            ).alias("score")
        )
    )
    topk = pscore.orderBy(F.col("score").desc(), F.col("phrase").asc()).limit(
        RAKE_TOPK
    )
    wr = W.orderBy(F.col("score").desc(), "phrase")
    return topk.withColumn(
        "rk", F.row_number().over(wr).cast("bigint")
    ).select(
        "phrase",
        F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        "score",
        "rk",
    )


# --------------------------- q361 Kneser-Ney interpolated bigram LM scoring

KN_D = 0.75  # absolute discount (exact in binary)


@register(
    "q361_kneser_ney_lm_score",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                  AS BIGINT) % {LM_TRAIN_MOD} AS bucket
      FROM documents
    ),
    words AS (
      SELECT doc_id, bucket, CAST(r.i AS BIGINT) AS i,
             string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w
      FROM split, UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    train_bi AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
      FROM words a
      JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.bucket < {LM_TRAIN_LT}
      GROUP BY a.w, b.w
    ),
    ctx AS (
      SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p_fwd
      FROM train_bi GROUP BY w1
    ),
    cont AS (SELECT w2, COUNT(*) AS n1p_rev FROM train_bi GROUP BY w2),
    tt AS (SELECT COUNT(*) AS t FROM train_bi),
    vv AS (SELECT COUNT(DISTINCT w) AS v FROM words
           WHERE bucket < {LM_TRAIN_LT}),
    test_bi AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM words a
      JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.bucket >= {LM_TRAIN_LT}
    ),
    probs AS (
      SELECT s.doc_id,
             CASE WHEN tb.c12 IS NULL THEN 1 ELSE 0 END AS oov,
             CASE
               WHEN ctx.c1 IS NOT NULL THEN
                 GREATEST(COALESCE(tb.c12, 0) - {KN_D!r}, 0.0) / ctx.c1
                 + ({KN_D!r} * ctx.n1p_fwd / ctx.c1)
                   * (COALESCE(cont.n1p_rev, 0)
                      / NULLIF(CAST((SELECT t FROM tt) AS DOUBLE), 0.0))
               ELSE COALESCE(cont.n1p_rev, 0)
                    / NULLIF(CAST((SELECT t FROM tt) AS DOUBLE), 0.0)
             END AS p
      FROM test_bi s
      LEFT JOIN train_bi tb ON tb.w1 = s.w1 AND tb.w2 = s.w2
      LEFT JOIN ctx ON ctx.w1 = s.w1
      LEFT JOIN cont ON cont.w2 = s.w2
    ),
    lps AS (
      SELECT doc_id, oov,
             (FLOOR(CAST(ln(CASE WHEN p > 0 THEN p
                           ELSE 1.0 / ((SELECT t FROM tt)
                                       + (SELECT v FROM vv) + 1) END) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS lp
      FROM probs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (FLOOR(CAST(-CAST(SUM(CAST(lp AS DECIMAL(38,9))) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_neg_logprob,
           (FLOOR(CAST(CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS oov_share
    FROM lps GROUP BY doc_id
    """,
)
def q361_kneser_ney_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scoring — the D={KN_D}
    absolute-discount upgrade of q236's add-one model (the smoothing
    every production n-gram LM actually uses): discounted bigram mass
    is redistributed via the CONTINUATION probability N1+(.w2)/T
    (how many contexts a word follows — "Francisco" is frequent but
    follows only "San", so its continuation weight is tiny), with the
    context's escape weight D*N1+(w1.)/c(w1). Unseen contexts back
    off to pure continuation; a zero-probability floor 1/(T+V+1)
    keeps ln() finite identically on both engines. Held-out docs
    (q88 hash split) get avg negative log-prob + OOV-bigram share.

    Shape: the model is three vocabulary-bounded aggregates (bigram
    counts, per-context totals+fan-outs, per-word continuation
    counts), all broadcast onto the held-out bigram stream — no
    corpus-sized shuffle after the count phase; per-doc sums use the
    decimal roundtrip so engine summation order never moves the
    1e-4-rounded score.
    """
    docs = fan_out(t(spark, sf_dir, "documents"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7
            ),
            16,
            10,
        ).cast("long")
        % LM_TRAIN_MOD
    )
    words = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.posexplode(F.split("text", " ")).alias("i", "w"),
    )
    bigrams = (
        words.alias("a")
        .join(
            words.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
        )
    )
    train_bi = (
        bigrams.filter(F.col("bucket") < LM_TRAIN_LT)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    ctx = train_bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = train_bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_rev"))
    tt = train_bi.agg(F.count(F.lit(1)).alias("t"))
    vv = (
        words.filter(F.col("bucket") < LM_TRAIN_LT)
        .agg(F.countDistinct("w").alias("v"))
    )
    pcont = F.coalesce(F.col("n1p_rev"), F.lit(0)) / F.nullif(
        F.col("t").cast("double"), F.lit(0.0)
    )
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)) - F.lit(KN_D), F.lit(0.0)
        )
        / F.col("c1")
        + (F.lit(KN_D) * F.col("n1p_fwd") / F.col("c1")) * pcont,
    ).otherwise(pcont)
    lp = dround(
        F.log(
            F.when(p > 0, p).otherwise(
                F.lit(1.0) / (F.col("t") + F.col("v") + 1)
            )
        ),
        9,
    )
    scored = (
        bigrams.filter(F.col("bucket") >= LM_TRAIN_LT)
        # train_bi/ctx/cont are bigram/unigram-type-grain (unbounded
        # under Heaps' law) — no broadcast hint; AQE decides. The
        # 1-row tt/vv aggregates stay hinted.
        .join(train_bi, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("oov"),
            lp.alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        dround(
            -F.sum(F.col("lp").cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_neg_logprob"),
        dround(
            F.sum("oov").cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_share"),
    )


# ------------------------------- q363 Gopher repetition-filter suite

GOPHER_TOP2_MAX = 0.20  # Rae et al. 2021 thresholds (2-gram variant)
GOPHER_DUP3_MAX = 0.15


@register(
    "q363_gopher_repetition",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS i,
             string_split(text, ' ')[CAST(r.i + 1 AS INTEGER)] AS w
      FROM documents,
           UNNEST(range(len(string_split(text, ' ')))) AS r(i)
    ),
    base AS (
      SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_char,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    uni AS (
      SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT w) AS n_distinct
      FROM toks GROUP BY doc_id
    ),
    bi AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS g, COUNT(*) AS c
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      GROUP BY a.doc_id, a.w || ' ' || b.w
    ),
    top2 AS (
      SELECT doc_id, c * CAST(LENGTH(g) AS BIGINT) AS top2_chars
      FROM (
        SELECT doc_id, g, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM bi
      ) WHERE rn = 1
    ),
    tri AS (
      SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c3.w AS g, COUNT(*) AS c
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN toks c3 ON c3.doc_id = a.doc_id AND c3.i = a.i + 2
      GROUP BY a.doc_id, a.w || ' ' || b.w || ' ' || c3.w
    ),
    dup3 AS (
      SELECT doc_id,
             SUM(CASE WHEN c >= 2
                      THEN c * CAST(LENGTH(g) AS BIGINT) ELSE 0 END)
               AS dup3_chars
      FROM tri GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tok AS n_tokens,
           (FLOOR(CAST(1.0 - CAST(u.n_distinct AS DOUBLE) / u.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS dup_word_frac,
           (FLOOR(CAST(COALESCE(t2.top2_chars, 0) / CAST(b.n_char AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS top2gram_char_frac,
           (FLOOR(CAST(COALESCE(d3.dup3_chars, 0) / CAST(b.n_char AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS dup3gram_char_frac,
           CAST(CASE WHEN COALESCE(t2.top2_chars, 0)
                          / CAST(b.n_char AS DOUBLE) > {GOPHER_TOP2_MAX!r}
                       OR COALESCE(d3.dup3_chars, 0)
                          / CAST(b.n_char AS DOUBLE) > {GOPHER_DUP3_MAX!r}
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM base b
    JOIN uni u ON u.doc_id = b.doc_id
    LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id
    LEFT JOIN dup3 d3 ON d3.doc_id = b.doc_id
    """,
)
def q363_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al.
    2021, Table A1): duplicate-word fraction (1 - type/token), the
    character fraction covered by the single most frequent 2-gram,
    and the character fraction covered by duplicated 3-grams —
    the degenerate-text gates (loops, boilerplate stutter, keyword
    stuffing) that length/stopword quality scores (q81) miss, and
    the per-doc WITHIN-document complement of q228's cross-document
    boilerplate detection and q96's repeat score.

    Top-2-gram selection carries a (count DESC, gram ASC) total
    order; all fractions are ratios of exact integers (counts x
    char lengths over the document's char count), so no float-sum
    divergence exists anywhere. Docs flagged by the {GOPHER_TOP2_MAX}
    / {GOPHER_DUP3_MAX} thresholds get flagged=1.

    Shape: token stream self-joins on (doc_id, i+1)/(doc_id, i+2)
    are co-partitioned narrow joins on the doc key (one exchange
    each, reused); every aggregate is per-doc (natural key, no
    skew beyond document length itself); the n-gram tables reduce
    before the per-doc argmax window. At 100 TB every stage keys on
    doc_id — embarrassingly parallel by document.
    """
    toks = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("ip", "w")
    ).select("doc_id", F.col("ip").cast("bigint").alias("i"), "w")
    base = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_char"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    uni = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("w").alias("n_distinct")
    )
    bi = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.w"), F.col("b.w")).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w2 = W.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("g").asc())
    top2 = (
        bi.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("c") * F.length("g").cast("bigint")).alias("top2_chars"),
        )
    )
    tri = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .join(
            toks.alias("c3"),
            (F.col("c3.doc_id") == F.col("a.doc_id"))
            & (F.col("c3.i") == F.col("a.i") + 2),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(
                " ", F.col("a.w"), F.col("b.w"), F.col("c3.w")
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup3 = tri.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("c") >= 2, F.col("c") * F.length("g").cast("bigint")
            ).otherwise(F.lit(0))
        ).alias("dup3_chars")
    )
    t2c = F.coalesce(F.col("top2_chars"), F.lit(0))
    d3c = F.coalesce(F.col("dup3_chars"), F.lit(0))
    return (
        base.join(uni, "doc_id")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").alias("n_tokens"),
            dround(
                1.0 - F.col("n_distinct").cast("double") / F.col("n"), 6
            ).alias("dup_word_frac"),
            dround(t2c / F.col("n_char").cast("double"), 6).alias(
                "top2gram_char_frac"
            ),
            dround(d3c / F.col("n_char").cast("double"), 6).alias(
                "dup3gram_char_frac"
            ),
            F.when(
                (t2c / F.col("n_char").cast("double") > GOPHER_TOP2_MAX)
                | (d3c / F.col("n_char").cast("double") > GOPHER_DUP3_MAX),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("flagged"),
        )
    )


# ------- q377 multinomial Naive Bayes language classifier

NB_TEST_MOD = 5  # doc_id % 5 == 0 -> held-out test set
NB_TOPV = 1000  # per-lang vocabulary cap (broadcastable model)
NB_LOG_SCALE = 1_000_000  # log-prob integer grid (FLOOR(ln*1e6))


@register(
    "q377_naive_bayes_langid",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id % {NB_TEST_MOD} <> 0
    ),
    test AS (
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id % {NB_TEST_MOD} = 0
    ),
    tr_tok AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM train
    ),
    counts AS (
      SELECT lang, w, COUNT(*) AS c FROM tr_tok GROUP BY 1, 2
    ),
    model AS (
      SELECT lang, w, c FROM (
        SELECT lang, w, c,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, w) AS rk
        FROM counts
      ) WHERE rk <= {NB_TOPV}
    ),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM model),
    lang_tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM model GROUP BY 1
    ),
    priors AS (
      SELECT lang, COUNT(*) AS nd,
             (SELECT COUNT(*) FROM train) AS ntr
      FROM train GROUP BY 1
    ),
    te_tok AS (
      SELECT doc_id, w, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM test)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT tk.doc_id, lt.lang,
             CAST(SUM(tk.cnt * CAST(FLOOR(ln(
               CAST(COALESCE(m.c, 0) + 1 AS DOUBLE)
               / CAST(lt.tot + v.v AS DOUBLE)) * {NB_LOG_SCALE})
               AS BIGINT)) AS BIGINT) AS tok_score
      FROM te_tok tk
      CROSS JOIN lang_tot lt
      CROSS JOIN vocab v
      LEFT JOIN model m ON m.lang = lt.lang AND m.w = tk.w
      GROUP BY 1, 2
    ),
    total AS (
      SELECT s.doc_id, s.lang,
             s.tok_score + CAST(FLOOR(ln(
               CAST(p.nd AS DOUBLE) / CAST(p.ntr AS DOUBLE))
               * {NB_LOG_SCALE}) AS BIGINT) AS score
      FROM scored s JOIN priors p ON p.lang = s.lang
    ),
    pred AS (
      SELECT doc_id, lang AS lang_pred FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang) AS rk
        FROM total
      ) WHERE rk = 1
    )
    SELECT te.lang AS lang_true, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM test te JOIN pred p ON p.doc_id = te.doc_id
    GROUP BY 1, 2
    """,
)
def q377_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier — train on a
    hash-held-out split, score the test split, emit the confusion
    matrix. The WORD-grain generative twin of q82's character-trigram
    profile scorer, and the classic first-baseline text classifier a
    corpus pipeline runs before anything neural.

    Laplace-smoothed log-probs ln((c+1)/(tot_l+V)) and priors
    ln(n_l/n_train) are snapped to an integer grid
    (FLOOR(ln(rational)*1e6)) so per-doc scores are BIGINT sums —
    order-independent across partitions and bit-identical cross-
    engine (the float-to-grid rule; ln of identical rationals is
    same-op-order IEEE). Argmax ties break on lang ascending.

    Scale: the model is a (lang x top-{NB_TOPV}) aggregate — the
    per-lang row_number cap bounds it regardless of corpus vocab, so
    it BROADCASTS; scoring is explode -> broadcast-join -> integer
    sum, no shuffle wider than the test corpus' token stream. Langs
    is a bounded dimension (x|langs| fan-out documented).
    """
    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    test = docs.filter(F.col("doc_id") % NB_TEST_MOD == 0)
    tr_tok = fan_out(train).select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    counts = tr_tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("c").desc(), "w")
    )
    model = counts.withColumn("rk", rk).filter(F.col("rk") <= NB_TOPV).drop("rk")
    vocab = model.agg(F.count_distinct("w").alias("v"))
    lang_tot = model.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tot"))
    ntr = train.agg(F.count(F.lit(1)).alias("ntr"))
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(ntr))
    )
    te_tok = (
        fan_out(test)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ilog = lambda col: F.floor(F.log(col) * NB_LOG_SCALE).cast("bigint")
    scored = (
        te_tok.crossJoin(F.broadcast(lang_tot))
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(model.withColumnRenamed("lang", "m_lang")),
            (F.col("m_lang") == F.col("lang")) & (model.w == te_tok.w),
            "left",
        )
        .select(
            "doc_id",
            "lang",
            (
                F.col("cnt")
                * ilog(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("term").cast("bigint").alias("tok_score"))
    )
    total = scored.join(F.broadcast(priors), "lang").select(
        "doc_id",
        "lang",
        (
            F.col("tok_score")
            + ilog(F.col("nd").cast("double") / F.col("ntr").cast("double"))
        ).alias("score"),
    )
    prk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score").desc(), "lang")
    )
    pred = (
        total.withColumn("rk", prk)
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"))
    )
    return (
        test.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ------- q388 unigram-LM (SentencePiece-style) Viterbi tokenizer scoring

VIT_MAXW = 12   # word-length cap for the DP (chars)
VIT_MAXP = 4    # max piece length (chars)
VIT_TOPW = 50   # words reported (by corpus frequency)
VIT_MIN_PIECE_N = 3  # substring frequency floor for multi-char pieces
VIT_SCALE = 1_000_000  # integer log-prob grid
VIT_NEG = -(1 << 40)   # "-inf" for unreachable DP states (BIGINT-safe)


def _vit_best_cells(n: int) -> str:
    """Unrolled Viterbi DP: best{i} = max over piece lengths l=1..4
    of best{i-l} + g(piece ending at i); missing pieces contribute
    VIT_NEG. All-BIGINT GREATEST chains — no struct compare, no
    float."""
    stages = []
    for i in range(1, n + 1):
        cands = []
        for ln in range(1, min(VIT_MAXP, i) + 1):
            prev = f"best{i - ln}" if i - ln > 0 else "0"
            cands.append(
                f"CASE WHEN wl >= {i} THEN COALESCE(g_{i - ln}_{ln},"
                f" {VIT_NEG}) + {prev} ELSE {VIT_NEG} END"
            )
        expr = cands[0] if len(cands) == 1 else f"GREATEST({', '.join(cands)})"
        stages.append(f"d{i} AS (SELECT *, {expr} AS best{i} FROM d{i - 1})")
    return ",\n    ".join(stages)


def _vit_sql() -> str:
    piece_cols = ",\n             ".join(
        f"MAX(CASE WHEN po = {po} AND pl = {pl} THEN g END) AS g_{po}_{pl}"
        for po in range(VIT_MAXW)
        for pl in range(1, VIT_MAXP + 1)
        if po + pl <= VIT_MAXW
    )
    final_best = " ".join(
        f"WHEN wl = {i} THEN best{i}" for i in range(1, VIT_MAXW + 1)
    )
    return f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) BETWEEN 1 AND {VIT_MAXW}
      GROUP BY w
    ),
    spans AS (
      SELECT substr(w, po + 1, pl) AS piece, n, po, pl, w
      FROM words,
           UNNEST(range({VIT_MAXW})) AS a(po),
           UNNEST(range(1, {VIT_MAXP + 1})) AS b(pl)
      WHERE po + pl <= len(w)
    ),
    piece_counts AS (
      -- frequency-weighted substring counts over the word table
      SELECT piece, CAST(SUM(n) AS BIGINT) AS c
      FROM spans GROUP BY piece
    ),
    vocab AS (
      SELECT piece, c FROM piece_counts
      WHERE len(piece) = 1 OR c >= {VIT_MIN_PIECE_N}
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS z FROM vocab),
    model AS (
      SELECT piece,
             CAST(FLOOR(ln(CAST(c AS DOUBLE)
               / CAST((SELECT z FROM tot) AS DOUBLE)) * {VIT_SCALE})
               AS BIGINT) AS g
      FROM vocab
    ),
    top_words AS (
      SELECT w, n, len(w) AS wl FROM (
        SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rk
        FROM words
      ) WHERE rk <= {VIT_TOPW}
    ),
    looked AS (
      SELECT tw.w, tw.n, tw.wl, sp.po, sp.pl, m.g
      FROM top_words tw
      JOIN spans sp ON sp.w = tw.w
      LEFT JOIN model m ON m.piece = substr(tw.w, sp.po + 1, sp.pl)
    ),
    d0 AS (
      SELECT w, n, wl,
             {piece_cols}
      FROM looked GROUP BY w, n, wl
    ),
    {_vit_best_cells(VIT_MAXW)}
    SELECT w AS word, n AS freq,
           CAST(wl AS BIGINT) AS n_chars,
           CAST(-(CASE {final_best} END) AS BIGINT) AS viterbi_nll_grid
    FROM d{VIT_MAXW}
    """


@register("q388_unigram_viterbi_tokenizer", oracle=_vit_sql())
def q388_unigram_viterbi_tokenizer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM tokenizer scoring (the SentencePiece/Kudo 2018
    model family): build a substring piece vocabulary (all 1-chars +
    frequency-floored pieces up to {VIT_MAXP} chars, probabilities
    from frequency-weighted span counts), then Viterbi-score the
    top-{VIT_TOPW} corpus words — the max-probability segmentation's
    negative log-likelihood, i.e. the quantity the unigram trainer's
    E-step maximizes per word. Complements the BPE shelf (q226 pair
    counts, q268 merge training): BPE is bottom-up greedy, unigram is
    top-down probabilistic, and this op is its inner loop.

    Determinism: piece log-probs snap to the 1e-6 integer grid, so
    the DP is pure BIGINT max-plus algebra — the Spark side runs the
    recurrence as a per-row loop over in-row piece-score maps, the
    ORACLE unrolls the identical {VIT_MAXW}-stage GREATEST chain
    (missing pieces = a -2^40 floor that cannot win), and max of
    identical integers cannot diverge cross-engine.

    Scale: span generation is bounded fan-out (<= {VIT_MAXW}x
    {VIT_MAXP} per DISTINCT word, after the word-grain reduce); the
    model is a piece-grain aggregate; the DP itself touches only
    {VIT_TOPW} rows.
    """
    words = (
        fan_out(
            t(spark, sf_dir, "documents").select(
                F.explode(F.split("text", " ")).alias("w")
            )
        )
        .filter(F.length("w").between(1, VIT_MAXW))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spans = words.select(
        "w",
        "n",
        F.explode(F.sequence(F.lit(0), F.length("w") - 1)).alias("po"),
    ).select(
        "w",
        "n",
        "po",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(VIT_MAXP), F.length("w") - F.col("po")),
            )
        ).alias("pl"),
    ).select(
        "w",
        "n",
        "po",
        "pl",
        F.substring(F.col("w"), F.col("po") + 1, F.col("pl")).alias(
            "piece"
        ),
    )
    piece_counts = spans.groupBy("piece").agg(
        F.sum("n").cast("bigint").alias("c")
    )
    vocab = piece_counts.filter(
        (F.length("piece") == 1) | (F.col("c") >= VIT_MIN_PIECE_N)
    )
    tot = vocab.agg(F.sum("c").cast("bigint").alias("z"))
    model = vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("z").cast("double"))
            * VIT_SCALE
        )
        .cast("bigint")
        .alias("g"),
    )
    top_words = (
        words.select(
            "w",
            "n",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), F.col("w")))
            .alias("rk"),
        )
        .filter(F.col("rk") <= VIT_TOPW)
        .select("w", "n", F.length("w").alias("wl"))
    )
    looked = (
        top_words.join(spans.select("w", "po", "pl", "piece"), "w")
        .join(F.broadcast(model), "piece", "left")
        .groupBy("w", "n", "wl")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("po") * 10 + F.col("pl")).alias("k"),
                        F.coalesce(F.col("g"), F.lit(VIT_NEG)).alias("v"),
                    )
                )
            ).alias("gm")
        )
    )
    # in-row Viterbi over the piece-score map as ONE array fold
    # (ArrayAggregate): acc = [best0..best_{i-1}]; step i appends
    # max over piece lengths of acc[i-ln] + g. A runtime loop keeps
    # janino's generated method tiny — the previous unrolled
    # GREATEST chain inlined best{i-1..i-4} recursively (expression
    # TREES, not DAGs), blew the 64KB method limit, and silently
    # fell back to interpreted eval (r5 verdict task 3). Same
    # max-plus BIGINT algebra as the oracle's unrolled CTEs; the
    # fold only runs to wl, which the oracle's "wl >= i" CASE guards
    # reduce to as well.
    def _step(acc: Column, i: Column) -> Column:
        cands = [
            F.when(
                i >= ln,
                F.coalesce(
                    F.element_at("gm", (i - ln) * 10 + ln),
                    F.lit(VIT_NEG),
                )
                + F.element_at(acc, i - ln + 1),
            ).otherwise(F.lit(VIT_NEG))
            for ln in range(1, VIT_MAXP + 1)
        ]
        return F.concat(acc, F.array(F.greatest(*cands)))

    best_arr = F.aggregate(
        F.sequence(F.lit(1), F.col("wl")),
        F.array(F.lit(0).cast("bigint")),
        _step,
    )
    final = F.element_at(best_arr, F.col("wl") + 1)
    return looked.select(
        F.col("w").alias("word"),
        F.col("n").alias("freq"),
        F.col("wl").cast("bigint").alias("n_chars"),
        (-final).cast("bigint").alias("viterbi_nll_grid"),
    )
