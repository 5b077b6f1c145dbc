"""Property-based oracle parity: Spark and DuckDB must agree on
RANDOMLY GENERATED inputs, not just the driver's fixtures.

Hypothesis generates small events/documents tables (adversarial
shapes: duplicate timestamps, single-user bursts, empty-ish tables,
repeated texts), writes them as parquet into a scratch sf_dir, and
runs a slice of the registry through the same compare() used
everywhere else. This catches determinism bugs that fixture data
can't — tie-breaking, empty-group edges, all-duplicate corpora.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_brotli_spark import TABLES
from hadoop_brotli_spark.registry import load_all_queries

from .conftest import SF_DIR
from .oracle_harness import compare

SPECS = load_all_queries()

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
WORDS = ["scan", "join", "sort", "hash", "merge", "table", "key", "batch"]

# Queries whose semantics are events/documents-driven and cheap enough
# to run per-example.
EVENT_QUERIES = [
    "q116_activity_streaks",
    "q121_event_transitions",
    "q143_bounce_rate",
    # tie-break-sensitive windows: duplicate timestamps are the attack
    "q171_last_touch_attribution",
    "q178_out_of_order_audit",
    "q172_event_cooccurrence",
    # degenerate-denominator guard (ADVICE r1): single-distinct-day
    # event types must yield NULL slope in BOTH engines
    "q189_trend_slope",
    # sketch state must be byte-identical cross-engine on any input
    "q219_count_min_sketch",
    # sparse/absent error hours -> empty incident set on both sides
    "q220_interval_bin_join",
    # k=1 users / single-event corpora stress the Gini denominators
    "q223_join_key_skew",
    # exact percentile over tiny type groups; zero-late streams
    "q244_watermark_recommendation",
    # batch-boundary merge must equal whole-stream sessionization on
    # ANY event layout (single-sided users, boundary-straddling gaps)
    "q248_incremental_session_merge",
    # censoring edges: no signups, purchase-before-signup, same-day
    # conversion — risk set and ln-product must agree on all of them
    "q261_kaplan_meier",
    # duplicate timestamps attack the open/close tie-breakers
    "q263_ohlc_bars",
    # single-variant splits and p∈{0,1} corners of the interval
    "q266_wilson_interval",
    # tiny groups exercise the n<k exact-fallback branch of KMV
    "q271_bottomk_distinct",
    # zero-positive / zero-negative corpora must NULL the WOE, not
    # diverge (ANSI error vs inf)
    "q272_woe_iv_binning",
    # empty treatment/control arms within a stratum NULL both ATEs
    "q326_propensity_ate",
    # hot-key-free / single-user corpora: salt histogram still exact
    "q281_salted_join_balance",
    # duplicate timestamps (zero-length holds) and single-event days
    # (carry to midnight) attack the TWAP interval arithmetic
    "q283_time_weighted_average",
    # partial funnels everywhere; duplicate-ts step resolution
    "q289_funnel_motif",
    # single-op keys and first=last ties stress the net-op classes
    "q294_cdc_compaction",
    # short series (< lag days) empty the scored set; zero-value
    # days exercise every NULLIF denominator
    "q302_forecast_backtest",
    # duplicate timestamps and back-to-back events attack the
    # island-boundary running-MAX tie-breaks
    "q306_interval_union_coverage",
    # quartile-cut ties and 1-day series stress the SAX words
    "q317_sax_similarity",
    # single-type corpora -> zero pairs; 1-2 day series -> tiny DPs
    # on both the numpy and the unrolled-SQL side
    "q318_dtw_alignment",
]
DOC_QUERIES = [
    "q60_dedup_exact",
    "q126_sequence_packing",
    # repeated texts / tiny vocab stress distinct + top-k tie-breaks
    "q179_incremental_corpus_gate",
    "q183_vocabulary_stats",
    "q184_top_bigrams",
    # repeated texts collapse LSH buckets/signatures — sketch-space
    # estimates must still match exactly
    "q199_minhash_jaccard_estimate",
    # identical fingerprints / sub-cap buckets: every pair at
    # hamming 0 must emerge identically on both sides
    "q212_simhash_band_pairs",
    # tiny vocab: sources with one distinct rank must NULL the slope
    "q215_zipf_slope",
    # vocab size exceeds the corpus vocabulary -> zero OOV everywhere
    "q218_vocab_oov_rate",
    # dense-id assignment under heavy count ties; 1-word docs
    "q225_vocab_indexing",
    # pair-count ties; 1-char-word-free corpus by construction
    "q226_bpe_pair_counts",
    # block DF thresholds under mass-duplicated tiny corpora
    "q228_boilerplate_blocks",
    # adversarial hash splits can empty the LM train side -> NULL
    # scores on BOTH engines (guard added for exactly this)
    "q236_bigram_lm_score",
    # mask-rate determinism on 1-word docs / heavy duplication
    "q241_span_corruption_plan",
    # sub-k cells everywhere when every doc is its own cell
    "q247_k_anonymity_audit",
    # regex counts/redaction checksum under tiny repeated texts
    "q252_pii_pattern_scrub",
    # docs below the 8-token window + mass-duplicated corpora
    "q253_exact_substring_dup",
    # 1-word docs: zero-division guards on token/word ratios
    "q255_tokenizer_fertility",
    # docs shorter than the CDC context window -> single forced chunk
    "q260_cdc_chunk_dedup",
    # heavy pair-count ties + repeated single-word corpora attack the
    # argmax tie-break and the two-pass merge rewrite
    "q268_bpe_merge_iterations",
    # hash-dim collisions under tiny vocabularies
    "q274_feature_hashing",
    # gappy frequency-of-frequencies tables (missing r+1) must fall
    # back to raw r identically on both engines
    "q310_good_turing",
    # single-source corpora: the LOO denominator (gn - n) hits 0 ->
    # the replicate mean must NULL identically
    "q325_jackknife_se",
    # single-class corpora must NULL the AUC on both engines
    "q275_auc_rank",
    # all-one-class corpora must NULL kappa (pe = 1) on both engines
    "q304_cohens_kappa",
    # MIXED safe/failed classes within one lang are the trap: the
    # level-1 recount must cover failed rows only (local recoding)
    "q280_k_anon_generalization",
    # all-src0 corpora empty the target split; TPR=FPR classifiers
    # must NULL the estimate on both engines
    "q293_label_shift_bbse",
    # every stage can go empty (all-dup corpora, sub-8-token docs);
    # stage counts must collapse identically on both engines
    "q300_pipeline_funnel_v2",
]


@pytest.fixture(scope="module")
def scratch_sf(tmp_path_factory) -> Path:
    """A writable sf_dir seeded with the static small tables; the
    generated tables are overwritten per example."""
    base = tmp_path_factory.mktemp("prop_sf")
    for name in TABLES:
        shutil.copy(Path(SF_DIR) / f"{name}.parquet", base / f"{name}.parquet")
    return base


events_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id
        st.integers(0, 86_400),  # seconds offset within a few days
        st.sampled_from(EVENT_TYPES),
        st.integers(0, 99_999),  # cents -> 2-decimal value
    ),
    min_size=1,
    max_size=40,
)

docs_rows = st.lists(
    st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),  # text
        st.sampled_from(["src0", "src1", "src2"]),
        st.sampled_from(["en", "de"]),
    ),
    min_size=1,
    max_size=25,
)


def _write_events(base: Path, rows) -> None:
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s * 37)
                for _, s, _, _ in rows
            ],
            "user_id": [u for u, _, _, _ in rows],
            "event_type": [e for _, _, e, _ in rows],
            "value": [c / 100.0 for _, _, _, c in rows],
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    df.to_parquet(base / "events.parquet", index=False)


def _write_docs(base: Path, rows) -> None:
    texts = [" ".join(w) for w, _, _ in rows]
    df = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": texts,
            "lang": [lang for _, _, lang in rows],
            "source": [src for _, src, _ in rows],
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(base / "documents.parquet", index=False)


@settings(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_rows)
def test_event_queries_match_oracle_on_generated_data(spark, scratch_sf, rows):
    _write_events(scratch_sf, rows)
    for name in EVENT_QUERIES:
        compare(SPECS[name], spark, str(scratch_sf))


@settings(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=docs_rows)
def test_doc_queries_match_oracle_on_generated_data(spark, scratch_sf, rows):
    _write_docs(scratch_sf, rows)
    for name in DOC_QUERIES:
        compare(SPECS[name], spark, str(scratch_sf))
