"""Unpartitioned-window audit (round-6 verdict task 2 — the durable
form of the r5/r6 "single-partition global windows over unbounded
grains" fixes, mirroring tests/test_broadcast_audit.py).

A window spec rooted directly on the ``Window`` class with no
partition columns — ``Window.orderBy(...)``, ``Window.rowsBetween``/
``rangeBetween``, or an argument-less ``Window.partitionBy()`` —
plans a WindowExec with an EMPTY partition spec (Spark's own
``WindowExec: No Partition Defined`` warning). Such a node funnels
its ENTIRE input through one task: correct at any sf, a
straggler/OOM at 100x unless the input is provably small.

Every site below was audited in r6 by MEASURING the rows flowing
into each empty-partition-spec physical window at sf0.01 vs sf0.1
(shuffle records written into the node's single-partition exchange).
Remaining sites fall into three safe classes:

  BOUNDED GRAIN — the window input is design-sized, not corpus-
      sized: histogram bins / sketch buckets / <=64-256-row
      bucket-offset tables (the q242/q444/q483 reconstruction
      patterns), day spines, threshold grids, k-row model tables,
      score-grain aggregates.
  RANK-FILTERED — a row_number/rank <= K filter downstream lets
      Spark plan WindowGroupLimit(Partial): every input partition
      pre-limits to K rows before the single-partition exchange, so
      the node sees <= K x tasks rows.
  POST-LIMIT — the input chain contains TakeOrdered / limit.

The six corpus-grain offenders the r6 measurement found (q158 2x20k
part rows, q223 2x1.5k user rows, q235 4x~500k co-supply edges —
100x over sf0.01 — q375 150k raw values, q376 60k value rows, q381
75k calibration rows) were RESTRUCTURED (grain_rank / q444 bucket
selection / TakeOrdered), not allowlisted; r5's seven (q438 q445
q475 q480 q483 q484 q485) likewise.

The census is AST-level — (module, enclosing function, root method)
with a site count — because it must be DETERMINISTIC: physical plans
reuse exchanges data-dependently and several queries embed
driver-computed literals, so runtime node counts drift across scale
factors and runs. Adding a new ``Window.orderBy`` (or stripping the
columns from a ``partitionBy``) changes this census and fails the
suite until the site is consciously audited: measure its input at
two SFs (``hadoop_brotli_spark.plans.unpartitioned_windows`` walks
the plan; the r6 measurement script pairs it with the node's
exchange metrics) and restructure corpus-grain inputs instead of
allowlisting them.
"""

from __future__ import annotations

import ast
import collections
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "hadoop_brotli_spark"

# window-spec root methods that leave the partition spec empty;
# partitionBy only counts when called with ZERO arguments
ROOT_METHODS = {"orderBy", "rowsBetween", "rangeBetween", "partitionBy"}

AUDITED_WINDOW_SITES = {
    # shared rank-reconstruction helper: offset cumsum over the
    # SCORE-GRAIN aggregate (bounded by distinct integer scores)
    ("queries/_util.py", "grain_rank", "orderBy"): 1,
    ("queries/advanced.py", "q347_quantile_sketch_merge", "orderBy"): 1,
    ("queries/analytics.py", "q131_histogram_cdf", "orderBy"): 1,
    ("queries/analytics.py", "q131_histogram_cdf", "partitionBy"): 1,
    ("queries/analytics.py", "q147_timeseries_anomaly", "orderBy"): 1,
    ("queries/analytics.py", "q152_adoption_curve", "orderBy"): 1,
    ("queries/analytics.py", "q156_period_over_period", "orderBy"): 1,
    # r6 restructure: cumsum over <=64 bit-length revenue buckets
    ("queries/analytics.py", "q158_abc_classification", "orderBy"): 1,
    ("queries/analytics.py", "q352_ks_two_sample", "orderBy"): 1,
    ("queries/analytics.py", "q353_bh_fdr_control", "orderBy"): 1,
    ("queries/analytics.py", "q353_bh_fdr_control", "partitionBy"): 1,
    # r6 restructure: offsets over <=64 bit-length price buckets
    ("queries/analytics.py", "q376_mann_whitney_u", "orderBy"): 1,
    ("queries/analytics.py", "q380_isotonic_calibration", "orderBy"): 1,
    ("queries/analytics.py", "q390_shapley_attribution", "orderBy"): 1,
    ("queries/closing_ops.py", "q258_revenue_autocorrelation", "orderBy"): 1,
    ("queries/closing_ops.py", "q261_kaplan_meier", "orderBy"): 2,
    ("queries/closing_ops.py", "q265_theil_sen_trend", "orderBy"): 1,
    ("queries/closing_ops.py", "q268_bpe_merge_iterations", "orderBy"): 1,
    ("queries/closing_ops.py", "q270_interval_concurrency", "orderBy"): 1,
    ("queries/closing_ops.py", "q275_auc_rank", "orderBy"): 1,
    ("queries/closing_ops.py", "q276_ewma_smoothing", "orderBy"): 1,
    ("queries/closing_ops.py", "q288_littles_law", "orderBy"): 1,
    ("queries/closing_ops.py", "q298_sprt_daily", "orderBy"): 1,
    ("queries/closing_ops.py", "q303_seasonal_residual_outliers", "orderBy"): 1,
    ("queries/closing_ops.py", "q310_good_turing", "orderBy"): 1,
    ("queries/closing_ops.py", "q311_hill_tail_index", "orderBy"): 1,
    ("queries/closing_ops.py", "q319_hits_scores", "orderBy"): 1,
    ("queries/closing_ops.py", "q322_decision_stump", "orderBy"): 1,
    ("queries/closing_ops.py", "q323_rank_correlation", "orderBy"): 2,
    ("queries/closing_ops.py", "q333_tfidf_cosine_pairs", "orderBy"): 1,
    ("queries/closing_ops.py", "q334_bm25_ranking", "orderBy"): 1,
    ("queries/closing_ops.py", "q338_ljung_box", "orderBy"): 1,
    ("queries/corpus_ops.py", "epoch_pos", "orderBy"): 1,
    # r6 restructure (q235): bounded count-grain strata cumulative +
    # <=256 sa-range bucket offsets inside the boundary stratum
    ("queries/corpus_ops.py", "period_edges", "orderBy"): 2,
    ("queries/corpus_ops.py", "q218_vocab_oov_rate", "orderBy"): 1,
    ("queries/corpus_ops.py", "q251_source_quality_league", "orderBy"): 2,
    ("queries/corpus_ops.py", "q355_pmi_collocations", "orderBy"): 1,
    ("queries/corpus_ops.py", "q372_ppmi_word_similarity", "orderBy"): 1,
    ("queries/expansion.py", "q398_link_prediction_ra", "orderBy"): 1,
    ("queries/expansion.py", "q401_nelson_aalen", "orderBy"): 2,
    ("queries/expansion.py", "q402_pinball_loss", "orderBy"): 1,
    ("queries/expansion.py", "q404_mmr_diverse_topk", "orderBy"): 3,
    ("queries/expansion.py", "q407_personalized_pagerank", "orderBy"): 1,
    ("queries/expansion.py", "q408_wordpiece_tokenize", "orderBy"): 1,
    ("queries/expansion.py", "q410_quantile_normalization", "orderBy"): 1,
    ("queries/expansion.py", "q412_ransac_line_fit", "orderBy"): 2,
    ("queries/expansion.py", "q413_pr_threshold_sweep", "orderBy"): 1,
    ("queries/expansion.py", "q414_twohop_reach_sketch", "orderBy"): 1,
    ("queries/expansion.py", "q415_segmented_regression", "orderBy"): 3,
    # r10: only the day-grain prefix windows remain (row_number +
    # cumulative sums over the calendar-day spine — bounded grain);
    # the candidate-triple argmin window folded into the 1-row
    # array DP
    ("queries/expansion.py", "q416_voptimal_histogram", "orderBy"): 2,
    ("queries/expansion.py", "q418_decayed_heavy_hitters", "orderBy"): 2,
    ("queries/expansion.py", "q419_logrank_test", "orderBy"): 1,
    ("queries/expansion.py", "q420_bandit_replay", "orderBy"): 1,
    ("queries/extras.py", "q198_rolling_median", "orderBy"): 1,
    # r7: cumulative Lorenz share over the 10-row decile grain
    ("queries/round7.py", "q503_vocab_gini_lorenz", "orderBy"): 1,
    # r8: TakeOrdered-then-rank tail — the rank window sees exactly
    # the SUF_TOPK=20 post-limit rows
    ("queries/round8.py", "q504_suffix_lcp_repeats", "orderBy"): 1,
    # r8: cumulative growth over the HEAPS_CKPTS=10-row checkpoint
    # grid (bounded by construction)
    ("queries/round8.py", "q511_heaps_law_fit", "orderBy"): 1,
    # r9: final rank over the merged summary — at most
    # SS_SHARDS x SS_K = 48 candidate rows (bounded by construction)
    ("queries/round9.py", "q518_topk_summary_merge", "orderBy"): 1,
    ("queries/extras.py", "q202_approx_top_k", "orderBy"): 1,
    ("queries/extras.py", "q219_count_min_sketch", "orderBy"): 1,
    ("queries/extras.py", "q220_interval_bin_join", "orderBy"): 1,
    ("queries/extras.py", "q220_interval_bin_join", "partitionBy"): 1,
    ("queries/extras.py", "q231_cusum_changepoint", "orderBy"): 2,
    ("queries/extras.py", "q374_skyline_frontier", "orderBy"): 1,
    # r6 restructure: exact selection reuses the sketch's own
    # log-bucket histogram (bounded by the value RANGE, not rows)
    ("queries/extras.py", "q375_ddsketch_quantiles", "orderBy"): 2,
    # r6 restructure: q444-style 256-bucket selection of the
    # conformal order statistic
    ("queries/mleval.py", "q381_split_conformal", "orderBy"): 1,
    ("queries/mleval.py", "q383_dsir_importance_selection", "orderBy"): 1,
    ("queries/mleval.py", "q393_bradley_terry", "orderBy"): 1,
    ("queries/multimodal.py", "q425_image_dhash_dedup", "orderBy"): 1,
    ("queries/multimodal.py", "q426_audio_fingerprint_dedup", "orderBy"): 1,
    ("queries/round5.py", "q427_weighted_reservoir_sample", "orderBy"): 1,
    ("queries/round5.py", "q435_gap_fill_interpolate", "orderBy"): 2,
    ("queries/round5.py", "q438_decile_gains", "orderBy"): 1,
    ("queries/round5.py", "q440_skew_join_advisor", "orderBy"): 1,
    ("queries/round5.py", "q444_distributed_median", "orderBy"): 1,
    ("queries/round5.py", "q445_woe_iv_binning", "partitionBy"): 1,
    ("queries/round5.py", "q448_unimax_allocation", "orderBy"): 2,
    ("queries/round5.py", "q448_unimax_allocation", "partitionBy"): 1,
    ("queries/round5b.py", "bucketed_rank", "orderBy"): 1,
    ("queries/round5b.py", "q454_ar1_yule_walker", "orderBy"): 1,
    ("queries/round5b.py", "q455_page_hinkley", "orderBy"): 1,
    ("queries/round5b.py", "q456_silhouette_elbow", "orderBy"): 1,
    ("queries/round5b.py", "q464_granger_causality", "orderBy"): 1,
    ("queries/round5b.py", "q466_ewma_control_chart", "orderBy"): 1,
    ("queries/round5b.py", "q469_hurst_exponent", "orderBy"): 1,
    ("queries/round5b.py", "q471_regression_influence", "orderBy"): 1,
    ("queries/round5b.py", "q472_map_at_k", "rowsBetween"): 1,
    ("queries/round5b.py", "q475_ks_exponential_arrivals", "orderBy"): 2,
    ("queries/round5b.py", "q476_lsh_parameter_planner", "orderBy"): 1,
    ("queries/round5b.py", "q480_textrank_keywords", "orderBy"): 1,
    ("queries/round5b.py", "q483_abc_xyz_classification", "orderBy"): 1,
    ("queries/round5b.py", "q485_dunning_collocations", "orderBy"): 1,
    # r6 new operators: q489's residual lag runs over the bounded
    # calendar day spine; q495's offset cumsum over the 256-row
    # bucket histogram
    ("queries/round6.py", "q489_durbin_watson", "orderBy"): 1,
    ("queries/round6.py", "q495_trimmed_winsorized_mean", "orderBy"): 1,
    # q500's offset cumsum over the 256-row bucket histogram
    ("queries/round6.py", "q500_histogram_bin_advisor", "orderBy"): 1,
    ("queries/textstats.py", "q181_mixture_weights", "partitionBy"): 1,
    ("queries/textstats.py", "q225_vocab_indexing", "orderBy"): 1,
    ("queries/textstats.py", "q226_bpe_pair_counts", "orderBy"): 1,
    ("queries/textstats.py", "q360_rake_keywords", "orderBy"): 1,
    ("queries/textstats.py", "q388_unigram_viterbi_tokenizer", "orderBy"): 1,
    ("queries/tpch_more.py", "q222_returned_item_ranking", "orderBy"): 1,
}


def _window_aliases(tree: ast.Module) -> set[str]:
    aliases: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module in (
            "pyspark.sql",
            "pyspark.sql.window",
        ):
            for a in node.names:
                if a.name == "Window":
                    aliases.add(a.asname or a.name)
    return aliases


def scan_sites() -> collections.Counter:
    found: collections.Counter = collections.Counter()
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        aliases = _window_aliases(tree)
        if not aliases:
            continue
        func_of: dict[ast.AST, str] = {}

        def assign(node: ast.AST, fn: str) -> None:
            for child in ast.iter_child_nodes(node):
                nf = fn
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    nf = child.name
                func_of[child] = nf
                assign(child, nf)

        assign(tree, "<module>")
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            f = node.func
            if not (
                isinstance(f, ast.Attribute)
                and isinstance(f.value, ast.Name)
                and f.value.id in aliases
                and f.attr in ROOT_METHODS
            ):
                continue
            if f.attr == "partitionBy" and (node.args or node.keywords):
                continue  # partitioned — the safe, default case
            rel = str(path.relative_to(PKG))
            found[(rel, func_of.get(node, "<module>"), f.attr)] += 1
    return found


def test_every_unpartitioned_window_site_is_audited():
    found = scan_sites()
    new = {k: v for k, v in found.items() if v > AUDITED_WINDOW_SITES.get(k, 0)}
    assert not new, (
        f"NEW unpartitioned window-spec sites (site: count): {new} — a "
        f"Window.orderBy/rowsBetween/rangeBetween without partitionBy "
        f"(or an argument-less partitionBy) was added. Measure the "
        f"node's input at two SFs first: bounded grain / rank-filtered "
        f"/ post-limit sites may be added to AUDITED_WINDOW_SITES with "
        f"a comment; corpus-grain inputs must be restructured "
        f"(grain_rank, the q444 bucket selection, or TakeOrdered)"
    )


def test_audit_list_has_no_stale_entries():
    found = scan_sites()
    stale = {
        k: v
        for k, v in AUDITED_WINDOW_SITES.items()
        if found.get(k, 0) < v
    }
    assert not stale, (
        f"AUDITED_WINDOW_SITES entries no longer in the source (ratchet "
        f"them down/out): {stale}"
    )


def test_scanner_sees_the_package():
    # the scanner silently matching nothing would green-light anything
    found = scan_sites()
    assert sum(found.values()) >= 50, found
