import sys, time
sys.path.insert(0, "/root/repo")
from hadoop_brotli_spark.registry import load_all_queries
from hadoop_brotli_spark.session import get_spark
spark = get_spark("baseline-timing")
specs = load_all_queries()
sf = "/root/testdata/sf0.1"
NAMES = ["q01_pricing_summary","q03_shipping_priority","q05_local_supplier_volume","q06_revenue_forecast",
"q20_agg_distinct","q40_window_topk_per_group","q56_sessionization","q60_dedup_exact","q62_dedup_minhash_lsh",
"q70_knn_bruteforce","q80_token_stats","q107_pipeline_funnel","q124_source_vocab_overlap","q137_basket_lift",
"q141_distribution_drift","q82_lang_id_ngram","q253_exact_substring_dup","q260_cdc_chunk_dedup",
"q422_jpeg_progressive_decode","q406_label_propagation","q444_distributed_median",
"q459_facility_location_greedy","q480_textrank_keywords","q232_label_noise_audit"]
# one throwaway warm-up of the scan+join machinery
from pyspark.sql import functions as F
from hadoop_brotli_spark.catalog import load_table
li = load_table(spark, sf, "lineitem"); o = load_table(spark, sf, "orders")
li.join(o, F.col("l_orderkey")==F.col("o_orderkey")).groupBy("l_returnflag").agg(F.sum("l_quantity")).count()
for name in NAMES:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = specs[name].fn(spark, sf).count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: min {min(runs):.3f}  runs {runs}", flush=True)
spark.stop()
