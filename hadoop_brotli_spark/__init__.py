"""hadoop_brotli_spark — a PySpark-native analytics engine.

A from-scratch engine with the capabilities of the reference repo
``tesseract2048/hadoop-brotli`` (a Hadoop Brotli compression codec —
see SURVEY.md): a Spark-integrated streaming block-codec file layer
(`sources/`), plus the relational query surface the host framework
provides in the reference's deployment, re-expressed as first-class
DataFrame operators (`queries/`), plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Design: DataFrame/Catalyst-first. No RDDs outside the codec path; no
row-at-a-time Python UDFs in any hot path; every operator declared
declaratively so Catalyst does pushdown / pruning / join planning.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
