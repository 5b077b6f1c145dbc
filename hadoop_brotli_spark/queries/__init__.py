"""Query modules. Each module registers its queries into
``hadoop_brotli_spark.registry.REGISTRY`` at import time via the
``@register`` decorator; ``registry.load_all_queries()`` imports them
all.
"""
