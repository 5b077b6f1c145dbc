"""Reusable column-level functions (JVM-side expressions) and
Arrow-batched pandas helpers.

``columns`` is the public expression library (dot products, LSH
buckets, Z-order keys, CMS buckets, shingles, Hamming distance);
``media`` holds the binary-column decoders (real PNG/GIF/WAV header
parsing, PIL-gated pixel decode); ``text_udfs`` the Arrow-vectorized
text scorers.
"""

from .columns import (  # noqa: F401
    cms_bucket,
    cosine_similarity,
    dot_product,
    hamming_distance,
    l2_norm,
    sign_bucket,
    word_shingles,
    zorder_key,
)

__all__ = [
    "cms_bucket",
    "cosine_similarity",
    "dot_product",
    "hamming_distance",
    "l2_norm",
    "sign_bucket",
    "word_shingles",
    "zorder_key",
]
