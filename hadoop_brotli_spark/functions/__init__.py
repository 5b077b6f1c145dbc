"""Reusable column-level functions (JVM-side expressions) and
Arrow-batched pandas helpers."""
