"""Large-scale data-pipeline operators (beyond the reference surface).

Dedup, similarity search, text analysis, and multimodal-column plumbing —
the operations an LLM training-data pipeline runs at 100 TB. All operators
are DataFrame-in → DataFrame-out, shuffle-conscious, and deterministic
(integer/decimal arithmetic where results feed differential checks).
"""

from verax_spark.operators import (
    dedup,
    embeddings,
    multimodal,
    packing,
    similarity,
    temporal,
    text,
    windows,
)

__all__ = [
    "dedup",
    "embeddings",
    "multimodal",
    "packing",
    "similarity",
    "temporal",
    "text",
    "windows",
]
