"""Column-expression function library (JVM-side, codegen-friendly).

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen — no Python UDFs in the hot path.
"""

from esco_neo4j_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from esco_neo4j_spark.functions.text import (  # noqa: F401
    ascii_clean,
    embedding_text,
    jaccard,
    ngram_shingles,
    word_shingles,
    normalize_ws,
    quality_features,
    token_count,
    truncate_ellipsis,
    word_tokens,
)
