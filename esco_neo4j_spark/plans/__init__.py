"""Named-query registry: the analysis_queries.md corpus mapped onto the
driver's synthetic star schema (FIXTURES.md §C shape mapping), plus the
north-star extension operators. Importing this package populates REGISTRY."""

from esco_neo4j_spark.plans.registry import REGISTRY, Query  # noqa: F401
from esco_neo4j_spark.plans import relational_queries  # noqa: F401
from esco_neo4j_spark.plans import vector_queries  # noqa: F401
from esco_neo4j_spark.plans import dedup_queries  # noqa: F401
from esco_neo4j_spark.plans import text_queries  # noqa: F401
from esco_neo4j_spark.plans import graph_queries  # noqa: F401
from esco_neo4j_spark.plans import event_queries  # noqa: F401
from esco_neo4j_spark.plans import udf_queries  # noqa: F401
from esco_neo4j_spark.plans import multimodal_queries  # noqa: F401
from esco_neo4j_spark.plans import esco_queries  # noqa: F401
