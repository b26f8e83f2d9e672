from esco_neo4j_spark.sources.esco import (  # noqa: F401
    ensure_warehouse,
    ingest,
    load_graph,
    read_esco_csv,
)
from esco_neo4j_spark.sources.merge import (  # noqa: F401
    merge_upsert,
    upsert_parquet,
)
