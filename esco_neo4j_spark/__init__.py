"""esco_neo4j_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference OzLe/ESCO-Neo4J tool.

The reference stores the ESCO taxonomy as a Neo4j labeled property graph and
ships Cypher strings to the server (reference: src/neo4j_client.py:123-149).
This engine re-expresses the same semantics Spark-first: node/edge Parquet
tables, DataFrame/SQL relational algebra for every Cypher pattern, a
DataFrame-native Pregel primitive for traversals and graph analytics, and
pandas-UDF pipelines for the model-backed operators (embedding, translation).

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster use
- ``catalog``    table registry for the synthetic star schema and ESCO tables
- ``functions``  scalar/vector/text column expression library
- ``operators``  relational, graph, dedup, similarity operator implementations
- ``sources``    ESCO CSV ingest -> node/edge Parquet tables
- ``plans``      named-query registry (the analysis_queries.md corpus, mapped)
- ``streaming``  Structured Streaming extensions over the events table
"""

__version__ = "0.1.0"
