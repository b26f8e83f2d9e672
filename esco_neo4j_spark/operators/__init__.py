"""Operator implementations: graph traversal/analytics, dedup, similarity,
relational composites. Each module documents which SURVEY.md §2 operator IDs
it covers and cites the reference behavior it replicates."""
