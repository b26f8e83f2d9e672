"""Structured Streaming extensions (SURVEY.md §2.J — absent from the
reference, added for the north-star event-pipeline surface)."""
