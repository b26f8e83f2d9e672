"""Torch-free stand-in for the ``sentence_transformers`` package.

Tests prepend this directory to the driver's sys.path and ship this file
to Spark executors with ``sparkContext.addPyFile`` so the REAL branch of
``make_embed_udf`` (lazy per-executor model init + batch ``encode`` on
the Arrow path) executes under pytest in a container without torch.
``encode`` returns deterministic float32 vectors derived from md5 so
tests can pin exact values.
"""
from __future__ import annotations

import hashlib

FAKE_DIM = 8


def fake_vector(text: str) -> list[float]:
    """The deterministic embedding formula shared with the tests."""
    digest = hashlib.md5(("fake-st:" + text).encode("utf-8")).digest()
    return [b / 255.0 for b in digest[:FAKE_DIM]]


class SentenceTransformer:
    """Mimics the two-call surface make_embed_udf uses: __init__(name)
    and encode(list[str]) -> sequence of float vectors."""

    instances_created = 0

    def __init__(self, model_name: str, *args, **kwargs):
        self.model_name = model_name
        SentenceTransformer.instances_created += 1

    def encode(self, texts, **kwargs):
        return [fake_vector(t) for t in texts]
