"""Text column expressions: normalization, tokenization, shingles, quality.

Reference parity:
- ``ascii_clean`` / ``normalize_ws``: the translator's pre-clean
  (reference: src/esco_translate.py:257-261).
- ``embedding_text``: "label. altLabels. description" concat fed to the
  sentence-transformer (reference: src/embedding_utils.py:24-30).
- ``truncate_ellipsis``: display truncation (reference: src/esco_cli.py:62-64).

Extensions (north-star LLM-pipeline operators): word tokenization, token
counting, character n-gram shingles, Jaccard over token sets, quality
features. All pure column expressions — no Python in the hot path, so they
survive a 100 TB scan at full codegen speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ascii_clean(c: Column) -> Column:
    """Strip non-ASCII chars (reference: src/esco_translate.py:257-258)."""
    return F.regexp_replace(c, r"[^\x00-\x7F]", "")


def normalize_ws(c: Column) -> Column:
    """Collapse whitespace runs + trim (reference: src/esco_translate.py:259-261)."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def embedding_text(label: Column, alt_labels: Column, description: Column) -> Column:
    """Text fed to the embedding model (reference: src/embedding_utils.py:24-30):
    ``f"{label}. {alt_labels}. {desc}".strip()`` with null-safe parts."""
    return normalize_ws(
        F.concat_ws(
            ". ",
            F.coalesce(label, F.lit("")),
            F.coalesce(alt_labels, F.lit("")),
            F.coalesce(description, F.lit("")),
        )
    )


def truncate_ellipsis(c: Column, max_len: int = 100) -> Column:
    """``desc[:97] + "..."`` display form (reference: src/esco_cli.py:62-64)."""
    return F.when(
        F.length(c) > max_len,
        F.concat(F.substring(c, 1, max_len - 3), F.lit("...")),
    ).otherwise(c)


def word_tokens(c: Column) -> Column:
    """Lowercased word tokens: runs of [a-z0-9']+ after lowercasing."""
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: t != F.lit("")
    )


def token_count(c: Column) -> Column:
    """Whitespace-ish token count (BPE-proxy: words + punctuation islands)."""
    return F.size(word_tokens(c))


def ngram_shingles(c: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles of the lowercased, ws-normalized text.

    Built with sequence+transform so it stays a column expression; used by
    the Jaccard / MinHash dedup operators.
    """
    s = normalize_ws(F.lower(c))
    return F.when(F.length(s) < n, F.array(s)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
                lambda i: F.substring(s, i, F.lit(n)),
            )
        )
    )


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (Broder shingling) of the tokenized text.

    Word shingles (not char n-grams) are the discriminative unit for
    document dedup: on a corpus with a small character-level alphabet,
    char shingles saturate (every doc contains most of the universe) and
    LSH degenerates to O(n^2) candidates; word shingles keep the shingle
    universe ~vocab^n. Docs shorter than n words get one whole-text shingle.
    """
    ws = word_tokens(c)
    return F.when(
        F.size(ws) < n, F.array(F.concat_ws(" ", ws))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
            )
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)


def quality_features(c: Column) -> dict[str, Column]:
    """Heuristic document-quality features (north-star text-analysis op).

    Returns a dict of named columns: length, token count, punctuation
    ratio, uppercase ratio, stopword ratio, mean word length.
    """
    n_chars = F.length(c)
    toks = word_tokens(c)
    n_toks = F.size(toks)
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_toks, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "upper_ratio": n_upper.cast("double") / safe_chars,
        "stopword_ratio": n_stop.cast("double") / safe_toks,
        "mean_word_len": F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / safe_toks,
    }


_STOPWORDS = (
    "the a an and or of to in is are was were for on with as by at it this "
    "that be from has have had not but they you we he she his her its"
).split()
