"""Text-analysis query corpus (north-star LLM-pipeline operators over the
documents table): token stats, quality scoring, language-ID heuristic,
document fingerprinting. Pure column expressions (functions/text.py); the
oracle mirrors each regexp/aggregation in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esco_neo4j_spark.functions.text import quality_features, word_tokens
from esco_neo4j_spark.plans.registry import query

_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), "
    "x -> x <> '')"
)

_STOP_EN = (
    "the a an and or of to in is are was were for on with as by at it this "
    "that be from has have had not but they you we he she his her its"
).split()
_LANG_MARKERS = {
    "en": _STOP_EN,
    "de": "der die das und ist nicht ein eine mit von zu den dem des im".split(),
    "es": "el la los las es un una y de que en no por con para su".split(),
    "fr": "le la les et est un une de que en ne pas pour dans du au".split(),
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "text_token_stats",
    sql=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_TOKENS})) AS BIGINT) AS total_tokens,
           CAST(round(avg(len({_TOKENS})), 4) AS DOUBLE) AS avg_tokens,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    survey_ops="text-tokens,D3",
    bench=True,
    tables=("documents",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up per source — the whitespace+regex
    tokenizer (BPE proxy) as a column expression, aggregated map-side."""
    d = spark.table("documents")
    n_toks = F.size(word_tokens(F.col("text")))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_toks).cast("bigint").alias("total_tokens"),
            F.round(F.avg(n_toks), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


@query(
    "text_quality_scores",
    sql=f"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(len({_TOKENS}) AS INT) AS n_tokens,
           CAST(round((length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE
                / greatest(length(text), 1), 6) AS DOUBLE) AS punct_ratio,
           CAST(round(len(list_intersect({_TOKENS}, {_sql_list(_STOP_EN)}))::DOUBLE
                / greatest(len({_TOKENS}), 1), 6) AS DOUBLE) AS stopword_ratio,
           CAST(round(list_aggregate(list_transform({_TOKENS}, t -> length(t)::DOUBLE), 'sum')
                / greatest(len({_TOKENS}), 1), 6) AS DOUBLE) AS mean_word_len
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
    survey_ops="text-quality,H7",
    tables=("documents",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features per document (length / punctuation /
    stopword / word-length ratios). Note stopword_ratio here counts
    distinct-stopword hits via set-intersect on both sides."""
    d = spark.table("documents")
    feats = quality_features(F.col("text"))
    toks = word_tokens(F.col("text"))
    stop = F.array(*[F.lit(w) for w in _STOP_EN])
    return (
        d.select(
            "doc_id",
            feats["n_chars"].cast("int").alias("n_chars"),
            feats["n_tokens"].cast("int").alias("n_tokens"),
            F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
            F.round(
                F.size(F.array_intersect(toks, stop)).cast("double")
                / F.greatest(F.size(toks), F.lit(1)).cast("double"),
                6,
            ).alias("stopword_ratio"),
            F.round(feats["mean_word_len"], 6).alias("mean_word_len"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def _langid_sql() -> str:
    hits = ",\n           ".join(
        f"len(list_intersect({_TOKENS}, {_sql_list(ws)})) AS hits_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS tagged_lang,
           {hits}
      FROM documents
    )
    SELECT doc_id, tagged_lang,
           CASE
             WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
             WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
             WHEN hits_es >= hits_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """


def _predicted_lang(text_col):
    """Stopword-marker language-ID expression with a deterministic
    preference order (en > de > es > fr on ties); shared by text_langid
    and the training-mix pipeline capstone."""
    toks = word_tokens(text_col)
    hits = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
        )
        for lang, ws in _LANG_MARKERS.items()
    }
    return (
        F.when(
            (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["es"])
            & (hits["en"] >= hits["fr"]),
            "en",
        )
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), "de")
        .when(hits["es"] >= hits["fr"], "es")
        .otherwise("fr")
    )


@query(
    "text_langid",
    sql=_langid_sql(),
    survey_ops="text-langid",
    tables=("documents",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic (see _predicted_lang). The
    tagged lang column is carried through for downstream accuracy
    checks."""
    d = spark.table("documents")
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("tagged_lang"),
            _predicted_lang(F.col("text")).alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint",
    sql=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct({_TOKENS})), '|'))
               AS fingerprint
      FROM documents
    )
    SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) >= 1
    ORDER BY n_docs DESC, fingerprint
    LIMIT 100
    """,
    survey_ops="text-fingerprint",
    tables=("documents",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint: md5 of the sorted distinct token
    set — groups token-identical documents regardless of word order (the
    'rolling hash' fingerprint family's set variant)."""
    d = spark.table("documents")
    fp = F.md5(
        F.concat_ws(
            "|", F.array_sort(F.array_distinct(word_tokens(F.col("text"))))
        )
    ).alias("fingerprint")
    return (
        d.select("doc_id", fp)
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.desc("n_docs"), F.asc("fingerprint"))
        .limit(100)
    )


# per-language keep-rate (percent) for the training-mix sample below
_MIX_RATES = {"en": 50, "de": 30, "es": 20, "fr": 10}
_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{l}' THEN {r}" for l, r in _MIX_RATES.items())
    + " ELSE 0 END"
)


@query(
    "text_stratified_sample",
    sql=f"""
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
                % 100 AS INT) AS bucket
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
          < {_RATE_SQL}
    ORDER BY doc_id
    """,
    survey_ops="text-sampling,B6",
    tables=("documents",),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    each doc hashes to a stable 0-99 bucket (md5 of its id) and survives
    iff bucket < the per-language keep rate. Unlike df.sample this is
    reproducible run-to-run and join-stable across tables keyed on the
    same id — the property a multi-pass 100 TB pipeline needs — and it is
    a pure filter: no shuffle, pushdown-friendly, exactly mirrored in
    SQL."""
    d = spark.table("documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    rate = F.lit(0)
    for lang, r in _MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


@query(
    "text_length_quantiles",
    sql="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(quantile_cont(n_chars, 0.5), 4) AS DOUBLE) AS p50,
           CAST(round(quantile_cont(n_chars, 0.9), 4) AS DOUBLE) AS p90,
           CAST(round(quantile_cont(n_chars, 0.99), 4) AS DOUBLE) AS p99
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    survey_ops="text-quantiles,D8",
    tables=("documents",),
)
def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact length percentiles per source (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the definition, so
    this is value-hash-checked). The sequence-length budget planner of a
    training pipeline; at 100 TB swap in approx_percentile and trade the
    oracle for a tolerance test."""
    d = spark.table("documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99"),
        )
        .orderBy("source")
    )


# ---- training-mix pipeline capstone ---------------------------------------

_PLANG_HITS = ",\n             ".join(
    f"len(list_intersect({_TOKENS}, {_sql_list(ws)})) AS hits_{lang}"
    for lang, ws in _LANG_MARKERS.items()
)
_PLANG_CASE = """CASE
           WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
           WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
           WHEN hits_es >= hits_fr THEN 'es'
           ELSE 'fr'
         END"""
_RATE_SQL_PLANG = (
    "CASE plang "
    + " ".join(f"WHEN '{l}' THEN {r}" for l, r in _MIX_RATES.items())
    + " ELSE 0 END"
)


def _pipeline_sql() -> str:
    from esco_neo4j_spark.plans.dedup_queries import (
        _MINHASH_CTES,
        _MINHASH_PAIRS_SELECT,
    )

    minhash = _MINHASH_CTES.replace("FROM documents", "FROM filtered")
    return f"""
    WITH RECURSIVE
    scored AS (
      SELECT doc_id, text, len({_TOKENS}) AS nt,
             {_PLANG_HITS}
      FROM documents
    ),
    filtered AS (
      SELECT doc_id, text, {_PLANG_CASE} AS plang
      FROM scored WHERE nt >= 20
    ),
    {minhash},
    pairs AS ({_MINHASH_PAIRS_SELECT}),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    walk AS (
      SELECT src AS id, dst AS reach FROM und
      UNION
      SELECT w.id, u.dst FROM walk w JOIN und u ON w.reach = u.src
    ),
    comp AS (SELECT id, least(id, min(reach)) AS comp FROM walk GROUP BY id),
    kept AS (
      SELECT f.doc_id, f.plang
      FROM filtered f LEFT JOIN comp c ON f.doc_id = c.id
      WHERE coalesce(c.comp, f.doc_id) = f.doc_id
    ),
    bucketed AS (
      SELECT doc_id, plang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
               AS bucket
      FROM kept
    )
    SELECT doc_id, plang AS lang, CAST(bucket AS INT) AS bucket
    FROM bucketed
    WHERE bucket < {_RATE_SQL_PLANG}
    ORDER BY doc_id
    """


@query(
    "pipeline_training_mix",
    sql=_pipeline_sql(),
    survey_ops="pipeline(ext),text-quality,text-langid,dedup-canonical,text-sampling",
    tables=("documents",),
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data prep — the pipeline the north-star
    operators exist FOR, composed as one lazy plan: (1) quality gate
    (>= 20 tokens), (2) language-ID, (3) MinHash-LSH near-dup
    canonicalization keeping each cluster's min-id doc, (4) deterministic
    per-language stratified sampling. Every stage is an already-oracle-
    checked operator; this query value-checks their COMPOSITION end to
    end (one DuckDB CTE chain recomputes all four stages independently).
    Catalyst fuses the gates into the scan, the LSH join is the banded
    equi-join, CC runs on the tiny near-dup pair graph, and the sampler
    is a pure filter — the whole mix costs ~the LSH join at 100 TB."""
    from esco_neo4j_spark.operators.dedup import minhash_dedup_pairs
    from esco_neo4j_spark.operators.graph import _checkpoint, connected_components

    d = spark.table("documents")
    filtered = d.filter(F.size(word_tokens(F.col("text"))) >= 20).select(
        "doc_id", "text", _predicted_lang(F.col("text")).alias("plang")
    )
    # The quality+langid gate is consumed by FIVE downstream branches
    # (minhash signature, both exact-Jaccard verify sides, CC vertex set,
    # and the kept-join) — without cutting lineage the tokenize+langid
    # subtree re-executes per branch, which is exactly the 11.8×-at-10×
    # superlinearity the r4 sf1 audit measured (93.5s; its
    # checkpoint-free sibling dedup_canonical_docs, identical dedup stage
    # over RAW docs, ran 24.6s). Materialize the gate once.
    filtered = _checkpoint(filtered)
    pairs = minhash_dedup_pairs(
        filtered, "text", "doc_id", threshold=0.5, num_hashes=16, bands=4
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(pairs)
    kept = (
        filtered.join(cc, filtered["doc_id"] == cc["id"], "left")
        .filter(
            F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id")
        )
        .select("doc_id", "plang")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    rate = F.lit(0)
    for lang, r in _MIX_RATES.items():
        rate = F.when(F.col("plang") == lang, F.lit(r)).otherwise(rate)
    return (
        kept.select("doc_id", F.col("plang").alias("lang"), bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


# ---- PII / sensitive-term scrubbing ---------------------------------------
#
# Dictionary + pattern redaction, the compliance pass every training-data
# pipeline runs before tokenization. Two pattern families: a blocklist of
# sensitive terms (here corpus words standing in for name/entity lists) and
# a structural email pattern (zero hits on this synthetic corpus — the
# plumbing is still exercised and value-checked). Match counts come from
# size(split(text, pat)) - 1, identical semantics in Spark (Java regex,
# limit -1 keeps trailing empties) and DuckDB (regexp_split_to_array).
_TERM_PAT = r"\b(customer|key|hash)\b"
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@query(
    "text_pii_scrub",
    sql=f"""
    WITH scrubbed AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '{_TERM_PAT}')) - 1 AS n_term_hits,
             len(regexp_split_to_array(text, '{_EMAIL_PAT}')) - 1 AS n_email_hits,
             regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                            '{_TERM_PAT}', '[REDACTED]', 'g') AS clean
      FROM documents
    )
    SELECT doc_id,
           CAST(n_term_hits AS INT) AS n_term_hits,
           CAST(n_email_hits AS INT) AS n_email_hits,
           CAST(length(clean) AS INT) AS clean_len,
           md5(clean) AS clean_md5
    FROM scrubbed
    ORDER BY doc_id
    """,
    survey_ops="text-pii(ext),H7,H9",
    tables=("documents",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact blocklisted terms and email-shaped spans from every document
    and report per-doc hit counts plus an md5 of the scrubbed text (so the
    oracle value-checks the REDACTION itself, not just the counts). Pure
    regexp column expressions — narrow, no shuffle, whole-stage codegen;
    at 100 TB this is a free rider on the first scan of the corpus. Large
    real blocklists (10^5+ names) should compile to an Aho-Corasick-style
    single pass or a broadcast-joined token table instead of one giant
    alternation; the structural patterns stay regexes."""
    d = spark.table("documents")
    n_terms = F.size(F.split(F.col("text"), _TERM_PAT, -1)) - 1
    n_emails = F.size(F.split(F.col("text"), _EMAIL_PAT, -1)) - 1
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "[EMAIL]"),
        _TERM_PAT,
        "[REDACTED]",
    )
    return (
        d.select(
            "doc_id",
            n_terms.cast("int").alias("n_term_hits"),
            n_emails.cast("int").alias("n_email_hits"),
            F.length(clean).cast("int").alias("clean_len"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_unigram_logprob",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n_total FROM toks)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_tokens,
           CAST(sum(CAST(round(-ln(cnt::DOUBLE / n_total::DOUBLE) * 1000000)
                         AS BIGINT)) AS BIGINT) AS sum_micro_nats
    FROM toks JOIN tf USING (term) CROSS JOIN n
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    survey_ops="text-lm-quality(ext),D3,C1",
    tables=("documents",),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document — the KenLM-style
    quality score's simplest honest proxy: fit corpus unigram
    probabilities (one partial-aggregable count per term), then charge
    each token -ln p(term). Per-token surprisal is quantized to integer
    micro-nats BEFORE the per-doc sum, so the aggregate is an exact
    integer in any summation order — float non-associativity cannot break
    the cross-engine value hash, a trick worth stealing for any
    double-summing oracle. The term table is vocabulary-sized and
    broadcast; the only corpus-sized shuffle is the per-doc re-group. At
    100 TB: identical shape, vocabulary still fits in a broadcast."""
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("n_total"))
    micro = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
        * 1_000_000
    ).cast("bigint")
    return (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", micro.alias("micro_nats"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.sum("micro_nats").cast("bigint").alias("sum_micro_nats"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_tfidf_top_terms",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, CAST(score AS DOUBLE) AS score,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM scored
    )
    WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    survey_ops="text-tfidf(ext),E,D5",
    bench=True,  # round-over-round visibility for the heaviest text shape
    tables=("documents",),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic IR weighting as two
    bounded aggregations: term frequency per (doc, term), document
    frequency per term (both partial-aggregable), idf = ln(N/df) joined
    back BROADCAST (the term dictionary is tiny next to the corpus), then
    a per-doc top-k window. No UDF anywhere; the score is rounded before
    ranking so the cross-engine order is identical. At 100 TB the df
    table is the only global state and it's vocabulary-sized."""
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", F.col("rk").cast("int").alias("rk"))
        .orderBy("doc_id", "rk")
    )


@query(
    "text_vocab_stats",
    sql=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT source, term, count(*) AS n FROM toks GROUP BY source, term
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(round(count(*)::DOUBLE / sum(n), 6) AS DOUBLE)
             AS type_token_ratio,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                / count(*), 6) AS DOUBLE) AS hapax_fraction
    FROM tf GROUP BY source ORDER BY source
    """,
    survey_ops="text-vocab(ext),D2,D5",
    tables=("documents",),
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics vocabulary profile per source: type-token
    ratio (lexical diversity) and hapax-legomena fraction (terms seen
    once — the Heaps'-law tail that dominates tokenizer vocab design).
    Two partial-aggregable groupBys; every ratio is ONE division of two
    exact integers, so 6dp rounding is deterministic. The diagnostic
    that catches template-generated or looped text at corpus level,
    complementing the per-document repetition scores."""
    d = spark.table("documents")
    toks = d.select(
        "source", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("n"))
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return (
        tf.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.count("*").cast("bigint").alias("vocab_size"),
            F.round(
                F.count("*").cast("double") / F.sum("n").cast("double"), 6
            ).alias("type_token_ratio"),
            hapax.cast("bigint").alias("hapax"),
            F.round(
                hapax.cast("double") / F.count("*").cast("double"), 6
            ).alias("hapax_fraction"),
        )
        .orderBy("source")
    )


@query(
    "text_bpe_pair_counts",
    sql=f"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS ws FROM documents),
    pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i + 1]
             )) AS pair
      FROM t WHERE len(ws) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 100
    """,
    survey_ops="text-bpe(ext),D2,F2",
    tables=("documents",),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies — the inner statistic of a
    BPE tokenizer-training iteration (merge the most frequent pair,
    recount). Pair construction is a per-row array expression (sequence +
    transform, zero shuffle, cost bounded by document length); the only
    exchange carries map-side partial counts, and the top-100 plans as
    TakeOrderedAndProject. A full distributed BPE trainer is this query
    in a loop with a broadcast merge table — each iteration exactly this
    shape."""
    d = spark.table("documents")
    ws = word_tokens(F.col("text"))
    t = d.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    pairs = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("ws", i), F.element_at("ws", i + 1)
                ),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(100)
    )


@query(
    "text_source_divergence",
    sql=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKENS}) AS term FROM documents
      WHERE source IN ('src0', 'src1')
    ),
    tf AS (
      SELECT source, term, count(*) AS n FROM toks GROUP BY source, term
    ),
    tot AS (SELECT source, sum(n) AS nt FROM tf GROUP BY source),
    probs AS (
      SELECT t.term,
             sum(CASE WHEN t.source = 'src0'
                      THEN t.n / CAST(x.nt AS DOUBLE) ELSE 0 END) AS p,
             sum(CASE WHEN t.source = 'src1'
                      THEN t.n / CAST(x.nt AS DOUBLE) ELSE 0 END) AS q
      FROM tf t JOIN tot x ON t.source = x.source
      GROUP BY t.term
    ),
    contrib AS (
      SELECT term,
             CAST(round((CASE WHEN p > 0
                    THEN p * ln(2.0 * p / (p + q)) ELSE 0 END
                  + CASE WHEN q > 0
                    THEN q * ln(2.0 * q / (p + q)) ELSE 0 END)
                  * 500000000) AS BIGINT) AS nano_half
      FROM probs
    )
    SELECT CAST(sum(nano_half) AS BIGINT) AS js_nano,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(round(sum(nano_half) / 1000000000.0, 6) AS DOUBLE)
             AS js_divergence
    FROM contrib
    """,
    survey_ops="text-divergence(ext),D8,G1",
    tables=("documents",),
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' term
    distributions — the distribution-shift detector a corpus pipeline
    runs when a new crawl source lands (high JS vs the reference mix
    means re-balance before training). Per-term probabilities are exact
    integer counts over exact totals; each term's JS contribution is
    quantized to integer nano-nats BEFORE the global sum (the
    quantize-before-sum discipline), so the divergence is order-exact
    across engines. Vocabulary-sized state throughout after the one
    token-count exchange."""
    d = spark.table("documents").filter(F.col("source").isin("src0", "src1"))
    toks = d.select(
        "source", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("n"))
    tot = tf.groupBy("source").agg(F.sum("n").alias("nt"))
    probs = (
        tf.join(F.broadcast(tot), "source")
        .groupBy("term")
        .agg(
            F.sum(
                F.when(
                    F.col("source") == "src0",
                    F.col("n") / F.col("nt").cast("double"),
                ).otherwise(0.0)
            ).alias("p"),
            F.sum(
                F.when(
                    F.col("source") == "src1",
                    F.col("n") / F.col("nt").cast("double"),
                ).otherwise(0.0)
            ).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    half = F.when(p > 0, p * F.log(F.lit(2.0) * p / (p + q))).otherwise(0.0) + \
        F.when(q > 0, q * F.log(F.lit(2.0) * q / (p + q))).otherwise(0.0)
    contrib = probs.select(
        F.round(half * 500_000_000).cast("bigint").alias("nano_half")
    )
    return contrib.agg(
        F.sum("nano_half").cast("bigint").alias("js_nano"),
        F.count("*").cast("bigint").alias("n_terms"),
    ).select(
        "js_nano",
        "n_terms",
        F.round(F.col("js_nano") / 1_000_000_000.0, 6).alias("js_divergence"),
    )


@query(
    "text_zipf_fit",
    sql=f"""
    WITH toks AS (
      SELECT unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
    ranked AS (
      SELECT CAST(round(ln(row_number() OVER (ORDER BY n DESC, term))
                        * 1000000) AS BIGINT) AS lx,
             CAST(round(ln(n) * 1000000) AS BIGINT) AS ly
      FROM tf
    ),
    s AS (
      SELECT count(*) AS k, sum(lx) AS sx, sum(ly) AS sy,
             sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
      FROM ranked
    )
    SELECT CAST(k AS BIGINT) AS vocab_size,
           CAST(round(
             (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS DOUBLE)
             AS zipf_slope
    FROM s
    """,
    survey_ops="text-zipf(ext),stats-ols(ext),E",
    tables=("documents",),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of log-frequency on log-rank over the
    corpus vocabulary (natural text sits near -1; template/generated
    corpora flatten — a corpus-level authenticity screen next to JS
    divergence). Per-term logs are single deterministic doubles
    quantized to integer micro-units BEFORE the power sums (the usual
    discipline), the slope one scalar tail. The rank window is a total
    order but runs over the VOCABULARY, not the corpus — at 100 TB the
    vocab is still bucket-rankable with the two-level trick."""
    d = spark.table("documents")
    toks = d.select(F.explode(word_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    ranked = tf.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("lx"),
        F.round(F.log(F.col("n").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("ly"),
    )
    s = ranked.agg(
        F.count("*").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    d_ = lambda c: F.col(c).cast("double")
    slope = (d_("k") * d_("sxy") - d_("sx") * d_("sy")) / (
        d_("k") * d_("sxx") - d_("sx") * d_("sx")
    )
    return s.select(
        F.col("k").cast("bigint").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
    )


@query(
    "text_nb_source_classifier",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    ct AS (
      SELECT d.source, t.term, count(*) AS cnt
      FROM toks t JOIN documents d USING (doc_id)
      GROUP BY d.source, t.term
    ),
    cls AS (
      SELECT source, sum(cnt) AS tok_total FROM ct GROUP BY source
    ),
    v AS (SELECT count(DISTINCT term) AS vocab FROM toks),
    prior AS (
      SELECT source,
             CAST(round(ln(count(*)::DOUBLE
                           / (SELECT count(*) FROM documents)) * 1000000)
                  AS BIGINT) AS prior_micro
      FROM documents GROUP BY source
    ),
    lik AS (
      SELECT t.term, cls.source,
             CAST(round(ln((coalesce(ct.cnt, 0) + 1)::DOUBLE
                           / (cls.tok_total + v.vocab)) * 1000000)
                  AS BIGINT) AS micro
      FROM (SELECT DISTINCT term FROM toks) t
      CROSS JOIN cls CROSS JOIN v
      LEFT JOIN ct ON ct.term = t.term AND ct.source = cls.source
    ),
    scored AS (
      SELECT tf.doc_id, lik.source,
             sum(tf.tf * lik.micro) AS ll
      FROM tf JOIN lik USING (term)
      GROUP BY tf.doc_id, lik.source
    ),
    best AS (
      SELECT s.doc_id, s.source AS predicted,
             row_number() OVER (PARTITION BY s.doc_id
                                ORDER BY s.ll + p.prior_micro DESC,
                                         s.source) AS r
      FROM scored s JOIN prior p ON s.source = p.source
    )
    SELECT d.source AS actual_source, b.predicted AS predicted_source,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM best b JOIN documents d USING (doc_id)
    WHERE b.r = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    survey_ops="text-classifier(ext),D3,C1,E",
    tables=("documents",),
)
def text_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes document classifier, trained and scored in
    one plan — the CCNet/GPT-3 "quality classifier" pattern (score every
    crawl page against a trusted-corpus model) with the documents table's
    source field as the label. Training is two bounded aggregates
    (class-term counts, class priors); the model — vocab x n_classes
    Laplace-smoothed log-likelihoods, quantized to integer micro-nats so
    every per-doc sum is order-exact — is broadcast back against per-doc
    term frequencies. Fan-out is n_classes (a small constant), the only
    corpus-sized shuffles are the tf rollup and the per-doc re-group, and
    the readout is the confusion matrix. At 100 TB the model table is
    still vocabulary-sized: same broadcast, same plan."""
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    ct = (
        toks.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    cls = ct.groupBy("source").agg(F.sum("cnt").alias("tok_total"))
    vocab = toks.agg(F.countDistinct("term").alias("vocab"))
    n_docs_total = d.count()  # 1 driver-side scalar (class prior denominator)
    prior = d.groupBy("source").agg(
        F.round(
            F.log(F.count("*").cast("double") / F.lit(float(n_docs_total)))
            * 1_000_000
        )
        .cast("bigint")
        .alias("prior_micro")
    )
    terms = toks.select("term").distinct()
    lik = (
        terms.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vocab))
        .join(ct, ["term", "source"], "left")
        .select(
            "term",
            "source",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("tok_total") + F.col("vocab")).cast("double")
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("micro"),
        )
    )
    scored = (
        tf.join(F.broadcast(lik), "term")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("tf") * F.col("micro")).alias("ll"))
    )
    best = (
        scored.join(F.broadcast(prior), "source")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc(F.col("ll") + F.col("prior_micro")), F.asc("source")
                )
            ),
        )
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("source").alias("predicted_source"))
    )
    return (
        best.join(d.select("doc_id", F.col("source").alias("actual_source")), "doc_id")
        .groupBy("actual_source", "predicted_source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("actual_source", "predicted_source")
    )


@query(
    "text_bigram_lm_score",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ),
    toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
    uni AS (SELECT term, count(*) AS cu FROM toks GROUP BY term),
    v AS (SELECT count(*) AS vocab FROM uni),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM docs WHERE len(toks) >= 2
    ),
    bcnt AS (SELECT bg, count(*) AS cb FROM big GROUP BY bg),
    scored AS (
      SELECT big.doc_id,
             CAST(round(-ln((bcnt.cb + 1)::DOUBLE
                            / (uni.cu + v.vocab)::DOUBLE) * 1000000)
                  AS BIGINT) AS micro
      FROM big
      JOIN bcnt USING (bg)
      JOIN uni ON uni.term = split_part(big.bg, ' ', 1)
      CROSS JOIN v
    )
    SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
           CAST(sum(micro) AS BIGINT) AS sum_micro_nats
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    survey_ops="text-lm-quality(ext),D3,C1",
    tables=("documents",),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprisal per document — the sequence-aware
    upgrade of text_unigram_logprob (KenLM-style fluency scoring charges
    -ln p(w2|w1), add-1 smoothed over the corpus vocabulary, per bigram).
    Bigrams are built PER ROW with transform(sequence(...)) over the token
    array — no positional window, no per-doc shuffle — then counted
    corpus-wide. Unlike the unigram model, the bigram table scales with
    corpus diversity, so the likelihood join is a plain shuffle join (NOT
    a broadcast — documented 100 TB difference); per-bigram surprisal is
    quantized to integer micro-nats before the per-doc sum, keeping the
    aggregate order-exact."""
    d = spark.table("documents")
    docs = d.select("doc_id", word_tokens(F.col("text")).alias("toks"))
    toks = docs.select("doc_id", F.explode("toks").alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("cu"))
    vocab = uni.agg(F.count("*").alias("vocab"))
    big = (
        docs.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat(element_at(toks, i), ' ', "
                    "element_at(toks, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    bcnt = big.groupBy("bg").agg(F.count("*").alias("cb"))
    micro = F.round(
        -F.log(
            (F.col("cb") + 1).cast("double")
            / (F.col("cu") + F.col("vocab")).cast("double")
        )
        * 1_000_000
    ).cast("bigint")
    return (
        big.join(bcnt, "bg")
        .join(uni, F.substring_index(F.col("bg"), " ", 1) == F.col("term"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("micro").cast("bigint").alias("sum_micro_nats"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_crossdoc_ngram_share",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 3, 1)),
               i -> array_to_string(t[i:i+4], ' ')))) AS gram
      FROM toks
    ),
    df AS (
      SELECT gram, count(*) AS n_docs FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(count(*) AS INT) AS n_grams,
           CAST(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS INT)
             AS shared_grams,
           CAST(round(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE
                      / count(*), 6) AS DOUBLE) AS crossdoc_share
    FROM grams g JOIN df d ON g.gram = d.gram
    GROUP BY g.doc_id
    ORDER BY crossdoc_share DESC, g.doc_id
    LIMIT 100
    """,
    survey_ops="dedup-adjacent-corpus-health(ext),D3,D5",
    tables=("documents",),
)
def text_crossdoc_ngram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplication share per doc: the fraction of a
    document's distinct word 5-grams that also appear in at least one
    OTHER document (RefinedWeb-style inter-document repetition signal —
    unlike the pairwise dedup family this measures diffuse boilerplate
    that no single near-dup pair explains, and unlike
    text_repetition_scores it is cross-doc, not within-doc). Shape is
    the inverted-index one: explode distinct (doc, gram) pairs, count
    document frequency per gram (one shuffle on gram), join back and
    re-aggregate per doc (one shuffle on doc_id) — never all-pairs, so
    it scales like the LSH candidate path. Because the (doc,gram) pairs
    are distinct, df > 1 exactly means "appears in another document"."""
    toks = spark.table("documents").select(
        "doc_id", word_tokens(F.col("text")).alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.size("t") >= 5,
                    F.expr(
                        "transform(sequence(1, size(t) - 4), "
                        "i -> array_join(slice(t, i, 5), ' '))"
                    ),
                ).otherwise(F.expr("array()"))
            )
        ).alias("gram"),
    )
    dfreq = grams.groupBy("gram").agg(F.count("*").alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        grams.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum(shared).cast("int").alias("shared_grams"),
            F.round(
                F.sum(shared).cast("double") / F.count("*"), 6
            ).alias("crossdoc_share"),
        )
        .orderBy(F.desc("crossdoc_share"), F.asc("doc_id"))
        .limit(100)
    )


# --- BM25 lexical retrieval ------------------------------------------------
# The reference's search is vector-only (src/semantic_search.py:61-96); a
# complete retrieval engine pairs it with lexical ranking. Okapi BM25
# (Robertson et al.) with the standard k1=1.2, b=0.75. The per-term
# contribution is quantized to integer nano-units BEFORE the cross-term sum,
# so the summation is associative and the cross-engine hash is exact (same
# trick as text_unigram_logprob's micro-nats).
_BM25_TERMS = ("table", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_nano(spark: SparkSession) -> DataFrame:
    """(doc_id, score_nano) for the literal query terms — shared by
    text_bm25_search and vec_hybrid_rrf.

    Shape at 100 TB: doc-length table is one partial-aggregable groupBy;
    the per-(doc, query-term) tf table is tiny after the IN filter pushes
    through the explode; df (3 rows) and the two global scalars broadcast
    as literals. One shuffle on doc_id for the final sum."""
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs, sum_dl = d.count(), dl.agg(F.sum("dl")).first()[0]
    avgdl = float(sum_dl) / float(n_docs)  # exact int-sum / int-count
    qt = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = qt.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom
    nano = F.round(contrib * 1e9).cast("bigint")
    return (
        qt.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(nano).alias("score_nano"))
    )


def _bm25_nano_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    toks AS (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    st AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                  (SELECT sum(dl)::DOUBLE / count(*) FROM dl) AS avgdl),
    qt AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({terms}) GROUP BY doc_id, term),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY term),
    bm25 AS (
      SELECT qt.doc_id,
             CAST(sum(CAST(round(
               ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (qt.tf * {_BM25_K1 + 1.0!r})
               / (qt.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                  + {_BM25_B!r} * dl.dl / st.avgdl))
               * 1e9) AS BIGINT)) AS BIGINT) AS score_nano
      FROM qt JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
      GROUP BY qt.doc_id)
    """


@query(
    "text_bm25_search",
    sql=f"""
    WITH {_bm25_nano_sql()}
    SELECT doc_id, score_nano FROM bm25
    ORDER BY score_nano DESC, doc_id LIMIT 20
    """,
    survey_ops="text-bm25(ext),K7,D3,F2",
    tables=("documents",),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed query ("table join window") — the
    lexical half of hybrid retrieval, complementing the reference's
    vector search (src/semantic_search.py:61-96). Integer nano-unit
    scores make the ranking order-exact across engines."""
    return (
        _bm25_nano(spark)
        .orderBy(F.desc("score_nano"), F.asc("doc_id"))
        .limit(20)
    )


# --- dictionary keyword tagging --------------------------------------------
_TAG_DICT = [
    ("spark", "engine"),
    ("query", "engine"),
    ("join", "operator"),
    ("window", "operator"),
    ("agg", "operator"),
    ("scan", "operator"),
    ("stream", "mode"),
    ("batch", "mode"),
]


@query(
    "text_keyword_tagging",
    sql=f"""
    WITH dict(term, tag) AS (VALUES {", ".join(f"('{t}', '{g}')" for t, g in _TAG_DICT)}),
    toks AS (
      SELECT DISTINCT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    hits AS (
      SELECT DISTINCT doc_id, tag FROM toks JOIN dict USING (term)
    )
    SELECT doc_id,
           string_agg(tag, ',' ORDER BY tag) AS tags,
           CAST(count(*) AS INT) AS n_tags
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
    survey_ops="text-tagging(ext),D6,C1",
    tables=("documents",),
)
def text_keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based document tagging (taxonomy annotation — the
    set-oriented form of gazetteer/keyword matching): distinct tokens
    equi-joined against a BROADCAST term->tag dictionary, distinct tags
    collected per doc. At 100 TB the dictionary is the only broadcast
    state and the join replaces any per-doc regex scan over the full
    dictionary; collected sets are sorted and joined to one string for
    cross-engine hash stability."""
    d = spark.table("documents")
    dict_df = F.broadcast(
        spark.createDataFrame(_TAG_DICT, ["term", "tag"])
    )
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(word_tokens(F.col("text")))).alias("term")
    )
    hits = toks.join(dict_df, "term").select("doc_id", "tag").distinct()
    return (
        hits.groupBy("doc_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("tag"))).alias("tags"),
            F.count("*").cast("int").alias("n_tags"),
        )
        .orderBy("doc_id")
    )


# --- BPE tokenizer: distributed trainer + subword application ---------------
#
# The scale-correct BPE shape (Sennrich et al. 2016, as production trainers
# implement it): ONE corpus-wide pass builds the (word, freq) vocabulary
# table, after which every merge round runs on vocabulary-sized state —
# training cost is independent of corpus size beyond that first groupBy.
# Each word is represented as a "(tok)(tok)...(tok)($)" string ('$' = the
# end-of-word marker; word tokens are [a-z0-9']+ runs, so '(' ')' '$' can
# never appear inside a token). Wrapping every token in parens makes a
# merge application a plain literal replace('(l)(r)' -> '(lr)') that is
# EXACT: adjacent occurrences share no characters (each token's delimiters
# belong to itself alone), so both engines' left-to-right non-overlapping
# replace semantics coincide with BPE's greedy leftmost merge — and a pair
# pattern can only match at true token boundaries, never inside a longer
# token. Each round: pair counts via a per-word array expression (zero
# shuffle) + one map-side-combinable groupBy, a 1-row TakeOrdered argmax
# (count desc, then pair string asc — space sorts below every token char,
# so string order == (left, right) tuple order), then the narrow replace.
# The driver holds only the K-row merge table — same bounded-state budget
# as the k-means centroids. The DuckDB oracle unrolls the K rounds with
# scalar-subquery argmaxes: every count is an integer, every state a
# string, so cross-engine equality is exact.
_BPE_ROUNDS = 8


def _bpe_rounds_sql(n_rounds: int = _BPE_ROUNDS) -> str:
    """WITH-clause prefix shared by the train/apply oracles: words ->
    rep0 -> (pairs{r}, best{r}, rep{r+1}) per unrolled merge round."""
    parts = [f"""
    WITH words AS MATERIALIZED (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
      GROUP BY w
    ),
    rep0 AS MATERIALIZED (
      SELECT w, freq,
             regexp_replace(w, '(.)', '(\\1)', 'g') || '($)' AS rep
      FROM words
    )"""]
    for r in range(n_rounds):
        parts.append(f""",
    pairs{r} AS MATERIALIZED (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT freq, unnest(list_transform(
                 generate_series(1, len(ts) - 1),
                 i -> ts[i] || ' ' || ts[i + 1])) AS pair
        FROM (SELECT freq,
                     string_split(substring(rep, 2, length(rep) - 2),
                                  ')(') AS ts
              FROM rep{r})
      ) GROUP BY pair
    ),
    best{r} AS MATERIALIZED (
      SELECT split_part(pair, ' ', 1) AS lt,
             split_part(pair, ' ', 2) AS rt, n
      FROM pairs{r} ORDER BY n DESC, pair LIMIT 1
    ),
    rep{r + 1} AS MATERIALIZED (
      SELECT w, freq,
             replace(rep,
                     '(' || (SELECT lt FROM best{r}) || ')(' ||
                       (SELECT rt FROM best{r}) || ')',
                     '(' || (SELECT lt FROM best{r}) ||
                       (SELECT rt FROM best{r}) || ')') AS rep
      FROM rep{r}
    )""")
    return "".join(parts)


def _bpe_train_final_sql(n_rounds: int = _BPE_ROUNDS) -> str:
    rows = "\n      UNION ALL\n      ".join(
        f"""SELECT CAST({r + 1} AS INTEGER) AS merge_round,
             (SELECT lt FROM best{r}) AS left_tok,
             (SELECT rt FROM best{r}) AS right_tok,
             CAST((SELECT n FROM best{r}) AS BIGINT) AS pair_count,
             (SELECT CAST(sum(freq * (length(rep)
                        - length(replace(rep, '(', '')))) AS BIGINT)
              FROM rep{r + 1}) AS corpus_tokens"""
        for r in range(n_rounds)
    )
    return f"""
    SELECT * FROM (
      {rows}
    ) ORDER BY merge_round"""


def _bpe_merge_loop(spark: SparkSession):
    """Run the K-round BPE trainer; returns (per-round merge rows, final
    vocabulary state with the fully-merged rep column)."""
    d = spark.table("documents")
    state = (
        d.select(F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
        .select(
            "w", "freq",
            F.concat(
                F.regexp_replace(F.col("w"), "(.)", "($1)"), F.lit("($)")
            ).alias("rep"),
        )
        .cache()
    )
    rows = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        ts = F.split(F.expr("substring(rep, 2, length(rep) - 2)"), r"\)\(")
        pairs = (
            state.select("freq", ts.alias("ts"))
            # fully-merged single-token words have no pairs; without the
            # guard sequence(0, -1) would DESCEND and index out of bounds
            .filter(F.size("ts") >= 2)
            .select("freq", F.explode(F.expr(
                "transform(sequence(0, size(ts) - 2),"
                " i -> concat(ts[i], ' ', ts[i + 1]))")).alias("pair"))
            .groupBy("pair").agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("pair")).limit(1).collect()
        if not top:  # pragma: no cover — chars+EOW always yield pairs
            break
        lt, rt = top[0]["pair"].split(" ")
        state = state.withColumn(
            "rep",
            F.replace(
                F.col("rep"), F.lit(f"({lt})({rt})"), F.lit(f"({lt}{rt})")
            ),
        )
        tokens_after = state.select(
            F.sum(
                F.col("freq") * (
                    F.length("rep")
                    - F.length(F.replace(F.col("rep"), F.lit("("), F.lit("")))
                )
            ).alias("t")
        ).collect()[0]["t"]
        rows.append((rnd, lt, rt, int(top[0]["n"]), int(tokens_after)))
    return rows, state


@query(
    "text_bpe_train",
    sql=_bpe_rounds_sql() + _bpe_train_final_sql(),
    survey_ops="text-bpe(ext),D2,F2",
    tables=("documents",),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING — the full loop whose inner
    statistic text_bpe_pair_counts exposes: per round, count adjacent
    token pairs over the vocabulary (weighted by word frequency), merge
    the argmax pair everywhere, repeat. Output is the learned merge
    table: (merge_round, left_tok, right_tok, pair_count, corpus_tokens
    after the merge) — the compression curve of the tokenizer. State is
    vocabulary-sized from round 1 on (the header comment has the scale
    argument and the paren-wrapping exactness proof); the K-row merge
    table is the only driver-side result, like the k-means centroids."""
    rows, _ = _bpe_merge_loop(spark)
    return spark.createDataFrame(
        rows,
        "merge_round int, left_tok string, right_tok string, "
        "pair_count bigint, corpus_tokens bigint",
    ).orderBy("merge_round")


@query(
    "text_bpe_subword_stats",
    sql=_bpe_rounds_sql() + f""",
    docw AS MATERIALIZED (
      SELECT source, unnest({_TOKENS}) AS w FROM documents
    ),
    j AS MATERIALIZED (
      SELECT d.source, r.rep FROM docw d JOIN rep{_BPE_ROUNDS} r ON d.w = r.w
    ),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(length(rep) - length(replace(rep, '(', '')))
                  AS BIGINT) AS subword_tokens
      FROM j GROUP BY source
    ),
    dv AS (
      SELECT source, CAST(count(DISTINCT t) AS BIGINT) AS distinct_subwords
      FROM (
        SELECT source,
               unnest(string_split(substring(rep, 2, length(rep) - 2),
                                   ')(')) AS t
        FROM j
      ) GROUP BY source
    )
    SELECT a.source, a.n_words, a.subword_tokens,
           CAST(round(a.subword_tokens / CAST(a.n_words AS DOUBLE), 6)
                AS DOUBLE) AS subwords_per_word,
           dv.distinct_subwords
    FROM agg a JOIN dv USING (source)
    ORDER BY source
    """,
    survey_ops="text-bpe(ext),C1,D3",
    tables=("documents",),
)
def text_bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained BPE to the corpus: per source, words are joined
    to the broadcast vocabulary->subword table (the set-oriented form of
    running a tokenizer — each distinct word is segmented once, not per
    occurrence) and rolled up into subword-token totals, tokens-per-word,
    and the distinct subword inventory. The join is broadcast (vocabulary
    -sized build side); everything after is one shuffle per aggregate.
    Token counts derive from the rep string (count of '(' delimiters), so
    the oracle replays them exactly."""
    _, state = _bpe_merge_loop(spark)
    docw = spark.table("documents").select(
        "source", F.explode(word_tokens(F.col("text"))).alias("w")
    )
    j = docw.join(F.broadcast(state.select("w", "rep")), "w")
    tok_n = F.length("rep") - F.length(
        F.replace(F.col("rep"), F.lit("("), F.lit(""))
    )
    agg = j.groupBy("source").agg(
        F.count("*").alias("n_words"),
        F.sum(tok_n).alias("subword_tokens"),
    )
    ts = F.split(F.expr("substring(rep, 2, length(rep) - 2)"), r"\)\(")
    dv = (
        j.select("source", F.explode(ts).alias("t")).distinct()
        .groupBy("source").agg(F.count("*").alias("distinct_subwords"))
    )
    return (
        agg.join(dv, "source")
        .select(
            "source",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("subword_tokens").cast("long").alias("subword_tokens"),
            F.round(
                F.col("subword_tokens") / F.col("n_words"), 6
            ).alias("subwords_per_word"),
            F.col("distinct_subwords").cast("long").alias("distinct_subwords"),
        )
        .orderBy("source")
    )


# --- TextRank keyword extraction ---------------------------------------------
def _textrank_sql() -> str:
    from esco_neo4j_spark.plans.graph_queries import (
        _pagerank_weighted_unrolled_sql,
    )

    prefix = f"""tp AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i + 1])) AS p
      FROM (SELECT {_TOKENS} AS ws FROM documents)
    ),
    cooc AS MATERIALIZED (
      SELECT least(split_part(p, ' ', 1), split_part(p, ' ', 2)) AS a,
             greatest(split_part(p, ' ', 1), split_part(p, ' ', 2)) AS b,
             CAST(count(*) AS BIGINT) AS w
      FROM tp
      WHERE split_part(p, ' ', 1) <> split_part(p, ' ', 2)
      GROUP BY 1, 2
    ),
    """
    edges = """
      SELECT a AS src, b AS dst, w FROM cooc
      UNION ALL
      SELECT b AS src, a AS dst, w FROM cooc
    """
    final = """
    SELECT id AS word, r AS rank_units,
           CAST(round(r / 1000000000.0, 6) AS DOUBLE) AS rank
    FROM r10 ORDER BY r DESC, id LIMIT 20"""
    return _pagerank_weighted_unrolled_sql(
        with_prefix=prefix, edges_sql=edges, final_sql=final
    )


@query(
    "text_textrank_keywords",
    sql=_textrank_sql(),
    survey_ops="text-keywords(ext),K4-adjacent,C1,D2",
    tables=("documents",),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph (adjacent-token pairs, undirected,
    count-weighted) — corpus-level salient terms that plain frequency
    confuses with stopword-adjacent noise. Composes two proven pieces:
    the co-occurrence edge build is the text_bpe_pair_counts shape
    (per-row array expression + one combinable groupBy, vocabulary-sized
    output), and the ranking is pagerank_weighted_fixedpoint — integer
    rank units, bit-identical at any parallelism, so the full chain
    (graph build -> 10 iterations -> top-20) is value-oracled through the
    parameterized unrolled-SQL builder it shares with
    graph_pagerank_weighted."""
    from esco_neo4j_spark.operators.graph import pagerank_weighted_fixedpoint

    d = spark.table("documents")
    ws = word_tokens(F.col("text"))
    pairs = (
        d.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(0, size(ws) - 2),"
            " i -> struct(ws[i] as x, ws[i + 1] as y))")).alias("p"))
        .filter(F.col("p.x") != F.col("p.y"))
    )
    from esco_neo4j_spark.operators.graph import _checkpoint

    # checkpoint the vocabulary-sized co-occurrence table: pagerank's
    # setup consumes the edge frame three times (vertices, out-weight
    # sums, edge join) and each evaluation would re-run the corpus-wide
    # pair explode otherwise
    cooc = _checkpoint(
        pairs.select(
            F.least("p.x", "p.y").alias("a"),
            F.greatest("p.x", "p.y").alias("b"),
        )
        .groupBy("a", "b").agg(F.count("*").alias("w"))
    )
    edges = cooc.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).union(
        cooc.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    pr = pagerank_weighted_fixedpoint(edges, weight_col="w", num_iter=10)
    return (
        pr.select(
            F.col("id").alias("word"),
            F.col("rank_units"),
            F.round(F.col("rank_units") / 1e9, 6).alias("rank"),
        )
        .orderBy(F.desc("rank_units"), F.asc("word"))
        .limit(20)
    )


@query(
    "pipeline_mixture_reweight",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n_total FROM toks),
    per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(round(
               sum(CAST(round(-ln(cnt::DOUBLE / n_total::DOUBLE) * 1000000)
                        AS BIGINT)) * 1.0 / count(*)) AS BIGINT)
               AS avg_micro_nats
      FROM toks JOIN tf USING (term) CROSS JOIN n
      GROUP BY source
    ),
    tot AS (SELECT sum(avg_micro_nats) AS denom FROM per_src)
    SELECT p.source, p.n_tokens, p.avg_micro_nats,
           CAST(round(p.avg_micro_nats * 1.0 / t.denom, 6) AS DOUBLE)
             AS mix_weight,
           CAST((p.avg_micro_nats * 1000000) // t.denom AS BIGINT)
             AS tokens_per_million
    FROM per_src p CROSS JOIN tot t
    ORDER BY p.source
    """,
    survey_ops="text-lm-quality(ext),D8,H(ext)",
    tables=("documents",),
)
def pipeline_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #7 — DoReMi-flavored MIXTURE REWEIGHTING: upweight
    training domains in proportion to their excess loss. The per-source
    loss proxy is average unigram surprisal (text_unigram_logprob's
    integer micro-nat machinery, so every sum is order-free); weights are
    the surprisal shares (one double division per source against an
    INTEGER denominator — no order-sensitive float sum anywhere), plus an
    exact integer tokens_per_million allocation for a budgeted sampler
    (floor division, so allocations never oversubscribe the budget). At
    100 TB: one corpus pass + vocabulary broadcast + a |sources|-row
    rollup — the mixture table is driver-sized by construction."""
    d = spark.table("documents")
    toks = d.select(
        "source", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("n_total"))
    micro = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
        * 1_000_000
    ).cast("bigint")
    per_src = (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum(micro) * 1.0 / F.count("*")).cast("bigint")
            .alias("avg_micro_nats"),
        )
    )
    denom = per_src.agg(F.sum("avg_micro_nats").alias("denom"))
    return (
        per_src.crossJoin(F.broadcast(denom))
        .select(
            "source", "n_tokens", "avg_micro_nats",
            F.round(F.col("avg_micro_nats") * 1.0 / F.col("denom"), 6)
            .alias("mix_weight"),
            F.expr("(avg_micro_nats * 1000000) div denom")
            .alias("tokens_per_million"),
        )
        .orderBy("source")
    )


def _temperature_mix_sql() -> str:
    return """
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE lang IS NOT NULL GROUP BY lang
    ),
    nmin AS (SELECT min(n_docs) AS n_min FROM counts),
    rates AS (
      SELECT lang, n_docs,
             CAST(floor(1000000.0
                        * sqrt(CAST(n_min AS DOUBLE) / n_docs))
                  AS BIGINT) AS rate_ppm
      FROM counts CROSS JOIN nmin
    ),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN rates r USING (lang)
      WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
            % 1000000 < r.rate_ppm
    )
    SELECT r.lang, r.n_docs, r.rate_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r
    LEFT JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang) k
      USING (lang)
    ORDER BY r.lang
    """


@query(
    "pipeline_temperature_mix",
    sql=_temperature_mix_sql(),
    survey_ops="pipeline-mixing(ext),D2",
    tables=("documents",),
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling (the mBERT/XLM-R mixing
    recipe, alpha = 0.5) over the corpus language tags: sample each
    language at a rate proportional to p^(alpha-1), normalized so the
    RAREST language keeps everything — r_lang = sqrt(n_min / n_lang),
    with N cancelling so the rate is a pure ratio of exact integer
    counts. The per-ppm rate floors to an integer (identical IEEE
    sqrt/divide/floor on both engines) and the keep decision is the
    md5-bucket coin the stratified mixer uses, so the whole pipeline —
    counts, DATA-DERIVED rates, sampling, rollup — is value-oracled
    (the third mixing family next to fixed-rate stratification and
    DoReMi reweighting; on this corpus the head language samples at
    ~54% and the tail languages at 93-100%).

    Scale shape: the rate table is (languages)-sized and broadcast back
    onto the scan; sampling is a filter; the only shuffles are two
    language-keyed partial aggs."""
    d = spark.table("documents").filter(F.col("lang").isNotNull()).select(
        "doc_id", "lang"
    )
    counts = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    nmin = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "lang",
        "n_docs",
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
        ).cast("bigint").alias("rate_ppm"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10
        ).cast("bigint")
        % 1000000
    )
    kept = d.join(F.broadcast(rates), "lang").filter(
        bucket < F.col("rate_ppm")
    )
    kc = kept.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_kept"))
    return (
        rates.join(kc, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "rate_ppm",
            F.coalesce(F.col("n_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_length_buckets",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9'']+'), x -> x <> '')) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, n,
             CASE WHEN n <= 1 THEN 0
                  ELSE CAST(ceil(log2(CAST(n AS DOUBLE))) AS INT)
             END AS bucket
      FROM toks
    ),
    agg AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(max(n) AS BIGINT) AS max_len,
             CAST(sum(n) AS BIGINT) AS sum_tokens
      FROM b GROUP BY bucket
    )
    SELECT bucket, n_docs, max_len, sum_tokens,
           CAST(n_docs * max_len - sum_tokens AS BIGINT) AS padding_waste,
           CAST(round(CAST(n_docs * max_len - sum_tokens AS DOUBLE)
                      / (n_docs * max_len), 6) AS DOUBLE) AS waste_ratio
    FROM agg ORDER BY bucket
    """,
    survey_ops="pipeline-batching(ext),D2",
    tables=("documents",),
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report — the padding-efficiency pass a
    training pipeline runs before building batches: bucket documents by
    power-of-two token-length bands (pad-to-bucket-max is the standard
    batching contract) and report each bucket's document count, padded
    length, real tokens, and padding waste. Everything is exact integer
    arithmetic off the token counts, so the whole report is
    value-oracled; the waste_ratio column is what justifies (or not)
    adding more buckets. One groupBy with map-side partials — the
    report is O(log(max_len)) rows at any corpus size."""
    toks = spark.table("documents").filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(word_tokens(F.col("text"))).alias("n")
    )
    bucket = F.when(F.col("n") <= 1, F.lit(0)).otherwise(
        F.ceil(F.log2(F.col("n").cast("double"))).cast("int")
    )
    agg = (
        toks.select(bucket.alias("bucket"), "n")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n").cast("bigint").alias("max_len"),
            F.sum("n").cast("bigint").alias("sum_tokens"),
        )
    )
    waste = F.col("n_docs") * F.col("max_len") - F.col("sum_tokens")
    return agg.select(
        "bucket",
        "n_docs",
        "max_len",
        "sum_tokens",
        waste.cast("bigint").alias("padding_waste"),
        F.round(
            waste.cast("double") / (F.col("n_docs") * F.col("max_len")), 6
        ).alias("waste_ratio"),
    ).orderBy("bucket")


@query(
    "pipeline_dataset_card",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang, text,
             len(list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                 '[^a-z0-9'']+'), x -> x <> '')) AS n
      FROM documents
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             CAST(count(DISTINCT md5(coalesce(text, ''))) AS BIGINT)
               AS n_distinct
      FROM toks
    ),
    med AS (
      SELECT n AS median_tokens FROM (
        SELECT n, row_number() OVER (ORDER BY n, doc_id) AS rk,
               count(*) OVER () AS cnt
        FROM toks)
      WHERE rk = CAST(ceil(cnt / 2.0) AS BIGINT)
    )
    SELECT metric, CAST(value AS DOUBLE) AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM base
      UNION ALL SELECT 'total_tokens', total_tokens FROM base
      UNION ALL SELECT 'mean_tokens',
        round(CAST(total_tokens AS DOUBLE) / n_docs, 6) FROM base
      UNION ALL SELECT 'median_tokens', median_tokens FROM med
      UNION ALL SELECT 'share_en',
        round(CAST(n_en AS DOUBLE) / n_docs, 6) FROM base
      UNION ALL SELECT 'empty_docs', n_empty FROM base
      UNION ALL SELECT 'exact_dup_rate',
        round(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 6) FROM base
    ) ORDER BY metric
    """,
    survey_ops="pipeline-datasheet(ext),D1,D5",
    tables=("documents",),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card — the datasheet a released training corpus ships
    with, computed as ONE query: document and token totals, exact median
    document length (rank statistic over integer counts — no
    approximation), language share, empty-document count, and the exact
    duplicate rate (1 - distinct md5(text) / docs). Every metric is
    integer arithmetic or one rounded ratio of exact integers, so the
    whole card is value-oracled. Shuffles: one global agg with map-side
    partials, one sort for the median rank — both bounded; at 100 TB
    the median moves to the two-pass exact-quantile recipe
    (ext_exact_quantiles_twopass) and everything else is unchanged."""
    from pyspark.sql import Window

    toks = spark.table("documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(word_tokens(F.coalesce(F.col("text"), F.lit("")))).alias("n"),
    )
    base = toks.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_empty"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
        F.countDistinct(F.md5(F.coalesce(F.col("text"), F.lit(""))))
        .cast("bigint")
        .alias("n_distinct"),
    )
    w = Window.orderBy("n", "doc_id")
    med = (
        toks.withColumn("rk", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(Window.partitionBy()))
        .filter(
            F.col("rk")
            == F.ceil(F.col("cnt") / F.lit(2.0)).cast("bigint")
        )
        .select(F.col("n").alias("median_tokens"))
    )
    def row(metric, value):
        return F.struct(
            F.lit(metric).alias("metric"),
            value.cast("double").alias("value"),
        )

    card = base.crossJoin(F.broadcast(med)).select(
        F.explode(
            F.array(
                row("n_docs", F.col("n_docs")),
                row("total_tokens", F.col("total_tokens")),
                row(
                    "mean_tokens",
                    F.round(
                        F.col("total_tokens").cast("double")
                        / F.col("n_docs"),
                        6,
                    ),
                ),
                row("median_tokens", F.col("median_tokens")),
                row(
                    "share_en",
                    F.round(
                        F.col("n_en").cast("double") / F.col("n_docs"), 6
                    ),
                ),
                row("empty_docs", F.col("n_empty")),
                row(
                    "exact_dup_rate",
                    F.round(
                        F.lit(1.0)
                        - F.col("n_distinct").cast("double")
                        / F.col("n_docs"),
                        6,
                    ),
                ),
            )
        ).alias("r")
    )
    return card.select("r.metric", "r.value").orderBy("metric")
