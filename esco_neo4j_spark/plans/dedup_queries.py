"""Deduplication query corpus (north-star LLM-pipeline operators).

Every hash here is md5-derived integer arithmetic, so the DuckDB oracle
reproduces Spark's results exactly — including the MinHash signatures and
the banded-LSH candidate generation (see operators/dedup.py). The SimHash
banded query is deliberately oracle-checked against a BRUTE-FORCE SQL
computation of the same fingerprints: for hamming <= 3 with 4x15-bit bands
the banding is lossless (pigeonhole), so the scale path must return exactly
the brute-force answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esco_neo4j_spark.functions.vector import cosine_similarity
from esco_neo4j_spark.operators.dedup import (
    MINHASH_PRIME,
    embedding_neardup_pairs,
    SIMHASH_BITS,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_pairs_banded,
)
from esco_neo4j_spark.plans.registry import query

# --- shared SQL fragments (mirror functions/text.py + operators/dedup.py) --
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), "
    "x -> x <> '')"
)
# word-3 shingles (Broder); docs under 3 words -> one whole-text shingle
_SHINGLES = f"""
  CASE WHEN len({_WORDS}) < 3 THEN [array_to_string({_WORDS}, ' ')]
       ELSE list_distinct(list_transform(
              generate_series(1, len({_WORDS}) - 2),
              i -> {_WORDS}[i] || ' ' || {_WORDS}[i+1] || ' ' || {_WORDS}[i+2]))
  END
"""
_TOKENS = (
    "list_distinct(list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> ''))"
)
_H28 = "(('0x' || substr(md5(s), 1, 7))::BIGINT)"
_TOKENS_ALL_RAW = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), "
    "x -> x <> '')"
)
_H60 = "(('0x' || substr(md5(t), 1, 15))::BIGINT)"


@query(
    "dedup_exact",
    sql=f"""
    SELECT md5({_NORM}) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents
    GROUP BY 1
    ORDER BY text_hash
    """,
    survey_ops="A3,B12,dedup-exact",
    tables=("documents",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash — one shuffle on the hash
    (generalizes reference src/esco_ingest.py:145 key-dedup)."""
    return exact_dedup(spark.table("documents"), "text", "doc_id").orderBy(
        "text_hash"
    )


def _minhash_sig_sql(num_hashes: int) -> str:
    terms = ", ".join(
        f"list_min(list_transform(hs, h -> (({2 * i + 1}) * h + {7919 * i + 1}) "
        f"% {MINHASH_PRIME}))"
        for i in range(num_hashes)
    )
    return f"[{terms}]"


# CTE chain shared by the pair query and the canonical-docs rollup
_MINHASH_CTES = f"""
    sh AS (
      SELECT doc_id AS id, {_SHINGLES} AS sh FROM documents
    ),
    hashed AS (
      SELECT id, sh, list_transform(sh, s -> {_H28}) AS hs FROM sh
    ),
    sigs AS (
      SELECT id, sh, {_minhash_sig_sql(16)} AS sig FROM hashed
    ),
    banded AS (
      SELECT id, b.band_id, b.band_key FROM sigs,
        LATERAL (
          SELECT unnest(generate_series(0, 3)) AS band_id,
                 unnest([
                   sig[1]||'-'||sig[2]||'-'||sig[3]||'-'||sig[4],
                   sig[5]||'-'||sig[6]||'-'||sig[7]||'-'||sig[8],
                   sig[9]||'-'||sig[10]||'-'||sig[11]||'-'||sig[12],
                   sig[13]||'-'||sig[14]||'-'||sig[15]||'-'||sig[16]
                 ]) AS band_key
        ) b
      QUALIFY count(*) OVER (PARTITION BY b.band_id, b.band_key) <= 64
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.id < b.id
    )
"""

_MINHASH_PAIRS_SELECT = """
    SELECT c.id_a, c.id_b,
           CAST(round(len(list_intersect(x.sh, y.sh))::DOUBLE /
                (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
             AS DOUBLE) AS jaccard
    FROM cands c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
    WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
          (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) >= 0.5
"""

_MINHASH_SQL = f"""
    WITH {_MINHASH_CTES}
    {_MINHASH_PAIRS_SELECT}
    ORDER BY id_a, id_b
"""


@query(
    "dedup_minhash_lsh",
    sql=_MINHASH_SQL,
    survey_ops="dedup-minhash,A7(scale)",
    bench=True,
    tables=("documents",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4-band LSH candidates (bucket cap 64) + exact-Jaccard
    verify >= 0.5, over word-3 shingles. The oracle reproduces the identical
    signatures, banding, and bucket cap, so the approximate pipeline itself
    is correctness-checked, not just sampled."""
    return minhash_dedup_pairs(
        spark.table("documents"), "text", "doc_id",
        threshold=0.5, num_hashes=16, bands=4,
    ).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH sh AS (SELECT doc_id AS id, {_SHINGLES} AS sh FROM documents)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
             AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.7
    ORDER BY id_a, id_b
    """,
    survey_ops="dedup-jaccard",
    tables=("documents",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs >= 0.7 via inverted-index join (no
    cross join: pairs sharing no shingle never meet — the scalable exact
    path). The brute-force SQL oracle must agree exactly."""
    return ngram_jaccard_pairs(
        spark.table("documents"), "text", "doc_id", threshold=0.7
    ).orderBy("id_a", "id_b")


def _simhash_sql(max_hamming: int, id_cap: int | None = None) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fp_terms = " + ".join(
        f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(SIMHASH_BITS)
    )
    cap = f" WHERE doc_id < {id_cap}" if id_cap is not None else ""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS t FROM documents{cap}
    ),
    h AS (SELECT doc_id, {_H60} AS hv FROM toks),
    bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, {fp_terms} AS simhash FROM bits)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY id_a, id_b
    """


@query(
    "dedup_simhash",
    sql=_simhash_sql(10, id_cap=4096),
    survey_ops="dedup-simhash",
    tables=("documents",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force SimHash pairs with hamming <= 10 (60-bit md5-derived
    fingerprint over distinct word tokens) on a FIXED calibration window
    (doc_id < 4096): the ground truth that prices the banded variant's
    band count (hamming<=3 lossless banding) on a bounded sample. The id
    cap makes the all-pairs hamming join CONSTANT cost in corpus size —
    the production plan at any scale is dedup_simhash_banded."""
    docs = spark.table("documents").filter(F.col("doc_id") < 4096)
    df = simhash_pairs(docs, "text", "doc_id", max_hamming=10)
    return df.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("id_a", "id_b")


@query(
    "dedup_simhash_banded",
    sql=_simhash_sql(3),
    survey_ops="dedup-simhash,A7(scale)",
    tables=("documents",),
)
def dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash join (4x15-bit bands): for hamming <= 3 the banding
    is LOSSLESS, so this scale-path plan is oracle-checked against the
    brute-force SQL — same fingerprints, same pairs, zero recall loss."""
    df = simhash_pairs_banded(
        spark.table("documents"), "text", "doc_id", max_hamming=3
    )
    return df.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("id_a", "id_b")


def _simhash_canonical_sql(max_hamming: int = 3, rounds: int = 4) -> str:
    """Unrolled replay of simhash_leader_clusters: identical
    fingerprints (the explode/group formulation), then per round the
    identical bucket min-election, <= 4-leader hamming verify, smallest
    qualifying leader, self-elected-leaders-only acceptance, and
    anti-join shrink of the remaining set."""
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fp_terms = " + ".join(
        f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(SIMHASH_BITS)
    )
    # every round CTE is referenced more than once (band by the
    # min-election subquery AND the candidate join, best by the
    # self-leader self-join, rem by the next round) — DuckDB 1.0
    # INLINES CTEs at each reference, so without MATERIALIZED the
    # fingerprint subtree re-evaluates exponentially across the
    # unrolled rounds (measured: >120s at sf0.001 inlined, ~1s
    # materialized; Spark pins the same frontiers via localCheckpoint)
    ctes = [
        f"""toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
    ),
    h AS (SELECT doc_id, {_H60} AS hv FROM toks),
    bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
    rem0 AS MATERIALIZED (
      SELECT doc_id AS id, {fp_terms} AS simhash FROM bits)"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""band{r} AS MATERIALIZED (
      SELECT id, simhash, b.band_id,
             (simhash >> (15 * b.band_id)) & 32767 AS band_bits
      FROM rem{r} CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
    ),
    best{r} AS MATERIALIZED (
      SELECT c.id, min(c.lead_id) AS best_lead FROM (
        SELECT DISTINCT t.id, t.simhash, l.lead_id
        FROM band{r} t
        JOIN (SELECT band_id, band_bits, min(id) AS lead_id
              FROM band{r} GROUP BY 1, 2) l
          USING (band_id, band_bits)) c
      JOIN rem{r} lf ON lf.id = c.lead_id
      WHERE bit_count(xor(c.simhash, lf.simhash)) <= {max_hamming}
      GROUP BY c.id
    ),
    asg{r} AS MATERIALIZED (
      SELECT b.id, b.best_lead AS canonical_id
      FROM best{r} b
      JOIN best{r} s ON s.id = b.best_lead AND s.best_lead = s.id
    ),
    rem{r + 1} AS MATERIALIZED (
      SELECT r.id, r.simhash FROM rem{r} r
      ANTI JOIN asg{r} a ON a.id = r.id
    )"""
        )
    unions = "\n      UNION ALL ".join(
        f"SELECT id, canonical_id FROM asg{r}" for r in range(rounds)
    )
    ctes.append(
        f"""assigned AS (
      {unions}
      UNION ALL SELECT id, id AS canonical_id FROM rem{rounds}
    )"""
    )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT d.doc_id,
           CAST(coalesce(a.canonical_id, d.doc_id) AS BIGINT)
             AS canonical_id,
           (coalesce(a.canonical_id, d.doc_id) <> d.doc_id) AS is_duplicate
    FROM documents d LEFT JOIN assigned a ON a.id = d.doc_id
    ORDER BY d.doc_id
    """


@query(
    "dedup_simhash_canonical",
    sql=_simhash_canonical_sql(),
    survey_ops="dedup-simhash,dedup-canonical,A7(scale)",
    tables=("documents",),
)
def dedup_simhash_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION SimHash dedup output (r9, r8 verdict item 2): ONE
    (doc_id, canonical_id, is_duplicate) row per document — O(N) output
    — via iterative min-id leader election over the band buckets, never
    materializing the Ω(true pairs) list the calibration twins
    (dedup_simhash / dedup_simhash_banded) emit by spec (542.6M rows on
    the near-all-duplicate sf10 corpus). Every duplicate's canonical is
    a KEPT doc within hamming <= 3 of it — the star guarantee — with
    greedy-star (not transitive-closure) cluster semantics, documented
    on the operator (simhash_leader_clusters); docs without a single
    word token pass through self-canonical, like dedup_canonical_docs.
    The oracle unrolls the identical fixed-round recursion."""
    from esco_neo4j_spark.operators.dedup import simhash_leader_clusters

    docs = spark.table("documents")
    asg = simhash_leader_clusters(
        docs, "text", "doc_id", max_hamming=3, rounds=4
    )
    return (
        docs.select("doc_id")
        .join(asg, docs["doc_id"] == asg["id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("canonical_id"), F.col("doc_id"))
            .cast("bigint")
            .alias("canonical_id"),
            (
                F.coalesce(F.col("canonical_id"), F.col("doc_id"))
                != F.col("doc_id")
            ).alias("is_duplicate"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_embedding_cosine",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_ALL_RAW}) AS t
      FROM documents WHERE doc_id < 4096
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 7))::BIGINT AS h FROM tok
    ),
    contrib AS (
      SELECT doc_id, h % 128 AS bucket,
             CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END AS sgn
      FROM hashed
    ),
    buckets AS (
      SELECT doc_id, bucket, CAST(sum(sgn) AS DOUBLE) AS val
      FROM contrib GROUP BY 1, 2 HAVING sum(sgn) <> 0
    ),
    norms AS (
      SELECT doc_id, sqrt(sum(val * val)) AS nrm FROM buckets GROUP BY 1
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.val * b.val) AS dot
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(round(dot / (na.nrm * nb.nrm), 6) AS DOUBLE) AS score
    FROM dots
    JOIN norms na ON id_a = na.doc_id
    JOIN norms nb ON id_b = nb.doc_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.9
    ORDER BY id_a, id_b
    """,
    survey_ops="dedup-embedding,C9,I1",
    tables=("documents",),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (>= 0.9) over 128-dim hash
    embeddings from the model-UDF pipeline, on a FIXED calibration window
    (doc_id < 4096). The inverted-index join is exact and avoids a cross
    join, but on DENSE vectors nearly every doc posts to every bucket, so
    its cost is O(N^2 * dim) in disguise — the sf1 scale audit measured
    the cliff at ~50k docs. The id bound makes the exact query constant
    cost at any corpus size (the ground truth that calibrates the
    bucketed paths); the production-scale semantic near-dup is
    dedup_semantic_bucketed (SemDeDup cells) / the LSH family."""
    return embedding_neardup_pairs(
        spark.table("documents").filter(F.col("doc_id") < 4096),
        "text", "doc_id", threshold=0.9, dim=128,
    ).orderBy("id_a", "id_b")


@query(
    "dedup_canonical_docs",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs AS ({_MINHASH_PAIRS_SELECT}),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    -- transitive closure over the (sparse) near-dup pair graph; UNION
    -- dedups rows so this is linear in reachable pairs, and dup clusters
    -- are tiny by construction
    walk AS (
      SELECT src AS id, dst AS reach FROM und
      UNION
      SELECT w.id, u.dst FROM walk w JOIN und u ON w.reach = u.src
    ),
    comp AS (
      SELECT id, least(id, min(reach)) AS comp FROM walk GROUP BY id
    )
    SELECT d.doc_id,
           CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS canonical_id,
           (coalesce(c.comp, d.doc_id) <> d.doc_id) AS is_duplicate
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ORDER BY d.doc_id
    """,
    survey_ops="dedup-canonical,K5-adjacent,C2",
    tables=("documents",),
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup CAPSTONE a training pipeline actually runs: MinHash-LSH
    near-dup pairs -> connected components over the pair graph -> keep the
    min-id doc per duplicate cluster. Composes the banded LSH join with
    the iterative hash-min CC operator; the oracle recomputes identical
    pairs and a recursive-closure min per cluster, so the whole
    composition is value-hash-checked end to end. At 100 TB the pair
    graph is orders of magnitude smaller than the corpus (only near-dups
    appear), so the CC iterations run on a tiny edge set."""
    from esco_neo4j_spark.operators.dedup import minhash_dedup_pairs
    from esco_neo4j_spark.operators.graph import connected_components

    docs = spark.table("documents")
    pairs = minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.5, num_hashes=16, bands=4
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id"))
            .cast("bigint")
            .alias("canonical_id"),
            (
                F.coalesce(F.col("component"), F.col("doc_id"))
                != F.col("doc_id")
            ).alias("is_duplicate"),
        )
        .orderBy("doc_id")
    )


# incremental variant: candidate join probes ONLY batch docs (id % 5 == 0)
_INC_CTES = _MINHASH_CTES.replace(
    "AND a.id < b.id",
    "AND a.id % 5 = 0 AND a.id <> b.id AND (b.id % 5 <> 0 OR a.id < b.id)",
)
_INC_SQL = f"""
    WITH {_INC_CTES},
    pairs AS ({_MINHASH_PAIRS_SELECT})
    SELECT id_a AS batch_id, id_b AS other_id, jaccard,
           CAST(id_b % 5 <> 0 AS BOOLEAN) AS other_is_base
    FROM pairs ORDER BY batch_id, other_id
"""


@query(
    "dedup_minhash_incremental",
    sql=_INC_SQL,
    survey_ops="dedup-incremental(ext),dedup-minhash",
    tables=("documents",),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup check: the NEW batch (docs with id % 5 == 0
    standing in for today's crawl) probed against the whole corpus via
    the same MinHash banding as dedup_minhash_lsh — batch-batch pairs
    once, batch-base pairs always, base-base pairs NEVER computed. This
    is the asymmetric join a living corpus actually runs on ingest (work
    scales with |batch| x bucket width, not |corpus|^2); the oracle
    replays identical signatures, banding, bucket cap, and the
    probe-side restriction."""
    from esco_neo4j_spark.operators.dedup import minhash_incremental_pairs

    return minhash_incremental_pairs(
        spark.table("documents"),
        "text",
        "doc_id",
        new_pred=lambda c: c % 5 == 0,
        threshold=0.5,
        num_hashes=16,
        bands=4,
    ).orderBy("batch_id", "other_id")


_CONTAIN_SQL = f"""
    WITH {_MINHASH_CTES}
    SELECT c.id_a, c.id_b,
           CAST(round(len(list_intersect(x.sh, y.sh))::DOUBLE / len(x.sh), 6)
             AS DOUBLE) AS containment_a,
           CAST(round(len(list_intersect(x.sh, y.sh))::DOUBLE / len(y.sh), 6)
             AS DOUBLE) AS containment_b
    FROM cands c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
    WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE / len(x.sh), 6) >= 0.7
       OR round(len(list_intersect(x.sh, y.sh))::DOUBLE / len(y.sh), 6) >= 0.7
    ORDER BY id_a, id_b
"""


@query(
    "dedup_containment",
    sql=_CONTAIN_SQL,
    survey_ops="dedup-containment(ext),dedup-minhash",
    tables=("documents",),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup over the same banded LSH candidates
    as dedup_minhash_lsh: |A∩B|/|A| and /|B| both scored, pair kept when
    either direction >= 0.7 — the detector for subset duplication
    (quotes, boilerplate-wrapped copies) that symmetric Jaccard
    under-scores. Single-division integer ratios; oracle replays the
    full candidate generation."""
    from esco_neo4j_spark.operators.dedup import minhash_containment_pairs

    return minhash_containment_pairs(
        spark.table("documents"), "text", "doc_id", threshold=0.7
    ).orderBy("id_a", "id_b")


_CLUSTER_SIZES_SQL = f"""
    WITH RECURSIVE {_MINHASH_CTES},
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
    sizes AS (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp)
    SELECT CAST(cluster_size AS INT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    ORDER BY cluster_size
"""


@query(
    "dedup_cluster_sizes",
    sql=_CLUSTER_SIZES_SQL,
    survey_ops="dedup-canonical,K-cc,D2",
    tables=("documents",),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: MinHash pairs -> connected
    components -> component sizes -> size distribution. THE health
    report of a dedup run — a fat tail here means boilerplate families
    or template storms (and predicts how much the canonical pass will
    remove); the per-size doc totals reconcile against the corpus count.
    CC runs on the tiny pair graph; everything downstream is
    component-table sized."""
    from esco_neo4j_spark.operators.dedup import minhash_dedup_pairs
    from esco_neo4j_spark.operators.graph import connected_components

    pairs = minhash_dedup_pairs(
        spark.table("documents"), "text", "doc_id", threshold=0.5
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy(F.col("cluster_size").cast("int").alias("cluster_size"))
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


_EST_ERROR_SQL = f"""
    WITH {_MINHASH_CTES}
    SELECT c.id_a, c.id_b,
           CAST(round(len(list_filter(generate_series(1, 16),
                          i -> x.sig[i] = y.sig[i])) / 16.0, 6) AS DOUBLE)
             AS jaccard_est,
           CAST(round(len(list_intersect(xs.sh, ys.sh))::DOUBLE /
                (len(xs.sh) + len(ys.sh) - len(list_intersect(xs.sh, ys.sh))),
                6) AS DOUBLE) AS jaccard_exact
    FROM cands c
    JOIN sigs x ON c.id_a = x.id JOIN sigs y ON c.id_b = y.id
    JOIN sh xs ON c.id_a = xs.id JOIN sh ys ON c.id_b = ys.id
    ORDER BY id_a, id_b
"""


@query(
    "dedup_minhash_est_error",
    sql=_EST_ERROR_SQL,
    survey_ops="dedup-minhash,ann-eval(ext)",
    tables=("documents",),
)
def dedup_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration report: for every LSH candidate pair, the
    signature-estimated Jaccard (matching positions / 16) next to the
    exact shingle Jaccard — the tuning table for num_hashes/bands
    decisions (estimator stderr ~ sqrt(J(1-J)/16), and a drifting gap
    here says re-tune before trusting the threshold). Like
    vec_lsh_recall_eval, the approximation is EVALUATED inside the hard
    gate: both estimate and truth replay bit-exact in SQL."""
    from esco_neo4j_spark.operators.dedup import (
        _minhash_sig_from_hashed,
        lsh_candidate_pairs,
        md5_int28,
        shingled,
    )

    d = spark.table("documents")
    sh = shingled(d, "text", "doc_id")
    hashed = sh.select("id", F.transform("sh", md5_int28).alias("hs"))
    sigs = _minhash_sig_from_hashed(hashed, 16)
    cands = lsh_candidate_pairs(sigs, 4, 4, 64)
    est = F.round(
        F.size(
            F.filter(
                F.arrays_zip(F.col("siga"), F.col("sigb")),
                lambda s: s["siga"] == s["sigb"],
            )
        )
        / 16.0,
        6,
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
    union = (
        F.size("sa") + F.size("sb")
        - F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    ).cast("double")
    return (
        cands.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("siga")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sigb")), "id_b")
        .join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            est.alias("jaccard_est"),
            F.round(inter / union, 6).alias("jaccard_exact"),
        )
        .orderBy("id_a", "id_b")
    )


def _ingest_clean_sql() -> str:
    from esco_neo4j_spark.plans.text_queries import _EMAIL_PAT, _TERM_PAT, _TOKENS

    clean_tokens = _TOKENS.replace("lower(text)", "lower(clean)")
    return f"""
    WITH {_INC_CTES},
    pairs AS ({_MINHASH_PAIRS_SELECT}),
    dup AS (SELECT DISTINCT id_a AS doc_id FROM pairs),
    scrubbed AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                            '{_TERM_PAT}', '[REDACTED]', 'g') AS clean
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT s.doc_id,
           CAST(len({clean_tokens}) AS INT) AS n_tokens,
           md5(clean) AS clean_md5
    FROM scrubbed s LEFT JOIN dup d ON s.doc_id = d.doc_id
    WHERE d.doc_id IS NULL AND len({clean_tokens}) >= 20
    ORDER BY s.doc_id
    """


@query(
    "pipeline_ingest_clean",
    sql=_ingest_clean_sql(),
    survey_ops="pipeline(ext),text-pii(ext),dedup-incremental(ext),text-quality",
    tables=("documents",),
)
def pipeline_ingest_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST capstone — what actually happens when a new crawl batch
    (docs with id % 5 == 0) lands: (1) PII scrub, (2) near-dup check
    against the ENTIRE corpus via the asymmetric incremental LSH probe,
    (3) quality gate (>= 20 tokens of the scrubbed text), emitting the
    rows an upsert (sources/merge.py) would then apply. Third capstone
    next to pipeline_training_mix (curation) and pipeline_embed_cluster
    (enrichment): every stage is an already-oracled operator and the
    COMPOSITION is value-checked end to end as one lazy plan — the
    batch scrub is a narrow map, the dedup probe scales with
    |batch| x bucket width, and the anti-join keys on batch-sized
    ids."""
    from esco_neo4j_spark.functions.text import word_tokens
    from esco_neo4j_spark.operators.dedup import minhash_incremental_pairs
    from esco_neo4j_spark.plans.text_queries import _EMAIL_PAT, _TERM_PAT

    docs = spark.table("documents")
    pairs = minhash_incremental_pairs(
        docs, "text", "doc_id", new_pred=lambda c: c % 5 == 0
    )
    dup_ids = pairs.select(F.col("batch_id").alias("doc_id")).distinct()
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "[EMAIL]"),
        _TERM_PAT,
        "[REDACTED]",
    )
    scrubbed = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", clean.alias("clean")
    )
    n_tok = F.size(word_tokens(F.col("clean")))
    return (
        scrubbed.join(dup_ids, "doc_id", "left_anti")
        .filter(n_tok >= 20)
        .select(
            "doc_id",
            n_tok.cast("int").alias("n_tokens"),
            F.md5("clean").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_simhash_hamming_hist",
    sql=f"""
    WITH pairs AS ({_simhash_sql(60)})
    SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY hamming ORDER BY hamming
    """,
    survey_ops="dedup-simhash,ann-eval(ext),D2",
    tables=("documents",),
)
def dedup_simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash calibration: the full pairwise hamming-distance
    distribution — where the near-dup threshold should sit is read
    straight off this histogram (a clean corpus shows a far-mode around
    ~30 of 60 bits with a near-dup spike at <= 3; a merged mode means
    the fingerprint is saturating and needs more bits). Like the brute
    simhash query it rides the all-pairs comparison — the CALIBRATION
    pass you run on a sample, not the corpus; the production path stays
    the lossless 4x15-bit banding. Integer XOR popcounts, 61-row
    output."""
    from esco_neo4j_spark.operators.dedup import simhash_pairs

    pairs = simhash_pairs(
        spark.table("documents"), "text", "doc_id", max_hamming=60
    )
    return (
        pairs.groupBy(F.col("hamming").cast("int").alias("hamming"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("hamming")
    )


# --- substring-level exact dedup: duplicated-span extraction ---------------
@query(
    "dedup_substring_spans",
    sql=f"""
    WITH docs AS (SELECT doc_id, {_WORDS} AS toks FROM documents),
    pos AS (
      SELECT doc_id, toks, unnest(range(len(toks) - 4)) AS pos
      FROM docs WHERE len(toks) >= 5),
    wins AS (
      SELECT doc_id, pos,
             md5(array_to_string(toks[pos + 1:pos + 5], ' ')) AS wid
      FROM pos),
    dup AS (
      SELECT wid FROM wins GROUP BY wid
      HAVING count(DISTINCT doc_id) >= 2),
    dpos AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (wid)),
    flag AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) > 5
                  THEN 1 ELSE 0 END AS gap
      FROM dpos),
    isl AS (
      SELECT doc_id, pos,
             sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flag)
    SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 4 AS INT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
    survey_ops="dedup-substring(ext),E,D2",
    tables=("documents",),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (the span-removal primitive of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" — substring-level, where the doc-level families above only
    mark whole documents): every 5-token window whose md5 appears in
    >= 2 distinct documents is a duplicated window; per doc, overlapping
    duplicated windows merge into maximal [span_start, span_end] token
    spans via gaps-and-islands. All integer positions — exact oracle.

    Scale shape: windows are built per-row (explode, no shuffle), the
    duplicate-window set is one groupBy on the md5 key (window TEXT never
    shuffles — only its 16-byte hash), and the island merge windows are
    partitioned by doc_id. The suffix-array of the paper is replaced by
    the fixed-width hashed-window inverted index — the bucketed equi-join
    shape every dedup operator here uses."""
    from pyspark.sql import Window

    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.expr(
            "filter(split(lower(text), '[^a-z0-9\\']+'), x -> x != '')"
        ).alias("toks"),
    ).filter(F.size("toks") >= 5)
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(toks) - 5), "
                "i -> md5(array_join(slice(toks, i + 1, 5), ' ')))"
            )
        ).alias("pos", "wid"),
    )
    dup = (
        wins.groupBy("wid")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wid")
    )
    dpos = wins.join(dup, "wid").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.when(
        F.col("pos") - F.lag("pos").over(w) > 5, 1
    ).otherwise(0)
    isl = dpos.withColumn(
        "island",
        F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + 4).cast("int").alias("span_end"),
            F.count("*").cast("bigint").alias("n_windows"),
        )
        .drop("island")
        .orderBy("doc_id", "span_start")
    )


# --- SemDeDup-style semantic dedup: cluster, then dedup within cluster -----
def derive_semdedup_k(
    n_rows: int, *, target_cluster: int = 256, base_k: int = 8,
    max_k: int = 1 << 20,
) -> int:
    """Scale-adaptive SemDeDup cluster count: k tracks corpus size so the
    EXPECTED cluster stays ~``target_cluster`` rows and the within-cluster
    O(N²/k) verify stays ~linear in N — the round-4 audit's fixed-k gap
    (with k=8 forever, the 512-row cap starts silently truncating
    clusters at 10×+ scale). Pure arithmetic over the parquet-metadata
    row count, so the Spark plan and the DuckDB oracle builder derive the
    IDENTICAL k. At driver correctness scales (N ≤ 2048) this returns the
    historic k=8; at sf1 (N = 20k) k=79."""
    import math

    if n_rows <= 0:
        return base_k
    return max(base_k, min(max_k, math.ceil(n_rows / target_cluster)))


def derive_semdedup_coarse(k: int, *, flat_max_k: int = 32) -> int:
    """Coarse-layer size for the two-level SemDeDup assignment: 0 (flat
    N x k assignment) while k is small, else ceil(sqrt(k)) — the r8 fix
    for the assignment stage itself re-quadratizing. With k ~ N/256 the
    flat assignment is k*N = N^2/256 cosines (the measured super-linear
    tail at 3x data); routing through m = sqrt(k) coarse centroids costs
    N*m + N*(k/m) ~= 2*N*sqrt(k) — O(N^1.5) with a tiny constant, and the
    SQL oracle builder derives the identical m from the identical k."""
    import math

    return 0 if k <= flat_max_k else math.ceil(math.sqrt(k))


def _semdedup_k(sf_dir: str) -> int:
    from esco_neo4j_spark.catalog import table_rowcount

    return derive_semdedup_k(table_rowcount(sf_dir, "embeddings"))


def _semdedup_assign_sql(k: int, m: int) -> str:
    """CTE block (c, ..., a) computing the cluster assignment — flat
    argmax for m == 0, two-level coarse->fine otherwise. Both levels
    break ties on the 6dp-rounded score to the LOWEST centroid id, same
    as the Spark plan."""
    if m == 0:
        return f"""c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {k}),
    s AS (
      SELECT v.vec_id, c.cid,
             round(list_cosine_similarity(
               CAST(v.embedding AS DOUBLE[]), c.cvec), 6) AS s
      FROM embeddings v CROSS JOIN c),
    a AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rk FROM s)
      WHERE rk = 1)"""
    return f"""c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {k}),
    co AS (
      SELECT vec_id AS mid, CAST(embedding AS DOUBLE[]) AS mvec
      FROM embeddings WHERE vec_id < {m}),
    f2c AS (
      -- cid < m pinned to its own cell (coarse set is a prefix of the
      -- fine set) so every reachable coarse cell is non-empty; mirrors
      -- the Spark plan's r9 drop-proofing pin exactly
      SELECT cid, cid AS mid FROM c WHERE cid < {m}
      UNION ALL
      SELECT cid, mid FROM (
        SELECT c.cid, co.mid, row_number() OVER (
          PARTITION BY c.cid
          ORDER BY round(list_cosine_similarity(c.cvec, co.mvec), 6)
            DESC, co.mid) AS rk
        FROM c CROSS JOIN co
        WHERE c.cid >= {m})
      WHERE rk = 1),
    v2c AS (
      SELECT vec_id, mid FROM (
        SELECT v.vec_id, co.mid, row_number() OVER (
          PARTITION BY v.vec_id
          ORDER BY round(list_cosine_similarity(
            CAST(v.embedding AS DOUBLE[]), co.mvec), 6) DESC, co.mid
          ) AS rk
        FROM embeddings v CROSS JOIN co)
      WHERE rk = 1),
    s AS (
      SELECT v.vec_id, c.cid,
             round(list_cosine_similarity(
               CAST(v.embedding AS DOUBLE[]), c.cvec), 6) AS s
      FROM embeddings v
      JOIN v2c ON v2c.vec_id = v.vec_id
      JOIN f2c ON f2c.mid = v2c.mid
      JOIN c ON c.cid = f2c.cid),
    a AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rk FROM s)
      WHERE rk = 1)"""


def _semdedup_sql(sf_dir: str) -> str:
    k = _semdedup_k(sf_dir)
    m = derive_semdedup_coarse(k)
    return f"""
    WITH {_semdedup_assign_sql(k, m)},
    capped AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster, row_number() OVER (
          PARTITION BY cluster ORDER BY vec_id) AS rnc FROM a)
      WHERE rnc <= 512),
    p AS (
      SELECT ax.cluster, x.vec_id AS id_a, y.vec_id AS id_b
      FROM embeddings x
      JOIN capped ax ON ax.vec_id = x.vec_id
      JOIN embeddings y ON x.vec_id < y.vec_id
      JOIN capped ay ON ay.vec_id = y.vec_id
      WHERE ax.cluster = ay.cluster
        AND round(list_cosine_similarity(
              CAST(x.embedding AS DOUBLE[]),
              CAST(y.embedding AS DOUBLE[])), 6) >= 0.45)
    SELECT id_b AS vec_id, CAST(cluster AS INT) AS cluster,
           CAST(min(id_a) AS BIGINT) AS canonical_id
    FROM p GROUP BY id_b, cluster ORDER BY vec_id
    """


@query(
    "dedup_semantic_bucketed",
    sql=_semdedup_sql,  # per-sf_dir builder: k derives from corpus size
    survey_ops="dedup-semantic(ext),C9,H1",
    tables=("embeddings",),
)
def dedup_semantic_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic dedup (Abbas et al.): assign every vector
    to its nearest of k centroids (here: the first k vectors,
    deterministic — production would feed vec_kmeans_clusters' centroids
    in), then find near-duplicate pairs (cosine >= 0.45) ONLY within a
    cluster and drop the higher id of each pair, keeping the lowest
    partner as canonical. The cluster pass turns the O(N^2) similarity
    join into k independent within-cluster joins — the same
    bucket-then-verify shape as the LSH family, but with semantic
    buckets. Ties in the rounded assignment score break to the lowest
    centroid id on both engines.

    Scale guards:
    - k DERIVES from corpus size (derive_semdedup_k: ~N/256, floor 8 —
      the round-5 fix for the fixed-k O(N²/k) re-quadratization; the
      oracle builder replays the same k from the same parquet metadata).
    - the ASSIGNMENT is two-level once k > 32 (r8, the r7 verdict's one
      super-linear tail item): flat argmax over k centroids costs k*N =
      N²/256 cosines; routing each vector through m = ceil(sqrt(k))
      coarse centroids (the first m vectors — a PREFIX of the fine
      centroid set; each cid < m is PINNED to its own cell so every
      reachable coarse cell holds >= 1 fine centroid even under 6dp
      rounding ties between near-duplicate coarse centroids) and
      then argmax-ing only over the fine centroids whose coarse cell it
      landed in costs ~2*N*sqrt(k). The oracle builder replays the
      identical two-step argmax with the identical m.
    - per-cluster participation capped at the 512 lowest vec_ids
      (deterministic windowed drop, replayed in the oracle — the
      max_bucket guard the MinHash path uses); with adaptive k the
      expected cluster is ~256 rows, so the cap is the skew backstop,
      not the steady-state truncator."""
    from pyspark.sql import Window

    from esco_neo4j_spark.operators.similarity import _pair_cosine_pudf

    emb = spark.table("embeddings").filter(F.col("embedding").isNotNull())
    pair_cos = _pair_cosine_pudf()  # Arrow twin of the HOF cosine chain
    # (bit-exact sequential folds — see lsh_self_join); as interpreted
    # zip_with+aggregate expressions the assignment cosines dominated
    # the r5 audit (111s); Arrow-batched they cost ~2s at sf1
    k = _semdedup_k(sf_dir)
    m = derive_semdedup_coarse(k)
    cents = F.broadcast(
        emb.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
    )

    def _argmax(scored: DataFrame, part: str, pick: str, out: str,
                score: str = "s") -> DataFrame:
        w = Window.partitionBy(part).orderBy(
            F.desc(score), F.asc(pick)
        )
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(part, F.col(pick).alias(out))
        )

    if m == 0:
        scored = emb.crossJoin(cents).select(
            "vec_id",
            "cid",
            F.round(
                pair_cos(F.col("embedding"), F.col("cvec")), 6
            ).alias("s"),
        )
        assign = _argmax(scored, "vec_id", "cid", "cluster")
    else:
        coarse = F.broadcast(
            emb.filter(F.col("vec_id") < m).select(
                F.col("vec_id").alias("mid"),
                F.col("embedding").alias("mvec"),
            )
        )
        # fine centroid -> coarse cell (k x m, broadcast both sides).
        # cid < m is PINNED to its own cell (a coarse centroid IS its
        # own fine centroid — the coarse set is a prefix of the fine
        # set): without the pin, a 6dp rounding tie between two
        # near-duplicate coarse centroids could argmax fine centroid i
        # away from cell i, leaving a cell v2c still routes vectors to
        # with zero fine members — and the inner join below would then
        # silently DROP those vectors from the assignment (r9 advisory).
        # The pin guarantees every reachable cell is non-empty.
        f2c_pinned = cents.filter(F.col("cid") < m).select(
            "cid", F.col("cid").alias("mid")
        )
        f2c = f2c_pinned.unionByName(
            _argmax(
                cents.filter(F.col("cid") >= m)
                .crossJoin(coarse)
                .select(
                    "cid",
                    "mid",
                    F.round(
                        pair_cos(F.col("cvec"), F.col("mvec")), 6
                    ).alias("s"),
                ),
                "cid", "mid", "mid",
            )
        )
        # vector -> coarse cell (N x m against the broadcast coarse set;
        # the argmax window shuffles ids + one scalar only)
        v2c = _argmax(
            emb.crossJoin(coarse).select(
                "vec_id",
                "mid",
                F.round(
                    pair_cos(F.col("embedding"), F.col("mvec")), 6
                ).alias("s"),
            ),
            "vec_id", "mid", "mid",
        )
        # vector -> fine, argmax ONLY over the fines in its coarse cell
        # (~k/m each); the cell routing table (k rows) broadcasts
        cell_fines = F.broadcast(f2c.join(cents, "cid"))
        scored = (
            emb.join(v2c, "vec_id")
            .join(cell_fines, "mid")
            .select(
                "vec_id",
                "cid",
                F.round(
                    pair_cos(F.col("embedding"), F.col("cvec")), 6
                ).alias("s"),
            )
        )
        assign = _argmax(scored, "vec_id", "cid", "cluster")
    wcap = Window.partitionBy("cluster").orderBy("vec_id")
    assign = (
        assign.withColumn("rnc", F.row_number().over(wcap))
        .filter(F.col("rnc") <= 512)
        .drop("rnc")
    )
    # ids-only within-cluster pair join (the lsh_self_join discipline:
    # width x fanout is what fills shuffles); vectors enter via id-keyed
    # joins at verify time
    x = assign.select(F.col("cluster"), F.col("vec_id").alias("id_a"))
    y = assign.select(F.col("cluster"), F.col("vec_id").alias("id_b"))
    cand = x.join(y, "cluster").filter(F.col("id_a") < F.col("id_b"))
    # r7: the same LOSSLESS interval screen the LSH joins run — pairs
    # provably below the threshold never fetch vectors or reach the
    # Arrow cosine; results exactly unchanged, oracle untouched (the
    # cluster passthrough column survives the screen)
    from esco_neo4j_spark.operators.similarity import _sq_interval_screen

    cand = _sq_interval_screen(
        cand, emb, emb, 0.45, 64, "id_a", "id_b", "vec_id", "embedding"
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .filter(F.round(pair_cos(F.col("va"), F.col("vb")), 6) >= 0.45)
    )
    return (
        pairs.groupBy(
            F.col("id_b").alias("vec_id"),
            F.col("cluster").cast("int").alias("cluster"),
        )
        .agg(F.min(F.col("id_a")).cast("bigint").alias("canonical_id"))
        .orderBy("vec_id")
    )


@query(
    "pipeline_leakage_safe_split",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
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
    comp AS (
      SELECT id, least(id, min(reach)) AS comp FROM walk GROUP BY id
    ),
    assigned AS (
      SELECT d.doc_id, d.source,
             coalesce(c.comp, d.doc_id) AS canonical_id,
             CASE WHEN h < 90 THEN 'train'
                  WHEN h < 95 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT d.doc_id, d.source, coalesce(c2.comp, d.doc_id) AS cid,
               ('0x' || substr(md5(CAST(coalesce(c2.comp, d.doc_id)
                                        AS VARCHAR)), 1, 7))::BIGINT % 100
                 AS h
        FROM documents d LEFT JOIN comp c2 ON d.doc_id = c2.id
      ) d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n_leaky_clusters FROM (
        SELECT canonical_id FROM assigned
        GROUP BY canonical_id HAVING count(DISTINCT split) > 1
      )
    )
    SELECT a.split, a.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT a.canonical_id) AS BIGINT) AS n_clusters,
           l.n_leaky_clusters
    FROM assigned a CROSS JOIN leak l
    GROUP BY a.split, a.source, l.n_leaky_clusters
    ORDER BY a.split, a.source
    """,
    survey_ops="dedup-canonical,C2,D3,H(ext)",
    tables=("documents",),
)
def pipeline_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #6 — LEAKAGE-SAFE train/val/test split: assignment is
    hashed from the near-dup CLUSTER's canonical id (LSH pairs -> CC ->
    min-id), not the document's, so near-duplicates can never straddle
    splits — the classic eval-contamination bug (a test doc whose
    near-copy sits in train) is impossible BY CONSTRUCTION, and the
    n_leaky_clusters witness column audits exactly that invariant inside
    the query (must be 0). Split hash is md5(canonical_id) % 100 with
    90/5/5 bands — deterministic, engine-portable, stable under corpus
    growth (adding docs never reassigns an existing cluster unless its
    canonical min changes). One LSH pass + tiny-graph CC + one rollup."""
    from esco_neo4j_spark.operators.dedup import minhash_dedup_pairs
    from esco_neo4j_spark.operators.graph import connected_components

    docs = spark.table("documents")
    pairs = minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.5, num_hashes=16, bands=4
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(pairs)
    canon = F.coalesce(F.col("component"), F.col("doc_id")).cast("bigint")
    h = (
        F.conv(F.substring(F.md5(canon.cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 100
    )
    from esco_neo4j_spark.operators.graph import _checkpoint

    # two consumers (leak audit + rollup) — checkpoint the narrow
    # 4-column assignment so the docs-x-cc join runs once
    assigned = _checkpoint(
        docs.select("doc_id", "source")
        .join(cc, docs["doc_id"] == cc["id"], "left")
        .select(
            "doc_id", "source", canon.alias("canonical_id"),
            F.when(h < 90, "train").when(h < 95, "val")
            .otherwise("test").alias("split"),
        )
    )
    leak = (
        assigned.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count("*").cast("long").alias("n_leaky_clusters"))
    )
    return (
        assigned.groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("canonical_id").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "source", "n_docs", "n_clusters",
                "n_leaky_clusters")
        .orderBy("split", "source")
    )


@query(
    "dedup_sorted_neighborhood",
    sql=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, substring({_NORM}, 1, 32) AS k,
             list_sort(list_distinct({_WORDS})) AS ws
      FROM documents
    ),
    ranked AS MATERIALIZED (
      SELECT doc_id, ws, row_number() OVER (ORDER BY k, doc_id) AS r
      FROM base
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(b.r - a.r AS INT) AS delta, a.ws AS wa, b.ws AS wb
      FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 7
    )
    SELECT id_a, id_b, delta,
           CAST(round(len(list_intersect(wa, wb))::DOUBLE /
                (len(wa) + len(wb) - len(list_intersect(wa, wb))), 6)
                AS DOUBLE) AS jaccard
    FROM pairs
    WHERE len(list_intersect(wa, wb))::DOUBLE /
          (len(wa) + len(wb) - len(list_intersect(wa, wb))) >= 0.5
    ORDER BY id_a, id_b
    """,
    survey_ops="dedup-snm(ext),E,C1",
    tables=("documents",),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez-Stolfo SNM — the classic
    BLOCKING-FREE alternative to LSH banding): sort by a domain key (the
    32-char normalized-text prefix), compare each record only against its
    next w-1=7 neighbors in key order, verify exact word-set Jaccard.
    Candidate count is exactly (w-1)*N — linear BY CONSTRUCTION, no
    hot-bucket cap needed (the property that made SNM the entity-
    resolution workhorse before minhash).

    Scale shape: the global key rank is assembled DISTRIBUTED with the
    two-level bucket trick (per-first-char row_number + broadcast bucket
    offsets — corpus_queries.shuffle_rank's pattern; the oracle's plain
    row_number() OVER (ORDER BY ...) would be a single-partition window),
    neighbor candidates come from ONE equi-join on rank after a 7-way
    delta explode carrying ids+rank only, and the word sets are fetched
    by two id-keyed joins at verify time (ids-not-payloads discipline,
    same as the LSH join)."""
    from pyspark.sql import Window

    from esco_neo4j_spark.functions.text import word_tokens
    from esco_neo4j_spark.operators.dedup import norm_text
    from esco_neo4j_spark.plans.corpus_queries import _bucket_offsets

    W = 8
    d = spark.table("documents")
    base = d.select(
        "doc_id",
        F.substring(norm_text(F.col("text")), 1, 32).alias("k"),
        F.array_sort(F.array_distinct(word_tokens(F.col("text")))).alias("ws"),
    )
    keyed = base.select(
        "doc_id", "k", F.substring(F.col("k"), 1, 1).alias("bkt")
    )
    counts = keyed.groupBy("bkt").agg(F.count("*").alias("c"))
    offs = _bucket_offsets(counts, "c")
    win = Window.partitionBy("bkt").orderBy("k", "doc_id")
    ranked = keyed.join(F.broadcast(offs), "bkt").select(
        "doc_id",
        (F.col("off") + F.row_number().over(win)).cast("bigint").alias("r"),
    )
    probes = ranked.select(
        F.col("doc_id").alias("id_a"), F.col("r").alias("ra"),
        F.explode(F.array(*[F.lit(i) for i in range(1, W)])).alias("delta"),
    ).withColumn("r", F.col("ra") + F.col("delta"))
    cand = probes.join(
        ranked.select(F.col("doc_id").alias("id_b"), "r"), "r"
    ).select("id_a", "id_b", F.col("delta").cast("int").alias("delta"))
    wa = base.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("wa"))
    wb = base.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("wb"))
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    uni = F.size("wa") + F.size("wb") - inter
    jac = inter / uni
    return (
        cand.join(wa, "id_a").join(wb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b", "delta", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )

# --- SymSpell deletion-neighborhood edit-distance dedup ---------------------
@query(
    "dedup_symdel_editdist",
    sql="""
    WITH k AS (
      SELECT substr(c_name, 1, 32) AS key, count(*) AS n
      FROM customer WHERE c_name IS NOT NULL
      GROUP BY 1
    ),
    vars AS (
      SELECT key, n,
             unnest(list_distinct(list_prepend(key,
               [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                for i in range(1, length(key) + 1)]))) AS v
      FROM k
    ),
    p AS (
      SELECT DISTINCT a.key AS key_a, b.key AS key_b,
             a.n AS n_a, b.n AS n_b
      FROM vars a JOIN vars b ON a.v = b.v AND a.key < b.key
    )
    SELECT key_a, key_b, CAST(levenshtein(key_a, key_b) AS INT) AS ed,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM p WHERE levenshtein(key_a, key_b) <= 1
    ORDER BY key_a, key_b
    """,
    survey_ops="dedup-editdist(ext),C9",
    tables=("customer",),
)
def dedup_symdel_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (<= 1) near-duplicate entity keys via the SymSpell
    symmetric-deletion join (operators/dedup.py:symdel_pairs) — the
    edit-distance member of the dedup family, covering the short-
    identifier regime (entity names, URLs, titles, SKUs) where the
    set/vector banding families (MinHash, SimHash, LSH) are the wrong
    geometry. Run over customer display names: the zero-padded numeric
    tail makes single-digit-substitution collisions (near-identical
    identifiers) a real, deterministic workload rather than a synthetic
    fixture.

    Candidate generation is LOSSLESS for ED <= 1 (two keys within one
    edit MUST share a single-deletion variant — see the operator docstring
    for the case analysis), so unlike the probabilistic banding paths
    there is no recall parameter: the oracle replays variants, join, and
    the levenshtein verify exactly (both engines implement the same
    unit-cost distance). Output is key-level with occurrence counts —
    the formulation whose cost tracks DISTINCT keys, not duplication
    factor (the operator docstring records the 269s -> 17.3s sf1 audit
    delta that forced this)."""
    from esco_neo4j_spark.operators.dedup import symdel_pairs

    return symdel_pairs(
        spark.table("customer"), "c_name", max_len=32
    ).orderBy("key_a", "key_b")


@query(
    "dedup_symdel_editdist2",
    sql="""
    WITH k AS (
      SELECT substr(p_name, 1, 32) AS key, count(*) AS n
      FROM part WHERE p_name IS NOT NULL
      GROUP BY 1
    ),
    vars AS (
      SELECT key, n,
             unnest(list_distinct(list_prepend(key,
               [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                for i in range(1, length(key) + 1)]
               || flatten(
                 [[substr(key, 1, i - 1) || substr(key, i + 1, j - i - 1)
                     || substr(key, j + 1, length(key))
                   for j in range(i + 1, length(key) + 1)]
                  for i in range(1, length(key) + 1)])
             ))) AS v
      FROM k
    ),
    p AS (
      SELECT DISTINCT a.key AS key_a, b.key AS key_b,
             a.n AS n_a, b.n AS n_b
      FROM vars a JOIN vars b ON a.v = b.v AND a.key < b.key
    )
    SELECT key_a, key_b, CAST(levenshtein(key_a, key_b) AS INT) AS ed,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM p WHERE levenshtein(key_a, key_b) <= 2
    ORDER BY key_a, key_b
    """,
    survey_ops="dedup-editdist(ext),C9",
    tables=("part",),
)
def dedup_symdel_editdist2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ED <= 2 (fuzzy-match) setting of the SymSpell deletion-
    neighborhood join (operators/dedup.py:symdel_pairs, max_edit=2) —
    registered separately from the ED <= 1 typo setting so the nested
    two-deletion neighborhood (depth-2 variants, ~C(L,2) fan-out per
    distinct key) is oracle-gated, not just fixture-tested: the DuckDB
    side replays self + single + ordered-pair deletions with nested
    list comprehensions and the same unit-cost levenshtein verify.
    Candidate generation stays LOSSLESS at depth 2 (an optimal edit
    script touches <= 2 positions per side; deleting exactly those
    positions on each side leaves the same string), so the verified
    output is exactly the ED <= 2 key pairs and any variant-generation
    difference between engines is erased by the verify.

    Column choice is load-bearing (r6 sf1 audit): ED <= 2 over the
    SERIAL zero-padded customer names is adversarial by construction —
    nearly every id is within two digit-substitutions of thousands of
    others (measured 204k true pairs at sf0.01, 4.08M at sf1, 260s of
    pure Ω(output)). Word-y part names are the regime fuzzy matching is
    FOR (titles/descriptions), with bounded true-pair density (24 pairs,
    0.5s at sf1). The dense serial-id regime stays covered by the ED<=1
    typo query on c_name, which is linear there."""
    from esco_neo4j_spark.operators.dedup import symdel_pairs

    return symdel_pairs(
        spark.table("part"), "p_name", max_len=32, max_edit=2
    ).orderBy("key_a", "key_b")


@query(
    "dedup_cdc_chunks",
    sql="""
    WITH cuts AS (
      -- Karp-Rabin window hash, base 53, window 8: exact BIGINT
      -- arithmetic identical to the Arrow chunker's vectorized form
      SELECT doc_id, source, text, length(text) AS L,
             list_distinct(list_filter(
               [CASE WHEN (
                    ord(substr(text, i, 1))::BIGINT * 1
                  + ord(substr(text, i - 1, 1))::BIGINT * 53
                  + ord(substr(text, i - 2, 1))::BIGINT * 2809
                  + ord(substr(text, i - 3, 1))::BIGINT * 148877
                  + ord(substr(text, i - 4, 1))::BIGINT * 7890481
                  + ord(substr(text, i - 5, 1))::BIGINT * 418195493
                  + ord(substr(text, i - 6, 1))::BIGINT * 22164361129
                  + ord(substr(text, i - 7, 1))::BIGINT * 1174711139837
                 ) % 32 = 0 THEN i END
                for i in range(8, length(text) + 1)],
               x -> x IS NOT NULL)) AS cutpos
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    bounds AS (
      SELECT doc_id, source, text,
             list_sort(list_distinct([0] || cutpos || [L])) AS b
      FROM cuts
    ),
    per AS (
      SELECT source, md5(chunk) AS h, length(chunk) AS l
      FROM (
        SELECT doc_id, source,
               unnest([substr(text, b[k] + 1, b[k + 1] - b[k])
                       for k in range(1, len(b))]) AS chunk
        FROM bounds
      )
    ),
    agg1 AS (
      SELECT source, count(*) AS n_chunks, sum(l) AS total_chars
      FROM per GROUP BY source
    ),
    agg2 AS (
      SELECT source, count(*) AS distinct_chunks, sum(l) AS distinct_chars
      FROM (SELECT source, h, max(l) AS l FROM per GROUP BY source, h)
      GROUP BY source
    )
    SELECT a1.source,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(distinct_chunks AS BIGINT) AS distinct_chunks,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(distinct_chars AS BIGINT) AS distinct_chars,
           CAST(round(distinct_chars::DOUBLE / total_chars, 6) AS DOUBLE)
             AS dedup_ratio
    FROM agg1 a1 JOIN agg2 USING (source)
    ORDER BY a1.source
    """,
    survey_ops="dedup-cdc(ext),I1",
    tables=("documents",),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup stats per source
    (operators/dedup.py:cdc_chunk_stats): variable-size chunks cut at
    Karp-Rabin rolling-hash boundaries (FastCDC lineage — boundaries
    survive edits, fixed blocks don't; r7 replaced the md5-per-position
    rule with the O(1)-rollable polynomial), chunk-hash dedup ratio =
    the storage/transfer win a snapshotting corpus store gets. The
    oracle replays the exact boundary polynomial and chunking with
    DuckDB list comprehensions, so the whole pipeline (boundaries,
    chunk hashes, per-source rollup) is value-checked, not just
    row-counted."""
    from esco_neo4j_spark.operators.dedup import cdc_chunk_stats

    return cdc_chunk_stats(spark.table("documents"))
