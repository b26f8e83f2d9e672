"""Count-min sketch as a DISTRIBUTED TABLE (row, bucket, cnt).

The classic CMS is a d x w counter matrix held in memory; at 100 TB the
Spark-native shape is the same matrix AS A DATAFRAME: build it with one
explode(d) + groupBy (map-side combinable, output bounded at d*w rows no
matter the input size), persist it like any table, MERGE sketches by
union + groupBy sum, and answer point queries by joining candidate keys
against the (tiny, broadcastable) sketch table and taking min over the d
rows. Nothing ever holds per-key state: memory is O(d*w) regardless of
input cardinality, and the one-sided error bound (est >= true,
est <= true + eps*N w.h.p., eps = e/w) is the textbook CMS guarantee.

Hashing (r5): h_j(x) = first 60 bits of md5(j || '-' || x) mod w —
engine-neutral (md5 is identical everywhere), so a DuckDB oracle can
reproduce every bucket (and therefore every estimate) EXACTLY. The
affine family ((a_j*x + b_j) mod P) mod w used in r1-r4 is kept ONLY
for the hll_registers/hll_estimate merge-property unit tests: on DENSE
integer keys the affine map never wraps P, degenerating order
statistics (KMV picked the k smallest KEYS, a measured 600x estimate
error) and making CMS rows collide identically (bucket = bijection of
key mod w in every row). The md5 register sketches
(hll_registers_md5/hll_estimate_md5) power the registered queries; rank
functions stay trailing-zero arithmetic (w & -w, exact log2 of a power
of two), so every register value AND the final estimate replay
bit-exactly in DuckDB SQL (plans/event_queries:
events_hll_distinct_rollup, events_approx_distinct_rollup).

Reference has no sketch surface (extension per SURVEY.md §2); the CMS /
heavy-hitter pattern is standard large-scale-pipeline equipment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime; used by the affine HLL
# variants kept below for the merge-property unit tests)
CMS_DEPTH = 4  # hash rows; each row hashes md5(j || '-' || key)


def _bucket(j: int, key_col, width: int):
    """Row-j bucket via md5 — NOT the affine (a*u+b) % P % w family the
    r1-r4 sketches used. r5 lesson (found on KMV, same class here): for
    DENSE integer keys the affine map never wraps P, so bucket reduces
    to an affine map mod w — a BIJECTION of (key mod w) in every row,
    making collisions identical across all d rows and the min-of-rows
    worthless (two keys congruent mod w collided everywhere). md5 rows
    keyed by j are independent in the only sense that matters here:
    structured key sets spread like uniform ones."""
    hx = F.md5(F.concat_ws("-", F.lit(j), key_col.cast("string")))
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint") % width


def cms_build(df: DataFrame, key_col: str, width: int = 1024) -> DataFrame:
    """Build the sketch table (sketch_row, bucket, cnt) over an integer
    key column. One narrow explode (x depth) then a groupBy whose output
    is bounded at depth*width rows — partial aggregation does almost all
    the work map-side."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("sketch_row"),
                _bucket(j, F.col(key_col), width).alias("bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(
            F.col("rb.sketch_row").alias("sketch_row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same params: element-wise counter sum
    (union + groupBy). CMS(A) + CMS(B) == CMS(A union B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("sketch_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 1024
) -> DataFrame:
    """Point-query estimates for each key in ``keys``: min over the d
    sketch rows of the counter at the key's bucket. The sketch table is
    at most depth*width rows, so it is broadcast — the key side never
    shuffles. Keys whose buckets are all absent estimate 0 (coalesce),
    preserving est >= true for unseen keys too."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sketch_row"),
                        _bucket(j, F.col(key_col), width).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.sketch_row").alias("sketch_row"),
             F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_build(df: DataFrame, key_col: str, width: int = 65_536) -> DataFrame:
    """Bloom filter as a distributed bit table: the DISTINCT (sketch_row,
    bucket) pairs set by any key. At most depth*width rows regardless of
    input size; same arithmetic hash family as the CMS so an oracle can
    reproduce membership decisions exactly if it ever needs to."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("sketch_row"),
                _bucket(j, F.col(key_col), width).alias("bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )
    return df.select(F.explode(rows).alias("rb")).select(
        F.col("rb.sketch_row").alias("sketch_row"),
        F.col("rb.bucket").alias("bucket"),
    ).distinct()


def bloom_prune(df: DataFrame, key_col: str, bloom: DataFrame,
                width: int = 65_536) -> DataFrame:
    """Semi-join REDUCTION: keep only rows whose key hits the bloom filter
    in all depth positions (possible false positives, never false
    negatives — a later exact join removes the former, so composing
    bloom_prune + join is EXACT while shuffling only the surviving
    fraction of the big side). This is the manual form of Spark's runtime
    row-level bloom pruning, usable when the build side is a separate
    pipeline stage (e.g. yesterday's key set) rather than the same query.

    The bit table is bounded (depth*width rows) and broadcast, so the
    probe is a narrow map-side filter: no shuffle of ``df`` happens here.
    """
    bits = F.broadcast(bloom)
    probe = df
    for j in range(CMS_DEPTH):
        bj = bits.filter(F.col("sketch_row") == j).select(
            F.col("bucket").alias(f"__b{j}")
        )
        probe = probe.join(
            bj,
            _bucket(j, F.col(key_col), width) == F.col(f"__b{j}"),
            "left_semi",
        )
    return probe


# --- HyperLogLog as a register TABLE (group_cols..., bucket, rho) ---------
#
# h(x) = (HLL_A*x + HLL_B) mod P splits into bucket = h mod m (register
# index) and w = floor(h/m) (rank source). rho(w) = 1 + trailing zeros of
# w — computed as log2(w & -w) + 1, exact because w & -w is a power of
# two and log2 of a power of two is exact in double. Registers hold
# max(rho); merging sketches (across days, partitions, tables) is
# groupBy-max — the defining HLL property. The estimate uses the raw HLL
# estimator alpha_m * m^2 / sum(2^-M_j) with the standard linear-counting
# small-range correction. sum(2^-M_j) is kept as the INTEGER
# sum(2^(32-M_j)) (every term exact, 16-term sum exact in double), so the
# whole computation is reproducible arithmetic — no engine-specific hash
# or sketch layout anywhere.
HLL_A, HLL_B = 22_853, 977
HLL_M = 16  # registers; RSE ~ 1.04/sqrt(16) = 26% — sized for the test
# tables (see events_hll_distinct_rollup docstring for the lgK tradeoff)
_HLL_RHO_CAP = 28  # h < 2^31, w = h//16 < 2^27 -> tz <= 26; w == 0 maps here


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  m: int = HLL_M) -> DataFrame:
    """Per-group HLL register table over an integer key column: at most
    ``m`` rows per group no matter the input size. One narrow projection
    then a groupBy-max — partial aggregation does the work map-side."""
    h = (F.lit(HLL_A) * F.col(key_col) + F.lit(HLL_B)) % F.lit(CMS_P)
    w = F.floor(h / F.lit(m)).cast("long")
    lowbit = w.bitwiseAND(-w)
    rho = (
        F.when(w == 0, F.lit(_HLL_RHO_CAP))
        .otherwise((F.log2(lowbit.cast("double")) + F.lit(1)).cast("int"))
    )
    return (
        df.select(*group_cols, (h % m).cast("int").alias("bucket"),
                  rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables built with the same (m, hash): element-wise
    max. HLL(A) merged with HLL(B) == HLL(A union B) exactly."""
    return (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str],
                 m: int = HLL_M) -> DataFrame:
    """Cardinality estimate per group from a (merged) register table.

    alpha_16 = 0.673 (Flajolet et al.'s constant for m=16); empty
    registers contribute 2^32 to the scaled harmonic sum. Small-range
    correction (raw <= 2.5m with V empty registers) switches to linear
    counting m*ln(m/V). floor() not cast() for the final integer: Spark
    truncates double->bigint casts while DuckDB rounds them, so the
    oracle mirrors floor explicitly."""
    alpha = 0.673 if m == 16 else 0.7213 / (1 + 1.079 / m)
    two32 = 4294967296.0
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(32) - F.col("rho"))).alias("psum"),
        F.count("*").alias("nb"),
    )
    v = F.lit(m) - F.col("nb")
    raw = F.lit(alpha * m * m * two32) / (F.col("psum") + v * F.lit(two32))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.floor(est).cast("bigint").alias("approx"),
        v.cast("int").alias("empty_registers"),
    )


# --- md5-hashed HLL (pseudorandom + portable) -------------------------------
#
# The affine-hash family above is deliberately minimal, but on CONSECUTIVE
# integer keys its bucket map h%16 is an affine cycle that spreads k <= 16
# keys over ~k distinct registers — far more uniformly than a random hash
# would — which biases linear counting upward (15 keys -> v=1 -> estimate
# 44). Fine for the rollup queries' documented error regime over large
# user populations; wrong for per-vertex HyperBall balls of size 3-50.
# md5 is the one hash both engines share (playbook), and is genuinely
# pseudorandom: bucket = first hex nibble, rank source = next 48 bits.
_HLL48_RHO_CAP = 49  # w == 0 (probability 2^-48) maps here


def hll_registers_md5(df: DataFrame, key_col: str,
                      group_cols: list[str]) -> DataFrame:
    """Per-group HLL register table keyed by md5(key): bucket is the
    first md5 nibble (m=16), rho = 1 + trailing zeros of the next 48
    bits. Same shape and merge property as hll_registers."""
    hexs = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(hexs, 1, 1), 16, 10).cast("int")
    w = F.conv(F.substring(hexs, 2, 12), 16, 10).cast("long")
    lowbit = w.bitwiseAND(-w)
    rho = (
        F.when(w == 0, F.lit(_HLL48_RHO_CAP))
        .otherwise((F.log2(lowbit.cast("double")) + F.lit(1)).cast("int"))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_md5(registers: DataFrame, group_cols: list[str],
                     m: int = HLL_M) -> DataFrame:
    """Estimate from an md5-register table (48-bit rank source): psum
    terms are 2^(48-rho) — dyadic, so the <= m-term double sum is exact
    and order-free in both engines; empty registers contribute 2^48.
    Same alpha/linear-counting rules as hll_estimate."""
    alpha = 0.673 if m == 16 else 0.7213 / (1 + 1.079 / m)
    two48 = 281474976710656.0
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(48) - F.col("rho"))).alias("psum"),
        F.count("*").alias("nb"),
    )
    v = F.lit(m) - F.col("nb")
    raw = F.lit(alpha * m * m * two48) / (F.col("psum") + v * F.lit(two48))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.floor(est).cast("bigint").alias("approx"),
        v.cast("int").alias("empty_registers"),
    )


# --- AMS F2 (second frequency moment / self-join size) sketch ---------------
#
# Alon-Matias-Szegedy tug-of-war: per sketch row j, every key pulls a
# +1/-1 rope end chosen by a hash; S_j = sum of pulls over the STREAM
# (with multiplicity), and S_j^2 is an unbiased estimator of
# F2 = sum_k count(k)^2 — the self-join size, the quantity join planners
# and skew triage actually need (ext_join_cardinality_probe's exact twin
# at sketch cost: 9 integers of state instead of a per-key rollup).
# Median over rows tightens the tail. Signs come from the same affine
# family as CMS (parity bit of (a*key + b) mod P), so every S_j is an
# exact integer both engines reproduce — the estimate itself is
# value-oracle-able, like the CMS/KMV/HLL families above.
# 9 md5 sign rows, offset by 100 so AMS rows never share a hash stream
# with the CMS/bloom rows (j = 0..3) over the same keys
AMS_DEPTH = 9


def ams_f2_terms(df: DataFrame, key_col: str) -> DataFrame:
    """(sketch_row, s) — the 9 rope sums. One narrow explode (9x rows of
    two ints) + one 9-group partial-aggregable sum; mergeable across
    partitions/days by construction (sums add)."""
    # md5 sign rows (r5): the affine ((a*u+b) % P) % 2 sign is just the
    # key's PARITY (phase-flipped by b) when a*u+b never wraps P — all 9
    # ropes pulled |n_even - n_odd| and the median-of-squares collapsed
    # to one degenerate (measured -98% on events) estimate. See _bucket.
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("sketch_row"),
                (F.lit(1) - 2 * (_bucket(100 + j, F.col(key_col), 2)))
                .cast("long").alias("pull"),
            )
            for j in range(AMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select(F.col("r.sketch_row").alias("sketch_row"),
                F.col("r.pull").alias("pull"))
        .groupBy("sketch_row")
        .agg(F.sum("pull").alias("s"))
    )
