"""Skew mitigation by key salting (SURVEY.md / north-star scale posture).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; explicit salting remains necessary for (a) skewed AGGREGATIONS
(AQE doesn't split hot groupBy keys) and (b) engines/paths where AQE can't
see the skew. Both helpers are result-identical to their unsalted forms —
which is exactly what their oracle queries assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_hash(df: DataFrame, salt_source: Column | None) -> Column:
    """Deterministic per-row salt basis. The old default, ``F.rand(seed=7)``,
    replays POSITIONALLY per partition — if a fetch failure re-executes an
    upstream map stage and rows arrive in a different order, a recomputed
    row draws a different salt than the one some reducers already consumed,
    double-counting or dropping it (the SPARK-23207 nondeterministic-key
    class). Hashing the row's own columns is stable under any recompute;
    the caveat (exact-duplicate rows share a salt, so a hot key made of
    IDENTICAL rows won't spread) is the documented reason to pass an
    explicit ``salt_source`` with a distinguishing column.

    The hash basis is restricted to xxhash64-HASHABLE column types —
    MapType (and variant) columns raise AnalysisException inside hash
    expressions, and the old all-columns spelling made the default salt
    fail on any schema carrying one, where ``F.rand`` had worked. If NO
    column is hashable the row content cannot seed a deterministic salt
    at all: fail loudly and ask for an explicit ``salt_source``."""
    if salt_source is not None:
        return F.xxhash64(salt_source)
    from pyspark.sql.types import ArrayType, MapType, StructType

    try:  # Spark 4's semi-structured type is unhashable too
        from pyspark.sql.types import VariantType
        unhashable: tuple = (MapType, VariantType)
    except ImportError:  # pragma: no cover - older Spark
        unhashable = (MapType,)

    def hashable(dt) -> bool:
        # recursive: a map NESTED in a struct/array poisons the hash too
        if isinstance(dt, unhashable):
            return False
        if isinstance(dt, ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
    if not cols:
        raise ValueError(
            "salted_agg/salted_join: no xxhash64-hashable columns to derive "
            "a deterministic salt from — pass salt_source explicitly"
        )
    return F.xxhash64(*[F.col(c) for c in cols])


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Phase 1 aggregates (key, salt) — spreading a hot
    key over ``n_salt`` reducers — phase 2 merges per key. count re-merges
    with sum; min/max/sum merge with themselves (all are commutative
    monoids; avg must be decomposed by the caller into sum+count).

    Salt caveat: the default salt hashes the row's own (hashable) columns,
    so EXACT-duplicate rows collapse onto one salt — a hot key whose rows
    are identical won't spread. Pass ``salt_source`` (any distinguishing
    column, e.g. a file/offset or monotonically_increasing_id drawn
    upstream) for that shape.
    """
    mergers = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = F.pmod(_salt_hash(df, salt_source), F.lit(n_salt))
    # count(col) — null-skipping, like the unsalted F.count(col) the module
    # contract promises equivalence with (count(1) would count null rows)
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(F.col(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(key).agg(
        *[
            getattr(F, mergers[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    n_salt: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Inner equi-join with the LEFT (large/skewed) side salted and the
    RIGHT side replicated across all salt values.

    A hot key's rows land in ``n_salt`` different shuffle partitions instead
    of one straggler; the right side pays a x``n_salt`` replication, so use
    this when right is much smaller (but too big / too skew-prone to
    broadcast outright). Result set is identical to a plain inner join.

    Salt caveat: the default salt hashes the left row's own (hashable)
    columns, so EXACT-duplicate left rows collapse onto one salt and
    won't spread — pass ``salt_source`` with a distinguishing column for
    identical-row hot keys.
    """
    salt = F.pmod(_salt_hash(left, salt_source), F.lit(n_salt))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [key, "_salt"]).drop("_salt")


def _triangle_pairs(df: DataFrame, *, block: str, id_col: str, n_salt: int) -> DataFrame:
    """Within-block all-pairs via triangle decomposition: rows are salted
    into ``n_salt`` groups on a hash of their identity, and the block's pair
    space is covered by one task per UNORDERED group pair (i <= j) — so a
    block of n rows costs n_salt*(n_salt+1)/2 tasks of (n/n_salt)^2
    comparisons instead of one n^2 straggler. Exactness: a cross-group pair
    meets in exactly one task (in arbitrary order — canonicalized by swap);
    a same-group pair meets twice (both orders) and the ``id`` ordering
    filter keeps one. Returns (block, l, r) with l[id_col] < r[id_col].
    """
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int")
    a = df.select(
        F.col(block).alias("_blk"), row.alias("l"), salt.alias("_ti")
    ).withColumn("_tj", F.explode(F.sequence(F.col("_ti"), F.lit(n_salt - 1))))
    # same quadratic-output hazard as the cold path: if Spark broadcasts
    # the replicated side of the (_blk, _ti, _tj) join, the pair explosion
    # inherits THIS side's partitioning — a single-split scan would put
    # every hot-block pair on one core; spread it when the input is small
    from wiki_mysql_spark.sources.tables import is_small_input

    if is_small_input(df, max_bytes=64 << 20, max_rows=2_000_000):
        a = a.repartition(df.sparkSession.sparkContext.defaultParallelism)
    b = df.select(
        F.col(block).alias("_blk"), row.alias("r"), salt.alias("_tj2")
    ).withColumn("_ti2", F.explode(F.sequence(F.lit(0), F.col("_tj2"))))
    joined = a.join(
        b,
        [a["_blk"] == b["_blk"], a["_ti"] == b["_ti2"], a["_tj"] == b["_tj2"]],
    )
    li, ri = F.col("l")[id_col], F.col("r")[id_col]
    return (
        joined.where((F.col("_ti") < F.col("_tj")) | (li < ri))
        .select(
            a["_blk"].alias(block),
            F.when(li < ri, F.col("l")).otherwise(F.col("r")).alias("_lo"),
            F.when(li < ri, F.col("r")).otherwise(F.col("l")).alias("_hi"),
        )
        .select(block, F.col("_lo").alias("l"), F.col("_hi").alias("r"))
    )


def skew_safe_block_self_pairs(
    df: DataFrame,
    *,
    block: str,
    id_col: str,
    n_salt: int = 8,
    hot_threshold: int = 10_000,
) -> DataFrame:
    """All unordered within-block row pairs (``l[id] < r[id]``) of a blocked
    self-join, immune to hot blocks.

    The blocking-key distribution in real corpora is Zipfian: one hot first
    token can put millions of rows in a single block and recreate the O(n^2)
    straggler blocking was meant to prevent (AQE's skew splitting cannot
    help — it can split a partition, but every task still sees the whole
    build side of the hot key). Two-phase plan:

    1. one cheap partial-aggregated block-size count; blocks above
       ``hot_threshold`` become a broadcast hot-list (bounded: at most
       |df| / hot_threshold keys),
    2. cold blocks take the plain self-join; hot blocks take the triangle
       decomposition (``_triangle_pairs``), whose per-task cost is capped at
       (block/n_salt)^2 regardless of block size.

    A block is entirely hot or entirely cold, so the union is exactly the
    naive pair set — result-identical, which the oracle asserts.

    Returns columns ``(block, l, r)`` where ``l``/``r`` are full-row structs.
    """
    # one materialization: without it the input lineage (scan + derived
    # block column) is re-evaluated in five subtrees of the final plan —
    # the size count, both cold join sides, and both exploded hot sides
    df = df.localCheckpoint(eager=False)
    sizes = df.groupBy(block).agg(F.count(F.lit(1)).alias("_n"))
    hot = F.broadcast(sizes.where(F.col("_n") > hot_threshold).select(block))
    cold_df = df.join(hot, block, "left_anti")
    hot_df = df.join(hot, block, "left_semi")

    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    a = cold_df.select(F.col(block).alias("_blk"), row.alias("l"))
    b = cold_df.select(F.col(block).alias("_blk"), row.alias("r"))
    # A small input does NOT mean small work: the pair output is quadratic
    # in block sizes (25M pairs from a 20k-row single-split part table at
    # sf0.1), and a broadcast join inherits the streaming side's partition
    # count — one scan partition would put the entire pair explosion plus
    # any downstream per-pair predicate (levenshtein!) on one core. When
    # the input is byte-gated small, spread the probe side round-robin and
    # pin the build side broadcast so every core gets an even pair share;
    # a large input already spreads across shuffle partitions naturally
    # (many blocks, AQE skew handling on top).
    from wiki_mysql_spark.sources.tables import is_small_input

    if is_small_input(cold_df, max_bytes=64 << 20, max_rows=2_000_000):
        a = a.repartition(df.sparkSession.sparkContext.defaultParallelism)
        b = F.broadcast(b)
    cold_pairs = (
        a.join(b, "_blk")
        .where(F.col("l")[id_col] < F.col("r")[id_col])
        .select(F.col("_blk").alias(block), "l", "r")
    )
    hot_pairs = _triangle_pairs(hot_df, block=block, id_col=id_col, n_salt=n_salt)
    return cold_pairs.unionByName(hot_pairs)
