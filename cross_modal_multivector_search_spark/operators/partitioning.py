"""Partitioning strategies for the 100 TB deployment.

Two techniques the engine's big joins/aggregations rely on at scale,
packaged with their plan-level guarantees (pinned in tests/test_plans.py):

  * bucketed co-located joins — write both sides bucketed by the join
    key; Spark's bucketed scan makes the sort-merge join shuffle-free
    (no Exchange on either side). This is how the vectors table and the
    candidate/set-mapping tables should be laid out at rest so the
    rerank gather join never reshuffles 100 TB of vectors.
  * salted aggregation — for skewed keys (one mega-document, one hot
    user), split each key into ``n_salts`` sub-keys, partially aggregate
    per sub-key, then finish per key. Two small shuffles instead of one
    skew-bound shuffle. (AQE's skew-join handling covers joins; salting
    covers aggregations, which AQE does not rebalance.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


#: below this many WORK-WEIGHTED bytes per scan task the single-task
#: map stage finishes under the fixed cost of the extra round-robin
#: shuffle, so splitting cannot pay. Recalibrated round 15 from stage
#: metrics: the split tax measures ~0.28 s (token_stats 0.45 -> 0.73 s
#: forced-split at sf0.1) and plain tokenize burns ~0.3 s per MB of
#: parquet single-task, so the break-even sits near 1 MB of factor-1
#: input — the old 4 MB gate left a 1.8 s single-task md5 stage
#: (minhash at sf0.1, 584 KB file, measured) unsplit on a 32-core box.
#: Callers whose per-byte map work is a multiple of plain tokenize
#: scale their footprint with ``work_factor`` instead of this constant.
_BYTES_PER_TASK_WORTH_SPLITTING = 768 << 10


#: compression suffixes Spark cannot byte-range split — one task per
#: file no matter the size (gzip/zstd/lz4/snappy text, zip archives).
_NON_SPLITTABLE_EXTS = (".gz", ".gzip", ".zip", ".zst", ".zstd",
                        ".lz4", ".snappy", ".deflate", ".br")

#: leaf nodes that are NOT file scans; a plan containing any of these
#: has input the file footprint cannot see (in-memory relations,
#: parallelized RDDs, range generators), so the footprint is a lie.
_NON_FILE_LEAVES = ("LocalRelation", "LogicalRDD", "ExternalRDD",
                    "OneRowRelation", "Range ")

#: cap on driver-side parquet-footer probes per call; past this many
#: files the file count alone already supplies parallelism.
_MAX_FOOTER_PROBES = 64


def _analyzed_plan(df: DataFrame) -> str:
    try:
        return df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return ""


def _file_splits(path: str, size: int, mpb: int) -> int:
    """Effective scan tasks one source file can yield.

    Byte-range splittable formats give ceil(size / maxPartitionBytes).
    Non-splittable compressed files give exactly 1 regardless of size —
    the case where a naive size/mpb estimate overstates parallelism and
    a CPU-heavy map stage silently serializes onto one task. Parquet is
    range-splittable only down to row-group granularity, so a huge
    single-row-group file is also 1 task; the footer holds the row-group
    count and reading it is a few driver-side ms.
    """
    low = path.lower()
    if low.endswith(_NON_SPLITTABLE_EXTS):
        return 1
    by_size = max(1, -(-size // mpb))
    if low.endswith((".parquet", ".pq")) and by_size > 1:
        try:
            import pyarrow.parquet as pq
            return max(1, min(by_size, pq.ParquetFile(path).metadata
                              .num_row_groups))
        except Exception:
            return by_size
    return by_size


def _input_footprint(df: DataFrame,
                     mpb: int) -> tuple[int, int] | None:
    """(total_bytes, est_scan_tasks) of the frame's source files via the
    driver-side file index — no Spark job, no RDD materialization.
    None when any source is not a stat-able local file (object stores,
    in-memory relations) or the plan mixes file scans with non-file
    leaves (a join/union with a LocalRelation would under-report):
    callers fall back to a conservative probe."""
    import os
    plan = _analyzed_plan(df)
    if any(tok in plan for tok in _NON_FILE_LEAVES):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total, est_parts = 0, 0
    probe_footers = len(files) <= _MAX_FOOTER_PROBES
    for f in files:
        path = f.removeprefix("file://").removeprefix("file:")
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        total += size
        if probe_footers:
            est_parts += _file_splits(path, size, mpb)
        elif path.lower().endswith(_NON_SPLITTABLE_EXTS):
            # the footer-probe cap only skips parquet footer reads; the
            # zero-cost suffix check must still apply or large .gz/.zst
            # files get credited with byte-range splits they can't give
            est_parts += 1
        else:
            est_parts += max(1, -(-size // mpb))
    return total, est_parts


_SIZE_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _max_partition_bytes(df: DataFrame) -> int:
    """spark.sql.files.maxPartitionBytes as an int, accepting every
    byte-string form Spark does ("134217728", "134217728b", "128MB")."""
    raw = str(df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", str(128 << 20))).strip().lower()
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    if raw and raw[-1] in _SIZE_SUFFIXES:
        mult = _SIZE_SUFFIXES[raw[-1]]
        raw = raw[:-1]
    try:
        return max(1, int(raw) * mult)
    except ValueError:
        return 128 << 20


def ensure_parallelism(df: DataFrame,
                       min_partitions: int | None = None,
                       work_factor: float = 1.0) -> DataFrame:
    """Repartition pathologically-concentrated inputs up to cluster
    parallelism — and ONLY those.

    A single-row-group 100 MB parquet file scans as ONE task, which
    serializes every CPU-heavy map stage built on it (shingle+md5
    pipelines); that case is worth one round-robin shuffle. A *small*
    single-split file (the sf0.1 documents table is ~600 KB) is NOT:
    the single task finishes in well under the fixed cost of the extra
    shuffle stage, so adding one to every token-based operator is a
    pure per-query tax (measured +0.3 s/query at sf0.1, VERDICT r4).
    At production scale a 100 TB scan already carries thousands of
    splits and this returns the input untouched.

    The decision comes from the driver-side file footprint (a few
    stat calls on the source files, plus parquet-footer row-group
    counts and compression-suffix splittability so non-splittable
    inputs are not credited with byte-range parallelism they cannot
    deliver) — no ``df.rdd`` plan materialization, no per-call Spark
    job. Non-file sources (cloud object stores where stat is
    unavailable, local relations, plans mixing file and in-memory
    leaves) fall back to the RDD-partition probe, whose result is
    cached per analyzed-plan fingerprint so repeated calls on the
    same query shape cost nothing.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    fp = _input_footprint(df, _max_partition_bytes(df))
    if fp is not None:
        total, est_parts = fp
        # ``work_factor`` = the caller's per-byte map cost relative to
        # plain tokenize (the calibration workload): a minhash pipeline
        # hashing every shingle num_hashes times does ~that multiple of
        # work per input byte, so its break-even input is that much
        # smaller. Measured r15 (sf0.1, 584 KB docs, single split):
        # tokenize 0.18 s/task, lang_quality 0.47 s (~3x), shingle+
        # shuffle-write 0.53 s (~3x), 8-hash minhash 1.78 s (~10x).
        eff = int(total * work_factor)
        if eff < _BYTES_PER_TASK_WORTH_SPLITTING * 2:
            return df          # tiny input: single task beats a shuffle
        # only repartition when the scan concentrates real work on
        # fewer tasks than the cluster has cores
        if est_parts >= target or eff // est_parts \
                < _BYTES_PER_TASK_WORTH_SPLITTING:
            return df
        return df.repartition(target)
    if _probed_partitions(df) < target:
        return df.repartition(target)
    return df


# analyzed-plan fingerprint -> rdd partition count, so the non-file
# fallback materializes df.rdd at most once per distinct query shape.
# RDD-backed plans (LogicalRDD/ExternalRDD) print only their schema, so
# two different RDD sources with the same schema would collide on the
# fingerprint and a later frame could silently reuse a stale count —
# exactly the serialized-stage failure this module exists to prevent;
# those plans are never cached. Bounded so a long-lived session that
# probes many distinct shapes cannot grow the dict without limit.
_RDD_PROBE_CACHE: dict[str, int] = {}
_RDD_PROBE_CACHE_MAX = 256


def _probed_partitions(df: DataFrame) -> int:
    import re
    plan = _analyzed_plan(df)
    cacheable = plan and not any(
        tok in plan for tok in ("LogicalRDD", "ExternalRDD"))
    key = re.sub(r"#\d+", "", plan) if cacheable else ""
    if key and key in _RDD_PROBE_CACHE:
        return _RDD_PROBE_CACHE[key]
    n = df.rdd.getNumPartitions()
    if key:
        if len(_RDD_PROBE_CACHE) >= _RDD_PROBE_CACHE_MAX:
            _RDD_PROBE_CACHE.pop(next(iter(_RDD_PROBE_CACHE)))
        _RDD_PROBE_CACHE[key] = n
    return n


# int shard id s -> probe int j with pmod(murmur3(j), n) == s, per n.
# Computed once per shard count with one tiny Spark job and cached.
_SHARD_KEY_CACHE: dict[int, list[int]] = {}


def _collision_free_keys(spark: SparkSession, n: int) -> list[int]:
    """For each partition target s in 0..n-1, an int j whose Spark hash
    lands exactly on s (``pmod(hash(j), n) == s``).

    ``repartition(n, shard_col)`` does NOT put shard s in partition s:
    it hashes the shard value, and hashing n distinct values into n
    bins leaves ~1/e of the bins empty while the worst bin holds
    O(log n / log log n) shards — measured on this engine: 64 shards ->
    37 used partitions, worst task 4 shards; 640 shards -> 398 used,
    worst task 7. On a cluster that idles a third of the executors and
    makes the critical path 4-7x one shard's work. Remapping through a
    probed key makes shard -> partition bijective.

    The probe evaluates Spark's own hash (murmur3, seed 42, INT input —
    the same expression HashPartitioning uses) so it can never drift
    from the engine; coupon-collector bounds the probe size at
    O(n log n) rows of driver work, once per shard count.
    """
    if n in _SHARD_KEY_CACHE:
        return _SHARD_KEY_CACHE[n]
    found: dict[int, int] = {}
    base, chunk = 0, max(4 * n, 1024)
    while len(found) < n:
        rows = (spark.range(base, base + chunk)
                .select(F.col("id").cast("int").alias("j"),
                        F.pmod(F.hash(F.col("id").cast("int")),
                               F.lit(n)).alias("p"))
                .collect())
        for r in rows:
            found.setdefault(r["p"], r["j"])
        base += chunk
        if base > 1_000_000 * max(1, n):
            raise RuntimeError(
                f"could not find collision-free keys for n={n}")
    keys = [found[s] for s in range(n)]
    _SHARD_KEY_CACHE[n] = keys
    return keys


def repartition_by_shard(df: DataFrame, n_shards: int,
                         shard_col: str) -> DataFrame:
    """Repartition so each int shard id in 0..n_shards-1 lands in its
    OWN partition (bijective), instead of the hash-collision layout
    ``repartition(n, shard_col)`` produces. The mapping rides as an
    array literal in the plan (n_shards ints — fine into the thousands;
    shard counts beyond that should bucket at the storage layer)."""
    keys = _collision_free_keys(df.sparkSession, n_shards)
    arr = F.array(*[F.lit(int(k)) for k in keys])
    shard = F.col(shard_col).cast("int")
    # fail loudly on NULL / out-of-range ids: element_at would otherwise
    # wrap a negative index from the array end (silent misroute) and
    # hash-group every NULL key into one arbitrary partition.
    pkey = F.when(
        shard.isNull() | (shard < 0) | (shard >= n_shards),
        F.raise_error(F.concat(
            F.lit(f"repartition_by_shard: shard id outside "
                  f"0..{n_shards - 1}: "),
            F.coalesce(shard.cast("string"), F.lit("NULL"))))
    ).otherwise(F.element_at(arr, shard + 1))
    return (df.withColumn("__pkey", pkey)
            .repartition(n_shards, "__pkey")
            .drop("__pkey"))


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int, sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Drops any stale table AND its warehouse location first — a dangling
    location from a previous session makes saveAsTable fail even with
    mode=overwrite (the catalog entry is gone but the directory remains).
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a shuffle-free sort-merge join (no Exchange above the scans).

    The merge hint keeps small tables off the broadcast path — a
    BroadcastExchange would defeat the co-location demonstration (and at
    real scale neither side broadcasts anyway).
    """
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table).hint("merge"), list(on), how))


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               aggs: dict[str, str], n_salts: int = 16) -> DataFrame:
    """Skew-proof groupBy for algebraic aggregates.

    aggs maps column -> fn in {sum, count, min, max}. Phase 1 groups on
    (key, salt) — the hot key's rows spread over n_salts reducers —
    phase 2 re-combines per key (n_salts rows per key, trivial).
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs: list[Column] = []
    for col, fn in aggs.items():
        out = f"{fn}_{col}"
        phase1_aggs.append(
            {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
            [fn](col).alias(out))
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                        F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(*phase1_aggs)
    phase2_aggs = [
        combine[fn](f"{fn}_{col}").alias(f"{fn}_{col}")
        for col, fn in aggs.items()
    ]
    return phase1.groupBy(*key_cols).agg(*phase2_aggs)
