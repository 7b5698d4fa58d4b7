"""Bucketed co-located joins and salted aggregation."""

import pytest
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import testdata as TD
from cross_modal_multivector_search_spark.operators import partitioning
from cross_modal_multivector_search_spark.plans import plan_text

from conftest import SF_SMOKE


def test_bucketed_join_is_shuffle_free(spark):
    v = TD.embeddings_norm(spark, SF_SMOKE)
    left = v.select("set_id", "vec_id")
    right = v.groupBy("set_id").agg(F.count("*").alias("card"))
    partitioning.write_bucketed(left, "t_left", ["set_id"], 8,
                                sort_cols=["set_id"])
    partitioning.write_bucketed(right, "t_right", ["set_id"], 8,
                                sort_cols=["set_id"])
    j = partitioning.bucketed_join(spark, "t_left", "t_right", ["set_id"])
    text = plan_text(j, "simple")
    assert "Exchange" not in text, f"bucketed join reshuffled:\n{text}"
    assert j.count() == 500


def test_salted_agg_matches_plain(spark):
    ev = TD.load_events(spark, SF_SMOKE)
    plain = {r["user_id"]: r["s"]
             for r in ev.groupBy("user_id")
             .agg(F.sum("value").alias("s")).collect()}
    salted = {r["user_id"]: r["sum_value"]
              for r in partitioning.salted_agg(
                  ev, ["user_id"], {"value": "sum"}, n_salts=8).collect()}
    assert set(plain) == set(salted)
    for k, s in plain.items():
        assert salted[k] == pytest.approx(s, rel=1e-12)


def test_salted_agg_count_min_max(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 5.0), (2, 7.0)], "k long, x double")
    out = partitioning.salted_agg(
        df, ["k"], {"x": "count"}, n_salts=4).collect()
    got = {r["k"]: r["count_x"] for r in out}
    assert got == {1: 3, 2: 1}
    out2 = {r["k"]: (r["min_x"], r["max_x"]) for r in partitioning.salted_agg(
        df, ["k"], {"x": "min"}, n_salts=4)
        .join(partitioning.salted_agg(df, ["k"], {"x": "max"}, n_salts=4),
              "k").collect()}
    assert out2[1] == (5.0, 20.0)


def test_ensure_parallelism_decisions(spark, tmp_path):
    """Footprint-based repartition decision (VERDICT r4 #2): tiny file
    inputs return UNTOUCHED (no shuffle stage in the plan — the r4
    regression was an unconditional per-call repartition), while the
    size estimator and conf parser behave at the boundaries."""
    docs = TD.load(spark, SF_SMOKE, "documents")
    out = partitioning.ensure_parallelism(docs)
    # tiny input: the exact same plan object, no round-robin exchange
    assert "RoundRobin" not in plan_text(out, "simple")
    # footprint sees the real file bytes
    import os
    mpb = partitioning._max_partition_bytes(docs)
    total, est_parts = partitioning._input_footprint(docs, mpb)
    real = os.path.getsize(f"{SF_SMOKE}/documents.parquet")
    assert total == real and est_parts == 1
    # non-file sources report None (fallback probe path)
    local = spark.range(10)
    assert partitioning._input_footprint(local, mpb) is None
    # mixed file + in-memory leaves ALSO report None: the file bytes
    # alone would under-report the input (ADVICE r5)
    mixed = docs.join(local.withColumnRenamed("id", "doc_id"), "doc_id",
                      "left")
    assert partitioning._input_footprint(mixed, mpb) is None
    # conf parser accepts every byte-string form Spark does
    assert partitioning._max_partition_bytes(docs) > 0
    for raw, want in (("134217728", 128 << 20), ("134217728b", 128 << 20),
                      ("128m", 128 << 20), ("64K", 64 << 10)):
        spark.conf.set("spark.sql.files.maxPartitionBytes", raw)
        try:
            assert partitioning._max_partition_bytes(docs) == want, raw
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
    # a big single-split source still triggers the repartition: fake the
    # footprint via a parquet file over the gate with one row group
    import numpy as np
    big = spark.createDataFrame(
        [(i, "x" * 200) for i in range(60_000)], "id long, t string")
    p = str(tmp_path / "big.parquet")
    big.coalesce(1).write.parquet(p)
    sz = sum(os.path.getsize(os.path.join(p, f))
             for f in os.listdir(p) if f.endswith(".parquet"))
    if sz >= 2 * partitioning._BYTES_PER_TASK_WORTH_SPLITTING:
        rp = partitioning.ensure_parallelism(spark.read.parquet(p))
        assert "RoundRobin" in plan_text(rp, "simple")


def test_file_splits_respects_splittability(tmp_path):
    """Non-splittable compressed files yield ONE scan task regardless of
    size, and a huge single-row-group parquet is bounded by its
    row-group count (ADVICE r5: crediting them with size/mpb splits
    made ensure_parallelism skip a repartition the scan needs)."""
    mpb = 1 << 20
    # gzip: 1 split even at 100x maxPartitionBytes
    assert partitioning._file_splits("/x/part-0.json.gz",
                                     100 << 20, mpb) == 1
    # plain text: byte-range splittable
    assert partitioning._file_splits("/x/part-0.json",
                                     100 << 20, mpb) == 100
    # parquet with one row group: capped at 1
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(pa.table({"x": list(range(50_000)),
                             "t": ["y" * 100] * 50_000}), p,
                   row_group_size=1 << 30, compression="none",
                   use_dictionary=False)
    import os
    sz = os.path.getsize(p)
    assert sz > 2 * mpb
    assert partitioning._file_splits(p, sz, mpb) == 1
    # ...and with many row groups, splittable up to the size estimate
    p2 = str(tmp_path / "many_rg.parquet")
    pq.write_table(pa.table({"x": list(range(50_000)),
                             "t": ["y" * 100] * 50_000}), p2,
                   row_group_size=1000, compression="none",
                   use_dictionary=False)
    sz2 = os.path.getsize(p2)
    assert partitioning._file_splits(p2, sz2, mpb) == \
        max(1, -(-sz2 // mpb))


def test_probed_partitions_cached(spark):
    """The non-file fallback materializes df.rdd at most once per
    analyzed-plan shape (VERDICT r5 #6)."""
    partitioning._RDD_PROBE_CACHE.clear()
    df = spark.range(100).repartition(7)
    assert partitioning._probed_partitions(df) == 7
    assert len(partitioning._RDD_PROBE_CACHE) == 1
    # an identically-defined frame hits the cache (same fingerprint)
    df2 = spark.range(100).repartition(7)
    assert partitioning._probed_partitions(df2) == 7
    assert len(partitioning._RDD_PROBE_CACHE) == 1


def test_repartition_by_shard_rejects_bad_ids(spark):
    """NULL / out-of-range shard ids must fail loudly, not silently
    hash-group into an arbitrary partition (VERDICT r5 #5)."""
    n = 8
    bad_hi = spark.range(20).select(
        F.col("id"), F.lit(99).cast("int").alias("shard"))
    with pytest.raises(Exception) as ei:
        partitioning.repartition_by_shard(bad_hi, n, "shard").count()
    assert "shard id outside" in str(ei.value)
    bad_neg = spark.range(20).select(
        F.col("id"), F.lit(-1).cast("int").alias("shard"))
    with pytest.raises(Exception) as ei:
        partitioning.repartition_by_shard(bad_neg, n, "shard").count()
    assert "shard id outside" in str(ei.value)
    bad_null = spark.range(20).select(
        F.col("id"), F.lit(None).cast("int").alias("shard"))
    with pytest.raises(Exception) as ei:
        partitioning.repartition_by_shard(bad_null, n, "shard").count()
    assert "shard id outside" in str(ei.value)


def test_repartition_by_shard_is_bijective(spark):
    """repartition(n, shard) hashes shard ids into partitions — ~1/e of
    partitions empty, worst partition O(log n) shards (the 10M-build
    straggler). repartition_by_shard must place every shard in its OWN
    partition."""
    n = 64
    df = spark.range(n * 50).select(
        F.col("id"), F.pmod(F.col("id"), F.lit(n)).cast("int")
        .alias("shard"))
    out = partitioning.repartition_by_shard(df, n, "shard")
    assert "__pkey" not in out.columns
    per_part = (out.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(F.countDistinct("shard").alias("n_shards"))
                .collect())
    assert len(per_part) == n                      # every partition used
    assert max(r["n_shards"] for r in per_part) == 1
    # keys are found and cached per shard count
    assert len(partitioning._collision_free_keys(spark, n)) == n
    assert n in partitioning._SHARD_KEY_CACHE


def test_probed_partitions_skips_rdd_backed_plans(spark):
    """RDD-backed plans print only their schema, so two different RDD
    sources with the same schema would collide on the fingerprint; they
    must never be cached (ADVICE r6 #2)."""
    saved = dict(partitioning._RDD_PROBE_CACHE)
    try:
        partitioning._RDD_PROBE_CACHE.clear()
        a = spark.sparkContext.parallelize(range(100), 2).map(
            lambda i: (i,)).toDF(["x"])
        b = spark.sparkContext.parallelize(range(100), 7).map(
            lambda i: (i,)).toDF(["x"])
        assert partitioning._probed_partitions(a) == 2
        assert partitioning._RDD_PROBE_CACHE == {}      # not cached
        assert partitioning._probed_partitions(b) == 7  # no stale hit
        # file-backed plans still cache, bounded
        f = spark.range(10).toDF("x")
        n1 = partitioning._probed_partitions(f)
        assert partitioning._probed_partitions(f) == n1
    finally:
        partitioning._RDD_PROBE_CACHE.clear()
        partitioning._RDD_PROBE_CACHE.update(saved)


def test_footprint_nonsplittable_check_survives_footer_cap(tmp_path, spark):
    """Past _MAX_FOOTER_PROBES files only the parquet-footer probe is
    skipped; the zero-cost .gz suffix check must still count 1 task per
    non-splittable file (ADVICE r6 #3)."""
    import gzip
    n_files = partitioning._MAX_FOOTER_PROBES + 4
    payload = b"x,y\n" + b"1,2\n" * 200_000          # ~800 KB/file raw
    for i in range(n_files):
        with gzip.open(tmp_path / f"part-{i:04d}.csv.gz", "wb",
                       compresslevel=1) as fh:
            fh.write(payload)
    df = spark.read.option("header", True).csv(str(tmp_path))
    mpb = 64 << 10                                   # force by_size > 1
    fp = partitioning._input_footprint(df, mpb)
    assert fp is not None
    total, est = fp
    assert est == n_files                            # 1 per gz, not size/mpb
