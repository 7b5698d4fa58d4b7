"""Readers/writers for the reference's binary formats <-> DataFrames.

Formats (all little-endian, SURVEY §1.3):
  * fbin      `[npts:u32][dim:u32][npts*dim float32]`
               (`/root/reference/src/multivector_reranker.cpp:505-549`,
                `include/efanna2e/util.h:179-210`)
  * ibin set-GT   `[num_queries:u32][k:u32][num_queries*k u32]`
               (`/root/reference/src/multivector_reranker.cpp:671-726`)
  * ibin vector-GT `[npts:u32][k:u32][npts*k u32 ids][npts*k f32 dists]`
               (`/root/reference/src/multivector_reranker.cpp:728-765`)
  * cardinality `[num_sets:u32][num_sets u32]`
               (`/root/reference/src/multivector_reranker.cpp:767-809`)

Ingest streams the payload in chunks through ``spark.createDataFrame``
(driver-side chunked memmap — fbin is a single local file by definition);
Parquet is the canonical at-rest format thereafter. Writers exist for
round-tripping results back to reference tooling.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StructField, StructType)

_VEC_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("vec", ArrayType(FloatType(), False), False),
])

_GT_SCHEMA = StructType([
    StructField("query_id", LongType(), False),
    StructField("rank", IntegerType(), False),
    StructField("neighbor_id", LongType(), False),
])


# single-file binary sinks are inherently driver-resident (the format has
# one header + one packed block); they exist for GT/query-sized round
# trips back to reference tooling. The guard turns "pointed a 100 TB base
# table at a .fbin" into a loud error instead of a silent driver OOM.
SINK_MAX_ROWS = 5_000_000


def _guard_sink_rows(df: DataFrame, what: str, max_rows: int) -> None:
    if df.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"{what}: input exceeds {max_rows} rows; this single-file "
            "driver-side sink is for GT/query-scale tables — write large "
            "tables as parquet (df.write.parquet) instead, or raise "
            "max_rows explicitly if the driver really can hold it")


def read_meta(path: str) -> tuple[int, int]:
    """(npts, dim) header with the reference's size validation."""
    import os
    with open(path, "rb") as f:
        npts, dim = struct.unpack("<II", f.read(8))
    expected = 8 + npts * dim * 4
    actual = os.path.getsize(path)
    if actual != expected:
        raise ValueError(
            f"fbin size mismatch: header says {expected}, file is {actual}")
    return npts, dim


def read_fbin(spark: SparkSession, path: str,
              chunk_rows: int = 100_000) -> DataFrame:
    """fbin -> DataFrame(vec_id, vec: array<float>)."""
    npts, dim = read_meta(path)
    if npts == 0:
        return spark.createDataFrame([], schema=_VEC_SCHEMA)
    mm = np.memmap(path, dtype=np.float32, mode="r", offset=8,
                   shape=(npts, dim))
    dfs = []
    for start in range(0, npts, chunk_rows):
        block = np.asarray(mm[start:start + chunk_rows])
        rows = [(start + i, block[i].tolist()) for i in range(len(block))]
        dfs.append(spark.createDataFrame(rows, schema=_VEC_SCHEMA))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def write_fbin(df: DataFrame, path: str, vec_id: str = "vec_id",
               vec_col: str = "vec",
               max_rows: int = SINK_MAX_ROWS) -> None:
    """DataFrame -> fbin, rows ordered by vec_id (driver-side sink)."""
    _guard_sink_rows(df, "write_fbin", max_rows)
    rows = df.select(vec_id, vec_col).orderBy(vec_id).collect()
    mat = np.array([r[1] for r in rows], dtype=np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<II", mat.shape[0],
                            mat.shape[1] if mat.ndim == 2 else 0))
        f.write(mat.tobytes())


def read_npy_dir(spark: SparkSession, paths: list[str],
                 chunk_rows: int = 100_000) -> DataFrame:
    """.npy shard files -> DataFrame(vec_id, vec), ids contiguous across
    shards in the given order (the reference's npy->fbin exporter,
    `/root/reference/export_fbin_from_npy.py:1-43`, with the DataFrame
    as the target instead of a packed file)."""
    if not paths:
        raise ValueError("read_npy_dir: no .npy shard paths given")
    dfs, offset = [], 0
    dfs.append(spark.createDataFrame([], schema=_VEC_SCHEMA))
    for p in paths:
        arr = np.load(p, mmap_mode="r")
        if arr.ndim != 2:
            raise ValueError(f"{p}: expected 2-D embedding array")
        for start in range(0, arr.shape[0], chunk_rows):
            block = np.asarray(arr[start:start + chunk_rows],
                               dtype=np.float32)
            rows = [(offset + start + i, block[i].tolist())
                    for i in range(len(block))]
            dfs.append(spark.createDataFrame(rows, schema=_VEC_SCHEMA))
        offset += arr.shape[0]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_set_gt_ibin(spark: SparkSession, path: str) -> DataFrame:
    """set-GT ibin -> DataFrame(query_id, rank, neighbor_id)."""
    with open(path, "rb") as f:
        nq, k = struct.unpack("<II", f.read(8))
        ids = np.fromfile(f, dtype=np.uint32, count=nq * k)
    rows = [(int(q), int(r), int(ids[q * k + r]))
            for q in range(nq) for r in range(k)]
    return spark.createDataFrame(rows, schema=_GT_SCHEMA)


def read_vector_gt_ibin(spark: SparkSession, path: str) -> DataFrame:
    """vector-GT ibin (DiskANN layout, dists present but ignored by the
    reference loader) -> DataFrame(query_id, rank, neighbor_id, dist)."""
    with open(path, "rb") as f:
        npts, k = struct.unpack("<II", f.read(8))
        ids = np.fromfile(f, dtype=np.uint32, count=npts * k)
        dists = np.fromfile(f, dtype=np.float32, count=npts * k)
    schema = StructType(_GT_SCHEMA.fields + [
        StructField("dist", FloatType(), False)])
    rows = [(int(q), int(r), int(ids[q * k + r]),
             float(dists[q * k + r]))
            for q in range(npts) for r in range(k)]
    return spark.createDataFrame(rows, schema=schema)


def _rank_grid(rows, n_cols_extra: int = 0):
    """Validate + normalize (query, rank, ...) rows into a dense grid.

    Accepts 0- or 1-based ranks (the engine's grouped_topk emits
    1-based); every query must have exactly the same contiguous rank
    set — a zero-filled hole would silently masquerade as neighbor id 0
    in the packed file.
    """
    qs = sorted({r[0] for r in rows})
    rmin = min(r[1] for r in rows)
    k = max(r[1] for r in rows) - rmin + 1
    seen: dict = {q: 0 for q in qs}
    for r in rows:
        seen[r[0]] += 1
    bad = {q: c for q, c in seen.items() if c != k}
    if bad:
        raise ValueError(
            f"ragged GT: expected {k} ranks per query, got {bad}")
    return qs, rmin, k


def write_set_gt_ibin(df: DataFrame, path: str,
                      query_col: str = "query_id", rank_col: str = "rank",
                      id_col: str = "neighbor_id",
                      max_rows: int = SINK_MAX_ROWS) -> None:
    _guard_sink_rows(df, "write_set_gt_ibin", max_rows)
    rows = df.select(query_col, rank_col, id_col) \
        .orderBy(query_col, rank_col).collect()
    if not rows:
        raise ValueError("empty GT DataFrame")
    qs, rmin, k = _rank_grid(rows)
    ids = np.zeros((len(qs), k), dtype=np.uint32)
    qix = {q: i for i, q in enumerate(qs)}
    for q, r, nid in rows:
        ids[qix[q], r - rmin] = nid
    with open(path, "wb") as f:
        f.write(struct.pack("<II", len(qs), k))
        f.write(ids.tobytes())


def write_vector_gt_ibin(df: DataFrame, path: str,
                         query_col: str = "query_id",
                         rank_col: str = "rank",
                         id_col: str = "neighbor_id",
                         dist_col: str = "dist",
                         max_rows: int = SINK_MAX_ROWS) -> None:
    """DataFrame -> vector-GT ibin (DiskANN layout: ids block then
    float32 dists block), the reference's GT-generation sink
    (`/root/reference/tests/gen_vector_groundtruth.cpp:126-133`)."""
    _guard_sink_rows(df, "write_vector_gt_ibin", max_rows)
    rows = df.select(query_col, rank_col, id_col, dist_col) \
        .orderBy(query_col, rank_col).collect()
    if not rows:
        raise ValueError("empty GT DataFrame")
    qs, rmin, k = _rank_grid(rows)
    ids = np.zeros((len(qs), k), dtype=np.uint32)
    dists = np.zeros((len(qs), k), dtype=np.float32)
    qix = {q: i for i, q in enumerate(qs)}
    for q, r, nid, d in rows:
        ids[qix[q], r - rmin] = nid
        dists[qix[q], r - rmin] = d
    with open(path, "wb") as f:
        f.write(struct.pack("<II", len(qs), k))
        f.write(ids.tobytes())
        f.write(dists.tobytes())


def read_cardinality_file(spark: SparkSession, path: str) -> DataFrame:
    """cardinality file -> (set_id, cardinality, first_vid) with the
    prefix-sum already applied (the reference's running offset)."""
    with open(path, "rb") as f:
        n, = struct.unpack("<I", f.read(4))
        cards = np.fromfile(f, dtype=np.uint32, count=n)
    firsts = np.concatenate(([0], np.cumsum(cards)[:-1]))
    rows = [(int(i), int(cards[i]), int(firsts[i])) for i in range(n)]
    return spark.createDataFrame(
        rows, "set_id long, cardinality long, first_vid long")
