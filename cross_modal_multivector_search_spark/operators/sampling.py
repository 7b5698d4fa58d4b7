"""Sampling / splitting / validation utilities from the reference's tooling.

  * deterministic sample of n distinct ids — `gen_rand_ids`
    (`/root/reference/tests/gen_rand_ids.cpp`): here via md5-ordering so
    the "random" choice is reproducible across engines (the oracle runs
    the same expression), unlike engine-native rand().
  * whole-set split into sampled/remaining — `extract_vectorsets`
    (`/root/reference/tests/extract_vectorsets.cpp:9-93`): semi/anti join.
  * superset validation of two candidate tables —
    `compare_two_ibin_and_validate_superset.cpp`: left-anti must be empty.
  * unit-norm Gaussian vector synthesis —
    `UtilityMethods::GenerateRandomVectorsAndStore`
    (`/root/reference/src/utility_methods.cpp:104-154`): seeded per-row
    generator, distributed via spark.range + mapInPandas.
  * mean pairwise similarity of a candidate list — `GetNNWiseDistance`
    (`/root/reference/src/multivector_reranker.cpp:842-861`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from ..functions import vector as V


def deterministic_sample(df: DataFrame, n: int, seed: int = 42,
                         id_col: str = "set_id") -> DataFrame:
    """n distinct ids chosen by md5(seed||id) order — a seeded shuffle
    that any SQL engine reproduces exactly."""
    return (df.select(id_col).distinct()
            .orderBy(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))),
                     F.col(id_col))
            .limit(n))


def stratified_sample(df: DataFrame, strata_cols: list[str], n_per: int,
                      seed: int = 42,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sample: n_per rows per stratum, chosen
    by md5(seed||id) order within each stratum (seeded shuffle any SQL
    engine reproduces — same trick as deterministic_sample).

    One window over the strata partitioning; no collect, no RNG state —
    the standard balanced-subset pass for eval-set construction.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per).drop("_rn"))


def split_by_sets(vecs: DataFrame, sampled_sets: DataFrame,
                  set_col: str = "set_id") -> tuple[DataFrame, DataFrame]:
    """(sampled, remaining) — whole sets stay together (semi/anti join)."""
    s = F.broadcast(sampled_sets.select(set_col))
    return (vecs.join(s, set_col, "semi"), vecs.join(s, set_col, "anti"))


def validate_superset(superset: DataFrame, subset: DataFrame,
                      keys: list[str]) -> DataFrame:
    """Rows of ``subset`` missing from ``superset`` (must be empty)."""
    return subset.join(superset, keys, "left_anti")


#: Block size of the counter-based generator contract (r11). Row id i's
#: draws are row (i % GEN_BLOCK) of the (seed, tag, i // GEN_BLOCK)
#: stream — a whole block's draws are recomputed wherever any of its
#: rows land, so output is partition-independent like the former
#: per-row-seeded scheme, but RNG construction is per BLOCK, not per
#: row (the r10 verdict's named fix: per-row default_rng spin-up was
#: minutes of pure Python at 10M ids).
#:
#: Every SeedSequence in this module carries a generator TAG as its
#: second entropy word so no two streams can collide (r11 advice: the
#: untagged [seed, blk] base stream collided with the centers stream
#: [seed, n_clusters] at blk == n_clusters, and random/clustered drew
#: from each other's blocks): 0 = driver-side derived constants (the
#: modality-gap direction), 1 = crossmodal query blocks, 2 = random
#: base blocks, 3 = clustered base blocks. Cluster centers keep the
#: 2-word stream [seed, n_clusters], disjoint from every 3-word one.
GEN_BLOCK = 4096


def _by_block(ids: np.ndarray, seed_tail: list, draw):
    """Iterate the distinct GEN_BLOCK-blocks covering ``ids``; for each,
    build the block's Generator from SeedSequence([*seed_tail, block]),
    call ``draw(rng)`` for the FULL block (a tuple of (GEN_BLOCK, ...)
    arrays), and yield (positions_into_ids, per-row slices) for the
    batch rows that fall in the block. A partition covering part of a
    block recomputes the whole block's draws (bounded, ≤2 partial
    blocks per contiguous range), which is what makes output
    partition-independent."""
    blocks = ids // GEN_BLOCK
    for blk in np.unique(blocks):
        sel = np.nonzero(blocks == blk)[0]
        rng = np.random.default_rng(seed_tail + [int(blk)])
        full = draw(rng)                       # tuple of (GEN_BLOCK, ...) arrays
        off = ids[sel] - blk * GEN_BLOCK
        yield sel, tuple(a[off] for a in full)


def _unit_rows(v: np.ndarray) -> list:
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return list(v.astype(np.float32))


def generate_random_vectors(spark: SparkSession, n: int, dim: int,
                            seed: int = 42) -> DataFrame:
    """n unit-norm Gaussian rows, deterministically seeded per id block.

    Distributed: spark.range partitions the id space; draws follow the
    ``GEN_BLOCK`` counter-based contract (row i = row i%B of the
    (seed, 2, i//B) stream — tag 2 is this generator's namespace), so
    output is independent of partitioning and the generator runs as
    whole-block vectorized NumPy.
    """
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("vec", ArrayType(FloatType(), False), False),
    ])

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vs = np.empty((len(ids), dim))
            for sel, (nv,) in _by_block(
                    ids, [seed, 2],
                    lambda r: (r.standard_normal((GEN_BLOCK, dim)),)):
                vs[sel] = nv
            yield pd.DataFrame({"vec_id": ids, "vec": _unit_rows(vs)})

    return spark.range(n).mapInPandas(gen, schema=schema)


def generate_clustered_vectors(spark: SparkSession, n: int, dim: int,
                               n_clusters: int, sigma: float = 0.2,
                               seed: int = 42) -> DataFrame:
    """n unit-norm rows drawn from a seeded mixture of Gaussians —
    clustered data for evaluating trained coarse quantizers (uniform
    Gaussians are the ANN worst case; real embedding corpora cluster).

    Cluster centers are generated once on the driver (tiny:
    n_clusters x dim) and folded into the mapInPandas closure; draws
    follow the ``GEN_BLOCK`` counter-based contract (cluster picks and
    noise for a whole id block come from the (seed, 3, block) stream —
    integers first, then the noise matrix; tag 3 is this generator's
    namespace) so output is independent of partitioning, exactly like
    `generate_random_vectors`.
    """
    rng = np.random.default_rng([seed, n_clusters])
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("cluster", LongType(), False),
        StructField("vec", ArrayType(FloatType(), False), False),
    ])

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cl = np.empty(len(ids), dtype=np.int64)
            vs = np.empty((len(ids), dim))
            for sel, (c, nv) in _by_block(
                    ids, [seed, 3],
                    lambda r: (r.integers(n_clusters, size=GEN_BLOCK),
                               r.standard_normal((GEN_BLOCK, dim)))):
                cl[sel] = c
                vs[sel] = centers[c] + sigma * nv
            yield pd.DataFrame({"vec_id": ids, "cluster": cl,
                                "vec": _unit_rows(vs)})

    return spark.range(n).mapInPandas(gen, schema=schema)


def generate_crossmodal_queries(spark: SparkSession, n: int, dim: int,
                                n_clusters: int, sigma: float = 0.2,
                                gap: float = 0.8, mix: float = 0.35,
                                seed: int = 42) -> DataFrame:
    """n unit-norm QUERY vectors distribution-shifted away from the
    base produced by ``generate_clustered_vectors(seed, n_clusters)`` —
    a synthetic stand-in for the reference's cross-modal workloads
    (text queries against an image base: t2i / laion / webvid,
    `/root/reference/prepare_data.sh:23-79`), where train and search
    queries share a distribution the BASE does not.

    Two documented properties of CLIP-style paired embeddings are
    modeled: (1) the *modality gap* — query vectors live in a cone
    offset from the base cloud by a fixed direction ``g`` (Liang et
    al., "Mind the Gap", NeurIPS'22), scaled by ``gap``; (2)
    *cross-cluster semantics* — a text query mixes two visual
    clusters (``(1-mix)*c_a + mix*c_b``), so its exact kNN set spans
    base clusters that are far apart in base geometry. Both are what
    make OOD queries hard for a base-only graph (HNSW) and are the
    regime RoarGraph's train-query projection targets (paper §1;
    reference README).

    Same determinism contract as the other generators: centers and
    ``g`` derive only from (seed, n_clusters); draws follow the
    ``GEN_BLOCK`` counter-based contract with stream (seed, 1, block)
    — the tag 1 keeps query draws decorrelated from same-block base
    draws — so output is independent of partitioning. Per block the
    draw order is a-picks, b-picks, then the noise matrix. Train and
    search queries are both drawn from THIS distribution (disjoint id
    ranges), mirroring the reference's query.train / query.10k split.
    """
    rng = np.random.default_rng([seed, n_clusters])
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.random.default_rng([seed, 0, n_clusters]).standard_normal(dim)
    g /= np.linalg.norm(g)

    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("vec", ArrayType(FloatType(), False), False),
    ])

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vs = np.empty((len(ids), dim))
            for sel, (a, b, nv) in _by_block(
                    ids, [seed, 1],
                    lambda r: (r.integers(n_clusters, size=GEN_BLOCK),
                               r.integers(n_clusters, size=GEN_BLOCK),
                               r.standard_normal((GEN_BLOCK, dim)))):
                vs[sel] = ((1.0 - mix) * centers[a] + mix * centers[b]
                           + gap * g + sigma * nv)
            yield pd.DataFrame({"vec_id": ids, "vec": _unit_rows(vs)})

    return spark.range(n).mapInPandas(gen, schema=schema)


def nn_wise_similarity(cands: DataFrame, vecs: DataFrame,
                       query_col: str = "query_id",
                       id_col: str = "base_id",
                       vec_id: str = "vec_id",
                       vec_col: str = "vec") -> DataFrame:
    """Mean pairwise similarity among each query's candidate list — the
    reference's candidate-diversity statistic. Self-join of candidates
    joined to vectors; excludes the diagonal, counts each unordered pair
    twice exactly like the C++ double loop."""
    cv = cands.join(
        vecs.select(F.col(vec_id).alias(id_col),
                    F.col(vec_col).alias("_v")), id_col)
    a = cv.select(F.col(query_col), F.col(id_col).alias("_ia"),
                  F.col("_v").alias("_va"))
    b = cv.select(F.col(query_col).alias("_q2"),
                  F.col(id_col).alias("_ib"), F.col("_v").alias("_vb"))
    pairs = a.join(b, (a[query_col] == b["_q2"])
                   & (F.col("_ia") != F.col("_ib")))
    sim = V.dot(V.to_double(F.col("_va")), V.to_double(F.col("_vb")))
    return pairs.groupBy(query_col).agg(
        F.round(F.avg(sim), 5).alias("mean_pairwise_sim"))
