"""Vector quantization: scalar int8 (SQ) and product quantization (PQ).

The 100 TB memory story for similarity search. The reference engine
holds full float32 vectors in RAM for every distance it computes
(`/root/reference/src/index_bipartite.cpp` loads the raw fbin matrix);
at 10^9+ vectors that is the capacity wall. Quantized codes shrink the
resident set — SQ: dim bytes/vector (4x vs float32), PQ: m_sub
bytes/vector (e.g. 32x at dim=64, m_sub=8) — while asymmetric distance
computation (ADC) scores full-precision queries against codes without
ever reconstructing the corpus.

Spark shapes:

  * ``sq_minmax`` — one JVM-side aggregation pass (posexplode +
    groupBy(pos), map-side combined to <= dim rows per partition; no
    shuffle of vector rows, no dim-scaled codegen unit).
  * ``sq_encode`` / ``sq_dequantize_expr`` — pure column expressions
    (stay in whole-stage codegen); the per-dim (lo, scale) constants
    ride in the plan as literals.
  * ``sq_adc_topk`` — declarative: dequantize + dot + grouped top-k
    (WindowGroupLimit), hash-reproducible against an ANSI-SQL twin.
  * ``pq_train`` — bounded driver work: per-subspace k-means++ /
    Lloyd's on a seeded sample (O(sample_n * dim), corpus-independent),
    mirroring ``simsearch.train_codebook``.
  * ``pq_encode`` / ``pq_adc_topk`` — ``mapInPandas`` GEMM passes; the
    codebook (m_sub*k*d_sub floats, ~100 KB at defaults) rides in the
    task closure, codes stream through Arrow batches, per-batch partial
    top-k merges via the same deterministic (score, id) tiebreak as
    ``brute_force.knn_exact_gemm``.

At cluster scale nothing here collects the corpus: encoding is
embarrassingly parallel, ADC search broadcasts only queries + codebook
+ LUTs, and the 4-32x smaller code column is what shuffles/caches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

from ..functions import vector as V
from .topk import grouped_topk


# --- scalar quantization --------------------------------------------


def sq_minmax(vecs: DataFrame, dim: int,
              vec_col: str = "vec") -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) over the corpus in one shuffle of ``dim``
    tiny rows.

    posexplode + groupBy(pos): partial aggregation runs map-side, so
    each partition emits at most ``dim`` (pos, lo, hi) rows into the
    shuffle regardless of corpus size — O(dim * partitions) bytes
    total. The previous shape (2*dim scalar aggregates in one agg call)
    moved even less but emitted a 2*dim-expression codegen unit — a
    1000+-expression method at dim 512, which blows the JIT's 8 KB
    inlining budget and can fail codegen outright. Driver output is
    O(dim) either way.
    """
    rows = (vecs.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
            .collect())
    if len(rows) != dim:
        raise ValueError(
            f"sq_minmax: expected {dim} dimensions, found {len(rows)} "
            "distinct positions (empty input or ragged vectors)")
    by_pos = {r["pos"]: (float(r["lo"]), float(r["hi"])) for r in rows}
    lo = [by_pos[i][0] for i in range(dim)]
    hi = [by_pos[i][1] for i in range(dim)]
    return lo, hi


def _sq_scales(lo: list[float], hi: list[float]) -> list[float]:
    # constant dimension -> scale 1.0: code 0, dequantizes to lo exactly
    return [(h - l) / 255.0 if h != l else 1.0
            for l, h in zip(lo, hi)]


def sq_encode(vecs: DataFrame, lo: list[float], hi: list[float],
              vec_col: str = "vec", out_col: str = "codes") -> DataFrame:
    """uint8 codes: code_i = clamp(floor((x_i - lo_i)/scale_i + 0.5),
    0, 255).

    Pure column expressions (no UDF): the (lo, scale) constants fold
    into the plan, the array stays in codegen. The expression shape
    (subtract, divide, +0.5, floor, greatest, least) is mirrored
    verbatim by the ANSI oracle so codes are bit-reproducible across
    engines. Both clamps matter for the build-once/encode-later use:
    vectors outside the trained [lo, hi] (new/streaming data against a
    stored scale) must saturate at 0/255, not wrap into negative codes.
    """
    s = _sq_scales(lo, hi)
    codes = F.array(*[
        F.greatest(
            F.least(F.floor((F.col(vec_col)[i] - F.lit(lo[i])) / F.lit(s[i])
                            + F.lit(0.5)), F.lit(255)),
            F.lit(0)).cast("int")
        for i in range(len(lo))
    ])
    return vecs.withColumn(out_col, codes)


def sq_dequantize_expr(lo: list[float], hi: list[float],
                       codes_col: str = "codes"):
    """dq_i = lo_i + code_i * scale_i as a column expression."""
    s = _sq_scales(lo, hi)
    return F.array(*[
        (F.lit(lo[i]) + F.col(codes_col)[i].cast("double") * F.lit(s[i]))
        for i in range(len(lo))
    ])


def sq_adc_topk(queries: DataFrame, base: DataFrame, dim: int, k: int,
                query_id: str = "query_id", base_id: str = "base_id",
                vec_col: str = "vec",
                minmax: tuple[list[float], list[float]] | None = None
                ) -> DataFrame:
    """Top-k inner product of full-precision queries against the
    int8-quantized corpus (asymmetric: only the base side is lossy).

    Declarative end-to-end: encode, dequantize, dot, WindowGroupLimit
    top-k — every stage an ANSI-SQL-expressible column expression, so
    the whole operator is oracle-checkable by value hash (unlike PQ,
    whose trained codebook needs the saturating k=n construction).

    The query side is broadcast-pinned: queries ≪ base is the operator's
    contract (same shape as every other search here), and without the
    hint a query side above autoBroadcastJoinThreshold silently degrades
    the plan from BroadcastNestedLoopJoin to a CartesianProduct over the
    corpus. ``minmax=(lo, hi)`` lets encode-once/search-many callers
    skip the two ``sq_minmax`` training jobs with a stored range.
    """
    lo, hi = minmax if minmax is not None else sq_minmax(base, dim, vec_col)
    coded = sq_encode(base.select(F.col(base_id).cast("long"), vec_col),
                      lo, hi, vec_col)
    dq = coded.select(base_id,
                      sq_dequantize_expr(lo, hi).alias("dqvec"))
    q = queries.select(F.col(query_id).cast("long"),
                       F.col(vec_col).alias("qvec"))
    scored = F.broadcast(q).crossJoin(dq).select(
        query_id, base_id,
        V.dot(F.col("qvec"), F.col("dqvec")).alias("score"))
    return grouped_topk(
        scored, [query_id],
        [F.col("score").desc(), F.col(base_id).asc()], k)


# --- product quantization -------------------------------------------


def _train_subspace_books(X: np.ndarray, m_sub: int, k: int,
                          iters: int, seed: int,
                          what: str) -> np.ndarray:
    """Per-subspace k-means++ + raw-L2 Lloyd's over a sample matrix —
    the shared trainer behind pq_train (raw vectors) and ivfpq_train
    (residuals). One rng schedule, one validation set: the two
    quantizers cannot drift."""
    from . import _kmeans
    n, dim = X.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    if n < k:
        raise ValueError(f"{what}: sample ({n}) < k ({k})")
    d_sub = dim // m_sub
    book = np.empty((m_sub, k, d_sub))
    for m in range(m_sub):
        Xm = X[:, m * d_sub:(m + 1) * d_sub]
        rng = np.random.default_rng([seed, k, m, n])
        C = _kmeans.kmeanspp_init(Xm, k, rng)
        book[m] = _kmeans.lloyd_l2(Xm, C, iters)
    return book


def pq_train(vecs: DataFrame, m_sub: int, k: int = 256,
             iters: int = 10, sample_n: int = 100_000, seed: int = 42,
             vec_col: str = "vec", id_col: str = "vec_id") -> np.ndarray:
    """Train a (m_sub, k, d_sub) PQ codebook on a bounded seeded sample.

    Per-subspace k-means++ seeding + Lloyd's, all driver-side NumPy on
    O(sample_n * dim) data — corpus-independent, the same bounded-
    training shape as ``simsearch.train_codebook``. Centroids are NOT
    normalized: PQ reconstructs raw subvectors.

    With k >= the number of distinct subvectors in a subspace the
    codebook converges to the identity quantizer (every subvector is
    its own centroid), making ADC scores exact — the saturating
    construction the oracle-checked driver query uses.
    """
    from . import _kmeans
    X = _kmeans.seeded_sample_matrix(vecs, sample_n, seed, id_col,
                                     vec_col)
    return _train_subspace_books(X, m_sub, k, iters, seed, "pq_train")


def pq_encode(vecs: DataFrame, codebook: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "vec",
              out_col: str = "codes") -> DataFrame:
    """(id, codes): nearest-centroid code per subspace, one GEMM per
    subspace per Arrow batch — the distributed encode pass. Codes are
    the only thing a downstream cache/shuffle needs to hold."""
    m_sub, k, d_sub = codebook.shape
    book = codebook.copy()
    schema = StructType([
        StructField(id_col, LongType()),
        StructField(out_col, ArrayType(IntegerType())),
    ])

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cn2 = (book * book).sum(axis=2)        # (m_sub, k)
        for pdf in it:
            ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            Xb = np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            codes = np.empty((len(ids), m_sub), dtype=np.int32)
            for m in range(m_sub):
                Xm = Xb[:, m * d_sub:(m + 1) * d_sub]
                codes[:, m] = np.argmin(
                    -2.0 * (Xm @ book[m].T) + cn2[m][None, :], axis=1)
            yield pd.DataFrame({id_col: ids,
                                out_col: list(codes)})

    return vecs.select(F.col(id_col).cast("long"),
                       vec_col).mapInPandas(encode, schema=schema)


def _query_luts(queries: DataFrame, pq_book: np.ndarray,
                coarse_book: np.ndarray | None = None,
                query_id: str = "query_id", vec_col: str = "vec"):
    """One Arrow fetch of the (small) query side -> (q_ids, LUT[,
    qcell]): the shared prep of every ADC scorer. LUT[q, m, c] is the
    partial dot of query q's m-th subvector against centroid c; qcell
    (residual scorers only) is the (n_q, n_cells) coarse-dot matrix."""
    m_sub, kc, d_sub = pq_book.shape
    q_pdf = queries.select(F.col(query_id).cast("long"),
                           vec_col).toPandas()
    q_ids = q_pdf.iloc[:, 0].to_numpy(dtype=np.int64)
    q_mat = (np.vstack(q_pdf.iloc[:, 1].to_numpy()).astype(np.float64)
             if len(q_pdf) else np.empty((0, m_sub * d_sub)))
    lut = np.einsum("qmd,mcd->qmc",
                    q_mat.reshape(len(q_ids), m_sub, d_sub), pq_book,
                    optimize=True)
    if coarse_book is None:
        return q_ids, lut
    qcell = q_mat @ np.ascontiguousarray(coarse_book,
                                         dtype=np.float64).T
    return q_ids, lut, qcell


def pq_adc_topk(queries: DataFrame, codes: DataFrame,
                codebook: np.ndarray, k: int,
                query_id: str = "query_id", base_id: str = "base_id",
                codes_id: str = "vec_id", vec_col: str = "vec",
                codes_col: str = "codes") -> DataFrame:
    """Asymmetric top-k: full-precision queries vs PQ codes.

    Queries (the small side, |Q| << corpus) fetch to the driver once;
    each task builds the (n_q, m_sub, k) lookup table of partial dots
    — one GEMM per subspace — then every Arrow batch of codes scores as
    pure table gathers (no reconstruction). Per-batch partial top-k
    with the deterministic (score desc, id asc) tiebreak, global merge
    via WindowGroupLimit — the knn_exact_gemm shape with codes instead
    of vectors streaming through."""
    q_ids, lut = _query_luts(queries, codebook, None, query_id, vec_col)
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, lut, k))

    schema = StructType([
        StructField("query_id", LongType()),
        StructField("base_id", LongType()),
        StructField("score", DoubleType()),
    ])

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tab, kk = bc.value
        if not len(ids):
            return
        nq = len(ids)
        for pdf in it:
            bids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            if not len(bids):
                continue
            cm = np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.int64)
            # scores[q, b] = sum_m LUT[q, m, codes[b, m]]
            sims = np.zeros((nq, len(bids)))
            for m in range(tab.shape[1]):
                sims += tab[:, m, :][:, cm[:, m]]
            kk_eff = min(kk, sims.shape[1])
            order = np.lexsort((np.broadcast_to(bids, sims.shape),
                                -sims), axis=1)[:, :kk_eff]
            rows = np.repeat(np.arange(nq), kk_eff)
            cols = order.ravel()
            yield pd.DataFrame({
                "query_id": ids[rows],
                "base_id": bids[cols],
                "score": sims[rows, cols],
            })

    partials = codes.select(
        F.col(codes_id).cast("long"), codes_col
    ).mapInPandas(score, schema=schema)
    out = grouped_topk(
        partials, ["query_id"],
        [F.col("score").desc(), F.col("base_id").asc()], k)
    return out.select(F.col("query_id").alias(query_id), "rank",
                      F.col("base_id").alias(base_id), "score")


# --- IVF-PQ: residual product quantization -------------------------


def ivfpq_train(vecs: DataFrame, coarse_book: np.ndarray, m_sub: int,
                k: int = 256, iters: int = 10, sample_n: int = 100_000,
                seed: int = 42, vec_col: str = "vec",
                id_col: str = "vec_id") -> np.ndarray:
    """PQ codebook over RESIDUALS vs the coarse (IVF) centroids.

    Plain PQ trains on globally-spread vectors, so its per-subspace
    cells resolve global structure and within-cluster neighbors fall
    below the distortion floor (the 1M probe: shortlist-30 recall
    0.20). Subtracting the assigned coarse centroid first leaves only
    the within-cell offset — typically ~10x smaller — so the same k
    centroids/subspace resolve ~10x finer. Same bounded-sample cost as
    ``pq_train``.
    """
    from . import _kmeans
    X = _kmeans.seeded_sample_matrix(vecs, sample_n, seed, id_col,
                                     vec_col)
    C = np.ascontiguousarray(coarse_book, dtype=np.float64)
    R = X - C[np.argmax(X @ C.T, axis=1)]
    return _train_subspace_books(R, m_sub, k, iters, seed, "ivfpq_train")


def ivfpq_encode(vecs: DataFrame, coarse_book: np.ndarray,
                 pq_book: np.ndarray, id_col: str = "vec_id",
                 vec_col: str = "vec") -> DataFrame:
    """(id, cell, codes): coarse assign + residual PQ encode FUSED in
    one mapInPandas pass — no join to recover centroids, the same
    map-only shape as ``spatial_shards``. The output is m_sub bytes of
    codes + one small int per vector; `cell` doubles as the partition /
    routing key at 100 TB."""
    m_sub, kc, d_sub = pq_book.shape
    coarse = np.ascontiguousarray(coarse_book, dtype=np.float64)
    book = pq_book.copy()
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("cell", LongType()),
        StructField("codes", ArrayType(IntegerType())),
    ])

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cn2 = (book * book).sum(axis=2)
        for pdf in it:
            ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            X = np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            cells = np.argmax(X @ coarse.T, axis=1)
            R = X - coarse[cells]
            codes = np.empty((len(ids), m_sub), dtype=np.int32)
            for m in range(m_sub):
                Rm = R[:, m * d_sub:(m + 1) * d_sub]
                codes[:, m] = np.argmin(
                    -2.0 * (Rm @ book[m].T) + cn2[m][None, :], axis=1)
            yield pd.DataFrame({id_col: ids,
                                "cell": cells.astype(np.int64),
                                "codes": list(codes)})

    return vecs.select(F.col(id_col).cast("long"),
                       vec_col).mapInPandas(encode, schema=schema)


def ivfpq_adc_topk(queries: DataFrame, codes: DataFrame,
                   coarse_book: np.ndarray, pq_book: np.ndarray,
                   k: int, query_id: str = "query_id",
                   base_id: str = "base_id",
                   codes_id: str = "vec_id",
                   vec_col: str = "vec") -> DataFrame:
    """Asymmetric top-k against residual codes.

    score(q, x) = q . c_cell(x) + q . residual(x): the first term is a
    tiny (n_q, n_cells) matrix computed once on the driver, the second
    the usual per-subspace LUT gather — both ride in one broadcast, so
    the scan stays pure table lookups. A cell-pruned variant (probe
    only the best coarse cells, IVF-style) falls out by pre-filtering
    ``codes`` on its `cell` column before calling this."""
    q_ids, lut, qcell = _query_luts(queries, pq_book, coarse_book,
                                    query_id, vec_col)
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, lut, qcell, k))

    schema = StructType([
        StructField("query_id", LongType()),
        StructField("base_id", LongType()),
        StructField("score", DoubleType()),
    ])

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tab, qc, kk = bc.value
        if not len(ids):
            return
        nq = len(ids)
        for pdf in it:
            bids = pdf["__bid"].to_numpy(dtype=np.int64)
            if not len(bids):
                continue
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            cm = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            sims = qc[:, cells].copy()
            for m in range(tab.shape[1]):
                sims += tab[:, m, :][:, cm[:, m]]
            kk_eff = min(kk, sims.shape[1])
            order = np.lexsort((np.broadcast_to(bids, sims.shape),
                                -sims), axis=1)[:, :kk_eff]
            rows = np.repeat(np.arange(nq), kk_eff)
            cols = order.ravel()
            yield pd.DataFrame({
                "query_id": ids[rows],
                "base_id": bids[cols],
                "score": sims[rows, cols],
            })

    partials = codes.select(
        F.col(codes_id).cast("long").alias("__bid"), "cell", "codes"
    ).mapInPandas(score, schema=schema)
    out = grouped_topk(
        partials, ["query_id"],
        [F.col("score").desc(), F.col("base_id").asc()], k)
    return out.select(F.col("query_id").alias(query_id), "rank",
                      F.col("base_id").alias(base_id), "score")


def ivfpq_search(queries: DataFrame, codes: DataFrame,
                 coarse_book: np.ndarray, pq_book: np.ndarray,
                 nprobe: int, k: int,
                 query_id: str = "query_id",
                 base_id: str = "base_id",
                 codes_id: str = "vec_id",
                 vec_col: str = "vec") -> DataFrame:
    """Cell-pruned ADC top-k: the IVF probe rule composed with residual
    codes — the full billion-scale search shape.

    Per query, only its ``nprobe`` best coarse cells are scanned: a
    tiny (query_id, cell) routing table (n_q x nprobe rows, driver
    NumPy from the same argmax-dot rule the codes were assigned with)
    broadcast-joins against the codes on `cell`, so with codes
    partitioned by cell the scan prunes at the storage layer — the
    ADC kernel then scores only the surviving (query, code) pairs via
    LUT gathers. Scan volume drops by ~n_cells/nprobe vs the full
    ``ivfpq_adc_topk`` at the recall cost of cells the router skipped
    (tests pin recall parity at saturating nprobe).
    """
    if nprobe < 1:
        raise ValueError(f"ivfpq_search: nprobe must be >= 1, got "
                         f"{nprobe} (0 would silently scan nothing)")
    q_ids, lut, qcell = _query_luts(queries, pq_book, coarse_book,
                                    query_id, vec_col)
    nprobe = min(nprobe, coarse_book.shape[0])
    qpos = {int(q): i for i, q in enumerate(q_ids)}
    spark = codes.sparkSession

    # (query_id, cell) routing pairs — n_q * nprobe rows, LocalRelation
    pairs = [(int(q), int(c))
             for i, q in enumerate(q_ids)
             for c in np.argsort(-qcell[i], kind="stable")[:nprobe]]
    if not pairs:
        return spark.createDataFrame(
            [], f"{query_id} long, rank int, {base_id} long, score double")
    route_df = spark.createDataFrame(pairs, "__qid long, cell long")

    bc = spark.sparkContext.broadcast((qpos, lut, qcell, k))
    schema = StructType([
        StructField("query_id", LongType()),
        StructField("base_id", LongType()),
        StructField("score", DoubleType()),
    ])

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos, tab, qc, kk = bc.value

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            qi = np.fromiter((pos[int(x)] for x in pdf["__qid"]),
                             dtype=np.int64, count=len(pdf))
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            cm = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            s = qc[qi, cells]
            for m in range(tab.shape[1]):
                s = s + tab[qi, m, cm[:, m]]
            out = pd.DataFrame({"query_id": pdf["__qid"].to_numpy(),
                                "base_id": pdf["__bid"].to_numpy(),
                                "score": s})
            # per-batch partial top-k per query (deterministic tiebreak)
            out = out.sort_values(
                ["query_id", "score", "base_id"],
                ascending=[True, False, True], kind="stable")
            return out.groupby("query_id", sort=False).head(kk)

        for pdf in it:
            if len(pdf):
                yield emit(pdf)

    # the probed-cell union is driver-known, so push it as a STATIC
    # filter before the join: with codes stored partitioned by `cell`
    # the scan partition-prunes to nprobe cells per query batch
    # (PartitionFilters in the plan — no reliance on runtime DPP); the
    # broadcast join then keeps only each query's own cells. Pure
    # pruning: the join is already an inner join on cell.
    probed_cells = sorted({c for _, c in pairs})
    probed = (codes.select(F.col(codes_id).cast("long").alias("__bid"),
                           "cell", "codes")
              .filter(F.col("cell").isin(probed_cells))
              .join(F.broadcast(route_df), "cell"))
    partials = probed.mapInPandas(score, schema=schema)
    out = grouped_topk(
        partials, ["query_id"],
        [F.col("score").desc(), F.col("base_id").asc()], k)
    return out.select(F.col("query_id").alias(query_id), "rank",
                      F.col("base_id").alias(base_id), "score")
