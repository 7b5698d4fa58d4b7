"""Shared k-means primitives for the trained quantizers.

One implementation of the three pieces `simsearch.train_codebook`
(IVF coarse quantizer) and `quantize.pq_train` (per-subspace PQ
codebooks) both need:

  * a seeded, partition-independent driver sample (md5-ordered — any
    engine reproduces it), bounded by sample_n regardless of corpus
    size;
  * k-means++ seeding (D^2-weighted; first-k init collapses on
    clustered data — dense components grab many seeds and Lloyd's
    cannot split a merged cell afterwards);
  * Lloyd's iterations in the two metrics used in-repo: unit-normalized
    argmax-dot (the IVF probe rule) and raw expanded-L2 (PQ subspaces,
    where centroids reconstruct raw subvectors).

Callers pass their own ``rng`` so existing seeding schedules (and the
recorded probe results derived from them) stay bit-identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seeded_sample_matrix(vecs: DataFrame, sample_n: int, seed: int,
                         id_col: str = "vec_id",
                         vec_col: str = "vec") -> np.ndarray:
    """Deterministic sample -> (n, dim) float64 matrix on the driver."""
    samp = (vecs.select(id_col, vec_col)
            .orderBy(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))),
                     F.col(id_col))
            .limit(sample_n).toPandas())
    if not len(samp):
        # np.asarray([]) would be a 1-D (0,) array whose .shape unpack
        # fails with an opaque error far from the cause — fail here
        raise ValueError("seeded_sample_matrix: input has no rows")
    return np.asarray([np.asarray(v, dtype=np.float64)
                       for v in samp[vec_col]])


def kmeanspp_init(X: np.ndarray, k: int,
                  rng: np.random.Generator) -> np.ndarray:
    """D^2-weighted k-means++ seeding. With k == #distinct rows every
    distinct row is chosen (unchosen rows keep d2 > 0), which is what
    makes the saturating identity-quantizer construction provable."""
    n = len(X)
    C = np.empty((k, X.shape[1]))
    C[0] = X[int(rng.integers(n))]
    d2 = np.sum((X - C[0]) ** 2, axis=1)
    for c in range(1, k):
        tot = d2.sum()
        p = d2 / tot if tot > 0 else None
        C[c] = X[int(rng.choice(n, p=p))]
        d2 = np.minimum(d2, np.sum((X - C[c]) ** 2, axis=1))
    return C


def lloyd_ip_normalized(X: np.ndarray, C: np.ndarray,
                        iters: int) -> np.ndarray:
    """Lloyd's with unit-norm centroids and argmax-dot assignment — the
    IVF rule, so training and `ivf_search`'s probe can never disagree
    about a cell boundary."""
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[a == c]
            if len(members):
                C[c] = members.mean(axis=0)
        norms = np.linalg.norm(C, axis=1, keepdims=True)
        C = np.where(norms > 0, C / np.maximum(norms, 1e-12), C)
    return C


def lloyd_l2(X: np.ndarray, C: np.ndarray, iters: int) -> np.ndarray:
    """Raw-space Lloyd's with expanded-L2 argmin (constant ||x||^2
    dropped); centroids are NOT normalized — PQ reconstructs raw
    subvectors. Argmin ties resolve to the lowest centroid id."""
    C = C.copy()
    for _ in range(iters):
        a = np.argmin(-2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :],
                      axis=1)
        for c in range(len(C)):
            members = X[a == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C
