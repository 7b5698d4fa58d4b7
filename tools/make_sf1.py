"""Stage a synthetic sf1.0 dataset as a documented 10x scale-up of the
driver's read-only sf0.1 tables (VERDICT r11 directive #7: measure the
Spark-vs-DuckDB headline twins at 10x volume to show the per-job-floor
ratio inverting with scale; no network, so DuckDB's tpch generator is
unavailable and /root/testdata is read-only).

Scale-up rules (copy i in 0..9; copy 0 is the original rows):
  region/nation        — fixed dimensions, copied once (TPC-H shape).
  customer/supplier/
  part/orders/lineitem — keys offset by i * (max_key + 1) per copy,
                         foreign keys offset consistently, so each copy
                         is a disjoint self-consistent star; nation/
                         region FKs untouched (fixed dims).
  events               — event_id/user_id offset per copy: 10x users,
                         identical per-user session shapes.
  documents            — doc_id offset; for copies i>0 every 3rd token
                         is replaced by a copy-seeded md5 token, so no
                         3-token shingle survives between copies: the
                         MinHash/Jaccard/ngram-span dedup families see
                         organic-like pair density (10 verbatim copies
                         would add C(10,2)=45 near-dup pairs per doc —
                         a quadratic workload distortion, not a
                         scale-up).
  embeddings           — vec_id offset by i * n_rows (n_rows divisible
                         by the set cardinality, so set boundaries are
                         preserved); copy vectors are re-mixed
                         v' = normalize(0.15 v + 0.989 g) with seeded
                         unit Gaussian g: cos(v, v') ~= 0.15 +- 0.12,
                         ~2 sd below the 0.4 near-dup threshold, so
                         original->copy pairs are as rare as organic
                         random pairs at d=64 (near-dup pair count is
                         intrinsically quadratic in n at a fixed
                         threshold on this data — that growth is the
                         data's, not the scale-up's).

Deterministic (hash/seed-based, no RNG state shared across rows), so
Spark and DuckDB read one identical staged dataset.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1_data)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _read(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SRC}/{name}.parquet").to_pandas()


def _write(df: pd.DataFrame, out_dir: str, name: str,
           schema: pa.Schema) -> None:
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False),
                   f"{out_dir}/{name}.parquet")


def _offset(df: pd.DataFrame, cols: list, i: int,
            spans: dict) -> pd.DataFrame:
    out = df.copy()
    for c in cols:
        out[c] = out[c] + i * spans[c]
    return out


def _subst_tokens(text: str, copy: int) -> str:
    toks = text.split(" ")
    for j in range(2, len(toks), 3):
        h = hashlib.md5(f"{copy}:{toks[j]}".encode()).hexdigest()[:6]
        toks[j] = f"x{h}"
    return " ".join(toks)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_data"
    os.makedirs(out_dir, exist_ok=True)

    for name in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"{name}: copied ({t.num_rows} rows)")

    star = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    spans: dict[str, int] = {}
    frames = {name: _read(name) for name in star}
    # one span per KEY name, shared by PK and FK sides (o_custkey's
    # span == c_custkey's): the FK offset must match the PK offset
    key_alias = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
                 "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}
    for name, cols in star.items():
        for c in cols:
            if c not in key_alias:
                spans[c] = int(frames[name][c].max()) + 1
    for fk, pk in key_alias.items():
        spans[fk] = spans[pk]
    for name, cols in star.items():
        src = frames[name]
        schema = pq.read_table(f"{SRC}/{name}.parquet").schema
        out = pd.concat([_offset(src, cols, i, spans)
                         for i in range(COPIES)], ignore_index=True)
        _write(out, out_dir, name, schema)
        print(f"{name}: {len(src)} -> {len(out)} rows")

    docs = _read("documents")
    schema = pq.read_table(f"{SRC}/documents.parquet").schema
    span = int(docs["doc_id"].max()) + 1
    parts = [docs]
    for i in range(1, COPIES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * span
        d["text"] = [_subst_tokens(t, i) for t in d["text"]]
        d["n_chars"] = [len(t) for t in d["text"]]
        parts.append(d)
    _write(pd.concat(parts, ignore_index=True), out_dir, "documents",
           schema)
    print(f"documents: {len(docs)} -> {len(docs) * COPIES} rows")

    emb = _read("embeddings")
    schema = pq.read_table(f"{SRC}/embeddings.parquet").schema
    n = len(emb)
    # vec_id offsets of i * n preserve the vec_id // M set boundaries
    # ONLY when n is a multiple of M (the engine's multivector set
    # cardinality, __spark_entry__'s `vec_id // 5`); a non-divisible
    # source would silently produce copy-straddling sets mixing
    # original and re-mixed vectors — fail loudly instead
    M = 5
    assert n % M == 0, \
        f"embeddings rows ({n}) not divisible by set cardinality {M}"
    vecs = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    parts = [emb]
    for i in range(1, COPIES):
        g = np.random.default_rng([977, i]).standard_normal(vecs.shape)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        mixed = 0.15 * vecs + 0.989 * g
        mixed /= np.linalg.norm(mixed, axis=1, keepdims=True)
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + i * n
        e["embedding"] = [r.astype(np.float32) for r in mixed]
        parts.append(e)
    _write(pd.concat(parts, ignore_index=True), out_dir, "embeddings",
           schema)
    print(f"embeddings: {n} -> {n * COPIES} rows")
    print(f"staged sf1.0 scale-up at {out_dir}")


if __name__ == "__main__":
    main()
