"""Scale probe: tfidf_top_terms + bm25_rank over millions of synthetic
docs with a Zipf-shaped vocabulary (VERDICT r9 asked for exactly this
after both operators' scale-shape fixes: tf-df join unhinted, global
top-k via TakeOrderedAndProject).

Docs are ~40 tokens drawn from a power-law over a 50k-word vocabulary
(`w<rank>`; exponent 2 concentrates mass in the head like natural
language), deterministically seeded per (doc_id, position). The BM25
query mixes a hot head term (w0 appears in a large fraction of docs —
the former single-partition-window hazard), a mid term, and a tail
term. Run at two sizes to check linear-ish scaling.

Usage: python tools/text_scale_probe.py [n_docs ...] [--out out_md]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import text
from cross_modal_multivector_search_spark.session import get_spark

VOCAB = 50_000
TOKENS_PER_DOC = 40
ZIPF_S = 2.0
BM25_TERMS = ["w0", "w137", "w48000"]


def synth_docs(spark, n: int):
    # u = first 8 md5 hex chars of (doc_id:pos) as uniform [0,1);
    # rank = floor(V * u^s): inverse-CDF power-law, all JVM-side
    u = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))),
        1, 8), 16, 10).cast("double") / F.lit(float(1 << 32)))
    word = F.concat(F.lit("w"), F.floor(
        F.lit(VOCAB) * F.pow(u, F.lit(ZIPF_S))).cast("long"))
    return (spark.range(n).withColumnRenamed("id", "doc_id")
            .select("doc_id", F.explode(
                F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC))).alias("pos"))
            .select("doc_id", word.alias("w"))
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.collect_list("w")).alias("text")))


def main() -> None:
    argv = sys.argv[1:]
    out = "-"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sizes = [int(a) for a in argv] or [1_000_000, 5_000_000]
    spark = get_spark("text-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    lines = ["", "## tfidf_top_terms + bm25_rank scale probe "
             f"(Zipf vocab {VOCAB}, {TOKENS_PER_DOC} tok/doc)", "",
             "| docs | gen s | tfidf s | bm25 s | bm25 hot-term df |",
             "|---|---|---|---|---|"]
    for n in sizes:
        t0 = time.time()
        docs = synth_docs(spark, n).repartition(64).cache()
        docs.count()
        t_gen = time.time() - t0

        t0 = time.time()
        n_tfidf = text.tfidf_top_terms(docs, k=5).count()
        t_tfidf = time.time() - t0

        t0 = time.time()
        bm = text.bm25_rank(docs, BM25_TERMS, k=20).collect()
        t_bm25 = time.time() - t0
        assert len(bm) == 20, len(bm)

        df_hot = docs.filter(
            F.col("text").rlike(r"(^| )w0( |$)")).count()
        lines.append(f"| {n:,} | {t_gen:.1f} | {t_tfidf:.1f} "
                     f"| {t_bm25:.1f} | {df_hot:,} "
                     f"({100.0 * df_hot / n:.0f}%) |")
        print(lines[-1], flush=True)
        assert n_tfidf == 5 * n, (n_tfidf, n)
        docs.unpersist()

    if out == "-":
        print("\n".join(lines))
    else:
        with open(out, "a") as f:
            f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
