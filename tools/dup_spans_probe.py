"""Scale probe: duplicate_ngram_spans over synthetic docs with planted
duplicate passages (substring-dedup shape at corpus scale).

Generates N docs of unique junk tokens (12 hex chars of md5 — wide
enough that passage-boundary grams sharing a junk token across two
planted docs are vanishingly unlikely; 6 chars measurably collided at
20k docs), plants a shared
10-token passage into 5% of docs at a doc-dependent offset, runs
`duplicate_ngram_spans(n=5)`, and checks every planted doc yields
exactly one maximal span of the passage's length while unplanted docs
yield nothing.

Usage: python tools/dup_spans_probe.py [n_docs] [out_md]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import dedup
from cross_modal_multivector_search_spark.session import get_spark

PASSAGE = " ".join(f"shared{i:02d}" for i in range(10))
N_GRAM = 5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out = sys.argv[2] if len(sys.argv) > 2 else "-"
    spark = get_spark("dup-spans-probe")
    spark.sparkContext.setLogLevel("ERROR")

    junk = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(25)),
        lambda i: F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), i)), 1, 12)))
    planted = (F.col("doc_id") % 100) < 5
    # passage spliced after a doc-dependent number of junk tokens so
    # span_start varies (exercises island grouping at many offsets)
    head_toks = (F.col("doc_id") % 10 + 3).cast("int")
    head = F.concat_ws(" ", F.slice(F.split(junk, " "), 1, head_toks))
    tail = F.concat_ws(" ", F.slice(F.split(junk, " "),
                                    head_toks + 1, F.lit(25)))
    docs = (spark.range(n).withColumnRenamed("id", "doc_id")
            .withColumn("text", F.when(
                planted,
                F.concat_ws(" ", head, F.lit(PASSAGE), tail))
                .otherwise(junk))
            .repartition(64).cache())
    docs.count()

    t0 = time.time()
    spans = dedup.duplicate_ngram_spans(docs, n=N_GRAM).cache()
    n_spans = spans.count()
    wall = time.time() - t0

    n_planted = docs.filter(planted).count()
    stats = spans.agg(
        F.countDistinct("doc_id").alias("docs"),
        F.min("span_len").alias("min_len"),
        F.max("span_len").alias("max_len")).collect()[0]
    ok = (n_spans == n_planted == stats["docs"]
          and stats["min_len"] == stats["max_len"] == 10)
    line = (f"dup_ngram_spans @ {n:,} docs (~{n * 26 // 1000}k tokens), "
            f"n={N_GRAM}: {wall:.1f}s wall, {n_spans:,} spans from "
            f"{n_planted:,} planted docs, span_len "
            f"{stats['min_len']}-{stats['max_len']}, "
            f"exact={'PASS' if ok else 'FAIL'}")
    print(line, flush=True)
    if out != "-":
        with open(out, "a") as f:
            f.write(f"\n- {line}\n")
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
