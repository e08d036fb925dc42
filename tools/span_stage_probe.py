"""A/B the duplicated_spans token-staging rewrite — measurement only.

The shipped formulation references the ``tokens(text_col)`` expression
from INSIDE the span-building transform lambda. Higher-order functions
run interpreted (no codegen, no subexpression elimination), so every
span element re-derives the whole split-lower-remove tokenization of
the document: O(n_tokens^2 / stride) per doc. The candidate stages the
token array as a concrete column attribute first (the dedup.py
shingle_arrays precedent), making the per-element work a cheap
attribute slice.

Two measurements, both interleaved in one process:

1. Doc-length scaling at CONSTANT total token count — the quadratic
   term shows as per-token cost growing with doc length under the
   shipped formulation and flat under the staged one. (The r12 100x
   corpus-size probe scaled doc COUNT at fixed length, which a
   per-doc-quadratic term passes — this axis is the one it missed.)
2. The real gate entry shape: sf0.1 documents via _t_wide, both
   variants, reps alternating order.

Every compared pair is equality-gated on the exact result rows
(n_spans / n_dup_spans longs and the IEEE ratio) before any timing is
reported.

Usage: python tools/span_stage_probe.py [reps]
"""

from __future__ import annotations

import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.operators import text as TX  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def staged_duplicated_spans(
    corpus: DataFrame,
    window: int = 20,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
) -> DataFrame:
    """Candidate: identical algebra, token array staged as a column."""
    staged = corpus.select(
        F.col(id_col), TX.tokens(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_spans = (F.floor((n - F.lit(window)) / F.lit(stride)) + 1).cast("int")
    idx = F.when(n >= window, F.sequence(F.lit(1), n_spans)).otherwise(
        F.array().cast("array<int>")
    )
    span_of = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(toks, (i - 1) * stride + 1, window)
    )
    spans_arr = F.transform(idx, span_of)
    if hash_spans:
        spans_arr = F.transform(spans_arr, lambda s: F.xxhash64(s))
    spans = staged.select(F.col(id_col), F.explode(spans_arr).alias("span"))
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("c"))
    return (
        spans.join(counts, "span")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("c") >= 2).cast("long")).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_ratio",
            F.col("n_dup_spans").cast("double")
            / F.col("n_spans").cast("double"),
        )
    )


def synth_docs(spark, n_docs: int, doc_len: int, seed: int = 7):
    """Deterministic corpus: n_docs docs of doc_len tokens from a small
    vocab, with a planted 40-token boilerplate block in every 5th doc
    so duplicate spans exist."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(1000)]
    boiler = " ".join(rng.choice(vocab) for _ in range(40))
    rows = []
    for d in range(n_docs):
        body = " ".join(rng.choice(vocab) for _ in range(doc_len - 40))
        text = (boiler + " " + body) if d % 5 == 0 else (
            " ".join(rng.choice(vocab) for _ in range(40)) + " " + body
        )
        rows.append((d, text))
    return spark.createDataFrame(rows, "doc_id int, text string").repartition(
        32
    ).localCheckpoint()


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def key(r):
    return (r.n_spans, r.n_dup_spans, r.dup_span_ratio)


def equal_gate(a: DataFrame, b: DataFrame, label: str) -> None:
    ra = {r.doc_id: key(r) for r in a.collect()}
    rb = {r.doc_id: key(r) for r in b.collect()}
    if ra != rb:
        diff = {k for k in ra.keys() | rb.keys() if ra.get(k) != rb.get(k)}
        raise SystemExit(f"EQUALITY GATE FAILED ({label}): {sorted(diff)[:5]}")
    print(f"  equality gate PASS ({label}, {len(ra)} docs)")


def ab(docs, reps, label, spark):
    equal_gate(
        TX.duplicated_spans(docs), staged_duplicated_spans(docs), label
    )
    times: dict[str, list[float]] = {"base": [], "staged": []}
    for rep in range(reps):
        order = (
            [("base", TX.duplicated_spans), ("staged", staged_duplicated_spans)]
            if rep % 2 == 0
            else [
                ("staged", staged_duplicated_spans),
                ("base", TX.duplicated_spans),
            ]
        )
        for vname, fn in order:
            spark.sparkContext.setJobDescription(f"span_stage {label} {vname}")
            t0 = time.time()
            materialize(fn(docs))
            times[vname].append(time.time() - t0)
    mb = statistics.median(times["base"])
    ms = statistics.median(times["staged"])
    print(
        f"  {label}: base {mb:.3f}s staged {ms:.3f}s ratio {ms / mb:.3f} "
        f"(all base={['%.3f' % t for t in times['base']]}, "
        f"staged={['%.3f' % t for t in times['staged']]})"
    )
    return mb, ms


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="span_stage_probe")
    materialize(Q.queries()["count_lineitem"](spark, SF_DIR))  # warmup

    print("== doc-length scaling, constant 400k total tokens ==")
    for doc_len in (250, 1000, 4000):
        docs = synth_docs(spark, 400_000 // doc_len, doc_len)
        mb, ms = ab(docs, reps, f"len={doc_len}", spark)
        per_tok_b = mb / 400_000 * 1e6
        per_tok_s = ms / 400_000 * 1e6
        print(
            f"    per-token: base {per_tok_b:.2f}us staged {per_tok_s:.2f}us"
        )
        docs.unpersist()

    print("== gate shape: sf0.1 documents via _t_wide ==")
    docs = Q._t_wide(spark, SF_DIR, "documents")
    ab(docs, reps, "sf0.1 documents", spark)


if __name__ == "__main__":
    main()
