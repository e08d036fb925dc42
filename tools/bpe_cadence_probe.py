"""A/B the distributed BPE loop's lineage-truncation cadence.

The shipped loop localCheckpoints the symbol table EVERY merge round
(12 rounds = 12 checkpoint materializations + 12 winner aggregates).
Candidate: checkpoint every K rounds — the expression tree between
checkpoints grows by one _apply_merge fold per round, trading plan
size for fewer materialization jobs.

Variants interleaved in one process; equality gate on the merge table.

Usage: python tools/bpe_cadence_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.operators import text as TX  # noqa: E402
from etl_project_gcp_spark.operators.text import (  # noqa: E402
    _apply_merge,
    word_frequencies,
)
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_MERGES = 12
VOCAB_LIMIT = 5000


def fit_distributed_cadence(docs, cadence: int):
    """The shipped distributed loop, checkpointing every `cadence`
    rounds instead of every round."""
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, "text", top=VOCAB_LIMIT)
        .select(F.col("word").alias("w"), F.col("n").alias("cnt"))
    )
    syms = words.select(
        "cnt",
        F.filter(F.split(F.col("w"), "(?!^)"), lambda s: s != "").alias("syms"),
    ).localCheckpoint()

    merges = []
    since_ckpt = 0
    for rank in range(NUM_MERGES):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.desc("pc"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = pairs[0]
        merges.append((rank, best["l"], best["r"]))
        syms = syms.select(
            "cnt",
            _apply_merge(
                F.col("syms"), F.lit(best["l"]), F.lit(best["r"])
            ).alias("syms"),
        )
        since_ckpt += 1
        if since_ckpt >= cadence:
            syms = syms.localCheckpoint()
            since_ckpt = 0
    return spark.createDataFrame(
        [(r, l, x, l + x) for r, l, x in merges],
        "rank int, left string, right string, merged string",
    )


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="bpe_cadence_probe")
    docs = Q._t(spark, SF_DIR, "documents")

    shipped = TX.bpe_learn_merges(docs, num_merges=NUM_MERGES, fit="distributed")
    want = sorted(map(tuple, shipped.collect()))
    for cad in (4, NUM_MERGES):
        got = sorted(map(tuple, fit_distributed_cadence(docs, cad).collect()))
        assert got == want, f"cadence {cad} changes the merge table!"
    print("equality gate: merge tables identical (cadence 1, 4, 12)", flush=True)

    variants = {
        "cad1 (shipped)": lambda d: TX.bpe_learn_merges(
            d, num_merges=NUM_MERGES, fit="distributed"
        ),
        "cad4": lambda d: fit_distributed_cadence(d, 4),
        "cad12": lambda d: fit_distributed_cadence(d, NUM_MERGES),
    }
    times = {k: [] for k in variants}
    for rep in range(reps):
        names = list(variants) if rep % 2 == 0 else list(variants)[::-1]
        for name in names:
            t0 = time.time()
            materialize(variants[name](docs))
            times[name].append(time.time() - t0)
        print(f"rep {rep} done", flush=True)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}  "
            f"{[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
