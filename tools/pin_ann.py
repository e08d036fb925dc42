"""Regenerate etl_project_gcp_spark/_ann_pins.py after an INTENTIONAL
testdata/corpus change (the pins are corpus-keyed; a regen without a
corpus change that produces different rows is a regression, not a
stale pin — investigate before re-pinning).

Runs each pinned ANN entry at sf0.001/sf0.01/sf0.1 twice — once at 16
shuffle partitions, once at 7 — and refuses to write unless both runs
agree (partition-count independence, the property the pins rely on).

    python tools/pin_ann.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PINNED_ENTRIES = ("ann_lsh_topk", "ann_ivf_topk", "ann_ivf_index_topk")
SFS = ("sf0.001", "sf0.01", "sf0.1")


def _collect(parts: int) -> dict:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = {}
    for name in PINNED_ENTRIES:
        for sf in SFS:
            df = qs[name](spark, f"/root/testdata/{sf}")
            out.setdefault(name, {})[sf] = sorted(
                map(tuple, df.collect())
            )
    spark.stop()
    return out


def main() -> None:
    a = _collect(16)
    b = _collect(7)
    if a != b:
        raise SystemExit(
            "partition-count DEPENDENT results — these cannot be "
            "pinned; find the nondeterminism first"
        )
    if a["ann_ivf_topk"] != a["ann_ivf_index_topk"]:
        raise SystemExit(
            "in-memory IVF and persisted-index IVF disagree — the "
            "documented result-equality broke; fix before pinning"
        )
    header = open(
        os.path.join(
            os.path.dirname(__file__),
            "..",
            "etl_project_gcp_spark",
            "_ann_pins.py",
        )
    ).read()
    docstring = header.split('"""')[1]
    lines = [f'"""{docstring}"""', "", "# fmt: off", "ANN_PINNED = {"]
    for name in sorted(a):
        lines.append(f'    "{name}": {{')
        for sf in SFS:
            lines.append(f'        "{sf}": [')
            for q, n, c, rk in a[name][sf]:
                lines.append(f"            ({q}, {n}, {c!r}, {rk}),")
            lines.append("        ],")
        lines.append("    },")
    lines += ["}", "# fmt: on", ""]
    path = os.path.join(
        os.path.dirname(__file__),
        "..",
        "etl_project_gcp_spark",
        "_ann_pins.py",
    )
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}: {sum(len(v) for d in a.values() for v in d.values())} pinned rows")


if __name__ == "__main__":
    main()
