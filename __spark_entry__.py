"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_project_gcp_spark`` (see SURVEY.md §2 for
the operator inventory each query name maps to).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from etl_project_gcp_spark import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Entries whose committed driver evidence predates their current
# implementation, or (r8) whose oracle was just fixed. These jump to
# the ABSOLUTE head of the rotation — ahead of the re-check slice —
# because tie-break priority alone cannot reach an entry whose green
# count is already above the tier the round's budget exhausts. Remove
# names once their driver row post-dates the rework. The r6-era eight
# (bpe_merges, dedup_minhash, ..., binary_resize_meta) all got their
# r7 hash-green rows and are cleared per the r7 verdict ask #2.
_FORCE_RECHECK: list[str] = [
    # r10: empty. The r9 eight (ann_*_topk ×6, binary_embed_topk,
    # dedup_simhash) all got their first full-hash rows in
    # CORRECTNESS_r09 under the pinned-VALUES oracles and are cleared
    # per the r9 verdict ask #1; they move to _PRIORITY below for a
    # second clean round.
]

# Registry entries the verify harness should reach first this round —
# tie-break only (within a green-count tier), so never-checked entries
# still come first. Use _FORCE_RECHECK for entries that must be reached
# regardless of their green count.
_PRIORITY: list[str] = [
    # r12: empty. The r9 ten (ann_* x6, binary_embed_topk,
    # dedup_simhash, binary_file_ingest_meta, bpe_merges) all collected
    # their second and third full-hash rows in r10/r11 and sit at >=4
    # greens — above the 3-green tier the rotation's budget reaches —
    # so the tie-break no longer applies to them. Every registry entry
    # is >=3-green (r11 verdict); the rotation now just walks the
    # 3-green tier toward 4-green registry-wide, no steering needed.
]


def _rounds_green(
    names: list[str],
    here: str = _HERE,
    oracled: set[str] | None = None,
) -> dict[str, int]:
    """Per query, how many past driver rounds recorded a clean row
    (CORRECTNESS_r*.json living next to this file).

    ``oracled`` = entries that TODAY carry a full value oracle. Their
    past rows-only checks (err="no_oracle") don't count: a rows-only
    clean is evidence for the weaker claim only, so an entry upgraded
    to a full oracle re-enters the rotation at its hash-green count —
    the exact situation that previously needed manual _FORCE_RECHECK
    entries every time an oracle landed (r9 verdict ask #1)."""
    greens = {n: 0 for n in names}
    if oracled is None:
        oracled = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for n, row in rows.items():
            if n not in greens or not isinstance(row, dict):
                continue
            # A rows-only entry's successful check is recorded as
            # err="no_oracle" with spark_rows set — that IS a clean
            # driver round. Counting it 0 made all 9 rows-only entries
            # permanently "never-checked", eating 9 of the ~50 verify
            # slots every round instead of rotating with the greens.
            ok_err = row.get("err") is None or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and n not in oracled
            )
            clean = (
                ok_err
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if clean:
                greens[n] += 1
    return greens


# Verify-prefix slots reserved each round for re-checking entries that are
# already driver-green. Least-checked-first alone lets an old green rot
# unnoticed when the engine or testdata changes (round 3: the events.ts
# layout change broke 8 r1-green queries for a full round); a rotating
# re-check window walks the green set across rounds so every green gets
# periodically re-proven.
_RECHECK_SLOTS = 10


# Rotation phase snapshots, one per directory: taken at first use so a
# CORRECTNESS file written mid-round (harness ordering) cannot shift the
# re-check slice between two queries() calls in the same process.
_ROUND_INDEX_CACHE: dict[str, int] = {}


def _round_index(here: str = _HERE) -> int:
    """Rounds completed so far = CORRECTNESS_r*.json files present at
    first call in this process (snapshotted — deterministic within a
    round even if the harness writes this round's file early), advances
    between rounds — the rotation phase for the re-check window."""
    if here not in _ROUND_INDEX_CACHE:
        _ROUND_INDEX_CACHE[here] = len(
            glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        )
    return _ROUND_INDEX_CACHE[here]


def _rotation_order(names: list[str], here: str = _HERE) -> list[str]:
    """Order the registry: a rotating slice of previously-green entries
    first (stale-green guard), then least-driver-checked first.

    The verify harness walks ``queries()`` in dict order and checks a
    bounded prefix per round (round 1 covered exactly the first 50 of
    111). Rotating by past CORRECTNESS results steers each round's
    budget at the entries with the fewest green rows, so the whole
    registry converges to driver-green across rounds without manual
    reordering; brand-new queries start at zero and are checked right
    after the re-check slice. The slice itself advances by
    ``_RECHECK_SLOTS`` per round, cycling through all greens.
    """
    greens = _rounds_green(names, here=here, oracled=set(Q.oracle_sql()))
    prio = {n: i for i, n in enumerate(_PRIORITY)}
    base = {n: i for i, n in enumerate(names)}
    ordered = sorted(
        names, key=lambda n: (greens[n], prio.get(n, len(prio)), base[n])
    )
    forced = [n for n in _FORCE_RECHECK if n in base]
    green_pool = [
        n
        for n in sorted(names, key=base.get)
        if greens[n] > 0 and n not in set(forced)
    ]
    if not green_pool:
        taken = set(forced)
        return forced + [n for n in ordered if n not in taken]
    start = (_round_index(here) * _RECHECK_SLOTS) % len(green_pool)
    recheck = [
        green_pool[(start + i) % len(green_pool)]
        for i in range(min(_RECHECK_SLOTS, len(green_pool)))
    ]
    taken = set(forced) | set(recheck)
    return forced + recheck + [n for n in ordered if n not in taken]


def _self_check() -> None:
    """Invariants the rotation must hold: a permutation of the registry,
    oracle keys a subset, the forced stale-evidence entries at the very
    head, then a re-check slice of previously-green entries (when any
    greens exist), then never-checked entries ahead of checked ones."""
    qs = Q.queries()
    rotated = _rotation_order(list(qs))
    assert sorted(rotated) == sorted(qs), "rotation must be a permutation"
    assert set(Q.oracle_sql()) <= set(qs), "oracle keys must be registered"
    greens = _rounds_green(list(qs), oracled=set(Q.oracle_sql()))
    forced = [n for n in _FORCE_RECHECK if n in qs]
    assert rotated[: len(forced)] == forced, (
        "forced re-check entries must lead the rotation"
    )
    n_green = sum(
        1 for n, g in greens.items() if g > 0 and n not in set(forced)
    )
    slice_len = min(_RECHECK_SLOTS, n_green)
    head = rotated[len(forced) : len(forced) + slice_len]
    tail = rotated[len(forced) + slice_len :]
    assert all(greens[n] > 0 for n in head), (
        "re-check slice must hold previously-green entries"
    )
    seen_checked = False
    for n in tail:
        if greens[n] > 0:
            seen_checked = True
        assert not (seen_checked and greens[n] == 0), (
            "never-checked entries must precede checked ones after the re-check slice"
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: product_metrics — dim→fact left join +
    grouped multi-aggregate + rounded avg (reference gold layer shape,
    etl_medallion.py:182-194)."""
    return Q.product_metrics(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-checked first (see _rotation_order)."""
    qs = Q.queries()
    return {n: qs[n] for n in _rotation_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records rows-only check)."""
    return Q.oracle_sql()
