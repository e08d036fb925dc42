"""Registry rotation in __spark_entry__: the verify harness checks a
bounded prefix of queries() per round, so the dict must order
least-driver-checked entries first and stay a faithful permutation."""

from __future__ import annotations

import json

import __spark_entry__ as E


def test_rotation_is_permutation_and_prioritizes_unchecked():
    E._self_check()


def test_rounds_green_counts_clean_rows(tmp_path):
    rows = {
        "green_q": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "err_q": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
        "rows_only_q": {"rows_match": None, "schema_match": None, "hash_match": None,
                        "spark_rows": 5, "err": None},
        # a rows-only entry the driver checked: err=no_oracle + recorded
        # row count IS a clean round (it must rotate with the greens,
        # not permanently head the never-checked tier)
        "no_oracle_q": {"rows_match": None, "schema_match": None, "hash_match": None,
                        "spark_rows": 17, "err": "no_oracle"},
        # no_oracle WITHOUT a recorded row count = the query never ran
        "no_oracle_failed_q": {"rows_match": None, "schema_match": None,
                               "hash_match": None, "spark_rows": None,
                               "err": "no_oracle"},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    names = ["green_q", "err_q", "rows_only_q", "no_oracle_q",
             "no_oracle_failed_q", "new_q"]
    greens = E._rounds_green(names, here=str(tmp_path))
    assert greens == {"green_q": 1, "err_q": 0, "rows_only_q": 1,
                      "no_oracle_q": 1, "no_oracle_failed_q": 0, "new_q": 0}


def test_rotation_orders_by_green_count(tmp_path):
    names = ["a", "b", "c"]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {"hash_match": True, "err": None}})
    )
    greens = E._rounds_green(names, here=str(tmp_path))
    order = sorted(names, key=lambda n: (greens[n], names.index(n)))
    assert order == ["b", "c", "a"]


def test_recheck_slice_heads_rotation_with_greens():
    """Stale-green guard: right after the _FORCE_RECHECK block (which
    may legitimately hold never-green entries — e.g. an entry whose
    oracle was just fixed), the next min(_RECHECK_SLOTS, n_green)
    rotation entries must all be previously green, so the driver's
    bounded verify prefix re-proves them."""
    qs = list(E.Q.queries())
    greens = E._rounds_green(qs)
    n_green = sum(1 for g in greens.values() if g > 0)
    assert n_green >= E._RECHECK_SLOTS  # corpus has 100+ green rows by now
    rotated = E._rotation_order(qs)
    n_forced = len([n for n in E._FORCE_RECHECK if n in set(qs)])
    head = rotated[n_forced : n_forced + E._RECHECK_SLOTS]
    assert all(greens[n] > 0 for n in head)


def test_forced_recheck_leads_rotation():
    """Entries whose driver evidence predates their implementation must
    be reached THIS round regardless of green count: tie-break priority
    can't lift a 3-green entry over 106 two-green ones, so the forced
    list jumps the queue entirely (r7 verdict ask #1)."""
    qs = list(E.Q.queries())
    forced = [n for n in E._FORCE_RECHECK if n in qs]
    rotated = E._rotation_order(qs)
    assert rotated[: len(forced)] == forced
    # and they are not double-listed later
    assert len(rotated) == len(set(rotated))


def test_round_index_snapshots_per_process(tmp_path):
    """A CORRECTNESS file written mid-round must not shift the rotation
    phase: the round index is snapshotted at first call per directory."""
    here = str(tmp_path)
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    assert E._round_index(here) == 1
    (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
    assert E._round_index(here) == 1  # unchanged within the process


def test_recheck_slice_rotates_across_rounds(monkeypatch):
    """The slice must advance with the round counter so successive rounds
    walk different parts of the green set."""
    qs = list(E.Q.queries())
    monkeypatch.setattr(E, "_round_index", lambda here=None: 0)
    r0 = E._rotation_order(qs)[: E._RECHECK_SLOTS]
    monkeypatch.setattr(E, "_round_index", lambda here=None: 1)
    r1 = E._rotation_order(qs)[: E._RECHECK_SLOTS]
    assert r0 != r1


def test_every_oracle_binds_in_duckdb():
    """r9 verdict ask #6: the driver verifies a ~50-entry prefix per
    round, so an oracle whose SQL rots (schema drift, a typo in an
    edit) between driver visits could hide for several rounds. EXPLAIN
    binds every registered oracle against the sf0.001 corpus views in
    DuckDB — parse errors and unresolved tables/columns surface in
    seconds, without executing anything."""
    import duckdb

    from oracle import CORPUS

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in CORPUS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf}/{t}.parquet')"
        )
    failures = {}
    for name, sql in E.Q.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — report every rot at once
            failures[name] = str(e).splitlines()[0]
    assert not failures, f"oracle SQL no longer binds: {failures}"
