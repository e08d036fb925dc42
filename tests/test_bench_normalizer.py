"""Unit tests for the bench container-speed pin EVIDENCE block.

History: the r8-r11 normalizer divided totals by a pooled three-pin
ratio, guarded from r11 by a 1.25-spread disagreement alarm (ADVICE r9
#5). The r12 re-pin measured the idle-sitting spread distribution under
refreshed multi-sitting pins — 1.23-1.87 across eight known-good idle
sittings — which contains every sitting previously called pathological,
so the pooled divisor was removed entirely: the pins now ship as three
per-shape speed indicators plus spread/median evidence, and a
``decoupled`` flag that fires only past the observed idle maximum.
The r13 re-derivation (r12 verdict ask #2) retired that pre-memo range
for the post-memoization multi-day population: n=13 in-bench idle
sittings across two days, range 1.00-1.58, decoupled bound 1.75."""

from __future__ import annotations

import os

import bench


def _warm(scale_by_pin):
    """Synthetic warm dict: each pin's pinned time scaled by its own
    per-pin container-speed ratio."""
    return {
        n: round(bench.NORMALIZER_PINS_SF01[n] * scale_by_pin[n], 4)
        for n in bench.NORMALIZER_PINS_SF01
    }


def test_agreeing_pins_record_ratios_and_median():
    warm = _warm(
        {"count_lineitem": 1.10, "pricing_summary": 1.08, "doc_token_stats": 1.12}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["decoupled"] is False
    assert abs(n["pin_spread"] - 1.12 / 1.08) < 1e-3
    # the descriptive median sits on the middle pin
    assert abs(n["ratio_median"] - 1.10) < 1e-3
    assert set(n["per_pin_ratios"]) == set(bench.NORMALIZER_PINS_SF01)
    assert n["idle_spread_range"] == list(bench.PIN_SPREAD_IDLE_RANGE)


def test_idle_range_spread_is_not_flagged():
    """r10's '1.06/1.08/1.41' sitting (spread 1.33) motivated the old
    alarm — but the post-memo idle distribution (1.00-1.58, n=13 over
    two days) CONTAINS it, so under the evidence-only design it
    records, not alarms: page-cache decoupling at this magnitude is
    the normal state."""
    warm = _warm(
        {"count_lineitem": 1.06, "pricing_summary": 1.08, "doc_token_stats": 1.41}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["decoupled"] is False
    assert (
        bench.PIN_SPREAD_IDLE_RANGE[0]
        < n["pin_spread"]
        < bench.PIN_SPREAD_IDLE_RANGE[1]
    )
    assert abs(n["per_pin_ratios"]["doc_token_stats"] - 1.41) < 1e-2


def test_spread_past_idle_maximum_flags_decoupled():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 2.0}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["decoupled"] is True
    assert n["pin_spread"] > bench.PIN_SPREAD_DECOUPLED


def test_no_pooled_divisor_fields_exist():
    """The load-bearing r12 property: nothing in the block is named or
    usable as the old pooled divisor."""
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.0}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert "ratio" not in n and "reliable" not in n
    fields = bench.compact_normalizer_fields(n)
    assert "normalizer_ratio" not in fields
    assert "normalizer_ratio_rejected" not in fields
    assert fields["normalizer_ratio_median"] == n["ratio_median"]
    assert "normalizer_decoupled" not in fields  # only ships when fired


def test_compact_fields_carry_decoupled_flag_when_fired():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 2.5}
    )
    fields = bench.compact_normalizer_fields(
        bench.compute_normalizer(warm, 0.1)
    )
    assert fields["normalizer_decoupled"] is True
    assert "normalizer_ratio" not in fields


def test_compact_fields_no_normalizer_is_empty():
    assert bench.compact_normalizer_fields(None) == {}


def test_pins_only_apply_at_sf01():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.0}
    )
    assert bench.compute_normalizer(warm, 0.01) is None


def test_missing_pin_entry_disables_normalizer():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.0}
    )
    del warm["pricing_summary"]
    assert bench.compute_normalizer(warm, 0.1) is None


def test_zero_pin_time_is_decoupled_not_crash():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.0}
    )
    warm["count_lineitem"] = 0.0
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["decoupled"] is True
    assert n["pin_spread"] is None


def test_fs_meta_probe_returns_all_phases_positive():
    """The r14 FS-metadata pin: every phase of the commit-protocol
    primitive set (create/rename/list/unlink + fsync journal probe)
    must report a non-negative wall and the file count must be
    verified — a probe that silently timed the wrong number of ops
    would corrupt the cross-sitting axis it exists to carry."""
    out = bench._fs_meta_probe(n_files=16)
    assert out is not None and out["n_files"] == 16
    for k in ("create_ms", "rename_ms", "list_ms", "unlink_ms",
              "fsync_1mib_ms", "meta_total_ms"):
        assert out[k] >= 0.0
    # meta_total covers exactly the four metadata phases (fsync excluded)
    phases = (out["create_ms"] + out["rename_ms"] + out["list_ms"]
              + out["unlink_ms"])
    assert abs(out["meta_total_ms"] - phases) < 0.5


def test_fs_meta_probe_cleans_up_tempdir():
    """ADVICE r15 (low): glob under tempfile.gettempdir(), not a literal
    /tmp — mkdtemp honors TMPDIR, so the literal made this assertion
    vacuously true (two empty sets) whenever TMPDIR pointed elsewhere."""
    import glob
    import tempfile

    pattern = os.path.join(tempfile.gettempdir(), "bench_fsmeta_*")
    before = set(glob.glob(pattern))
    bench._fs_meta_probe(n_files=8)
    after = set(glob.glob(pattern))
    assert after <= before


def test_fs_meta_probe_integrity_check_precedes_fsync(monkeypatch):
    """ADVICE r15 (low): a stray file in the probe tempdir must doom the
    probe right after the list phase — before the unlink loop and the
    1 MiB fsync run for a result that will be discarded. Pinned by
    making fsync explode: the reordered probe never reaches it."""
    import tempfile

    real_mkdtemp = tempfile.mkdtemp

    def mkdtemp_with_stray(prefix=""):
        d = real_mkdtemp(prefix=prefix)
        open(os.path.join(d, "stray"), "wb").close()
        return d

    def fsync_boom(fd):
        raise AssertionError("fsync ran on a doomed probe")

    monkeypatch.setattr(tempfile, "mkdtemp", mkdtemp_with_stray)
    monkeypatch.setattr(os, "fsync", fsync_boom)
    assert bench._fs_meta_probe(n_files=8) is None


def test_cpu_pct_delta_excludes_guest_time():
    """ADVICE r14 (low): Linux folds guest/guest_nice into user/nice in
    /proc/stat (proc(5)), so the percentage denominator must not count
    the guest columns a second time."""
    start = {"user": 0, "nice": 0, "system": 0, "idle": 0, "iowait": 0,
             "irq": 0, "softirq": 0, "steal": 0, "guest": 0,
             "guest_nice": 0}
    end = dict(start, user=80, guest=60, idle=20)  # guest ⊂ user
    pct = bench._cpu_pct_delta(start, end)
    assert "guest" not in pct and "guest_nice" not in pct
    # denominator is user+idle=100, NOT user+guest+idle=160
    assert pct["user"] == 80.0 and pct["idle"] == 20.0
