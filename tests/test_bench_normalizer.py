"""Unit tests for the bench container-speed normalizer's disagreement
alarm (ADVICE r9 #5, automated in r11): when the three pins disagree
past the spread bound, the pooled ratio is noise and bench.py must
refuse to emit normalized values rather than divide by it."""

from __future__ import annotations

import bench


def _warm(scale_by_pin):
    """Synthetic warm dict: each pin's r8-pinned time scaled by its own
    per-pin container-speed ratio."""
    return {
        n: round(bench.NORMALIZER_PINS_SF01[n] * scale_by_pin[n], 4)
        for n in bench.NORMALIZER_PINS_SF01
    }


def test_agreeing_pins_are_reliable():
    warm = _warm(
        {"count_lineitem": 1.10, "pricing_summary": 1.08, "doc_token_stats": 1.12}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["reliable"] is True
    assert abs(n["pin_spread"] - 1.12 / 1.08) < 1e-3
    # pooled ratio sits inside the per-pin band
    assert 1.08 <= n["ratio"] <= 1.12
    assert set(n["per_pin_ratios"]) == set(bench.NORMALIZER_PINS_SF01)


def test_disagreeing_pins_refuse_normalization():
    """The motivating case: r10's noisy sitting measured per-pin ratios
    1.06 / 1.08 / 1.41 — one pooled number from those flatters or
    penalizes depending on which pin dominates the sum."""
    warm = _warm(
        {"count_lineitem": 1.06, "pricing_summary": 1.08, "doc_token_stats": 1.41}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["reliable"] is False
    assert n["pin_spread"] > bench.NORMALIZER_MAX_PIN_SPREAD
    # the evidence is still recorded even when refusing
    assert abs(n["per_pin_ratios"]["doc_token_stats"] - 1.41) < 1e-2


def test_spread_exactly_at_bound_is_reliable():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.25}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["reliable"] is True


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


def test_zero_pin_time_is_unreliable_not_crash():
    warm = _warm(
        {"count_lineitem": 1.0, "pricing_summary": 1.0, "doc_token_stats": 1.0}
    )
    warm["count_lineitem"] = 0.0
    n = bench.compute_normalizer(warm, 0.1)
    assert n is not None and n["reliable"] is False
    assert n["pin_spread"] is None


# ---------------------------------------------------------------------------
# compact_normalizer_fields: the ONE-line stdout fragment (ADVICE r11 —
# a rejected pooled ratio must never ship under the name a downstream
# consumer normalizes with)
# ---------------------------------------------------------------------------


def test_compact_fields_reliable_emits_normalizer_ratio():
    warm = _warm(
        {"count_lineitem": 1.10, "pricing_summary": 1.08, "doc_token_stats": 1.12}
    )
    fields = bench.compact_normalizer_fields(bench.compute_normalizer(warm, 0.1))
    assert "normalizer_ratio" in fields
    assert "normalizer_ratio_rejected" not in fields
    assert "normalizer_unreliable" not in fields
    assert fields["normalizer_pin_spread"] is not None


def test_compact_fields_unreliable_renames_ratio():
    """The r11 driver sitting's exact failure mode: the alarm fired,
    yet the compact line still carried normalizer_ratio — a consumer
    keying on that field alone would silently normalize with the
    rejected ratio. Rejected ratios must be impossible to use by
    accident."""
    warm = _warm(
        {"count_lineitem": 1.06, "pricing_summary": 1.08, "doc_token_stats": 1.41}
    )
    n = bench.compute_normalizer(warm, 0.1)
    assert n["reliable"] is False
    fields = bench.compact_normalizer_fields(n)
    assert "normalizer_ratio" not in fields
    assert fields["normalizer_unreliable"] is True
    # the evidence still ships, under the unmistakable name
    assert fields["normalizer_ratio_rejected"] == n["ratio"]
    assert fields["normalizer_per_pin_ratios"] == n["per_pin_ratios"]


def test_compact_fields_no_normalizer_is_empty():
    assert bench.compact_normalizer_fields(None) == {}
