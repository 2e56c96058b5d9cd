"""Measured validation of the realistic generator (round-4 verdict
Next #6): generator output statistics must stay inside the documented
literature envelope (testing/realism_stats.py — the 'minimap2-faithful'
claim as numbers, not adjectives), and the gate must actually detect
drift."""

from alignasm_tpu.testing.realism_stats import (
    ENVELOPE, check_envelope, measure_realism_stats,
)
from alignasm_tpu.testing.synth import generate_realistic_paf


def test_generator_in_envelope():
    stats = measure_realism_stats(
        generate_realistic_paf(n_contigs=300, seed=4242))
    assert check_envelope(stats) == [], stats


def test_envelope_stable_across_seeds():
    """The in-envelope property is a distributional fact, not a lucky
    seed: three disjoint seeds at moderate scale."""
    for seed in (1, 77, 20260820):
        stats = measure_realism_stats(
            generate_realistic_paf(n_contigs=150, seed=seed))
        bad = check_envelope(stats)
        assert bad == [], (seed, bad)


def test_envelope_detects_drift():
    """A generator whose divergence knob drifts 10x must violate —
    otherwise the gate is decoration."""
    stats = measure_realism_stats(
        generate_realistic_paf(n_contigs=60, seed=3, sub_rate=0.02))
    bad = check_envelope(stats)
    assert any("sub_per_base" in v for v in bad), bad


def test_envelope_has_anchors():
    """Every bound carries its literature anchor and an honest
    lit/design classification."""
    for key, (lo, hi, kind, anchor) in ENVELOPE.items():
        assert lo < hi
        assert kind in ("lit", "design"), key
        assert len(anchor) > 10, key
