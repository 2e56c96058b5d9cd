"""Device-routing cost model (runtime/costmodel.py) — the round-3
Amdahl A/B turned into policy: --engine tpu must never lose to the
native plane, because work is dispatched to the device only when the
measured model predicts a win."""

import dataclasses
import json
import pathlib

from alignasm_tpu.config import DEFAULT_CONFIG
from alignasm_tpu.runtime.costmodel import DeviceCostModel, load_model
from alignasm_tpu.testing.synth import generate_paf


def test_default_model_routes_nothing():
    """The measured constants (finish_vs_solve >= 1: the device-assisted
    finish costs MORE than the full native solve it replaces) mean no
    bucket can ever win — corpus-independent."""
    m = DeviceCostModel()
    assert not m.any_possible_win()
    # even an absurdly favorable bucket loses with finish_vs_solve >= 1
    assert not m.bucket_profitable(
        n_contigs=10**6, V=64, wire_bytes=1, row_bytes=1,
        sum_records=10**7)


def test_calibrated_model_can_route(tmp_path, monkeypatch):
    """On hardware where the finish is cheaper than the solve it
    replaces (a real DP-dominated regime), the model routes buckets
    whose saved work exceeds the transport cost."""
    cal = tmp_path / "cal.json"
    cal.write_text(json.dumps({
        "finish_vs_solve": 0.2, "dispatch_rtt_s": 2e-5,
        "h2d_bytes_per_s": 8e9, "d2h_bytes_per_s": 8e9,
    }))
    monkeypatch.setenv("ALIGNASM_TPU_COSTMODEL", str(cal))
    m = load_model()
    assert m.any_possible_win()
    # a large bucket saves real work...
    assert m.bucket_profitable(n_contigs=4096, V=64, wire_bytes=400_000,
                               row_bytes=270_000, sum_records=70_000)
    # ...a single tiny contig does not cover even a 20 us dispatch
    assert not m.bucket_profitable(n_contigs=1, V=8, wire_bytes=100,
                                   row_bytes=10, sum_records=4)


def test_model_rejects_unknown_fields(tmp_path, monkeypatch):
    cal = tmp_path / "bad.json"
    cal.write_text(json.dumps({"finish_vs_solve": 0.5, "typo_field": 1}))
    monkeypatch.setenv("ALIGNASM_TPU_COSTMODEL", str(cal))
    import pytest

    with pytest.raises(ValueError, match="typo_field"):
        load_model()


def test_auto_routing_byte_identical_and_recorded(tmp_path):
    """device_routing='auto' (the production default) must produce the
    same bytes as the forced device pipeline, record the decision in
    stats, and route through the fused native plane on this profile."""
    from alignasm_tpu.runtime.scheduler import solve_dataset_tpu

    p = tmp_path / "r.paf"
    p.write_text(generate_paf(n_contigs=20, seed=13))
    prefix = str(p)[:-4]

    assert DEFAULT_CONFIG.device_routing == "auto"
    solve_dataset_tpu(None, DEFAULT_CONFIG, src_paths=(str(p), None),
                      write_prefix=prefix)
    s = solve_dataset_tpu.last_stats
    assert s["routing"] == "auto"
    assert s["routed"] == "fused-native"
    assert s["device_routed_frac"] == 0.0
    assert s["cost_model"]["any_possible_win"] is False
    auto_bytes = [pathlib.Path(prefix + f".aln{x}.paf").read_bytes()
                  for x in ("", ".alt", ".all")]

    forced = dataclasses.replace(DEFAULT_CONFIG, device_routing="always")
    solve_dataset_tpu(None, forced, src_paths=(str(p), None),
                      write_prefix=prefix)
    s2 = solve_dataset_tpu.last_stats
    assert s2["device"] + s2["fallback"] + s2["singleton"] \
        + s2["native_direct"] >= 20
    for b, x in zip(auto_bytes, ("", ".alt", ".all")):
        assert b == pathlib.Path(prefix + f".aln{x}.paf").read_bytes(), x


def test_auto_routing_in_memory_results(tmp_path):
    """Without a write prefix (callers needing in-memory rows), auto
    routing solves on the exporter plane with the device gated off —
    results must equal the exact engine."""
    import copy

    from alignasm_tpu.engine.exact import solve_dataset
    from alignasm_tpu.io.paf import read_paf
    from alignasm_tpu.runtime.scheduler import solve_dataset_tpu

    p = tmp_path / "m.paf"
    p.write_text(generate_paf(n_contigs=10, seed=21))
    ds = read_paf(p)
    ds2 = copy.deepcopy(ds)
    got = solve_dataset_tpu(ds, DEFAULT_CONFIG, src_paths=(str(p), None))
    s = solve_dataset_tpu.last_stats
    assert s["routed"] == "native-plane"
    assert s["device"] == 0
    assert got == solve_dataset(ds2, DEFAULT_CONFIG)


def test_auto_with_calibration_gates_per_bucket(tmp_path, monkeypatch):
    """With a calibration where wins are possible (finish_vs_solve < 1),
    auto routing takes the exporter plane and gates per bucket: a huge
    dispatch RTT must gate every bucket (native covers, bytes correct),
    a negligible one must launch them."""
    from alignasm_tpu.runtime.scheduler import solve_dataset_tpu

    p = tmp_path / "g.paf"
    p.write_text(generate_paf(n_contigs=16, seed=31))
    prefix = str(p)[:-4]

    def run_with(cal):
        calp = tmp_path / "cal.json"
        calp.write_text(json.dumps(cal))
        monkeypatch.setenv("ALIGNASM_TPU_COSTMODEL", str(calp))
        solve_dataset_tpu(None, DEFAULT_CONFIG, src_paths=(str(p), None),
                          write_prefix=prefix)
        return dict(solve_dataset_tpu.last_stats)

    # wins possible in principle, but a 1000 s dispatch gates everything
    s = run_with({"finish_vs_solve": 0.2, "dispatch_rtt_s": 1000.0})
    assert s["routing"] == "auto"
    assert s.get("buckets_gated", 0) >= 1, s
    assert s["device"] == 0
    gated_bytes = [pathlib.Path(prefix + f".aln{x}.paf").read_bytes()
                   for x in ("", ".alt", ".all")]

    # near-free transport: the same buckets must launch
    s = run_with({"finish_vs_solve": 0.2, "dispatch_rtt_s": 1e-7,
                  "h2d_bytes_per_s": 1e12, "d2h_bytes_per_s": 1e12,
                  "device_s_per_contig": 1e-9, "device_s_per_step": 1e-9,
                  "solve_s_per_record": 1e-3})
    assert s.get("buckets_gated", 0) == 0, s
    assert s["device"] + s["fallback"] >= 1, s
    for b, x in zip(gated_bytes, ("", ".alt", ".all")):
        assert b == pathlib.Path(prefix + f".aln{x}.paf").read_bytes(), x
