"""Pallas twin of the production reverse-topo scan vs the XLA form.

The compiled-on-hardware validation (bit-equality at B=2048, V=64 on
the real v5e) ran in round 2; this suite covers the same parity in
interpret mode on the CPU mesh so regressions surface in CI.
"""

import numpy as np
import pytest


def _random_wire(B, V, W, seed):
    from alignasm_tpu.ops.dense import ANOM_SHIFT
    rng = np.random.default_rng(seed)
    wires = np.full((B, W, 2), V * (V + 1), np.int64)
    for b in range(B):
        n_e = int(rng.integers(V, W - 2))
        u = rng.integers(0, V - 1, n_e)
        v = u + 1 + (rng.integers(1, 1 << 30, n_e) % (V - 1 - u))
        s = rng.integers(1, 1 << 20, n_e)
        a = rng.integers(0, 3, n_e)
        cells = u * V + v
        # production wires never repeat a (u, v) cell (pack rejects
        # parallel edges); duplicate flat indices with different values
        # would make the on-device scatter's winner implementation-
        # defined, turning this parity test into a coin flip
        _uniq, first = np.unique(cells, return_index=True)
        keep = np.zeros(n_e, bool)
        keep[first] = True
        cells = np.where(keep, cells, V * (V + 1))
        dest = int(rng.integers(V // 2, V))
        # drop edges out of dest (it is a sink in production wires)
        cells = np.where((cells // V) == dest, V * (V + 1), cells)
        wires[b, :n_e, 0] = cells
        wires[b, :n_e, 1] = s | (a << ANOM_SHIFT)
        wires[b, n_e, 0] = V * V
        wires[b, n_e, 1] = dest
        wires[b, n_e + 1, 0] = V * V + 1
        wires[b, n_e + 1, 1] = int(rng.integers(0, V // 2))
    return wires.astype(np.int32).transpose(0, 2, 1)


@pytest.mark.parametrize("B,V,seed", [
    (16, 64, 0),     # G=8 branch
    (64, 64, 3),     # full-block batch
    (16, 128, 1),    # wider OW padding (V + 2 > 128 -> OW = 256)
])
@pytest.mark.parametrize("unroll", [False, True])
def test_pallas_topo_matches_xla(B, V, seed, unroll):
    from alignasm_tpu.ops.dense import dense_solve_wire_topo_nxt8
    from alignasm_tpu.ops.pallas_topo import dense_solve_wire_topo_nxt8_pallas

    W = 2 * V
    wire = _random_wire(B, V, W, seed)
    ref = np.asarray(dense_solve_wire_topo_nxt8(wire, V=V))
    got = np.asarray(
        dense_solve_wire_topo_nxt8_pallas(wire, V=V, interpret=True,
                                          unroll=unroll))
    np.testing.assert_array_equal(got, ref)


def test_pallas_topo_pads_odd_batches():
    """B not divisible by the block size must pad internally (the
    round-2 review found an assert here that a 3-contig tail bucket
    would have tripped)."""
    from alignasm_tpu.ops.dense import dense_solve_wire_topo_nxt8
    from alignasm_tpu.ops.pallas_topo import dense_solve_wire_topo_nxt8_pallas

    wire = _random_wire(3, 64, 128, 7)
    ref = np.asarray(dense_solve_wire_topo_nxt8(wire, V=64))
    got = np.asarray(
        dense_solve_wire_topo_nxt8_pallas(wire, V=64, interpret=True))
    np.testing.assert_array_equal(got, ref)
