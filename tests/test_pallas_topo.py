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
        wires[b, :n_e, 0] = u * V + v
        wires[b, :n_e, 1] = s | (a << ANOM_SHIFT)
        dest = int(rng.integers(V // 2, V))
        wires[b, n_e, 0] = V * V
        wires[b, n_e, 1] = dest
        wires[b, n_e + 1, 0] = V * V + 1
        wires[b, n_e + 1, 1] = int(rng.integers(0, V // 2))
        # drop edges out of dest (it is a sink in production wires)
        bad = (wires[b, :n_e, 0] // V) == dest
        wires[b, :n_e, 0] = np.where(bad, V * (V + 1), wires[b, :n_e, 0])
    return wires.astype(np.int32).transpose(0, 2, 1)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_topo_matches_xla(seed):
    from alignasm_tpu.ops.dense import dense_solve_wire_topo_nxt8
    from alignasm_tpu.ops.pallas_topo import dense_solve_wire_topo_nxt8_pallas

    B, V, W = 16, 64, 128
    wire = _random_wire(B, V, W, seed)
    ref = np.asarray(dense_solve_wire_topo_nxt8(wire, V=V))
    got = np.asarray(
        dense_solve_wire_topo_nxt8_pallas(wire, V=V, interpret=True))
    np.testing.assert_array_equal(got, ref)
