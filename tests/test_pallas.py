"""Dense relaxation kernels: the Pallas kernel (interpret mode) and its
XLA twin must agree bit-for-bit with the sparse relaxation kernel."""

import numpy as np
import pytest

from alignasm_tpu.config import DEFAULT_CONFIG
from alignasm_tpu.engine.device import pack_graph
from alignasm_tpu.engine.graph import build_graph
from alignasm_tpu.io.paf import read_paf
from alignasm_tpu.ops.pallas_relax import dense_sp_pallas, dense_sp_xla, pack_dense
from alignasm_tpu.ops.relax import solve_graph_batch
from tests.conftest import DATA_DIR


def _small_graphs(max_v=64, max_n=10):
    ds = read_paf(DATA_DIR / "synth_small.paf")
    out = []
    for ctg in ds.contigs:
        if not 2 <= len(ctg) <= max_n:
            continue
        g = build_graph(ctg, DEFAULT_CONFIG)
        if g.n_vertices > max_v:
            continue
        pg = pack_graph(g)
        dm = pack_dense(pg, max_v)
        if dm is not None:
            out.append((g, pg, dm))
    assert out, "no small graphs in fixture"
    return out


def _sparse_reference(g, pg):
    E = len(pg.eu)
    return solve_graph_batch(
        pg.eu[None], pg.ev[None], pg.es[None], pg.ea[None],
        pg.enz[None], pg.etot[None], pg.erank[None],
        np.ones((1, E), bool),
        np.asarray([g.src], np.int32), np.asarray([g.dest], np.int32),
        V=g.n_vertices, n_sweeps=g.n + 2,
    )


def _check(out, b, g, pg):
    ref = _sparse_reference(g, pg)
    s = np.asarray(out["s"][b, 0])[: g.n_vertices]
    rs = np.asarray(ref["d_s"][0])
    rs32 = np.where(rs >= 2**62, 2**30, rs)
    assert (s == rs32).all()
    win = np.asarray(out["win"][b, 0])[: g.n_vertices]
    eid = np.asarray(ref["d_eid"][0])
    bestv = np.where(eid >= 0, pg.ev[np.clip(eid, 0, None)], -1)
    assert ((s >= 2**30) | (win == bestv)).all()


def test_dense_xla_twin_matches_sparse():
    V = 64
    graphs = _small_graphs(max_v=V, max_n=24)
    arrs = [np.stack([d[i] for _g, _p, d in graphs]) for i in range(5)]
    dest = np.stack([np.full((1, V), g.dest, np.int32) for g, _p, _d in graphs])
    n_sweeps = max(g.n for g, _, _ in graphs) + 2
    out = dense_sp_xla(*arrs, dest, n_sweeps=n_sweeps)
    for b, (g, pg, _d) in enumerate(graphs):
        _check(out, b, g, pg)


def test_dense_pallas_interpret_matches_sparse():
    V = 32
    graphs = [t for t in _small_graphs(max_v=V, max_n=6)][:2]
    if not graphs:
        pytest.skip("no tiny graphs")
    arrs = [np.stack([d[i] for _g, _p, d in graphs]) for i in range(5)]
    dest = np.stack([np.full((1, V), g.dest, np.int32) for g, _p, _d in graphs])
    n_sweeps = max(g.n for g, _, _ in graphs) + 2
    out = dense_sp_pallas(*arrs, dest, n_sweeps=n_sweeps, interpret=True)
    for b, (g, pg, _d) in enumerate(graphs):
        _check(out, b, g, pg)
