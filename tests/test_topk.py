"""Top-K candidate tensor vs the Eppstein engine: the (sum, anom)
multiset of the first K walks must match exactly."""

import numpy as np

from alignasm_tpu.config import DEFAULT_CONFIG
from alignasm_tpu.engine.device import pack_graph
from alignasm_tpu.engine.graph import build_graph
from alignasm_tpu.engine.kshortest import KShortestWalks
from alignasm_tpu.io.paf import read_paf
from alignasm_tpu.model import distance as D
from alignasm_tpu.ops.topk import pack_edge_keys, topk_walks_batch
from tests.conftest import DATA_DIR


def test_topk_matches_eppstein_prefix():
    ds = read_paf(DATA_DIR / "synth_hard.paf")
    K = 16
    checked = 0
    for contig in ds.contigs:
        if not 2 <= len(contig) <= 24:
            continue
        g = build_graph(contig, DEFAULT_CONFIG)
        pg = pack_graph(g)
        V = 1 << max(3, (g.n_vertices - 1).bit_length())
        if V > 128:
            continue
        wk1 = pack_edge_keys(pg, V)
        out = topk_walks_batch(
            wk1[None], np.asarray([g.dest], np.int32),
            V=V, K=K, n_sweeps=g.n + 2,
        )
        got = [int(x) for x in np.asarray(out[0][g.src]) if x < 2**62]

        solver = KShortestWalks(g.adj, D.CALC_SUM)
        kd = solver.solve(g.src, g.dest, K)
        want = sorted((D.score_sum(d) << 16) | d[D.A] for d in kd)
        assert got == want, (got, want)
        checked += 1
    assert checked >= 10, f"only {checked} contigs exercised"
