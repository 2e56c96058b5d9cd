"""Generic k-shortest-walks fuzz: random DAGs with PafDistance weights,
element-wise against the reference solver (tests/oracle/ksw_harness,
which links the deterministic allocator)."""

import pathlib
import random
import subprocess

import pytest

from alignasm_tpu.engine.kshortest import KShortestWalks
from alignasm_tpu.model import distance as D

HARNESS = pathlib.Path(__file__).parent / "oracle" / "bin" / "ksw_harness"


def _random_dag(rng: random.Random, n: int, p: float):
    """Random DAG on n vertices (edges only forward) with small weights
    so distance ties are frequent."""
    adj = [[] for _ in range(n)]
    for u in range(n - 1):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = (
                    rng.randrange(0, 4),      # qry
                    rng.randrange(0, 4),      # ref
                    rng.randrange(0, 2),      # anom
                    rng.randrange(0, 2),      # nz
                    1,
                )
                adj[u].append((v, w))
    return adj


@pytest.fixture(scope="module")
def harness(oracle_bin):
    # oracle_bin fixture builds the oracle tree; build the harness too
    if not HARNESS.exists():
        subprocess.run(
            ["make", "-C", str(HARNESS.parent.parent), "bin/ksw_harness"],
            check=True, capture_output=True,
        )
    return HARNESS


@pytest.mark.parametrize("seed", range(6))
def test_dijkstra_and_spfa_match_dag_sp(seed):
    """The generic library modes (k_shortest_walks.hpp:69-129, dead in
    alignasm itself) must agree with the DAG shortest-path pass on
    non-negative DAGs: same distance keys for every reachable vertex."""
    from alignasm_tpu.engine.kshortest import (
        bellman_ford, dijkstra, shortest_path_dag,
    )

    rng = random.Random(seed + 100)
    n = rng.randrange(6, 16)
    adj = _random_dag(rng, n, p=0.45)
    d_dag, _ = shortest_path_dag(adj, 0, D.CALC_SUM)
    d_dij, _ = dijkstra(adj, 0)
    d_bf, _ = bellman_ford(adj, 0)
    for v in range(n):
        if d_dag[v] is D.MAX_DIST:
            assert d_dij[v] is D.MAX_DIST and d_bf[v] is D.MAX_DIST
        else:
            key = D.key(d_dag[v], D.CALC_SUM)
            assert D.key(d_dij[v], D.CALC_SUM) == key, v
            assert D.key(d_bf[v], D.CALC_SUM) == key, v


def test_bellman_ford_handles_negative_edges():
    """SPFA must handle negative edge weights (dijkstra's precondition
    doesn't hold) — a cheaper path through a negative edge must win."""
    from alignasm_tpu.engine.kshortest import bellman_ford

    neg = (-5, 0, 0, 0, 1)
    pos = lambda q: (q, 0, 0, 0, 1)
    # 0 -> 1 (cost 10), 0 -> 2 (cost 8), 2 -> 1 (cost -5): best 0->2->1 = 3
    adj = [[(1, pos(10)), (2, pos(8))], [], [(1, neg)]]
    d, prv = bellman_ford(adj, 0)
    assert D.score_sum(d[1]) == 3 and prv[1] == 2


def test_bellman_ford_no_false_cycle_on_negative_dag():
    """Soundness regression (round-5 review): a DAG whose vertices
    improve many times (parallel edges + heavy negative chain) has NO
    cycle — an unsound per-vertex improvement-count certificate raised
    a false NegativeCycleError here and recovered a garbage 'cycle'
    through Python's negative indexing."""
    from alignasm_tpu.engine.kshortest import bellman_ford

    w = lambda q: (q, 0, 0, 0, 1)
    adj = [
        [(1, w(-100))],
        [(2, w(-100)), (4, w(0)), (4, w(-10))],
        [(3, w(-100)), (4, w(0)), (4, w(-10))],
        [(4, w(0)), (4, w(-10))],
        [],
    ]
    d, prv = bellman_ford(adj, 0)
    assert D.score_sum(d[3]) == -300
    assert D.score_sum(d[4]) == -310 and prv[4] == 3


def test_bellman_ford_detects_negative_cycle():
    from alignasm_tpu.engine.kshortest import NegativeCycleError, bellman_ford

    w = lambda q: (q, 0, 0, 0, 1)
    # 1 -> 2 -> 1 with total weight -1: a negative cycle
    adj = [[(1, w(1))], [(2, w(-3))], [(1, w(2))]]
    with pytest.raises(NegativeCycleError) as exc:
        bellman_ford(adj, 0)
    cyc = exc.value.cycle
    assert cyc[0] == cyc[-1] and set(cyc) == {1, 2}


@pytest.mark.parametrize("seed", range(8))
def test_random_dag_enumeration_matches_reference(harness, seed):
    rng = random.Random(seed)
    n = rng.randrange(6, 16)
    adj = _random_dag(rng, n, p=0.45)
    src, dest = 0, n - 1
    k = 200

    lines = [f"{n} {src} {dest} {k} {sum(len(a) for a in adj)}"]
    for u in range(n):
        for v, w in adj[u]:
            lines.append(f"{u} {v} {w[0]} {w[1]} {w[2]} {w[3]} {w[4]}")
    ref = subprocess.run(
        [str(harness)], input="\n".join(lines), capture_output=True,
        text=True, check=True,
    ).stdout.splitlines()
    ref = [l for l in ref if l and l != "END"]

    solver = KShortestWalks(adj, D.CALC_SUM)
    kd = solver.solve(src, dest, k)
    assert len(kd) == len(ref), (len(kd), len(ref))
    for i, line in enumerate(ref):
        head, _, tail = line.partition("|")
        ref_d = tuple(int(x) for x in head.split()[1:])
        ref_path = tail.split()
        assert kd[i] == ref_d, f"walk {i}: {kd[i]} vs {ref_d}"
        my_path = [f"{u}->{v}" for u, v, _w in solver.recover(src, dest, i)]
        assert my_path == ref_path, f"walk {i} path"
