"""Device (TPU) contig engine: batched graph solve + host finish.

Division of labor (SURVEY.md §7 phases 2-4):
  * host: graph construction (engine.graph — C++-bound later), packing
    to struct-of-arrays, path backtracking, upgrade pass, output
    casework (reusing the exact engine's oracle-faithful functions);
  * device: every relaxation — distance-to-sink with exact tie-breaks,
    anomaly floor, per-anomaly-level constrained SP, walk-count DPs —
    batched over a bucket of contigs in one jitted XLA program.

Byte-identity policy: the device path handles a contig alone only when
its solution is provably order-insensitive (no full-distance ties in
any consumed walk group, k-budget not binding, anomaly levels within
range).  Anything else routes to the exact host engine, so results are
bit-identical to the reference in ALL cases — the device is a fast
path, never an approximation.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from fractions import Fraction

import numpy as np

from alignasm_tpu.config import AlignasmConfig
from alignasm_tpu.engine.graph import ContigGraph
from alignasm_tpu.engine.kshortest import topology_sort
from alignasm_tpu.engine import exact as exact_engine

_RANK_SHIFT = 26
_INF = np.int64(2**62)
_MAX_LEVELS = 8
_K_BUDGET = 10_000


@dataclasses.dataclass
class PackedGraph:
    g: ContigGraph
    eu: np.ndarray
    ev: np.ndarray
    es: np.ndarray
    ea: np.ndarray
    enz: np.ndarray
    etot: np.ndarray
    erank: np.ndarray
    edge_w: list           # full 5-tuple weight per edge (host side)


def pack_graph(g: ContigGraph) -> PackedGraph:
    """Flatten adjacency u-major (the g_rev construction order of
    k_shortest_walks.hpp:180-183) and attach the reversed-relaxation
    arrival rank used for first-improvement tie-breaks."""
    V = g.n_vertices
    eu, ev, es, ea, enz, etot, ws = [], [], [], [], [], [], []
    rev_pos: dict = {}
    rev_idx = []
    for u in range(V):
        for v, w in g.adj[u]:
            eu.append(u)
            ev.append(v)
            es.append(w[0] + w[1])
            ea.append(w[2])
            enz.append(w[3])
            etot.append(w[4])
            ws.append(w)
            k = rev_pos.get(v, 0)
            rev_pos[v] = k + 1
            rev_idx.append(k)

    # Kahn FIFO topo order of g_rev: in-degree of u in g_rev equals the
    # forward out-degree of u
    in_deg = [len(g.adj[u]) for u in range(V)]
    g_rev: list = [[] for _ in range(V)]
    for i, (u, v) in enumerate(zip(eu, ev)):
        g_rev[v].append(u)
    q = deque(u for u in range(V) if in_deg[u] == 0)
    kahn_pos = [0] * V
    pos = 0
    while q:
        x = q.popleft()
        kahn_pos[x] = pos
        pos += 1
        for to in g_rev[x]:
            in_deg[to] -= 1
            if in_deg[to] == 0:
                q.append(to)
    assert pos == V, "cycle in contig DAG"

    erank = np.fromiter(
        ((kahn_pos[v] << _RANK_SHIFT) | ri for v, ri in zip(ev, rev_idx)),
        dtype=np.int64, count=len(ev),
    )
    return PackedGraph(
        g=g,
        eu=np.asarray(eu, np.int32), ev=np.asarray(ev, np.int32),
        es=np.asarray(es, np.int64), ea=np.asarray(ea, np.int32),
        enz=np.asarray(enz, np.int32), etot=np.asarray(etot, np.int32),
        erank=erank, edge_w=ws,
    )


class Fallback(Exception):
    """Raised when a contig's solution is walk-order-sensitive and must
    be solved by the exact host engine."""


def pack_graph_from_native(contig: list, exp: dict) -> PackedGraph:
    """Build a finish-compatible PackedGraph from the native exporter's
    struct-of-arrays (native/src/export.cc) — the C++ host plane does
    the sort/cut/score work; Python only reassembles views."""
    n = exp["n"]
    V = exp["n_vertices"]
    recs = [contig[int(k)] for k in exp["perm"]]
    for i, rec in enumerate(recs):
        contig[rec.ctg_index].ctg_sorted_index = i

    vtx_pairs = list(zip(exp["vtx_pre"].tolist(), exp["vtx_cur"].tolist()))
    cut_str = {}
    cut_pre_end = {}
    NO_CUT = np.int64(-(2**63))
    for vid, (i, j) in enumerate(vtx_pairs):
        cut_str[(i, j)] = (int(exp["cut_st_q"][vid]), int(exp["cut_st_r"][vid]))
        if exp["cut_pe_q"][vid] != NO_CUT:
            cut_pre_end[(i, j)] = (
                int(exp["cut_pe_q"][vid]), int(exp["cut_pe_r"][vid])
            )

    eu = exp["eu"]; ev = exp["ev"]
    edge_w = list(zip(
        exp["eq"].tolist(), exp["er"].tolist(), exp["ea"].tolist(),
        exp["enz"].tolist(), exp["etot"].tolist(),
    ))
    adj: list = [[] for _ in range(V)]
    ev_l = ev.tolist()
    for e, u in enumerate(eu.tolist()):
        adj[u].append((ev_l[e], edge_w[e]))

    g = ContigGraph(
        n=n, recs=recs, part_idx=None, parts=None,
        cut_pre_end=cut_pre_end, cut_str=cut_str, cut_overlap_idx={},
        vtx_pairs=vtx_pairs,
        vtx_index={p: i for i, p in enumerate(vtx_pairs)},
        adj=adj, src=exp["src"], dest=exp["dest"],
    )
    return PackedGraph(
        g=g, eu=eu, ev=ev, es=exp["eq"] + exp["er"], ea=exp["ea"],
        enz=exp["enz"], etot=exp["etot"], erank=exp["erank"], edge_w=edge_w,
    )


def _frac(nz, tot):
    return Fraction(int(nz), int(tot) if tot else 1)


def _backtrack_best(pg: PackedGraph, d_eid, src):
    path = []
    u = src
    while True:
        e = int(d_eid[u])
        if e < 0:
            raise Fallback("no best edge during backtrack")
        v = int(pg.ev[e])
        path.append((u, v, pg.edge_w[e]))
        if v == pg.g.dest:
            return path
        u = v


def _enumerate_group(pg: PackedGraph, d_s, d_a, src, limit, inf=int(_INF)):
    """All paths src->dest achieving the min (sum, anom) key — the
    leading tie group (paf_data.cpp:1595-1611).  DFS over achieving
    edges in adjacency order."""
    g = pg.g
    adj_eids: list = [[] for _ in range(g.n_vertices)]
    for i, u in enumerate(pg.eu):
        adj_eids[u].append(i)
    k1 = lambda u: (int(d_s[u]) << 16) | int(d_a[u])
    out = []
    stack = [(src, [])]
    # iterative DFS preserving adjacency order
    while stack:
        u, pref = stack.pop()
        if u == g.dest:
            out.append(pref)
            if len(out) > limit:
                raise Fallback("tie group larger than enumeration limit")
            continue
        # push in reverse so adjacency order pops first
        for e in reversed(adj_eids[u]):
            v = int(pg.ev[e])
            if d_s[v] >= inf:
                continue
            if (int(d_s[v] + pg.es[e]) << 16) | int(d_a[v] + pg.ea[e]) == k1(u):
                stack.append((v, pref + [(u, v, pg.edge_w[e])]))
    return out


def _path_frac(path):
    nz = sum(w[3] for _u, _v, w in path)
    tot = sum(w[4] for _u, _v, w in path)
    return _frac(nz, tot)


def _order_group(paths):
    """Walk-enumeration order within an equal-(sum,anom) group: mapq
    fraction descending; exact fraction ties are allocation-order in the
    reference — not reproducible here, so fall back."""
    keyed = [(_path_frac(p), i) for i, p in enumerate(paths)]
    fracs = [k for k, _ in keyed]
    if len(set(fracs)) != len(fracs):
        raise Fallback("full-distance tie inside walk group")
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [paths[i] for _f, i in keyed]


def _enumerate_level_group(pg: PackedGraph, lv_s, src, level, limit, inf=int(_INF)):
    """All paths achieving the level-`level` minimum sum."""
    g = pg.g
    adj_eids: list = [[] for _ in range(g.n_vertices)]
    for i, u in enumerate(pg.eu):
        adj_eids[u].append(i)
    out = []
    stack = [(src, level, [])]
    while stack:
        u, a, pref = stack.pop()
        if u == g.dest:
            if a == 0:
                out.append(pref)
                if len(out) > limit:
                    raise Fallback("alt group larger than enumeration limit")
            continue
        for e in reversed(adj_eids[u]):
            v = int(pg.ev[e])
            a2 = a - int(pg.ea[e])
            if a2 < 0 or lv_s[v, a2] >= inf:
                continue
            if int(lv_s[v, a2] + pg.es[e]) == int(lv_s[u, a]):
                stack.append((v, a2, pref + [(u, v, pg.edge_w[e])]))
    return out


def finish_contig(pg: PackedGraph, dev, cfg: AlignasmConfig, inf=int(_INF)):
    """Reconstruct the reference's outputs from device DP results.

    ``inf`` is the kernel's unreachable sentinel (2^62 for the int64
    kernel, 2^30 for the int32 kernel).  Raises Fallback whenever the
    result could depend on the reference's walk-enumeration order beyond
    what the DPs determine.
    """
    g = pg.g
    src, dest = g.src, g.dest
    d_s = np.asarray(dev["d_s"]); d_a = np.asarray(dev["d_a"])
    d_eid = np.asarray(dev["d_eid"])
    lv_s = np.asarray(dev["lv_s"]) if dev.get("lv_s") is not None else None
    cnt_tot = int(dev["cnt_tot"][src]); cnt_min = int(dev["cnt_min"][src])
    floor_a = int(dev["floor_a"][src])

    assert d_s[src] < inf, "dest unreachable"
    min_sum = int(d_s[src]); min_anom = int(d_a[src])

    # topo cache for the upgrade pass (identical to exact engine)
    sorted_vertices = topology_sort(g.adj)
    order = [0] * g.n_vertices
    for i, u in enumerate(sorted_vertices):
        order[u] = i
    g._topo_cache = (order, sorted_vertices)

    not_alt_map: dict = {}
    conv = lambda path: exact_engine._edge_path_to_outputs(g, path, not_alt_map)

    # ---- main path + coverage tie sweep -------------------------------
    if cnt_min >= _K_BUDGET:
        raise Fallback("tie group may exceed the k budget")
    path1 = _backtrack_best(pg, d_eid, src)
    out = conv(path1)
    max_cov = exact_engine._total_coverage(out)
    max_out: list = []
    if cnt_min > 1:
        group = _enumerate_group(pg, d_s, d_a, src, cnt_min + 1, inf)
        assert len(group) == cnt_min, (len(group), cnt_min)
        ordered = _order_group(group)
        # ordered[0] must be path1 (the best tree path is the first walk)
        rest = [p for p in ordered if [e[:2] for e in p] != [e[:2] for e in path1]]
        if len(rest) != cnt_min - 1:
            raise Fallback("best path not uniquely identified in group")
        for p in rest:
            outs_p = conv(p)
            cov = exact_engine._total_coverage(outs_p)
            if cov > max_cov:
                max_cov = cov
                out = outs_p
                max_out.clear()
            elif cov == max_cov:
                max_out.append(outs_p)

    # ---- alt path -----------------------------------------------------
    alt_out: list = []
    if cnt_tot >= 2 and min_anom != floor_a:
        if lv_s is None:
            raise Fallback("level DP results missing for alt scan")
        if cnt_tot > _K_BUDGET:
            raise Fallback("k budget binds for alt scan")
        if min_anom > _MAX_LEVELS:
            raise Fallback("anomaly level beyond device DP range")
        # level minima in walk-enumeration order = ascending (sum, anom)
        levels = []
        for a in range(0, min_anom):
            if a >= lv_s.shape[1]:
                raise Fallback("anomaly level beyond device DP range")
            if lv_s[src, a] < inf:
                levels.append((int(lv_s[src, a]), a))
        levels.sort()
        ans_up = ans_down = 0
        have = False
        cov_best = -1
        for s_a, a in levels:
            up = s_a - min_sum
            down = min_anom - a
            if not have or up * ans_down < down * ans_up:
                have = True
                ans_up, ans_down = up, down
                group = _enumerate_level_group(pg, lv_s, src, a, 4096, inf)
                ordered = _order_group(group)
                first = True
                for p in ordered:
                    outs_p = conv(p)
                    cov = exact_engine._total_coverage(outs_p)
                    if first:
                        alt_out = outs_p
                        cov_best = cov
                        first = False
                    elif cov > cov_best:
                        cov_best = cov
                        alt_out = outs_p
            # non-improving levels never convert (strict slope compare,
            # eq_sum_anom false across levels)

    return out, alt_out, max_out
