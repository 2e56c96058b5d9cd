"""Fused dense relaxation kernel (Pallas / Mosaic, TPU).

The north-star formulation (BASELINE.json): the reference's
pointer-chasing shortest-path machinery becomes a dense min-plus
relaxation that lives entirely in VMEM.  For a bucket contig with V
vertices (V <= 512), the graph is a set of dense (V, V) edge matrices —
score sum, anomaly, mapq numerator/denominator, arrival rank — and one
relaxation sweep is

    cand[u, v] = W[u, v] (+) d[v]          (broadcast, no gather)
    d'[u]      = lex-min over v of cand    (VPU lane reduction)

with the full PafDistance tie-break (sum, anom, mapq-fraction, arrival
rank) via four masked min passes.  All matrices fit VMEM (5 * V^2 * 4 B
= 5 MB at V = 512), so the N-sweep fixed-point loop runs at VPU speed
with a single HBM read of the graph and a single write of the result —
the "speed-of-light" shape for this op.

int32 throughout: score sums are < 2^31 for genome-scale inputs, and
the mapq fraction packs exactly into 30 bits for path denominators
<= 1024 (distinct fractions with denominator <= 2^10 differ by more
than 2^-20, so flooring at 2^-20 resolution preserves strict order).

Parity targets: shortest_path_dag tie-breaks (k_shortest_walks.hpp:
160-175) as replicated by ops/relax.py — equivalence is tested against
that kernel and the host engine.

The dense min-plus-on-accelerator shape follows the tensorized
Floyd-Warshall / BFS-on-matrix-unit literature (see PAPERS.md):
semiring matrix ops trade redundant work for hardware-friendly
regularity, which is exactly the profitable trade on a VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INF32 = np.int32(2**30)
QUL_SHIFT = 20
QUL_ONE32 = np.int32(1 << QUL_SHIFT)


def _init_state(V, dest):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    is_dest = lane == dest
    return dict(
        s=jnp.where(is_dest, jnp.int32(0), INF32),
        a=jnp.zeros((1, V), jnp.int32),
        nz=jnp.zeros((1, V), jnp.int32),
        tot=jnp.zeros((1, V), jnp.int32),
        rank=jnp.where(is_dest, jnp.int32(-1), INF32),
        win=jnp.full((1, V), -1, jnp.int32),
    )


def _sweep(ws, wa, wnz, wtot, wrank, V, d):
    """One dense relaxation sweep — shared by the Pallas kernel and the
    XLA twin, so both compile the identical math."""
    valid = (ws < INF32) & (d["s"] < INF32)
    cs = jnp.where(valid, ws + d["s"], INF32)
    m1 = jnp.min(cs, axis=1, keepdims=True)
    on = valid & (cs == m1)
    ca = jnp.where(on, wa + d["a"], INF32)
    m2 = jnp.min(ca, axis=1, keepdims=True)
    on = on & (ca == m2)
    cnz = wnz + d["nz"]
    ctot = wtot + d["tot"]
    # mapq-fraction key in f32: correctly-rounded division is exact for
    # order AND equality here (equal rationals round identically;
    # distinct ones with denominators <= 2^10 differ by >= 2^-20, far
    # above f32 rounding error).  Integer division is microcoded and
    # ~40x slower on the VPU.
    qk = -(cnz.astype(jnp.float32) / jnp.maximum(ctot, 1).astype(jnp.float32))
    qkm = jnp.where(on, qk, jnp.float32(np.inf))
    m3 = jnp.min(qkm, axis=1, keepdims=True)
    on = on & (qkm == m3)
    rk = jnp.where(on, wrank, INF32)
    m4 = jnp.min(rk, axis=1, keepdims=True)
    on = on & (rk == m4)

    wnz_v = jnp.min(jnp.where(on, cnz, INF32), axis=1, keepdims=True)
    wtot_v = jnp.min(jnp.where(on, ctot, INF32), axis=1, keepdims=True)
    vidx = jax.lax.broadcasted_iota(jnp.int32, on.shape, 1)
    win_v = jnp.min(jnp.where(on, vidx, V), axis=1, keepdims=True)

    inc_q = -(d["nz"].astype(jnp.float32)
              / jnp.maximum(d["tot"], 1).astype(jnp.float32))
    # candidate minima come out as (V, 1) columns; realign as (1, V) rows
    c1 = m1.reshape(1, V); c2 = m2.reshape(1, V)
    c3 = m3.reshape(1, V); c4 = m4.reshape(1, V)
    wv = win_v.reshape(1, V)
    nzv = wnz_v.reshape(1, V); totv = wtot_v.reshape(1, V)
    better = (c1 < d["s"]) | ((c1 == d["s"]) & ((c2 < d["a"]) | (
        (c2 == d["a"]) & ((c3 < inc_q) | ((c3 == inc_q) & (c4 < d["rank"]))))))
    better = better & (c1 < INF32)
    sel = lambda new, old: jnp.where(better, new, old)
    return dict(
        s=sel(c1, d["s"]), a=sel(c2, d["a"]), nz=sel(nzv, d["nz"]),
        tot=sel(totv, d["tot"]), rank=sel(c4, d["rank"]),
        win=sel(wv, d["win"]),
    )


def _kernel(ws_ref, wa_ref, wnz_ref, wtot_ref, wrank_ref, dest_ref,
            out_s, out_a, out_nz, out_tot, out_rank, out_win, *, V, n_sweeps):
    ws = ws_ref[0]
    wa = wa_ref[0]
    wnz = wnz_ref[0]
    wtot = wtot_ref[0]
    wrank = wrank_ref[0]
    dest = dest_ref[0]

    d = _init_state(V, dest)
    d = jax.lax.fori_loop(
        0, n_sweeps, lambda _, st: _sweep(ws, wa, wnz, wtot, wrank, V, st), d
    )
    out_s[0] = d["s"]
    out_a[0] = d["a"]
    out_nz[0] = d["nz"]
    out_tot[0] = d["tot"]
    out_rank[0] = d["rank"]
    out_win[0] = d["win"]


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
def dense_sp_xla(ws, wa, wnz, wtot, wrank, dest, n_sweeps):
    """XLA twin of the Pallas kernel (same _sweep math, vmapped over B).
    Used where Mosaic compilation is unavailable; numerically identical."""
    V = ws.shape[1]

    def one(ws, wa, wnz, wtot, wrank, dest):
        d = _init_state(V, dest)
        d = jax.lax.fori_loop(
            0, n_sweeps, lambda _, st: _sweep(ws, wa, wnz, wtot, wrank, V, st), d
        )
        return d

    return jax.vmap(one)(ws, wa, wnz, wtot, wrank, dest)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "interpret"))
def dense_sp_pallas(ws, wa, wnz, wtot, wrank, dest, n_sweeps, interpret=False):
    """Batched dense shortest-path fixed point.

    ws..wrank: (B, V, V) int32 dense edge matrices (INF32 = no edge);
    dest: (B, 1, V) int32 broadcast row holding the dest index.
    Returns dict of (B, 1, V) state arrays incl. the winning next-vertex
    per vertex (``win``; -1 where unreachable/dest).
    """
    B, V, _ = ws.shape
    matspec = pl.BlockSpec((1, V, V), lambda b: (b, 0, 0))
    vecspec = pl.BlockSpec((1, 1, V), lambda b: (b, 0, 0))
    out_shape = [jax.ShapeDtypeStruct((B, 1, V), jnp.int32)] * 6
    kernel = functools.partial(_kernel, V=V, n_sweeps=n_sweeps)
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[matspec] * 5 + [vecspec],
        out_specs=[vecspec] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(ws, wa, wnz, wtot, wrank, dest)
    return dict(zip(["s", "a", "nz", "tot", "rank", "win"], outs))


def pack_dense(pg, V: int):
    """Dense (V, V) int32 edge matrices from a PackedGraph (host side).

    Returns None when the contig exceeds int32/dense bounds (big scores,
    high degree) — caller falls back to the sparse kernel.
    """
    n_v = pg.g.n_vertices
    if n_v > V:
        return None
    es = pg.es
    if len(es) and (es.max() >= 2**28 or len(es) > V * V):
        return None
    ws = np.full((V, V), INF32, np.int32)
    wa = np.zeros((V, V), np.int32)
    wnz = np.zeros((V, V), np.int32)
    wtot = np.zeros((V, V), np.int32)
    wrank = np.full((V, V), INF32, np.int32)
    # rank values must fit int32: re-rank densely (order-preserving)
    order = np.argsort(pg.erank, kind="stable")
    dense_rank = np.empty(len(order), np.int64)
    dense_rank[order] = np.arange(len(order))
    ws[pg.eu, pg.ev] = es.astype(np.int32)
    wa[pg.eu, pg.ev] = pg.ea
    wnz[pg.eu, pg.ev] = pg.enz
    wtot[pg.eu, pg.ev] = pg.etot
    wrank[pg.eu, pg.ev] = dense_rank.astype(np.int32)
    return ws, wa, wnz, wtot, wrank
