"""int32 variant of the batched DAG relaxation program.

TPU v5e has no native int64 — the packed-key kernels in ops/relax.py
pay a large emulation tax.  This variant keeps every comparison in
native int32/f32 while preserving exact semantics:

  * (sum, anom) compare as two masked passes instead of one packed key
    (path sums must fit int32 — the host guards per bucket and falls
    back to the int64 kernel otherwise);
  * the mapq fraction compares as correctly-rounded f32 division
    (order- and equality-exact for denominators <= 2^10, see
    ops/pallas_relax.py);
  * arrival ranks are densely re-ranked per contig on host
    (order-preserving, < 2^26).

Outputs mirror ops/relax.py's solve_graph_batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF32 = jnp.int32(2**30)
FINF = jnp.float32(np.inf)
COUNT_SAT = jnp.int32(10_001)


def _seg_min(vals, seg, num):
    return jax.ops.segment_min(vals, seg, num_segments=num)


def _seg_sum(vals, seg, num):
    return jax.ops.segment_sum(vals, seg, num_segments=num)


def _qkey(nz, tot):
    return -(nz.astype(jnp.float32) / jnp.maximum(tot, 1).astype(jnp.float32))


def _argmin4(k1, k2, k3, k4, seg, num, valid):
    """Segmented lex argmin over (k1, k2 int32, k3 f32, k4 int32 unique)."""
    k1 = jnp.where(valid, k1, INF32)
    m1 = _seg_min(k1, seg, num)
    on = valid & (k1 == m1[seg])
    m2 = _seg_min(jnp.where(on, k2, INF32), seg, num)
    on = on & (k2 == m2[seg])
    m3 = _seg_min(jnp.where(on, k3, FINF), seg, num)
    on = on & (k3 == m3[seg])
    m4 = _seg_min(jnp.where(on, k4, INF32), seg, num)
    return m1, m2, m3, m4


@functools.partial(jax.jit, static_argnames=("V", "n_sweeps"))
def sp_batch32(
    eu, ev, es, ea, enz, etot, erank, evalid, src, dest, V, n_sweeps=None,
):
    """Phase 1: distance-to-sink, anomaly floor, walk counts (int32)."""
    B, E = eu.shape
    if n_sweeps is None:
        n_sweeps = V

    def one(eu, ev, es, ea, enz, etot, erank, evalid, src, dest):
        init = dict(
            s=jnp.full((V,), INF32).at[dest].set(0),
            a=jnp.zeros((V,), jnp.int32),
            nz=jnp.zeros((V,), jnp.int32),
            tot=jnp.zeros((V,), jnp.int32),
            rank=jnp.full((V,), INF32).at[dest].set(-1),
            eid=jnp.full((V,), -1, jnp.int32),
        )

        def sweep(_, st):
            cs = st["s"][ev] + es
            ca = st["a"][ev] + ea
            cnz = st["nz"][ev] + enz
            ctot = st["tot"][ev] + etot
            ok = evalid & (st["s"][ev] < INF32)
            m1, m2, m3, m4 = _argmin4(
                jnp.where(ok, cs, INF32), ca, _qkey(cnz, ctot), erank, eu, V, ok
            )
            cur3 = _qkey(st["nz"], st["tot"])
            better = (m1 < st["s"]) | ((m1 == st["s"]) & ((m2 < st["a"]) | (
                (m2 == st["a"]) & ((m3 < cur3) | ((m3 == cur3) & (m4 < st["rank"])))
            )))
            better = better & (m1 < INF32)
            win = ok & (erank == m4[eu]) & better[eu]
            eids = jnp.arange(E, dtype=jnp.int32)
            w_eid = _seg_min(jnp.where(win, eids, E), eu, V)
            got = w_eid < E
            w = jnp.clip(w_eid, 0, E - 1)
            upd = lambda cur, cand: jnp.where(got, cand[w], cur)
            return dict(
                s=upd(st["s"], cs), a=upd(st["a"], ca),
                nz=upd(st["nz"], cnz), tot=upd(st["tot"], ctot),
                rank=jnp.where(got, erank[w], st["rank"]),
                eid=jnp.where(got, w, st["eid"]),
            )

        d = jax.lax.fori_loop(0, n_sweeps, sweep, init)

        # anomaly floor
        fa = jnp.full((V,), INF32).at[dest].set(0)

        def sweep_anom(_, fa):
            c = jnp.where(evalid & (fa[ev] < INF32), fa[ev] + ea, INF32)
            return jnp.minimum(fa, _seg_min(c, eu, V))

        fa = jax.lax.fori_loop(0, n_sweeps, sweep_anom, fa)

        # walk counts (saturating int32)
        base = jnp.zeros((V,), jnp.int32).at[dest].set(1)

        def sweep_cnt(_, c):
            return jnp.minimum(
                base + _seg_sum(jnp.where(evalid, c[ev], 0), eu, V), COUNT_SAT
            )

        cnt_tot = jax.lax.fori_loop(0, n_sweeps, sweep_cnt, base)

        ach = evalid & (d["s"][ev] < INF32) & (
            (d["s"][ev] + es == d["s"][eu]) & (d["a"][ev] + ea == d["a"][eu])
        )

        def sweep_cmin(_, c):
            return jnp.minimum(
                base + _seg_sum(jnp.where(ach, c[ev], 0), eu, V), COUNT_SAT
            )

        cnt_min = jax.lax.fori_loop(0, n_sweeps, sweep_cmin, base)

        # one stacked result -> ONE device-to-host transfer per bucket
        # (small-array transfer latency dominates on tunneled backends)
        return jnp.stack([d["s"], d["a"], d["eid"], fa, cnt_tot, cnt_min])

    return jax.vmap(one)(eu, ev, es, ea, enz, etot, erank, evalid, src, dest)


SP_ROWS = ("d_s", "d_a", "d_eid", "floor_a", "cnt_tot", "cnt_min")


def unpack_sp(stacked_row):
    """Per-contig dict view of one (6, V) stacked phase-1 result."""
    return {k: stacked_row[j] for j, k in enumerate(SP_ROWS)}


def rerank_dense(erank: np.ndarray) -> np.ndarray:
    """Order-preserving dense re-rank of int64 arrival ranks into int32."""
    order = np.argsort(erank, kind="stable")
    out = np.empty(len(order), np.int32)
    out[order] = np.arange(len(order), dtype=np.int32)
    return out

