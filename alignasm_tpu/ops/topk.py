"""Per-node top-K walk distances via a fixed-width candidate tensor.

The north-star reformulation of Eppstein's persistent heaps
(BASELINE.json): every vertex carries the K smallest walk-distance keys
to the sink, and one relaxation sweep merges each vertex's candidate
lists through its out-edges with ``jax.lax.top_k``:

    cand[u] = { W[u, v] + topk[v][j] }        (dense broadcast, (V, V*K))
    topk'[u] = K smallest of cand[u] ∪ topk[u]

Keys are the packed (score_sum << 16 | anom) order — the projection of
the full PafDistance order that the walk-selection consumers key on
(tie sweep: eq_sum_anom, alt scan: slope over (sum, anom); see
paf_data.cpp:1581-1649).  After |longest path| sweeps, ``topk[src]``
holds the (sum, anom) multiset of the reference's first K walks —
validated against the Eppstein engine in tests.

This is the capability kernel for bounded-K on-device enumeration; the
production device path uses the cheaper level/count DPs (ops/relax32)
because the outputs it needs are narrower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.int64(2**62)


@functools.partial(jax.jit, static_argnames=("V", "K", "n_sweeps"))
def topk_walks_batch(wk1, dest, V, K, n_sweeps):
    """wk1: (B, V, V) int64 packed edge keys (INF = no edge);
    dest: (B,) int32.  Returns (B, V, K) sorted walk-key lists."""

    def one(wk1, dest):
        base = jnp.full((V, K), INF).at[dest, 0].set(0)

        def sweep(_, tk):
            # a walk from u is exactly one out-edge plus a child walk, so
            # the recurrence merges children only (self-merge would count
            # every walk once per sweep); dest's empty-walk base persists
            cand = jnp.where(
                wk1[:, :, None] < INF, wk1[:, :, None] + tk[None, :, :], INF
            ).reshape(V, V * K)
            # top_k selects the largest, so negate (keys are >= 0 or INF)
            neg_top, _idx = jax.lax.top_k(-cand, K)
            fresh = -neg_top
            is_dest = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0) == dest
            return jnp.where(is_dest, base[dest][None, :], fresh)

        return jax.lax.fori_loop(0, n_sweeps, sweep, base)

    return jax.vmap(one)(wk1, dest)


def pack_edge_keys(pg, V: int) -> np.ndarray:
    """Dense (V, V) packed (sum << 16 | anom) edge-key matrix."""
    wk1 = np.full((V, V), np.int64(2**62))
    wk1[pg.eu, pg.ev] = (pg.es.astype(np.int64) << 16) | pg.ea
    return wk1
