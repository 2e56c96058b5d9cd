"""Multi-chip parallelism over a jax.sharding.Mesh.

Two axes of scale (SURVEY.md §2.9/§5.7-5.8):
  * ``data`` — contig-batch data parallelism: the batched relaxation
    program is embarrassingly parallel over contigs (the TPU-native
    analogue of the reference's TBB parallel_for, alignasm.cpp:346-361).
    Sharding the batch dim over the mesh lets XLA run each shard's
    sweeps locally with zero communication.
  * ``graph`` — edge-sharded relaxation for 512 GB-class contig graphs
    (BASELINE.json configs[4]): each device holds an edge shard and
    sweeps exchange per-vertex running minima via lexicographic pmin
    collectives over ICI — the reference has no analogue (it simply
    demands a 512 GB host, README.md:25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alignasm_tpu.ops.relax import solve_graph_batch, INF, _qul_key, _pack_k1


def data_parallel_solve(mesh: Mesh, batch, V: int, n_sweeps: int):
    """Run solve_graph_batch with the contig-batch dim sharded over the
    mesh's ``data`` axis."""
    spec = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, spec)
    eu, ev, es, ea, enz, etot, erank, evalid, src, dest = batch
    return solve_graph_batch(
        put(eu), put(ev), put(es), put(ea), put(enz), put(etot),
        put(erank), put(evalid), put(src), put(dest),
        V=V, n_sweeps=n_sweeps,
    )


def make_edge_sharded_sp(mesh: Mesh, axis: str, V: int, n_sweeps: int):
    """Edge-sharded distance-to-sink: each device relaxes its own edge
    shard; per-sweep vertex minima merge with three masked pmin rounds
    (the lexicographic (k1, qul, rank) tie-break needs one collective
    per key).  Returns a jitted function over per-device edge shards.

    Shapes: all edge arrays (E,) get split on their leading dim across
    ``axis``; vertex state (V,) is replicated.
    """

    def local_min(vals, seg):
        return jax.ops.segment_min(vals, seg, num_segments=V)

    def step(_, carry):
        ds, da, dnz, dtot, drank, eu, ev, es, ea, enz, etot, erank, evalid = carry
        cs = ds[ev] + es
        ca = da[ev] + ea
        cnz = dnz[ev] + enz
        ctot = dtot[ev] + etot
        ok = evalid & (ds[ev] < INF)
        ck1 = jnp.where(ok, _pack_k1(cs, ca), INF)
        m1 = jax.lax.pmin(local_min(ck1, eu), axis)
        on1 = ok & (ck1 == m1[eu])
        ck2 = _qul_key(cnz, ctot)
        m2 = jax.lax.pmin(local_min(jnp.where(on1, ck2, INF), eu), axis)
        on2 = on1 & (ck2 == m2[eu])
        m3 = jax.lax.pmin(local_min(jnp.where(on2, erank, INF), eu), axis)
        cur1 = jnp.where(ds < INF, _pack_k1(ds, da), INF)
        cur2 = _qul_key(dnz, dtot)
        better = (m1 < cur1) | ((m1 == cur1) & (m2 < cur2)) | (
            (m1 == cur1) & (m2 == cur2) & (m3 < drank)
        )
        # gather the winning candidate locally, merge across shards
        win = on2 & (erank == m3[eu]) & better[eu]
        big = jnp.int64(2**62)
        pick = lambda c: jax.lax.pmin(local_min(jnp.where(win, c, big), eu), axis)
        ws, wa, wnz, wtot = pick(cs), pick(ca), pick(cnz), pick(ctot)
        got = better & (ws < big)
        ds = jnp.where(got, ws, ds)
        da = jnp.where(got, wa, da)
        dnz = jnp.where(got, wnz, dnz)
        dtot = jnp.where(got, wtot, dtot)
        drank = jnp.where(got, m3, drank)
        return ds, da, dnz, dtot, drank, eu, ev, es, ea, enz, etot, erank, evalid

    def sharded_sp(eu, ev, es, ea, enz, etot, erank, evalid, dest):
        ds = jnp.full((V,), INF, jnp.int64).at[dest].set(0)
        da = jnp.zeros((V,), jnp.int64)
        dnz = jnp.zeros((V,), jnp.int64)
        dtot = jnp.zeros((V,), jnp.int64)
        drank = jnp.full((V,), INF, jnp.int64).at[dest].set(-1)
        carry = (ds, da, dnz, dtot, drank,
                 eu, ev, es, ea, enz, etot, erank, evalid)
        carry = jax.lax.fori_loop(0, n_sweeps, step, carry)
        return carry[0], carry[1], carry[2], carry[3]

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        sharded_sp,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
