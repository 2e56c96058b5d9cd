"""Pallas TPU kernel for the production reverse-topo scan.

The XLA form (ops/dense.py:_topo_scan) lowers each of the V scan steps
to ~20 separate HLO ops over (B, V) buffers; at production shapes the
per-op dispatch overhead — not memory — dominates (~8 ms at B=2048,
V=64 on v5e).  This kernel runs the WHOLE scan inside one Pallas
program: a grid step holds G contig slabs in VMEM and carries the six
DP vectors through a hardware fori_loop, so a step is a handful of
vector ops on registers/VMEM with no per-op dispatch.

Math parity: identical to _topo_scan / solve_slab_topo_nxt8 (the same
(sum, anom) lex DP, anomaly floor, saturating walk counts, achieving-
successor extraction, and on-device order-insensitivity gate; see
ops/dense.py for the reference-semantics citations).  The output row
contract matches dense_solve_wire_topo_nxt8: (B, V + 2) uint8
[nxt (dest-encoded), fast, src] — bit-equality is enforced by
tests/test_pallas_topo.py (interpret mode in CI; compiled on the real
chip in the round-2 hardware validation, bit-equal at B=2048, V=64).

NOT wired into the scheduler: chained-launch timing measured the XLA
scan FASTER at production shapes (1.19 vs 2.23 us/contig — XLA fuses
this op's tiny sequential steps better than the hand-written VMEM
kernel), so this module guards the compiled-Pallas capability claim
rather than the production throughput.  See BENCH_RESULTS.md
"Mosaic/Pallas status".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from alignasm_tpu.ops.dense import ANOM_SHIFT, COUNT_SAT, INF32, _densify_wire


def _scan_kernel(arr_ref, out_ref, *, V: int, OW: int, unroll: bool = False):
    """One grid step: G slabs (G, V+1, V) -> G rows (G, OW) int32.

    Every constant is materialized as a strong-typed int32 array before
    it meets jnp.where: weak-scalar promotion emits convert_element_type
    ops whose Mosaic lowering rule recurses forever in this jax build
    (the container's prior 'Mosaic blocked' symptom)."""
    G = arr_ref.shape[0]
    mask = jnp.int32((1 << ANOM_SHIFT) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, V), 1)   # (G, V)
    zs = jnp.zeros((G, V), jnp.int32)
    infs = zs + INF32
    ones = zs + jnp.int32(1)
    zc = jnp.zeros((G, 1), jnp.int32)
    vvec = zs + jnp.int32(V)

    # static SLICES, not integer indices: `ref[:, V, 0:1]` embeds the
    # index as an int64 literal in the `get` op, and int64->int32
    # converts loop forever in this build's Mosaic lowering helper
    dest = arr_ref[:, V : V + 1, 0:1][:, 0, :]              # (G, 1)
    src = arr_ref[:, V : V + 1, 1:2][:, 0, :]               # (G, 1)

    on_dest = lane == dest                                  # (G, V)
    s0 = jnp.where(on_dest, zs, infs)
    c0 = jnp.where(on_dest, ones, zs)
    init = (s0, zs, s0, c0, c0, zs - jnp.int32(1))

    def step(t, st):
        s, a, fa, ct, cm, nxt = st
        u = V - 1 - t
        if unroll:
            # static trip: u is a python int — a static slice lets
            # Mosaic schedule the whole scan without per-step dynamic
            # slicing or hardware-loop bookkeeping
            row = arr_ref[:, u : u + 1, :][:, 0, :]         # (G, V)
        else:
            row = arr_ref[:, pl_ds(u), :][:, 0, :]          # (G, V)
        edge = row != infs
        ws = row & mask
        wa = jax.lax.shift_right_logical(row, mask * 0 + ANOM_SHIFT)
        cs = jnp.where(edge, ws + s, infs)
        m1 = jnp.min(cs, axis=1, keepdims=True)             # (G, 1)
        on = edge & (cs == m1)
        m2 = jnp.min(jnp.where(on, wa + a, infs), axis=1, keepdims=True)
        reach = m1 < zc + INF32
        s_u = jnp.where(reach, m1, zc + INF32)
        a_u = jnp.where(reach, m2, zc)
        fa_u = jnp.min(jnp.where(edge, wa + fa, infs), axis=1, keepdims=True)
        ct_u = jnp.minimum(
            jnp.sum(jnp.where(edge, ct, zs), axis=1, keepdims=True,
                    dtype=jnp.int32), zc + COUNT_SAT)
        ach = edge & (s < infs) & (ws + s == s_u) & (wa + a == a_u)
        cm_u = jnp.minimum(
            jnp.sum(jnp.where(ach, cm, zs), axis=1, keepdims=True,
                    dtype=jnp.int32), zc + COUNT_SAT)
        # lowest-index achieving successor, -1 if none
        low = jnp.min(jnp.where(ach, lane, vvec), axis=1, keepdims=True)
        nxt_u = jnp.where(low < vvec[:, :1], low, zc - jnp.int32(1))
        # write column u everywhere except each contig's dest row
        # (u normalized to a strong int32 so no i64 literal reaches
        # Mosaic when the loop is unrolled and u is a python int)
        u32 = jnp.int32(u)
        at_u = (lane == u32) & (dest != u32)

        def upd(vec, x):
            return jnp.where(at_u, x, vec)

        return (upd(s, s_u), upd(a, a_u), upd(fa, fa_u),
                upd(ct, ct_u), upd(cm, cm_u), upd(nxt, nxt_u))

    # int32 loop bounds: x64 is enabled in this environment, so plain
    # python bounds make the counter int64 and every arithmetic/compare
    # against it emits int64<->int32 converts whose Mosaic lowering
    # rule recurses forever (the container's 'Mosaic blocked' symptom)
    if unroll:
        st = init
        for t in range(V):
            st = step(t, st)
        s, a, fa, ct, cm, nxt = st
    else:
        s, a, fa, ct, cm, nxt = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(V), step, init)

    at_src = lane == src
    pick = lambda vec: jnp.sum(jnp.where(at_src, vec, zs), axis=1,
                               keepdims=True, dtype=jnp.int32)
    a_s, fa_s, ct_s, cm_s = pick(a), pick(fa), pick(ct), pick(cm)
    one = zc + jnp.int32(1)
    fast_mask = (cm_s == one) & ~((ct_s >= one + one) & (a_s != fa_s))
    fast = jnp.where(fast_mask, zc + jnp.int32(1), zc)
    nxt_enc = jnp.where(nxt < zs, dest + zs, nxt)

    pad = jnp.zeros((G, OW - V - 2), jnp.int32)
    out_ref[:, :] = jnp.concatenate([nxt_enc, fast, src, pad], axis=1)


def pl_ds(u):
    from jax.experimental import pallas as pl

    return pl.ds(u, 1)


@functools.partial(jax.jit, static_argnames=("V", "interpret", "unroll"))
def dense_solve_wire_topo_nxt8_pallas(wire, V, interpret=False, unroll=False):
    """Pallas twin of dense_solve_wire_topo_nxt8: same sparse wire in,
    same (B, V + 2) uint8 rows out.  Any B (padded internally by
    replicating the last contig's wire, like dense_solve_slabs_pallas).

    ``unroll=True`` traces the V scan steps as straight-line code with
    STATIC slab slices (no per-step dynamic slicing, no hardware-loop
    bookkeeping) — the round-3 swing at the 2.23-vs-1.19 us/contig gap
    against the XLA scan; devbench times both forms."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert V <= 256, "uint8 nxt entries require V <= 256"
    packed = _densify_wire(wire, V)
    B = packed.shape[0]
    # block size: ~1 MB of slab VMEM per grid step (the hardware-
    # validated budget at the production shape G=64, V=64), capped at
    # 64 and floored at 8 — V=256 slabs get G=8 (~2 MB), not G=64
    slab_bytes = (V + 1) * V * 4
    G = max(8, min(64, ((1 << 20) // slab_bytes) // 8 * 8))
    padB = ((B + G - 1) // G) * G
    if padB != B:
        packed = jnp.concatenate(
            [packed, jnp.repeat(packed[-1:], padB - B, 0)])
    OW = max(128, ((V + 2 + 127) // 128) * 128)

    # index maps derive their zero block-coords from the (int32)
    # program id: plain `0` literals are typed i64 by this build and
    # Mosaic fails to legalize the index-map function's return
    rows = pl.pallas_call(
        functools.partial(_scan_kernel, V=V, OW=OW, unroll=unroll),
        grid=(padB // G,),
        in_specs=[pl.BlockSpec((G, V + 1, V), lambda b: (b, b * 0, b * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, OW), lambda b: (b, b * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padB, OW), jnp.int32),
        interpret=interpret,
    )(packed)
    return rows[:B, : V + 2].astype(jnp.uint8)
