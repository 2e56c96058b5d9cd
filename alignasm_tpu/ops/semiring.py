"""Packed-key encoding of the PafDistance semiring for device kernels.

The reference orders distances by (score_sum, anom, mapq-fraction) in
CALC_SUM mode (paf_data.hpp:146-158).  On device we pack this order
into two int64 lexicographic keys so relaxations reduce with plain
integer min:

  k1 = score_sum * 2^16 + anom
       score sums are < 2^35 for genome-scale inputs (front/end terms
       are 2*qry_total <= 2^33; per-edge gap terms are capped at
       SV_BASELINE = 2^20 by anomaly substitution), and path anomaly
       counts are < 2^16, so k1 fits comfortably in 63 bits.

  k2 = (QUL_ONE - qul_order) * 2^RANK_BITS + arrival_rank
       qul_order = floor(qul_nonzero * 2^30 / qul_total') encodes the
       mapq fraction exactly: distinct fractions with denominators
       <= 2^10 differ by more than 2^-20, so flooring at 2^-30
       resolution preserves strict order, and equal rationals floor
       equally.  Larger fraction = better, hence the inversion.
       arrival_rank (the (topo-position, adjacency-position) rank of
       the relaxing edge) reproduces the reference's first-improvement
       tie-break exactly.

Bounds are asserted host-side when building edge tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ANOM_BITS = 16
QUL_BITS = 30
QUL_ONE = 1 << QUL_BITS
RANK_BITS = 26          # up to 64M edges per contig graph
INF1 = np.int64(2**62)  # "unreachable" sentinel for k1
INF2 = np.int64(2**62)


def pack_k1(score_sum, anom):
    return (score_sum << ANOM_BITS) | anom


def qul_order(nz, tot):
    """Exact integer encoding of the mapq fraction's order."""
    tot_safe = jnp.where(tot == 0, 1, tot) if isinstance(tot, jnp.ndarray) else (tot if tot else 1)
    return (nz << QUL_BITS) // tot_safe


def pack_k2(nz, tot, rank):
    return ((QUL_ONE - qul_order(nz, tot)) << RANK_BITS) | rank


def np_pack_edge_keys(q, r, a, nz, tot):
    """Host-side packing of per-edge weights (numpy).  Returns (k1, qul
    numerator/denominator kept separate — path fractions accumulate as
    sums, so k2 is only packable per *path*, not per edge)."""
    s = q + r
    assert (s < (1 << 40)).all(), "edge score overflow for packed keys"
    assert (a < (1 << ANOM_BITS)).all()
    return s * (1 << ANOM_BITS) + a
