"""Coordinate keys: packing, sorting, lookup, unique — the TPU replacement for
MinkowskiEngine's coordinate hash maps (reference: ME.utils.sparse_quantize /
the CoordinateManager used by minsu3d/model/module/backbone.py:38).

Design: a voxel coordinate (batch, x, y, z) is packed into a *pair* of int32
keys — ``khi`` carries the batch/proposal id, ``klo`` packs x,y,z at 10 bits
each (coords must lie in [0, 1024)). Pairs are ordered lexicographically.
All tables are fixed-capacity arrays sorted by key with INT32_MAX sentinel
padding, so every operation (sort, unique, lookup) is a static-shape XLA op:

  * build:   ``jnp.lexsort`` over (klo, khi)
  * lookup:  vectorized lower-bound binary search (``log2(cap)`` gathers)
  * unique:  neighbor-difference on the sorted keys

This replaces GPU hash probing with sort+bsearch, which XLA maps well to TPU
(no atomics, no data-dependent shapes, deterministic by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COORD_BITS = 10
COORD_MAX = 1 << COORD_BITS  # 1024 voxels per axis
SENTINEL = jnp.int32(2**31 - 1)


def pack(batch: jax.Array, coords: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack (batch, xyz int coords in [0, 1024)) into (khi, klo) int32 pairs."""
    batch = batch.astype(jnp.int32)
    c = coords.astype(jnp.int32)
    klo = (c[..., 0] << (2 * COORD_BITS)) | (c[..., 1] << COORD_BITS) | c[..., 2]
    return batch, klo


def unpack(khi: jax.Array, klo: jax.Array) -> tuple[jax.Array, jax.Array]:
    mask = COORD_MAX - 1
    x = (klo >> (2 * COORD_BITS)) & mask
    y = (klo >> COORD_BITS) & mask
    z = klo & mask
    return khi, jnp.stack([x, y, z], axis=-1)


def mask_invalid(khi: jax.Array, klo: jax.Array, valid: jax.Array):
    """Replace invalid entries with the sentinel so they sort to the end."""
    return (
        jnp.where(valid, khi, SENTINEL),
        jnp.where(valid, klo, SENTINEL),
    )


def lexsort_pairs(khi: jax.Array, klo: jax.Array) -> jax.Array:
    """Permutation sorting pairs ascending (khi major, klo minor). Stable."""
    return jnp.lexsort((klo, khi))


def _pair_less(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def lower_bound(s_hi: jax.Array, s_lo: jax.Array, q_hi: jax.Array, q_lo: jax.Array) -> jax.Array:
    """For each query pair, index of the first sorted entry >= query.

    ``s_hi/s_lo`` must be sorted ascending (sentinel padding included in the
    capacity). Returns indices in [0, cap].
    """
    cap = s_hi.shape[0]
    steps = cap.bit_length() + 1  # enough halvings to shrink [0, cap] to a point
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, cap, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        mid_c = jnp.minimum(mid, cap - 1)
        less = _pair_less(s_hi[mid_c], s_lo[mid_c], q_hi, q_lo)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    # fori_loop, not unrolled: XLA-CPU compile time explodes on the unrolled
    # gather chain (minutes for a full grid plan); runtime cost is identical
    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def lookup(s_hi: jax.Array, s_lo: jax.Array, q_hi: jax.Array, q_lo: jax.Array,
           missing: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Find each query pair in the sorted table.

    Returns (idx, found). Missing queries get index ``missing`` (default: the
    table capacity, i.e. one-past-the-end — convenient for zero-row gathers).
    """
    cap = s_hi.shape[0]
    if missing is None:
        missing = cap
    pos = lower_bound(s_hi, s_lo, q_hi, q_lo)
    pos_c = jnp.minimum(pos, cap - 1)
    found = (pos < cap) & (s_hi[pos_c] == q_hi) & (s_lo[pos_c] == q_lo) & (q_hi != SENTINEL)
    idx = jnp.where(found, pos_c, missing)
    return idx, found


def lookup_sorted_union(s_hi: jax.Array, s_lo: jax.Array, q_hi: jax.Array, q_lo: jax.Array,
                        missing: int | None = None):
    """Batch exact-match lookup via one multi-operand sort (no chained gathers).

    TPU rationale: XLA's random gathers cost ~9ns/element here while sorts are
    ~5x cheaper per element, so a 19-step binary search per query is ~40x more
    expensive than sorting the table/query union once. The union is sorted by
    (khi, klo, tag) with table entries first on ties; a segmented OR-scan then
    marks queries whose key-run contains a table entry, and the inclusive
    table-count gives both the matched index and the upper bound.

    Returns (idx, found, upper_bound):
      * idx: index of the matching table entry (or ``missing``)
      * found: exact-match flag
      * upper_bound: index of the first table entry with key > query
        (lower_bound(k) can be had by querying k-1).
    """
    cap = s_hi.shape[0]
    nq = q_hi.shape[0]
    if missing is None:
        missing = cap
    khi = jnp.concatenate([s_hi, q_hi])
    klo = jnp.concatenate([s_lo, q_lo])
    # tag folded into the payload's LSB (queries = payload<<1|1 sort after the
    # all-zero table payloads on key ties): 3 sort operands instead of 4 —
    # sorts are the dominant cost of plan builds, so operand count is traffic
    payload2 = jnp.concatenate([jnp.zeros(cap, jnp.int32),
                                (jnp.arange(nq, dtype=jnp.int32) << 1) | 1])
    khi, klo, payload2 = jax.lax.sort((khi, klo, payload2), num_keys=3)
    payload = payload2 >> 1

    is_table = (payload2 & 1) == 0
    cnt = jnp.cumsum(is_table.astype(jnp.int32))          # tables at positions <= p

    # found[p] = exists table entry j<=p in the same equal-key run. Key runs
    # are numbered by run_id (non-decreasing); the latest table entry's run_id
    # up to p is then a simple cummax — no gathers, no associative scan.
    prev_hi = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), khi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), klo[:-1]])
    new_run = (khi != prev_hi) | (klo != prev_lo)
    run_id = jnp.cumsum(new_run.astype(jnp.int32))
    latest_table_run = jax.lax.cummax(jnp.where(is_table, run_id, -1))
    found_sorted = latest_table_run == run_id

    q_pos = jnp.where(is_table, nq, payload)
    scatter = lambda v, fill: jnp.full((nq + 1,), fill, v.dtype).at[q_pos].set(v, mode="drop")[:nq]
    found = scatter(found_sorted, False)
    idx_last = scatter(jnp.maximum(cnt - 1, 0), 0)
    ub = scatter(cnt, 0)
    sentinel_q = q_hi == SENTINEL
    found = found & ~sentinel_q
    idx = jnp.where(found, idx_last, missing)
    return idx, found, ub


def unique_sorted(s_hi: jax.Array, s_lo: jax.Array, valid_sorted: jax.Array):
    """First-occurrence mask + compaction ids over sorted (possibly dup) keys.

    Returns (first_mask, seg_id, n_unique):
      * first_mask[i] — True where sorted entry i starts a new key (and valid)
      * seg_id[i]     — index of entry i's key among unique keys (pad: n_unique)
      * n_unique      — number of unique valid keys
    """
    prev_hi = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), s_lo[:-1]])
    first = ((s_hi != prev_hi) | (s_lo != prev_lo)) & valid_sorted
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = jnp.sum(first.astype(jnp.int32))
    seg = jnp.where(valid_sorted, seg, n_unique)
    return first, seg, n_unique
