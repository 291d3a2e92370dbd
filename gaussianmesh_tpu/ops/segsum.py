"""Row gather whose VJP is a sort + pairwise-tree segment reduction.

The per-Gaussian gradient reduction is the TPU replacement for the
reference backward's atomicAdd (backward.cu:523,545-554). The obvious
`zeros.at[idx].add(d)` scatter-add is deterministic but measured at
~16 ns/row on v5e (14.5 ms for the 900K-pair bench step) REGARDLESS of
index order — XLA's scatter is per-row serialized. This op keeps the
same forward (a wide row gather) and rewrites the backward as:

  1. stable sort (idx, arange)            — groups rows by destination
  2. ONE wide gather into sorted order
  3. log2(128) masked shifted-add passes  — an in-segment pairwise
     upsweep: pass j adds row i+2^j into row i for rows whose
     in-segment rank is a multiple of 2^(j+1); contiguous slices only,
     fully vectorized, EXACT pairwise summation (no long-prefix
     cancellation like a cumsum-and-diff would have)
  4. heads (rank 0) gathered per destination row; segments longer than
     128 contribute their extra heads (rank % 128 == 0) through a tiny
     compacted scatter-add (<= m/128 rows)

Deterministic (fixed reduction tree) and faster than the XLA scatter at
bench scale. In-segment ranks come from a cummax over head flags (no
scatter); the per-DESTINATION head positions need a searchsorted over
the sorted ids — ~13 ms at bench scale (round-3 prefix profile), so
`gather_rows_counted` takes the per-destination multiplicities from the
caller (the pair expansion knows them exactly) and replaces the search
with one exclusive cumsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TREE_PASSES = 7                      # exact heads for segments <= 128
_HEAD = 1 << _TREE_PASSES


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jax.Array, idx: jax.Array,
                assume_grouped: bool = False) -> jax.Array:
    """table (R, F) gathered at idx (m,) -> (m, F).

    Identical forward to `table[idx]`; the VJP reduces per-row
    cotangents with the deterministic tree above instead of an XLA
    scatter-add. `assume_grouped=True` skips the sort when equal idx
    values are already contiguous AND nondecreasing (e.g. the emission
    pair domain, which is parent-major).
    """
    return table[idx]


@jax.custom_vjp
def gather_rows_counted(table: jax.Array, idx: jax.Array,
                        counts: jax.Array) -> jax.Array:
    """`gather_rows` with caller-supplied destination multiplicities:
    counts (R,) int32 with counts[t] == #{j: idx[j] == t} EXACTLY (the
    contract is unchecked — wrong counts misalign the whole reduction).
    Skips the backward's per-destination searchsorted: head positions
    are an exclusive cumsum of counts."""
    return table[idx]


_SEG_CH = 2048     # rows per kernel block (4096 overflowed the 16M
                   # scoped-vmem stack by 384K with double buffering)
_SEG_TAIL = 128    # lookahead rows == 2^_TREE_PASSES (pass j reads +2^j)


def _tree_passes_jnp(sg, rank, ds):
    """The 7 masked shifted-add passes, pure jnp (CPU tests / tiny m)."""
    m = sg.shape[0]
    x = ds
    for j in range(_TREE_PASSES):
        s = 1 << j
        if s >= m:
            break
        shifted = jnp.concatenate([x[s:], jnp.zeros((s,) + x.shape[1:],
                                                    x.dtype)])
        same = jnp.concatenate([sg[s:] == sg[:m - s],
                                jnp.zeros((s,), bool)])
        take = ((rank & (2 * s - 1)) == 0) & same
        x = jnp.where(take[:, None], x + shifted, x)
    return x


def _segtree_kernel(ds_ref, dst_ref, sg_ref, sgt_ref, rk_ref, rkt_ref,
                    out_ref):
    x = jnp.concatenate([ds_ref[...], dst_ref[...]], axis=1)   # (F, W+TAIL)
    sg = jnp.concatenate([sg_ref[...], sgt_ref[...]], axis=1)  # (1, W+TAIL)
    rk = jnp.concatenate([rk_ref[...], rkt_ref[...]], axis=1)
    for j in range(_TREE_PASSES):
        s = 1 << j
        shifted = jnp.concatenate(
            [x[:, s:], jnp.zeros((x.shape[0], s), x.dtype)], axis=1)
        # shift sg as INT then compare (Mosaic cannot concatenate i1
        # vregs); -2 pad: distinct from every gid and the -1 lane pad
        sgs = jnp.concatenate(
            [sg[:, s:], jnp.full((1, s), -2, sg.dtype)], axis=1)
        take = ((rk & (2 * s - 1)) == 0) & (sgs == sg)
        x = jnp.where(take, x + shifted, x)
    out_ref[...] = x[:, :_SEG_CH]


def _tree_passes_tpu(sg, rank, ds):
    """All 7 passes fused in ONE Pallas kernel: one HBM read + one write
    instead of 21 materialized full-domain arrays. The XLA pass chain
    measured 11.2 ms of the 16.8 ms bench-scale reduction (round 5) in
    both row-major and pre-transposed layouts — it materializes every
    shifted/selected intermediate. The kernel runs in the TRANSPOSED
    (F, m) orientation: rows ride on LANES, so the (m, 16) row form's
    8x lane padding never enters a vreg (a row-major kernel variant
    measured SLOWER than the XLA chain for exactly that reason) and the
    shifts are lane-slices. Each lane's output needs the NEXT 2^7
    lanes' partials, so every input is passed twice (main block + a
    128-lane lookahead block) — static index maps only
    (scalar-dependent input maps abort the backend, tile_blend.py
    round-2 log). Bit-identical to _tree_passes_jnp: same adds, same
    order."""
    from jax.experimental import pallas as pl
    m, f = ds.shape
    nb = -(-m // _SEG_CH)
    pad = nb * _SEG_CH + _SEG_TAIL - m
    dsp = jnp.concatenate(
        [jax.lax.optimization_barrier(ds.T),
         jnp.zeros((f, pad), ds.dtype)], axis=1)
    # pad key -1: never equal to a real gid, so `same` is false past m
    sgp = jnp.concatenate([sg, jnp.full((pad,), -1, sg.dtype)])[None, :]
    rkp = jnp.concatenate([rank, jnp.zeros((pad,), rank.dtype)])[None, :]
    t = _SEG_CH // _SEG_TAIL
    out = pl.pallas_call(
        _segtree_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((f, _SEG_CH), lambda b: (0, b)),
            pl.BlockSpec((f, _SEG_TAIL), lambda b: (0, b * t + t)),
            pl.BlockSpec((1, _SEG_CH), lambda b: (0, b)),
            pl.BlockSpec((1, _SEG_TAIL), lambda b: (0, b * t + t)),
            pl.BlockSpec((1, _SEG_CH), lambda b: (0, b)),
            pl.BlockSpec((1, _SEG_TAIL), lambda b: (0, b * t + t)),
        ],
        out_specs=pl.BlockSpec((f, _SEG_CH), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((f, nb * _SEG_CH), ds.dtype),
    )(dsp, dsp, sgp, sgp, rkp, rkp)
    # barrier AFTER the transpose: a gather fed by a lazy transpose
    # lowers as a per-element lane gather (tile_blend round-3 lesson)
    return jax.lax.optimization_barrier(out.T)[:m]


def _tree_passes(sg, rank, ds):
    if (jax.default_backend() == "tpu" and ds.ndim == 2
            and sg.shape[0] >= _SEG_CH):
        return _tree_passes_tpu(sg, rank, ds)
    return _tree_passes_jnp(sg, rank, ds)


def _reduce_grouped(sg, ds, head_pos_padded, n_rows, counts):
    """Tree-reduce gid-grouped rows ds (m, F) by key sg (m,) into
    (n_rows, F). head_pos_padded (n_rows,): first grouped position of
    each destination, == m for empty destinations. counts (n_rows,):
    rows per destination (drives the long-segment extra-head
    enumeration — a tiny offset-expand; the jnp.nonzero compaction it
    replaced scanned the whole m domain and cost ~8 ms at bench scale,
    round-5 bisect)."""
    m = sg.shape[0]
    i_idx = jnp.arange(m, dtype=jnp.int32)
    flag = jnp.concatenate([jnp.ones((1,), bool), sg[1:] != sg[:-1]])
    seg_start = jax.lax.cummax(jnp.where(flag, i_idx, 0))
    rank = i_idx - seg_start

    # input barrier: ds is a wide row gather in every caller; unfenced,
    # XLA duplicates that gather into the first pass's three consumers
    # (x, shifted, and the transpose on the kernel path) — measured
    # +6-12 ms at bench scale (round 5)
    x = _tree_passes(sg, rank, jax.lax.optimization_barrier(ds))

    # per-destination sums: the rank-0 head of each segment (empty
    # segments hit a zero pad row). The barrier is LOAD-BEARING: without
    # it XLA fuses the whole pass chain into this gather's producer and
    # re-runs it per consumer — measured 11.2 ms for a 1.5 ms
    # tree+gather at bench scale (round 5; the same pathology class as
    # tile_blend's "materialize before gathering from a transpose").
    zpad = jax.lax.optimization_barrier(
        jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)]))
    dtable = zpad[head_pos_padded]                       # (n_rows, F)

    # segments longer than _HEAD: add their non-first heads through a
    # compacted scatter (static cap m // _HEAD + 1 rows). The extra-head
    # POSITIONS are enumerated from `counts` with a tiny offset-expand
    # over the destination domain — head_pos[g] + k*_HEAD for
    # k = 1..ceil(counts[g]/_HEAD)-1 — never by scanning the m domain.
    from gaussianmesh_tpu.ops.binning import _offset_expand
    cap = m // _HEAD + 1
    e_g = jnp.maximum(-(-counts // _HEAD) - 1, 0)        # extra heads/seg
    roff, parent, total, _ = _offset_expand(jnp.maximum(e_g, 1), cap)
    c_idx = jnp.arange(cap, dtype=jnp.int32)
    k = c_idx - roff[parent]
    valid = (c_idx < total) & (k < e_g[parent])          # skip forced dummies
    epos = jnp.where(valid,
                     head_pos_padded[parent] + (k + 1) * _HEAD, m)
    evals = zpad[jnp.minimum(epos, m)]
    erow = jnp.where(valid, parent, n_rows)
    dtable = dtable.at[erow].add(evals, mode="drop")
    return dtable


def _fwd(table, idx, assume_grouped):
    return table[idx], (idx, table.shape[0])


def _bwd(assume_grouped, res, d):
    idx, n_rows = res
    m = idx.shape[0]
    if assume_grouped:
        sg, ds = idx, d
    else:
        sg, perm = jax.lax.sort(
            (idx, jnp.arange(m, dtype=jnp.int32)), num_keys=1,
            is_stable=True)
        ds = d[perm]

    # first sorted position of each destination row (queries 0..n_rows)
    from gaussianmesh_tpu.ops.binning import _tile_starts
    starts = _tile_starts(sg, n_rows)
    counts = starts[1:] - starts[:n_rows]
    head_pos = jnp.where(counts > 0, starts[:n_rows], m)
    return _reduce_grouped(sg, ds, head_pos, n_rows, counts), None


gather_rows.defvjp(_fwd, _bwd)


def _fwd_counted(table, idx, counts):
    return table[idx], (idx, counts, table.shape[0])


def _bwd_counted(res, d):
    idx, counts, n_rows = res
    m = idx.shape[0]
    sg, perm = jax.lax.sort(
        (idx, jnp.arange(m, dtype=jnp.int32)), num_keys=1, is_stable=True)
    ds = d[perm]
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts).astype(jnp.int32)])[:n_rows]
    head_pos = jnp.where(counts > 0, starts, m)
    return _reduce_grouped(sg, ds, head_pos, n_rows, counts), None, None


gather_rows_counted.defvjp(_fwd_counted, _bwd_counted)
