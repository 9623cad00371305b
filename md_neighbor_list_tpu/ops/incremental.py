"""Incremental dense rebuild — sort only the cell-changers (VERDICT r2
item 2; SURVEY.md §9 "Sort cost").

Between Verlet rebuilds particles move at most skin/2, so at rebuild time
only a few percent of particles ("movers") have left their cell; the full
path still pays the whole 8-payload sort + full-width expand for them.
The incremental path:

  1. keys on wrapped positions; stayers = valid slots whose new key equals
     the cell they already sit in. Movers keep their key, everything else
     (stayers, empty slots) gets a sentinel key.
  2. ONE 8-payload sort of the same S records — but now all the structure
     is in the short mover prefix; the expand that follows only needs a
     NARROW window (the mover stream is ~5-15% dense), so the expand cost
     collapses. (The sort itself is size-bound, not order-bound — the
     remaining cost to attack; see the narrow-sort note below.)
  3. movers_dense = the existing expand kernel over the mover stream with
     ``window=MOVER_WINDOW`` (ops/dense_cells.sort_expand overrides).
  4. a merge kernel stitches the new state per cell row, entirely with
     lane-local log-shift rolls (no gathers, no scatters):
       - compact each cell's stayers to a prefix (monotone per-lane
         left-shift by rank: LSB-first conditional power-of-2 rolls — the
         order-preservation proof is in _compact_left's docstring),
       - append that cell's movers behind them (uniform per-cell right
         shift by the stayer count).

  Overflow protocol (two NEW failure modes, both detected, never silent):
    window overflow  a G-row group's mover span exceeds the narrow DMA
                     window -> records dropped by the expand -> the merged
                     state loses particles -> ``inc_overflow`` is True and
                     the caller falls back to the FULL rebuild (the right
                     response — cap is fine, the mover burst was not).
                     Detected directly from row_start spans.
    cell overflow    stayers + movers of one cell exceed cap -> dropped
                     movers are masked out pre-shift -> lost-particle
                     conservation check -> cap growth, exactly as the full
                     path (SURVEY.md §4.3).

  Equivalence contract vs the full rebuild: the SAME partition of
  particles into cells (set equality per cell — tested), NOT the same
  within-cell slot order (full sort interleaves by pre-sort position;
  incremental keeps stayers first, movers appended). All sweep kernels
  are order-independent in pair membership; force summation order within
  a cell differs by fp32 rounding only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops.dense_cells import (DenseSpec, DenseState,
                                                  _flat, cell_keys,
                                                  sort_expand, park_positions)

MOVER_G = 2          # cell rows per mover-expand program
MOVER_WINDOW = 512   # mover-stream DMA window per G-row group (lanes)
# window slack: the expand kernel rounds each group's start down to a 128
# boundary, so a group's usable span is MOVER_WINDOW - 128 records.
# Sizing: expand compute scales as (G*mc) x W x roll-levels — measured
# G=8/W=1280 cost as much as the FULL expand (the 4x broadcast rows ate
# the window savings); G=2/W=512 holds ~2.4x the expected per-group mover
# load (2 rows x ~130 movers at the skin/2 drift bound) at ~1/6 the
# compute. Overflow -> in-graph full-rebuild fallback, so an undersized
# window costs a fallback, never correctness.


def own_cell_keys(spec: DenseSpec) -> jnp.ndarray:
    """(R, mc, cap) i32: the cell key each slot belongs to by position."""
    r = jax.lax.broadcasted_iota(jnp.int32, (spec.rows, spec.mc, spec.cap), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (spec.rows, spec.mc, spec.cap), 1)
    return r * spec.mc + x


def _roll(a, shift, P):
    return pltpu.roll(a, shift % P, axis=a.ndim - 1)


def _compact_left(chs, shift_f, seg, cap, P):
    """Per-lane monotone left-compaction of ``chs`` by ``shift_f`` (f32
    integer shifts, one per lane), segment-local (segments = consecutive
    ``cap`` lanes). LSB-first conditional power-of-2 rolls: after the bits
    < 2^k are applied, lane positions are l - (shift mod 2^k), which stays
    strictly increasing across lanes carrying live elements (shift is
    nondecreasing with jumps bounded by the gap between lanes, and a mod
    wrap only moves the later element further right) — so no level ever
    lands two live elements on one lane, and no element crosses its
    segment's left edge (partial position >= final position >= segment
    start). Lanes not covered by an arriving element keep stale values;
    the caller selects by rank afterwards."""
    b = 1
    vals = list(chs) + [shift_f]
    while b < cap:
        rolled = [_roll(v, -b, P) for v in vals]
        sh = rolled[-1]
        # arrival guard: element exists in the same segment (origin lane
        # l + b did not cross the segment edge) and has bit b pending
        cond = (jnp.mod(jnp.floor(sh / b), 2.0) >= 1.0) & (seg < cap - b)
        vals = [jnp.where(cond, r, v) for r, v in zip(rolled, vals)]
        vals[-1] = jnp.where(cond, sh - b, vals[-1])
        b <<= 1
    return vals[:-1]


def _shift_right_uniform(chs, shift_f, seg, cap, P):
    """Per-segment uniform right shift (mover insertion behind the stayer
    prefix). Same LSB-first structure; elements never cross their
    segment's right edge because callers pre-mask movers whose destination
    would exceed cap."""
    b = 1
    vals = list(chs) + [shift_f]
    while b < cap:
        rolled = [_roll(v, b, P) for v in vals]
        sh = rolled[-1]
        cond = (jnp.mod(jnp.floor(sh / b), 2.0) >= 1.0) & (seg >= b)
        vals = [jnp.where(cond, r, v) for r, v in zip(rolled, vals)]
        vals[-1] = jnp.where(cond, sh - b, vals[-1])
        b <<= 1
    return vals[:-1]


def _merge_kernel(spid_ref, mpid_ref, *refs, cap: int, mc: int, nch: int):
    """Stitch one z-layer of cell rows: compact stayers to per-cell
    prefixes, append the cell's movers behind them. Blocks are rank-4
    (nch|1, mc, mc, cap) slices of the existing dense arrays — the cap
    axis is the lane axis, so every segment op is an in-tile lane op and
    the circular wrap of ``pltpu.roll`` IS the cell boundary. ``refs`` =
    value channels: nch stayer-side + nch mover-side inputs, then the
    outputs (nch values + pid). ``stay`` is derived in-kernel from
    spid_ref (>= 0 means the slot's particle stays; the caller pre-masks
    leavers to -1)."""
    s_ref, m_ref, out_vals, out_pid = refs
    shape = spid_ref.shape[1:]  # (B, mc, cap)
    seg = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    spid = spid_ref[0]
    stay = (spid >= 0).astype(jnp.float32)

    # per-cell inclusive prefix of stay -> rank/len (lane scan)
    s = stay
    b = 1
    while b < cap:
        s = s + jnp.where(seg >= b, _roll(s, b, cap), 0.0)
        b <<= 1
    rank_excl = s - stay          # stayer rank within its cell
    # broadcast each cell's total (value at lane cap-1) to all lanes
    t = jnp.where(seg == cap - 1, s, 0.0)
    b = 1
    while b < cap:
        t = jnp.maximum(t, jnp.where(seg < cap - b, _roll(t, -b, cap), 0.0))
        b <<= 1
    length = t                    # stayers per cell, broadcast

    # --- stayer compaction (left by lane - rank) ----------------------
    shift = jnp.where(stay > 0.5, seg.astype(jnp.float32) - rank_excl, 0.0)
    chs = [s_ref[c] for c in range(nch)] + [spid.astype(jnp.float32)]
    comp = _compact_left(chs, shift, seg, cap, cap)

    # --- mover insertion (right by the stayer count) ------------------
    segf = seg.astype(jnp.float32)
    mpid = mpid_ref[0]
    # drop movers whose destination lane would leave the cell (cell full):
    # lost-particle conservation at the caller grows cap
    mvalid = (mpid >= 0) & (segf + length < cap)
    movs = [jnp.where(mvalid, m_ref[c], 0.0) for c in range(nch)] + [
        jnp.where(mvalid, mpid.astype(jnp.float32), -1.0)
    ]
    ins = _shift_right_uniform(movs, jnp.where(mvalid, length, 0.0),
                               seg, cap, cap)

    keep_stay = segf < length
    keep_mov = ins[nch] >= 0.0
    for c in range(nch):
        out_vals[c] = jnp.where(
            keep_stay, comp[c], jnp.where(keep_mov, ins[c], 0.0))
    out_pid[0] = jnp.where(
        keep_stay, comp[nch], jnp.where(keep_mov, ins[nch], -1.0)
    ).astype(jnp.int32)


def _merge(state_w: DenseState, spid, movers: DenseState,
           spec: DenseSpec, interpret: bool) -> DenseState:
    """``spid``: (R, mc, cap) i32, the stayer-masked pid (leavers and
    empty slots already -1). All inputs are the existing rank-4 dense
    arrays sliced per z-layer by BlockSpec — no stacking, no reshapes
    (the first cut paid ~250 MB of relayout copies around a kernel moving
    ~130 MB). One call when the z-layer blocks fit VMEM, else one call
    per pos/vel channel group."""
    mc, cap, R = spec.mc, spec.cap, spec.rows
    # Rows per program sized from the kernel's LIVE-TEMPORARY model, not
    # the block sizes: Mosaic schedules the unrolled log-shift levels
    # overlapped (measured ~51 live (B, mc, cap)-padded arrays at nch=3 —
    # a B=16 variant demanded 16.67 MB and OOMed the 16 MB stack on
    # hardware), and (mc, cap) pads to (8k, 128) tiles. Target <= 10 MB
    # of temporaries. The grid need not divide R: Pallas pads the tail
    # block's reads (garbage rows are select-safe — no division in the
    # kernel) and clips its writes.
    _live = 52
    _row_bytes = ((mc + 7) // 8 * 8) * 128 * 4
    B = max(1, min(16, (10 << 20) // (_live * _row_bytes)))

    def bs(nch):
        return pl.BlockSpec((nch, B, mc, cap), lambda r: (0, r, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(nch, s_in, m_in):
        vals, pid = pl.pallas_call(
            functools.partial(_merge_kernel, cap=cap, mc=mc, nch=nch),
            grid=(pl.cdiv(R, B),),
            in_specs=[bs(1), bs(1), bs(nch), bs(nch)],
            out_specs=[bs(nch), bs(1)],
            out_shape=[
                jax.ShapeDtypeStruct((nch, R, mc, cap), jnp.float32),
                jax.ShapeDtypeStruct((1, R, mc, cap), jnp.int32),
            ],
            interpret=interpret,
        )(spid[None], movers.pid[None], s_in, m_in)
        return vals, pid[0]

    # two calls (pos, vel) so the inputs are the existing arrays verbatim
    # — a single fused call would need a (6, R, mc, cap) concat copy that
    # costs more than the duplicated (cheap) rank/len recompute
    pos, pid = call(3, state_w.pos, movers.pos)
    vel, _ = call(3, state_w.vel, movers.vel)
    return DenseState(pos=pos, vel=vel, pid=pid)


@functools.partial(jax.jit, static_argnums=(1, 2))
def rebuild_dense_incremental(
    state: DenseState, spec: DenseSpec, interpret: bool = False,
) -> tuple[DenseState, jnp.ndarray]:
    """Incremental rebuild. Returns (new_state, inc_overflow): when
    ``inc_overflow`` is True the mover stream overflowed its narrow expand
    window and ``new_state`` is INCOMPLETE — the caller must run the full
    ``rebuild_dense`` instead (``lax.cond`` in the engines). Cap overflow
    is, as everywhere, the caller's slot-count conservation check."""
    state = state._replace(pos=jnp.mod(state.pos, jnp.float32(spec.L)))
    keys = cell_keys(state, spec)
    own = own_cell_keys(spec)
    valid = state.valid()
    stay = valid & (keys == own)
    mover_keys = jnp.where(valid & ~stay, keys, jnp.int32(spec.ncells))

    chans = tuple(_flat(state.pos[i]) for i in range(3)) + tuple(
        _flat(state.vel[i]) for i in range(3)
    ) + (_flat(state.pid).astype(jnp.float32),)
    movers, row_start = sort_expand(
        _flat(mover_keys), chans, spec, interpret,
        group=MOVER_G, window=MOVER_WINDOW,
    )
    # window overflow: a G-row group's span (from its 128-aligned DMA
    # start) exceeding the window means the expand dropped records
    g_start = row_start[:-1:MOVER_G]
    g_end = row_start[MOVER_G::MOVER_G]
    if g_end.shape[0] < g_start.shape[0]:  # tail group
        g_end = jnp.concatenate([g_end, row_start[-1:]])
    span = jnp.max(g_end - (g_start // 128) * 128)
    inc_overflow = span > jnp.int32(MOVER_WINDOW)

    spid = jnp.where(stay, state.pid, jnp.int32(-1))
    merged = _merge(state, spid, movers, spec, interpret)
    # restore the park invariant (dense_cells.park_lattice) at XLA level:
    # the merge kernel fills vacated/empty slots with 0.0, and the wrap
    # above corrupted the stayer-side park values; this path is the
    # default-off incremental engine, so the extra select is off the
    # production step
    merged = merged._replace(
        pos=park_positions(merged.pos, merged.valid(), spec))
    return merged, inc_overflow


def rebuild_reference_incremental(state: DenseState,
                                  spec: DenseSpec) -> DenseState:
    """Order-exact jnp twin of the incremental result (stayers in slot
    order, then movers in mover-stream order) — the merge kernel's
    correctness oracle in tests."""
    import numpy as np

    pos = np.mod(np.asarray(state.pos), np.float32(spec.L))
    vel = np.asarray(state.vel)
    pid = np.asarray(state.pid)
    inv = np.float32(1.0 / spec.cell_size)
    mc, cap = spec.mc, spec.cap
    coords = np.clip((pos * inv).astype(np.int64), 0, mc - 1)
    key = (coords[0] + mc * (coords[1] + mc * coords[2])).reshape(-1)
    own = np.asarray(own_cell_keys(spec)).reshape(-1)
    valid = pid.reshape(-1) >= 0
    stay = valid & (key == own)
    movers = valid & ~stay

    S = key.shape[0]
    flat = lambda a: a.reshape(3, S)
    posf, velf, pidf = flat(pos), flat(vel), pid.reshape(-1)
    out_pos = np.zeros((3, S), np.float32)
    out_vel = np.zeros((3, S), np.float32)
    out_pid = np.full((S,), -1, np.int32)
    order = np.argsort(key[movers], kind="stable")
    mov_idx = np.nonzero(movers)[0][order]
    mov_key = key[mov_idx]
    for c in range(spec.ncells):
        slots = np.arange(c * cap, (c + 1) * cap)
        srcs = list(slots[stay[slots]]) + list(mov_idx[mov_key == c])
        srcs = srcs[:cap]  # cell overflow drops movers, as the kernel does
        dst = slots[: len(srcs)]
        out_pos[:, dst] = posf[:, srcs]
        out_vel[:, dst] = velf[:, srcs]
        out_pid[dst] = pidf[srcs]
    shape = (spec.rows, mc, cap)
    return DenseState(
        pos=jnp.asarray(out_pos.reshape((3,) + shape)),
        vel=jnp.asarray(out_vel.reshape((3,) + shape)),
        pid=jnp.asarray(out_pid.reshape(shape)),
    )
