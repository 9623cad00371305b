"""Y-grouped force-pass probe (the 'not taken' launch-overhead lever).

The production half-sweep force pass runs one program per (z, y) cell row
— mc^2 = 1225 programs at N=1M — and tools/tpu_launch_probe.py pins its
structural floor at ~5 ms/step, ~3.1 ms of which is per-program fixed
cost (2.5 us launch + output block bookkeeping). The full z-plane grid
(mc programs) was rejected for VMEM (~15 MB live), but a MIDDLE grid is
available when G | mc: grid (mc, mc/G), each program owning G consecutive
y-rows at one z, with

  - inputs as five (3, G, mc, cap) state blocks ((dz, dblock) in
    {(0,0),(0,+1),(1,-1),(1,0),(1,+1)}) — 5G rows fetched per program vs
    the per-row grid's 6G;
  - the t in [0,G) own rows unrolled in-kernel, windows cached per
    DISTINCT source row (2G+3 window builds per program vs 5G);
  - Newton-3 reactions still re-homed by output index_map injections:
    dy=0 offsets write partner rows inside the (z+dz, gy) main block;
    dy=+-1 offsets write G-1 partner rows in the main block and the one
    block-crossing row via a separate BOUNDARY output channel at
    (z+dz, gy+-1) (zero elsewhere) — 8 output arrays total, still one
    write per block, caller sums.

Per-t math, accumulation order, and fold order are IDENTICAL to
_force_half_kernel, so the grouped result is expected bitwise-equal to
the production pass; the probe CHECKS this before timing and refuses to
report a non-bitwise variant as a valid lever (it still times it, loudly
labeled INVALID, so a near-miss can be diagnosed). Run on the real chip:

    python tools/tpu_ygroup_probe.py --n 1000000 --cap 40 --groups 5 7
"""
import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.pallas_force import (
    HALF_OFFSETS5, _fold_rxn, _half_center_penalty, _window_from_block,
    _window_scratch)
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

_PENALTY = 1.0e30

# Input state blocks needed by a (z, gy) program: (dz, dblock) with
# dblock the y-block shift whose rows the unrolled t-loop touches.
IN_BLOCKS = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]


def _pair_geom_grouped(win, own, dz, dy, z, y, spec):
    """_pair_geom_win with (z, y) passed explicitly (y = gy*G + t is not
    a bare program id on the grouped grid). Same static shifts, same
    center-row penalty, same op order -> bit-identical r2p."""
    mc = spec.mc
    fL = jnp.float32(spec.L)
    xi = own[0][:, :, None]
    yi = own[1][:, :, None]
    zi = own[2][:, :, None]
    wx, wy, wz = win
    xj = wx[:, None, :]
    yj = wy[:, None, :]
    zj = wz[:, None, :]
    if dy == 1:
        yj = yj + jnp.where(y + 1 >= mc, fL, 0.0)
    elif dy == -1:
        yj = yj + jnp.where(y - 1 < 0, -fL, 0.0)
    if dz == 1:
        zj = zj + jnp.where(z + 1 >= mc, fL, 0.0)
    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    if (dz, dy) == (0, 0):
        r2p = r2p + _half_center_penalty(spec)
    return r2p, dxv, dyv, dzv


def _grouped_kernel(*refs, spec, rc: float, G: int):
    """G own rows per program. refs = 5 input blocks (IN_BLOCKS order),
    then outputs [own, rxn_k1_main, rxn_k2_main, rxn_k2_bnd, rxn_k3_main,
    rxn_k4_main, rxn_k4_bnd, rxn_k1_bnd? -- see OUT_CHANNELS], then the
    window scratch refs."""
    ins = refs[:5]
    outs = refs[5:-2]
    scr = refs[-2:]
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    gy = pl.program_id(1)
    r2cut = jnp.float32(rc * rc)

    # Zero-init every output block (boundary channels are sparse).
    zero = jnp.zeros((mc, cap), jnp.float32)
    for o in outs:
        for c in range(3):
            for t in range(G):
                o[c, t] = zero

    # Window cache keyed by (dz, local_row) where local_row indexes the
    # virtual [-1, G] row range; built on demand from the right block.
    wins = {}

    def get_win(dz, lr):
        key = (dz, lr)
        if key not in wins:
            if lr < 0:
                blk, row = ins[IN_BLOCKS.index((dz, -1))], lr + G
            elif lr >= G:
                blk, row = ins[IN_BLOCKS.index((dz, 1))], lr - G
            else:
                blk, row = ins[IN_BLOCKS.index((dz, 0))], lr
            wins[key] = _window_from_block(blk[:, row], spec, scr)
        return wins[key]

    own_blk_ref = ins[IN_BLOCKS.index((0, 0))]
    # outs layout: [own, (main_k, bnd_k?) for k=1..4]
    out_own = outs[0]
    rxn_refs = {}
    i = 1
    for k in range(1, 5):
        dz, dy = HALF_OFFSETS5[k]
        rxn_refs[k] = (outs[i], outs[i + 1] if dy != 0 else None)
        i += 2 if dy != 0 else 1

    for t in range(G):
        own = own_blk_ref[:, t]  # (3, mc, cap)
        y = gy * G + t
        acc = None
        rxn_rows = []
        for k in range(5):
            dz, dy = HALF_OFFSETS5[k]
            win = get_win(dz, t + dy)
            r2p, dxv, dyv, dzv = _pair_geom_grouped(
                win, own, dz, dy, z, y, spec)
            hit = r2p < r2cut
            s2 = pl.reciprocal(r2p, approx=True)
            s2 = s2 * (2.0 - r2p * s2)
            s2 = s2 * (2.0 - r2p * s2)
            s6 = s2 * s2 * s2
            f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
            px = f * dxv
            py = f * dyv
            pz = f * dzv
            rxn_rows.append([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                             jnp.sum(pz, axis=1)])
            if k == 0:
                acc = [px, py, pz]
            else:
                acc = [a + p for a, p in zip(acc, [px, py, pz])]
        own_f = [jnp.sum(a, axis=-1) for a in acc]
        for c in range(3):
            out_own[c, t] = own_f[c] - _fold_rxn(rxn_rows[0][c], mc, cap)
        for k in range(1, 5):
            dz, dy = HALF_OFFSETS5[k]
            main, bnd = rxn_refs[k]
            lr = t + dy
            if 0 <= lr < G:
                for c in range(3):
                    main[c, lr] = -_fold_rxn(rxn_rows[k][c], mc, cap)
            else:
                row = lr - G if lr >= G else lr + G
                for c in range(3):
                    bnd[c, row] = -_fold_rxn(rxn_rows[k][c], mc, cap)


def _grouped_kernel_scan(*refs, spec, rc: float, G: int):
    """fori_loop-over-t variant: bounds the live set to ONE row's worth
    (the fully-unrolled kernel blows Mosaic's scheduler at G>=5 on N=1M
    shapes — it overlaps the unrolled rows' temporaries, the same failure
    _split_rows documents for unrolled offset rows). Trades the window
    cache away (5 builds per t, like the per-row grid) but keeps the Gx
    launch reduction, which the launch probe pinned as the dominant
    fixed cost."""
    ins = refs[:5]
    outs = refs[5:-2]
    scr = refs[-2:]
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    gy = pl.program_id(1)
    r2cut = jnp.float32(rc * rc)

    zero = jnp.zeros((mc, cap), jnp.float32)
    for o in outs:
        for c in range(3):
            for t in range(G):
                o[c, t] = zero

    own_blk_ref = ins[IN_BLOCKS.index((0, 0))]
    rxn_refs = {}
    i = 1
    for k in range(1, 5):
        dz, dy = HALF_OFFSETS5[k]
        rxn_refs[k] = (outs[i], outs[i + 1] if dy != 0 else None)
        i += 2 if dy != 0 else 1

    def body(t, carry):
        own = own_blk_ref[:, t]  # dynamic sublane index into VMEM block
        y = gy * G + t
        acc = None
        rxn_rows = []
        for k in range(5):
            dz, dy = HALF_OFFSETS5[k]
            # source row t+dy of the right block, all offsets static
            # except t: in-range rows come from the main block, the
            # spill rows from the dblock=+-1 neighbors.
            if dy == 0:
                blk = ins[IN_BLOCKS.index((dz, 0))]
                src = blk[:, t]
            else:
                main_blk = ins[IN_BLOCKS.index((dz, 0))]
                spill_blk = ins[IN_BLOCKS.index((dz, dy))]
                lr = t + dy
                in_range = (0 <= lr) if dy == -1 else (lr <= G - 1)
                # both reads are cheap VMEM slices; select the right one
                lr_c = jnp.clip(t + dy, 0, G - 1)
                spill_row = 0 if dy == 1 else G - 1
                a = main_blk[:, lr_c]
                b = spill_blk[:, spill_row]
                cond = (t + dy >= 0) if dy == -1 else (t + dy <= G - 1)
                src = jnp.where(cond, a, b)
            win = _window_from_block(src, spec, scr)
            r2p, dxv, dyv, dzv = _pair_geom_grouped(
                win, own, dz, dy, z, y, spec)
            hit = r2p < r2cut
            s2 = pl.reciprocal(r2p, approx=True)
            s2 = s2 * (2.0 - r2p * s2)
            s2 = s2 * (2.0 - r2p * s2)
            s6 = s2 * s2 * s2
            f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
            px = f * dxv
            py = f * dyv
            pz = f * dzv
            rxn_rows.append([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                             jnp.sum(pz, axis=1)])
            if k == 0:
                acc = [px, py, pz]
            else:
                acc = [a2 + p for a2, p in zip(acc, [px, py, pz])]
        own_f = [jnp.sum(a2, axis=-1) for a2 in acc]
        for c in range(3):
            outs[0][c, t] = own_f[c] - _fold_rxn(rxn_rows[0][c], mc, cap)
        for k in range(1, 5):
            dz, dy = HALF_OFFSETS5[k]
            main, bnd = rxn_refs[k]
            if dy == 0:
                for c in range(3):
                    main[c, t] = -_fold_rxn(rxn_rows[k][c], mc, cap)
            else:
                lr = t + dy
                in_main = (lr >= 0) if dy == -1 else (lr <= G - 1)

                @pl.when(in_main)
                def _(k=k, lr=lr, main=main):
                    lrc = jnp.clip(lr, 0, G - 1)
                    for c in range(3):
                        main[c, lrc] = -_fold_rxn(rxn_rows[k][c], mc, cap)

                @pl.when(jnp.logical_not(in_main))
                def _(k=k, dy=dy, bnd=bnd):
                    row = 0 if dy == 1 else G - 1
                    for c in range(3):
                        bnd[c, row] = -_fold_rxn(rxn_rows[k][c], mc, cap)
        return carry

    jax.lax.fori_loop(0, G, body, jnp.int32(0))


def grouped_forces(state_pos, spec, rc, G, interpret=False, scan=False):
    mc, cap = spec.mc, spec.cap
    nby = mc // G
    shape = (3, G, mc, cap)

    def in_map(dz, db):
        def m(z, gy, dz=dz, db=db):
            return (0, ((z + dz) % mc) * nby + (gy + db) % nby, 0, 0)
        return m

    in_specs = [pl.BlockSpec(shape, in_map(dz, db),
                             memory_space=pltpu.VMEM)
                for dz, db in IN_BLOCKS]
    out_specs = [pl.BlockSpec(shape, lambda z, gy: (0, z * nby + gy, 0, 0),
                              memory_space=pltpu.VMEM)]
    n_out = 1
    for k in range(1, 5):
        dz, dy = HALF_OFFSETS5[k]

        def main_m(z, gy, dz=dz):
            return (0, ((z + dz) % mc) * nby + gy, 0, 0)
        out_specs.append(pl.BlockSpec(shape, main_m,
                                      memory_space=pltpu.VMEM))
        n_out += 1
        if dy != 0:
            def bnd_m(z, gy, dz=dz, dy=dy):
                return (0, ((z + dz) % mc) * nby + (gy + dy) % nby, 0, 0)
            out_specs.append(pl.BlockSpec(shape, bnd_m,
                                          memory_space=pltpu.VMEM))
            n_out += 1
    out_shapes = [jax.ShapeDtypeStruct((3, spec.rows, mc, cap),
                                       jnp.float32)] * n_out
    kern = _grouped_kernel_scan if scan else _grouped_kernel
    outs = pl.pallas_call(
        functools.partial(kern, spec=spec, rc=rc, G=G),
        grid=(mc, nby),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_window_scratch(spec),
        interpret=interpret,
    )(*([state_pos] * 5))
    return functools.reduce(lambda a, b: a + b, outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--groups", type=int, nargs="+", default=[5, 7])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--scan", action="store_true",
                    help="fori_loop-over-t kernel variant (bounds the "
                    "live set; the unrolled kernel fails Mosaic compile "
                    "at G>=5 on N=1M shapes)")
    args = ap.parse_args()

    system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
    spec = make_spec(box, 2.8, cap=args.cap)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    st, _ = rebuild_dense(st, spec, False)
    v32 = st.valid().astype(jnp.float32)
    mc = spec.mc
    print(f"device: {jax.devices()[0]}  N={args.n} mc={mc} cap={spec.cap}",
          flush=True)

    RC = 2.5

    # dense_forces_half returns (force, pe|None) — unpack the tuple.
    prod = jax.jit(lambda p: pallas_force.dense_forces_half(
        p, v32, spec, RC)[0])
    f_ref = jax.block_until_ready(prod(st.pos))

    @jax.jit
    def prod_loop(x):
        # Perturb per iteration (tpu_launch_probe.py pattern) so XLA
        # cannot CSE/hoist the pallas_call out of the loop.
        def body(i, c):
            f, _ = pallas_force.dense_forces_half(
                x + (i % 2).astype(jnp.float32) * 1e-6, v32, spec, RC)
            return c + f[0, 0, 0, 0]
        return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

    # Fence by fetching the device-side scalar — under the axon tunnel
    # block_until_ready does NOT block (see .claude/skills/verify).
    float(np.asarray(prod_loop(st.pos)))
    t0 = time.time()
    float(np.asarray(prod_loop(st.pos)))
    t_prod = (time.time() - t0) / args.reps * 1e3
    print(f"{'production per-row grid':28s} {t_prod:7.2f} ms/pass",
          flush=True)

    for G in args.groups:
        if mc % G:
            print(f"G={G}: skipped (mc={mc} not divisible)", flush=True)
            continue
        gf = jax.jit(lambda p, G=G: grouped_forces(p, spec, RC, G,
                                                   scan=args.scan))
        try:
            f_g = jax.block_until_ready(gf(st.pos))
        except Exception as e:  # VMEM blowup is a legitimate outcome
            print(f"G={G}: COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        d = jnp.max(jnp.abs(f_g - f_ref))
        scale = jnp.max(jnp.abs(f_ref))
        bitwise = bool(jnp.all(f_g == f_ref))
        tag = "" if bitwise else "  ** INVALID: not bitwise — timing for diagnosis only **"
        print(f"G={G}: max|dF|={float(d):.3e} (scale {float(scale):.3e}) "
              f"bitwise={bitwise}{tag}", flush=True)

        @jax.jit
        def g_loop(x, G=G):
            def body(i, c):
                f = grouped_forces(
                    x + (i % 2).astype(jnp.float32) * 1e-6, spec, RC, G,
                    scan=args.scan)
                return c + f[0, 0, 0, 0]
            return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

        float(np.asarray(g_loop(st.pos)))
        t0 = time.time()
        float(np.asarray(g_loop(st.pos)))
        t_g = (time.time() - t0) / args.reps * 1e3
        print(f"{'grouped G=%d' % G:28s} {t_g:7.2f} ms/pass "
              f"(production {t_prod:.2f})"
              f"{'' if bitwise else '  [INVALID]'}", flush=True)


if __name__ == "__main__":
    main()
