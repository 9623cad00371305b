"""Hardware validation gate — run on the real TPU (SURVEY.md §6.2 gates at
production scale; the CPU test suite runs the same chain in interpret mode).

    python tools/validate_tpu.py [--n 1000000] [--steps 1000]

Checks, in order:
  1. expand kernel == scatter-based reference (bitwise, pid + positions)
  2. force kernel (exact-divide variant) vs jnp reference (<= fp32 tol)
  3. hot-path force kernel (NR reciprocal) within loose tol
  4. pair-count parity: count kernel == O(N^2) oracle... at large N the
     oracle is O(N^2)-expensive, so the oracle runs at a subsampled N and
     the large-N count is checked against the jnp dense reference instead
  5. NVE energy drift over --steps at scale (<= 1e-4)
Exits nonzero on any failure; prints one PASS/FAIL line per gate.
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))


def gate(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    return bool(ok)


def compile_variants() -> bool:
    """Force-compile EVERY kernel-variant flag combination reachable from
    the public entry points on the real backend — compile-only (lower +
    compile on abstract shapes, nothing executes), seconds each with a
    warm /root/repo/.jax_cache.

    This is the structural answer to the interpret-mode blind spot
    (VERDICT r4 item 2): twice a variant that passed interpret-mode tests
    was rejected by real Mosaic (round-3 tpu.concatenate, round-4 both
    expand flags' sub-8-sublane window slices). Interpret mode checks
    math, not tiling; this gate checks tiling at BOTH production shape
    families (the N=1M mc=35 and N=8M mc=71 grids, cap=40)."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import (DenseSpec, DenseState,
                                                      rebuild_dense)
    from md_neighbor_list_tpu.ops.slab_kernels import (SlabSpec,
                                                       slab_forces_boundary,
                                                       slab_forces_half,
                                                       slab_forces_interior,
                                                       slab_lists_half)

    f32, i32 = jnp.float32, jnp.int32

    def S(*shape, dt=f32):
        return jax.ShapeDtypeStruct(shape, dt)

    def state_of(spec):
        R, mc, cap = spec.rows, spec.mc, spec.cap
        return DenseState(pos=S(3, R, mc, cap), vel=S(3, R, mc, cap),
                          pid=S(R, mc, cap, dt=i32))

    jobs = []
    for mc, L, tag in ((35, 100.0, "1M"), (71, 200.0, "8M")):
        spec = DenseSpec(mc=mc, cap=40, L=L, cell_size=L / mc)
        st = state_of(spec)
        pv = (S(3, spec.rows, mc, 40), S(spec.rows, mc, 40))
        for fuse in (False, True):
            for split in (0, 2, 4, 8):
                jobs.append((f"rebuild_dense[{tag} fuse={fuse} "
                             f"split={split}]", rebuild_dense,
                             (st, spec, False, fuse, split)))
        jobs.append((f"rebuild_dense[{tag} blocked]", rebuild_dense,
                     (st, spec, False, False, 0, True)))
        jobs += [
            (f"dense_lists_half[{tag}]", pallas_force.dense_lists_half,
             (*pv, spec, 2.8, False)),
            (f"dense_counts[{tag}]", pallas_force.dense_counts,
             (*pv, spec, 2.8, False)),
            (f"dense_counts_half[{tag}]", pallas_force.dense_counts_half,
             (*pv, spec, 2.8, False)),
            (f"dense_pe_virial[{tag}]", pallas_force.dense_pe_virial,
             (*pv, spec, 2.5, False)),
        ]
        for wpe in (False, True):
            jobs += [
                (f"dense_forces[{tag} pe={wpe}]", pallas_force.dense_forces,
                 (*pv, spec, 2.5, False, wpe)),
                (f"dense_forces_half[{tag} pe={wpe}]",
                 pallas_force.dense_forces_half, (*pv, spec, 2.5, False,
                                                  wpe)),
            ]
        # both list grids, regardless of which the auto policy picks at
        # this shape (grouped needs a G from the VMEM model; merged is
        # the _split_rows fallback) — via monkeypatch-free direct calls
        G, nby = pallas_force._group_for_lists(spec)
        if G > 1:
            jobs.append((
                f"lists_half_grouped[{tag} G={G} nby={nby}]",
                jax.jit(functools.partial(pallas_force.lists_half_grouped,
                                          spec=spec, G=G, radius=2.8,
                                          interpret=False, nby=nby)),
                (pv[0],)))
        jobs.append((
            f"lists_half_merged[{tag}]",
            jax.jit(functools.partial(
                pallas_force.lists_half_impl, spec=spec,
                grid=(mc, mc), specs=pallas_force._state_specs_merged(spec),
                radius=2.8, zwrap=True, interpret=False)),
            (pv[0],)))

    # slab kernel family (nz >= 2 for the interior/boundary split)
    mc, L, nz = 35, 100.0, 5
    ss = SlabSpec(mc=mc, nz=nz, mc_z=mc, cap=40, L=L, cell_size=L / mc,
                  cell_z=L / mc)
    ext = ((nz + 1) * mc, mc, 40)
    jobs += [
        ("slab_lists_half", slab_lists_half,
         (S(3, *ext), S(*ext), ss, 2.8, False)),
        ("slab_forces_interior", slab_forces_interior,
         (S(3, nz * mc, mc, 40), ss, 2.5, False)),
        ("slab_forces_boundary", slab_forces_boundary,
         (S(3, mc, mc, 40), S(3, mc, mc, 40), S(mc, mc, 40), ss, 2.5,
          False)),
    ]
    for wpe in (False, True):
        jobs.append((f"slab_forces_half[pe={wpe}]", slab_forces_half,
                     (S(3, *ext), S(*ext), ss, 2.5, False, wpe)))

    all_ok = True
    for name, fn, fargs in jobs:
        t0 = time.time()
        try:
            fn.lower(*fargs).compile()
            print(f"  compiled {name} ({time.time() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report, fail the gate
            all_ok = False
            msg = str(e).splitlines()[0][:140]
            print(f"  COMPILE FAIL {name}: {msg}", flush=True)
    return gate(f"all kernel-variant flag combinations compile on "
                f"{jax.devices()[0].platform} ({len(jobs)} programs)",
                all_ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--n-oracle", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--compile-variants", action="store_true",
                    help="run ONLY the kernel-variant compile gate")
    args = ap.parse_args()

    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.core.system import init_lattice
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
    from md_neighbor_list_tpu.ops import dense_ref, oracle, pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                      rebuild_dense)

    ok = True
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- gate 0: every kernel-variant flag combo compiles on real Mosaic --
    ok &= compile_variants()
    if args.compile_variants:
        print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
        return 0 if ok else 1

    # --- small-N gates vs the O(N^2) oracle -------------------------------
    n0 = args.n_oracle
    system, box = init_lattice(n0, 1.0)
    spec0 = make_spec(box, 2.8, cap=40)
    st0 = dense_ref.rebuild_reference(
        from_packed(system.pos, system.vel, system.pid, spec0), spec0
    )
    valid0 = st0.valid().astype(jnp.float32)
    vm0 = st0.valid()

    got, _ = rebuild_dense(st0, spec0, False)
    want = dense_ref.rebuild_reference(st0, spec0)
    ok &= gate(
        "expand == reference (bitwise)",
        bool(jnp.all(got.pid == want.pid))
        and bool(jnp.all(jnp.where(want.valid()[None], got.pos == want.pos,
                                   True))),
    )

    c_k = pallas_force.dense_counts(st0.pos, valid0, spec0, 2.8, False)
    pairs_k = int(jnp.sum(jnp.where(vm0, c_k, 0))) // 2
    pairs_o = int(oracle.pair_count(system.pos, box, 2.8))
    ok &= gate("pair-count parity vs oracle",
               pairs_k == pairs_o, f"({pairs_k} vs {pairs_o})")

    c_h = pallas_force.dense_counts_half(st0.pos, valid0, spec0, 2.8, False)
    pairs_h = int(jnp.sum(jnp.where(vm0, c_h, 0)))
    ok &= gate("half-sweep count parity vs oracle",
               pairs_h == pairs_o, f"({pairs_h} vs {pairs_o})")

    # the z-chunked reference (used for the large-N count gate, where the
    # full sweep's (mc^3, cap^2) temporaries exceed HBM) must be bitwise-
    # equal to the full reference
    c_f = dense_ref.sweep_reference(st0, spec0, 2.8, want_forces=False)
    c_c = dense_ref.sweep_counts_chunked(st0, spec0, 2.8)
    ok &= gate("chunked reference == reference (bitwise)",
               bool(jnp.all(c_c == c_f)))

    # list artifact at production cap: one-pass masks+counts; per-slot bit
    # tallies of the packed words must reproduce the counts bit-for-bit
    c_l, masks = pallas_force.dense_lists_half(st0.pos, valid0, spec0, 2.8,
                                               False)
    ok &= gate("list kernel counts == half counts",
               bool(jnp.all(jnp.where(vm0, c_l == c_h, True))))
    pop = pallas_force.mask_slot_counts(masks, spec0.cap)
    ok &= gate(f"mask popcount == counts (cap={spec0.cap}, "
               f"words={pallas_force.mask_words(spec0.cap)})",
               bool(jnp.all(jnp.where(vm0, pop == c_l, True))))

    # half-sweep Newton-3 force kernel (the hot step path)
    f_r, pe_ref = dense_ref.sweep_reference(st0, spec0, 2.5, want_forces=True)
    scale0 = float(jnp.max(jnp.abs(f_r)))
    for wpe, nm in ((True, "exact divide"), (False, "NR reciprocal")):
        f_hn, pe_hn = pallas_force.dense_forces_half(
            st0.pos, valid0, spec0, 2.5, False, wpe)
        dfh = float(jnp.max(jnp.where(vm0[None], jnp.abs(f_hn - f_r), 0.0)))
        ok &= gate(f"half-sweep N3 force ({nm}) vs reference",
                   dfh <= 2e-4 * max(scale0, 1.0), f"(max |dF| {dfh:.2e})")
        if wpe:
            pe_f = 0.5 * float(jnp.sum(jnp.where(vm0, pe_ref, 0.0)))
            pe_h2 = float(jnp.sum(jnp.where(vm0, pe_hn, 0.0)))
            ok &= gate("half-sweep PE == full PE",
                       abs(pe_h2 - pe_f) <= 1e-4 * abs(pe_f),
                       f"({pe_h2:.3f} vs {pe_f:.3f})")

    # virial/pressure observable kernel (round 3): pe AND virial from the
    # dedicated half-sweep diagnostics pass vs the jnp twin on real Mosaic
    _, pe_tw, w_tw = dense_ref.sweep_reference(st0, spec0, 2.5, True,
                                               want_virial=True)
    pe_v, w_v = pallas_force.dense_pe_virial(st0.pos, valid0, spec0, 2.5,
                                             False)
    pe_tws = 0.5 * float(jnp.sum(jnp.where(vm0, pe_tw, 0.0)))
    w_tws = 0.5 * float(jnp.sum(jnp.where(vm0, w_tw, 0.0)))
    pe_vs = float(jnp.sum(jnp.where(vm0, pe_v, 0.0)))
    w_vs = float(jnp.sum(jnp.where(vm0, w_v, 0.0)))
    ok &= gate("pe/virial kernel vs reference",
               abs(pe_vs - pe_tws) <= 1e-4 * abs(pe_tws)
               and abs(w_vs - w_tws) <= 1e-4 * max(abs(w_tws), 1.0),
               f"(PE {pe_vs:.3f} vs {pe_tws:.3f}, W {w_vs:.3f} vs "
               f"{w_tws:.3f})")

    f_k, pe_k = pallas_force.dense_forces(st0.pos, valid0, spec0, 2.5,
                                          False, True)
    f_r, pe_r = dense_ref.sweep_reference(st0, spec0, 2.5, want_forces=True)
    df = float(jnp.max(jnp.where(vm0[None], jnp.abs(f_k - f_r), 0.0)))
    scale = float(jnp.max(jnp.abs(f_r)))
    ok &= gate("force kernel (exact divide) vs reference",
               df <= 2e-4 * max(scale, 1.0), f"(max |dF| {df:.2e})")

    f_h, _ = pallas_force.dense_forces(st0.pos, valid0, spec0, 2.5,
                                       False, False)
    dh = float(jnp.max(jnp.where(vm0[None], jnp.abs(f_h - f_r), 0.0)))
    ok &= gate("force kernel (NR reciprocal) vs reference",
               dh <= 2e-4 * max(scale, 1.0), f"(max |dF| {dh:.2e})")

    # --- slab kernels on hardware (P virtual slabs emulated serially) -----
    # The distributed engine's shard_map protocol is CPU-tested
    # (tests/test_dense_slab.py); here the SLAB KERNELS themselves must
    # compile under real Mosaic and reproduce the cube kernels exactly.
    from md_neighbor_list_tpu.ops.slab_kernels import (SlabSpec,
                                                       slab_forces_half,
                                                       slab_lists_half)

    p_emul = 3
    mc0 = spec0.mc
    assert mc0 % p_emul == 0, f"pick p_emul dividing mc={mc0}"
    nz0 = mc0 // p_emul
    sspec = SlabSpec(mc=mc0, nz=nz0, mc_z=mc0, cap=spec0.cap, L=spec0.L,
                     cell_size=spec0.cell_size, cell_z=spec0.cell_size)
    c_cube = pallas_force.dense_counts_half(st0.pos, valid0, spec0, 2.8,
                                            False)
    f_cube, _ = pallas_force.dense_forces_half(st0.pos, valid0, spec0, 2.5,
                                               False, False)
    f_parts, seams, c_parts = [], [], []
    for d in range(p_emul):
        own = slice(d * nz0 * mc0, (d + 1) * nz0 * mc0)
        g = ((d + 1) * nz0) % mc0
        gh = slice(g * mc0, (g + 1) * mc0)
        gpos = st0.pos[:, gh]
        if (d + 1) * nz0 >= mc0:  # ring seam: ghost layer wraps to z ~ 0
            gpos = gpos.at[2].add(jnp.float32(spec0.L))
        ext_pos = jnp.concatenate([st0.pos[:, own], gpos], axis=1)
        ext_v = jnp.concatenate([valid0[own], valid0[gh]], axis=0)
        fo, se, _ = slab_forces_half(ext_pos, ext_v, sspec, 2.5, False,
                                     False)
        cs, ms = slab_lists_half(ext_pos, ext_v, sspec, 2.8, False)
        pops = pallas_force.mask_slot_counts(ms, sspec.cap)
        assert bool(jnp.all(jnp.where(vm0[own], pops == cs, True)))
        f_parts.append(fo)
        seams.append(se)
        c_parts.append(cs)
    for d in range(p_emul):  # seam of device d lands on device d+1's layer 0
        f_parts[(d + 1) % p_emul] = (
            f_parts[(d + 1) % p_emul].at[:, :mc0].add(seams[d])
        )
    f_slab = jnp.concatenate(f_parts, axis=1)
    c_slab = jnp.concatenate(c_parts, axis=0)
    ok &= gate(f"slab count kernel == cube (P={p_emul} emulated)",
               bool(jnp.all(jnp.where(vm0, c_slab == c_cube, True))))
    dfs = float(jnp.max(jnp.where(vm0[None], jnp.abs(f_slab - f_cube), 0.0)))
    ok &= gate(f"slab force kernel == cube (P={p_emul} emulated)",
               dfs <= 1e-5 * max(scale0, 1.0), f"(max |dF| {dfs:.2e})")

    # --- FULL distributed program on real hardware: P=1 self-halo ---------
    # Only one chip exists here, so the shard_map DD program (collectives,
    # rebuild vote, migration keying, seam-reaction return) runs in its
    # P=1 self-halo mode (parallel/dense_slab.py docstring) — the same
    # jitted program structure as P=8, with self-ppermutes — and must
    # reproduce the single-chip cube engine's trajectory.
    from md_neighbor_list_tpu.parallel.dense_slab import DenseSlabSimulator

    cfg_dd = MDConfig(n=n0, dt=0.001, temperature=1.0, mesh_devices=1)
    steps_dd = 100
    key_dd = jax.random.PRNGKey(7)
    dd = DenseSlabSimulator(cfg_dd, cap=40)
    sdd = dd.init(key_dd)
    _, total_dd = dd.lists(sdd)
    want_dd = int(oracle.pair_count(dd.gather(sdd).pos, dd.box, cfg_dd.rs))
    ok &= gate("DD(P=1) shard_map pair count == oracle",
               total_dd == want_dd, f"({total_dd} vs {want_dd})")

    ke0d, pe0d = dd.energies(sdd)
    e0d = float(ke0d) + float(pe0d)
    sdd = dd.run(sdd, steps_dd, chunk=50)
    ke1d, pe1d = dd.energies(sdd)
    e1d = float(ke1d) + float(pe1d)
    driftd = abs(e1d - e0d) / abs(e0d)

    cube = DenseSimulator(cfg_dd, cap=40)
    cc = cube.run(cube.init(key_dd), steps_dd, chunk=50)
    ke1c, pe1c = cube.energies(cc)
    e1c = float(ke1c) + float(pe1c)
    # NVE-equivalence gate: at n=16k the melt-transient drift over a short
    # window is ~1.4e-3 for BOTH engines (it scales ~1/sqrt(N); the
    # absolute 1e-4 bound is the large-N ladder's, measured 3.4e-5 at
    # N=1M/1k steps) — the DD claim gated here is that the distributed
    # program conserves energy exactly as well as the validated cube
    # engine: same total energy to ~fp32 roundoff after the same steps.
    dE = abs(e1d - e1c) / abs(e1c)
    ok &= gate(
        f"DD(P=1) energy == cube engine after {steps_dd} steps",
        dE <= 1e-5,
        f"(|dE/E| {dE:.2e}; both drift {driftd:.2e} through the melt)",
    )
    p_cube, _, _ = cube.to_system(cc)
    p_dd = np.asarray(dd.gather(sdd).pos)
    dpd = np.abs(p_dd - np.asarray(p_cube))
    dpd = np.minimum(dpd, dd.box.L - dpd).max()
    reb_dd = int(np.asarray(sdd.n_rebuilds)[0])
    reb_cc = int(np.asarray(cc.n_rebuilds))
    ok &= gate(
        f"DD(P=1) trajectory == cube engine after {steps_dd} steps",
        dpd <= 5e-4 and reb_dd == reb_cc
        and int(np.asarray(sdd.n_migrated)[0]) == 0
        and not bool(np.asarray(sdd.overflow).any()),
        f"(max |dx| {dpd:.2e}, rebuilds {reb_dd}/{reb_cc})",
    )

    # --- large-N gates -----------------------------------------------------
    cfg = MDConfig(n=args.n, dt=0.001, temperature=1.0)
    sim = DenseSimulator(cfg)
    carry = sim.init(jax.random.PRNGKey(0))
    cl = pallas_force.dense_counts(
        carry.state.pos, carry.state.valid().astype(jnp.float32),
        sim.spec, cfg.rs, False,
    )
    # full sweep_reference materializes (mc^3, cap, cap) temporaries —
    # fine at N=1M (~176 MB each), OOM at N=8M (~2.3 GB each): chunk
    if sim.spec.slots > 4_000_000:
        cr = dense_ref.sweep_counts_chunked(carry.state, sim.spec, cfg.rs)
    else:
        cr = dense_ref.sweep_reference(carry.state, sim.spec, cfg.rs,
                                       want_forces=False)
    ok &= gate(
        f"count kernel == reference at N={args.n}",
        bool(jnp.all(jnp.where(carry.state.valid(), cl == cr, True))),
    )

    # Phantom-bit gate (round-3 park-lattice fix): invalid slots must emit
    # ZERO mask bits even at slot counts where the round-2 1-D park line
    # collided in f32 (N=8M: 718k colliding parked pairs -> phantom hits
    # between empty slots that crashed ops/decode).
    c_big, m_big = pallas_force.dense_lists_half(
        carry.state.pos, carry.state.valid().astype(jnp.float32),
        sim.spec, cfg.rs, False)
    pop_big = pallas_force.mask_slot_counts(m_big, sim.spec.cap)
    ghost_bits = int(jnp.sum(jnp.where(carry.state.valid(), 0, pop_big)))
    ghost_cnt = int(jnp.sum(jnp.where(carry.state.valid(), 0, c_big)))
    ok &= gate(f"no phantom mask bits on invalid slots at N={args.n}",
               ghost_bits == 0 and ghost_cnt == 0,
               f"({ghost_bits} bits, {ghost_cnt} counts)")

    # Subsampled force parity at scale (VERDICT r2 item 5): at N=8M the
    # box is L=200 and f32 coordinates near x~L carry ~L*2^-23 ~ 2.4e-5
    # absolute resolution — this gate checks the engine's forces AT THOSE
    # COORDINATES against an fp64 oracle on a ~20-sigma patch (interior
    # particles have their full rc-neighborhood inside the patch, so the
    # open-boundary pairwise oracle is exact for them).
    if args.n >= 1_000_000:
        patch = 20.0
        margin = cfg.rc
        lo = sim.spec.L / 2.0
        force, _ = pallas_force.dense_forces_half(
            carry.state.pos, carry.state.valid().astype(jnp.float32),
            sim.spec, cfg.rc, False)
        pos_f = carry.state.pos.reshape(3, -1)
        frc_f = force.reshape(3, -1)
        inpatch = ((pos_f >= lo) & (pos_f < lo + patch)).all(axis=0) & (
            carry.state.valid().reshape(-1)
        )
        kmax = int(1.3 * patch**3)  # rho=1 + fluctuation margin
        order = jnp.argsort(~inpatch)  # in-patch rows first (stable)
        sel = order[:kmax]
        host = np.asarray(
            jnp.concatenate([pos_f[:, sel], frc_f[:, sel],
                             inpatch[sel][None].astype(jnp.float32)])
        )
        pp = host[:3].T.astype(np.float64)
        pf = host[3:6].T
        npatch = int(host[6].sum())
        pp, pf = pp[:npatch], pf[:npatch]
        interior = ((pp >= lo + margin) & (pp < lo + patch - margin)).all(1)
        pp32 = pp.astype(np.float32)
        f_ref = np.zeros_like(pp)
        for i0 in range(0, npatch, 2048):  # tiled pairwise oracle
            dr = pp[i0:i0 + 2048, None, :] - pp[None, :, :]
            r2 = (dr * dr).sum(-1)  # fp64 force VALUES...
            # ...but cutoff MEMBERSHIP in f32 like the engine, so a pair
            # within one ulp of rc^2 cannot flip between the two sides
            dr32 = pp32[i0:i0 + 2048, None, :] - pp32[None, :, :]
            r2_32 = (dr32 * dr32).sum(-1, dtype=np.float32)
            np.fill_diagonal(r2[:, i0:i0 + 2048], np.inf)
            np.fill_diagonal(r2_32[:, i0:i0 + 2048], np.inf)
            hit = r2_32 < np.float32(cfg.rc * cfg.rc)
            s2 = np.where(hit, 1.0 / r2, 0.0)
            s6 = s2 ** 3
            f_ref[i0:i0 + 2048] = (
                (24.0 * s6 * (2.0 * s6 - 1.0) * s2)[:, :, None] * dr
            ).sum(1)
        dfp = np.abs(pf[interior] - f_ref[interior]).max()
        fscale = np.abs(f_ref[interior]).max()
        ok &= gate(
            f"patch force parity vs fp64 oracle at N={args.n} "
            f"({int(interior.sum())} interior of {npatch} patch particles)",
            dfp <= 2e-4 * max(fscale, 1.0), f"(max |dF| {dfp:.2e})",
        )

    ke0, pe0 = sim.energies(carry)
    e0 = float(ke0) + float(pe0)
    t0 = time.time()
    carry = sim.run(carry, args.steps, chunk=200)
    ke1, pe1 = sim.energies(carry)
    e1 = float(ke1) + float(pe1)
    drift = abs(e1 - e0) / abs(e0)
    ok &= gate(
        f"NVE |dE/E| over {args.steps} steps at N={args.n}",
        drift <= 1e-4,
        f"({drift:.2e}, {int(np.asarray(carry.n_rebuilds))} rebuilds, "
        f"{time.time()-t0:.0f}s)",
    )
    ok &= gate("no capacity overflow", not bool(np.asarray(carry.overflow)))

    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
