"""MFU / roofline probe for the three hot kernels (VERDICT r2 item 3).

Measures, on the real TPU in the trustworthy post-first-readback regime
(see bench.py's module docstring):

  1. NDT fused value/grad/Hessian pass (ops/ndt_deriv.py) — split into the
     DIRECT7 HBM gather (vm.lookup7) and the derivative contractions;
  2. SC retrieval einsum (ops/scancontext.detect_loop) at K=2048;
  3. one PGO PCG iteration shape (models/pose_graph, block Hvp at K=2048);
  plus the end-to-end ndt.align and the per-scan engine stages for context.

For every kernel: measured time (k-call amortized, forced completion),
XLA's own cost model (lowered.compile().cost_analysis(): flops + bytes
accessed), achieved GFLOP/s and GB/s, and % of the chip peaks.

TPU v5e (1 chip) peaks used: 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32-on-MXU
(4 bf16 passes), 819 GB/s HBM. Elementwise (VPU) f32 peak is ~3.6 TFLOP/s
(8 lanes x 128 sublanes x 2 FLOP x 1.75 GHz, 2 cores).

Writes out/mfu.json and prints a markdown table for PERF.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import pay_first_readback
from xchu_slam_tpu.config import FilterConfig, default_config
from xchu_slam_tpu.models import odometry, pose_graph as pg
from xchu_slam_tpu.ops import ndt, ndt_deriv, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import sim, compile_cache

compile_cache.enable()

PEAK_F32_MXU = 49e12
PEAK_BF16_MXU = 197e12
PEAK_HBM = 819e9
PEAK_VPU = 3.6e12


def timed(fn, k=100):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]   # forced completion
    return (time.perf_counter() - t0) / k


def cost(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0))}
    except Exception as e:  # pragma: no cover
        return {"flops": 0.0, "bytes": 0.0, "error": str(e)[:100]}


def row(name, dt, ca, note="", analytic_bytes=None):
    """One roofline row. `analytic_bytes` (hand-counted operand traffic from
    the kernel's actual shapes) OVERRIDES XLA's cost model for the bandwidth
    figures when given: XLA's `bytes accessed` over-counts gather/scatter
    operands (it bills the whole gathered-from table per gather), which
    round 3 recorded as >100%-of-HBM rows. Both byte counts are kept in the
    artifact so the discrepancy itself is visible."""
    fl, by_xla = ca.get("flops", 0.0), ca.get("bytes", 0.0)
    by = analytic_bytes if analytic_bytes is not None else by_xla
    r = {
        "kernel": name, "time_ms": round(1e3 * dt, 3),
        "flops": fl, "bytes_xla_cost_model": by_xla,
        "bytes_analytic": analytic_bytes,
        "gflops_per_s": round(fl / dt / 1e9, 1),
        "gb_per_s": round(by / dt / 1e9, 1),
        "pct_hbm_peak": round(100 * by / dt / PEAK_HBM, 2),
        "pct_f32_mxu_peak": round(100 * fl / dt / PEAK_F32_MXU, 3),
        "pct_vpu_peak": round(100 * fl / dt / PEAK_VPU, 2),
        "note": note,
    }
    print(f"{name:42s} {r['time_ms']:9.3f} ms  {r['gflops_per_s']:8.1f} GF/s "
          f"{r['gb_per_s']:7.1f} GB/s  {r['pct_hbm_peak']:5.2f}% HBM",
          flush=True)
    return r


def main():
    pay_first_readback()
    rows = []

    # ---------------- workload: the bench phase1 odometry shapes ----------
    fcfg = FilterConfig(max_raw_points=32768, max_points=16384,
                        outlier_method="radius")
    ospec = odometry.OdomSpec(
        gspec=vm.GridSpec(gx=80, gy=80, gz=24, resolution=2.0, min_points=6,
                          eig_inflation=0.01),
        nspec=ndt.NdtSpec(max_iterations=30),
        min_add_scan_shift=0.5, max_localmap_size=5.0, recentre_margin=20.0)
    gspec, nspec = ospec.gspec, ospec.nspec
    world = sim.make_world(7, extent=120.0, ground_pts=150_000)
    gt = sim.loop_trajectory(n_scans=10, radius=60.0, speed=1.0)
    rng = np.random.default_rng(7)
    xyz, inten = sim.render_scan(world, gt[1], rng, n_points=24_000)
    cl = jax.block_until_ready(make_cloud(xyz, inten, capacity=32768))
    filt = jax.block_until_ready(filter_scan(cl, fcfg))
    state = jax.block_until_ready(
        odometry.init_state(ospec, jnp.zeros(6), filt.xyz, filt.mask))
    grid = state.grid_a
    N = int(filt.xyz.shape[0])
    pose = jnp.array([0.3, 0.2, 0.0, 0.0, 0.0, 0.02], jnp.float32)
    d1, d2 = ndt.gauss_constants(nspec.outlier_ratio, nspec.resolution)

    # --- 1a. DIRECT7 gather (vm.lookup7) ---
    look = jax.jit(lambda p, x: ndt_deriv.neighborhood(p, x, grid, gspec))
    nb = jax.block_until_ready(look(pose, filt.xyz))
    dt = timed(lambda: look(pose, filt.xyz))
    # analytic: read xyz [N,3] f32, gather N rows of the DIRECT7-PACKED fin
    # table (70 lanes = 280 B each; round 5 packed the 7 neighbor rows into
    # one via pack_fin7 — one latency-bound row gather per point instead of
    # seven), write (mean[N,7,3], icov[N,7,6], valid[N,7]) = N·7·10 f32.
    # XLA's cost model instead bills the FULL packed table per gather op,
    # which round 3 recorded as a 411%-of-HBM row.
    look_bytes = N * 3 * 4 + N * 280 + N * 7 * 10 * 4
    rows.append(row(f"ndt lookup7 gather (N={N})", dt, cost(look, pose, filt.xyz),
                    note="ONE 70-lane packed row per point (pack_fin7); "
                         "analytic bytes = xyz read + N gathered rows + "
                         "[N,7,10] write",
                    analytic_bytes=look_bytes))

    # --- 1b. fused value/grad/Hessian WITH precomputed neighborhood ---
    vgh_nb = jax.jit(lambda p, x, m, nbv: ndt_deriv.ndt_value_grad_hess(
        p, x, m, grid, gspec, d1, d2, nb=nbv))
    _ = jax.block_until_ready(vgh_nb(pose, filt.xyz, filt.mask, nb))
    dt = timed(lambda: vgh_nb(pose, filt.xyz, filt.mask, nb))
    rows.append(row(f"ndt value/grad/Hess, nb reused (N={N})", dt,
                    cost(vgh_nb, pose, filt.xyz, filt.mask, nb),
                    note="the per-Newton-iteration contraction"))

    # --- 1c. value/grad only (the line-search trial evaluation) ---
    vg_nb = jax.jit(lambda p, x, m, nbv: ndt_deriv.ndt_value_grad_hess(
        p, x, m, grid, gspec, d1, d2, want_hess=False, nb=nbv))
    _ = jax.block_until_ready(vg_nb(pose, filt.xyz, filt.mask, nb))
    dt = timed(lambda: vg_nb(pose, filt.xyz, filt.mask, nb))
    rows.append(row(f"ndt value/grad only (N={N})", dt,
                    cost(vg_nb, pose, filt.xyz, filt.mask, nb),
                    note="per line-search trial"))

    # --- 1d. full align (6-ish Newton iterations, while_loop) ---
    al = jax.jit(lambda g, x, m, p: ndt.align(g, x, m, p, gspec, nspec))
    res = jax.block_until_ready(al(grid, filt.xyz, filt.mask, pose))
    iters = int(res.iterations)
    dt = timed(lambda: al(grid, filt.xyz, filt.mask, pose), k=30)
    # analytic (measured trip counts, assumes 2 line-search ∇-trials/iter):
    # per Newton iter = lookup7 traffic + the Hessian contraction re-reading
    # nb [N,7,10] + 2 trial passes re-reading nb
    nb_bytes = N * 7 * 10 * 4
    align_bytes = iters * (look_bytes + nb_bytes + 2 * nb_bytes)
    rows.append(row(f"ndt.align e2e ({iters} Newton iters)", dt,
                    cost(al, grid, filt.xyz, filt.mask, pose),
                    note="while_loop; analytic bytes = iters x (lookup7 + "
                         "hess pass + 2 line-search trials), so the low %HBM "
                         "is the point: align is gather-ISSUE-bound, not "
                         "byte-bound",
                    analytic_bytes=align_bytes))

    # --- 2. SC retrieval: full-DB x 60-rotation einsum at K=2048 ----------
    cfg = default_config()
    scspec = sc.spec_from_config(cfg.sc)
    K, R, S = cfg.pgo.max_keyframes, cfg.sc.num_ring, cfg.sc.num_sector
    rngd = np.random.default_rng(0)
    db = jnp.asarray(rngd.random((K, R, S), np.float32))
    query = db[37]
    det = jax.jit(lambda q, d: sc.detect_loop(q, d, jnp.int32(K), scspec))
    _ = jax.block_until_ready(det(query, db))
    dt = timed(lambda: det(query, db))
    rows.append(row(f"sc.detect_loop (K={K}, {R}x{S}, 60 rot)", dt,
                    cost(det, query, db),
                    note="full-DB cosine over all rotations on the MXU"))

    # --- 3. PGO: one in-loop solve shape at K=2048 ------------------------
    gsp = pg.spec_from_config(cfg.pgo)
    graph = pg.empty_graph(gsp)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = 2.0 * np.arange(K)
    Z = np.eye(4, dtype=np.float32)
    Z[0, 3] = 2.0
    graph = graph._replace(
        between_T=jnp.asarray(np.tile(Z, (K, 1, 1))),
        kf_mask=graph.kf_mask.at[:1500].set(True))
    li = np.zeros(gsp.max_loops, np.int32)
    lj = np.zeros(gsp.max_loops, np.int32)
    li[:64] = rngd.integers(0, 700, 64)
    lj[:64] = li[:64] + rngd.integers(300, 700, 64)
    graph = graph._replace(
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_T=jnp.asarray(np.tile(Z, (gsp.max_loops, 1, 1))),
        loop_info=jnp.ones(gsp.max_loops, jnp.float32),
        loop_mask=jnp.asarray(np.arange(gsp.max_loops) < 64))
    p0 = jnp.asarray(poses)
    inloop = pg.inloop_spec(gsp)
    solve = jax.jit(lambda p, g: pg.solve(p, g, inloop))
    _ = jax.block_until_ready(solve(p0, graph))
    dt = timed(lambda: solve(p0, graph), k=20)
    rows.append(row(f"pg.solve in-loop (K={K}, 64 loops, gn=2)", dt,
                    cost(solve, p0, graph),
                    note="warm-start spec; tridiag-PCG inside"))

    full = jax.jit(lambda p, g: pg.solve(p, g, gsp))
    _ = jax.block_until_ready(full(p0, graph))
    dt = timed(lambda: full(p0, graph), k=10)
    rows.append(row(f"pg.solve full (K={K}, gn={gsp.gn_iterations})", dt,
                    cost(full, p0, graph), note="finalize-strength solve"))

    # --- context: per-scan engine stages ---------------------------------
    filt_j = jax.jit(lambda c: filter_scan(c, fcfg))
    dt = timed(lambda: filt_j(cl))
    rows.append(row("filter_scan 32k->16k", dt, cost(filt_j, cl),
                    note="crop + sort-downsample + radius outlier + compact"))

    # statistical outlier variants at the KITTI-sim CLI shape (8192 pts) —
    # the phase3 per-scan budget's former dominant term
    fcfg8 = FilterConfig(max_raw_points=32768, max_points=8192,
                         outlier_method="statistical")
    stat_j = jax.jit(lambda c: filter_scan(c, fcfg8))
    _ = jax.block_until_ready(stat_j(cl))
    dt = timed(lambda: stat_j(cl))
    rows.append(row("filter_scan 32k->8k statistical (fused)", dt,
                    cost(stat_j, cl),
                    note="one fused all-pairs hierarchical top_k pass "
                         "(k=30); was 2.3x slower row-chunked"))
    fcfg8b = FilterConfig(max_raw_points=32768, max_points=8192,
                          outlier_method="statistical_bucketed")
    statb_j = jax.jit(lambda c: filter_scan(c, fcfg8b))
    _ = jax.block_until_ready(statb_j(cl))
    dt = timed(lambda: statb_j(cl))
    rows.append(row("filter_scan 32k->8k statistical (bucketed)", dt,
                    cost(statb_j, cl),
                    note="27-bucket candidate gather + exact fallback; wins "
                         "at real-LiDAR density, loses at sim sparsity"))

    from xchu_slam_tpu.utils import se3 as se3u
    pts_map = jax.block_until_ready(se3u.rotate_translate(state.pose, filt.xyz))
    ins = jax.jit(lambda g, p, m: vm.insert_points(g, p, m, gspec))
    g2 = jax.block_until_ready(ins(state.grid_b, pts_map, filt.mask))
    dt = timed(lambda: ins(state.grid_b, pts_map, filt.mask))
    V = gspec.num_voxels
    # analytic: read pts [N,3], RMW N scattered [10]-rows, PLUS a full-table
    # copy — this probe's jit does NOT donate the grid (the same input is
    # reused across the k timed calls), so XLA must preserve it and copies
    # all V rows. The engine's real insert (odometry.step) donates the
    # state, so its traffic is the N·rows RMW only; this row is the
    # non-donated upper bound. (Round-4 review: the previous analytic count
    # assumed the donated path while timing the copying one.)
    ins_bytes = N * 3 * 4 + 2 * N * 10 * 4 + 2 * V * 10 * 4
    rows.append(row("vm.insert_points 16k", dt,
                    cost(ins, state.grid_b, pts_map, filt.mask),
                    note="scatter-add of per-voxel moments; analytic = N-row "
                         "RMW + full-table copy (non-donated probe jit; the "
                         "engine's donated insert skips the copy)",
                    analytic_bytes=ins_bytes))
    fin = jax.jit(lambda g: vm.finalize(g, gspec))
    dt = timed(lambda: fin(g2))
    # analytic: read moments [V,10], write packed fin [V,10]
    rows.append(row("vm.finalize 80x80x24", dt, cost(fin, g2),
                    note="mean/cov/eig-inflate/invert per voxel; analytic = "
                         "read [V,10] moments + write [V,10] fin",
                    analytic_bytes=2 * V * 10 * 4))

    out = {"device": str(jax.devices()[0]),
           "peaks": {"f32_mxu": PEAK_F32_MXU, "bf16_mxu": PEAK_BF16_MXU,
                     "hbm_Bps": PEAK_HBM, "vpu_f32": PEAK_VPU},
           "rows": rows}
    os.makedirs("out", exist_ok=True)
    with open("out/mfu.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote out/mfu.json", flush=True)

    # markdown table for PERF.md
    print("\n| kernel | time | GFLOP/s | GB/s | %HBM | %f32-MXU |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['kernel']} | {r['time_ms']:.2f} ms | "
              f"{r['gflops_per_s']:.0f} | {r['gb_per_s']:.0f} | "
              f"{r['pct_hbm_peak']:.1f}% | {r['pct_f32_mxu_peak']:.2f}% |")


if __name__ == "__main__":
    main()
