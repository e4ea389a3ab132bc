"""Benchmark: fwd+bwd differentiable rasterization throughput (Mrays/s/chip).

Headline metric per BASELINE.json: millions of rays (pixels) per second
through the FULL differentiable path — project -> rasterize (tile-binned
visibility + barycentrics) -> interpolate normals/albedo -> SH shade ->
antialias -> masked L1 loss -> backward to vertices/albedo/SH -> Adam
update. This is one HAM Stage-B step, the reference's metric workload
(`/root/reference/mesh_sfs_optim.py:246-318`).

The reference repo publishes NO benchmark numbers (BASELINE.md); the
`vs_baseline` field is measured against a 100 Mrays/s nominal parity bar
(an estimate of nvdiffrast fwd+bwd + loss on the reference's RTX 3090Ti at
this workload size), so >1.0 means faster than the assumed reference rate.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NOMINAL_BASELINE_MRAYS = 100.0

PRESETS = {
    # name: (res (H, W), n_views, subdiv, two_hands, base_refine, iters,
    #        fill)
    # fill = target silhouette coverage (fraction of frame area). The
    # real demo capture frames its hands at 5.6-7.5% mask coverage
    # (/root/reference/demo_data/1/mask); rounds <=3 benchmarked a
    # wide-framed scene at 0.2-0.4% coverage — a mostly-background frame
    # that understated covered-tile work (~2x at prod; BASELINE.md
    # round-4 measured record). fill=None keeps the legacy framing.
    #
    # prod = the reference's production HAM workload geometry: 334x512,
    # 16-view batch, x3-subdivided MANO-density mesh (~98.4k faces,
    # SURVEY.md: 49,281 verts / 98,432 faces; here 46,092/92,160 from
    # the round-5 watertight 360-face template at base_refine 1)
    # (`/root/reference/conf/ih_sfs.conf`, `mesh_sfs_optim.py:82`,
    # `train_mlp.py:151-154`).
    "prod": ((334, 512), 16, 3, False, 1, 10, 0.06),
    # demo = the reference's flagship demo workload: 1280x1024 renders,
    # two-hand subdiv-3 mesh (184,320 faces here; reference ~197k,
    # mano_optim.py:320-322),
    # batch 8 views per step (`/root/reference/conf/demo_sfs.conf`:
    # 16 cams at batch 8). Audited live (tile,chunk) pairs ~11.3k/view
    # at the 8x32 tile — under the 16k SMEM pair cap with no sharding;
    # view micro-batching keeps the step inside 16 GB HBM.
    "demo": ((1024, 1280), 8, 3, True, 1, 5, 0.065),
    # twohands = the mano_optim two-hand fusion at subdiv 3 (50k faces)
    "twohands": ((334, 512), 16, 3, True, 0, 10, 0.06),
    # legacy wide-framed variants (rounds <=3 comparability)
    "prod_wide": ((334, 512), 16, 3, False, 1, 10, None),
    "demo_wide": ((1024, 1280), 8, 3, True, 1, 5, None),
    "full": ((512, 512), 4, 2, False, 0, 10, None),
    "small": ((256, 256), 4, 1, False, 0, 10, None),
    "tiny": ((64, 64), 2, 0, False, 0, 3, None),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="prod", choices=sorted(PRESETS))
    ap.add_argument("--platform", default=None, help="e.g. cpu to force CPU")
    ap.add_argument("--roofline", action="store_true",
                    help="add per-kernel roofline bounds to the JSON")
    ap.add_argument("--impl", default=None,
                    help="force a rasterizer backend (e.g. binned) instead "
                         "of the deferred Pallas path")
    ap.add_argument("--trace", action="store_true",
                    help="after timing, profile one chain and print the "
                         "top device ops to stderr")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    # Persistent compile cache: once a compile of the big step succeeds,
    # later runs (and retries) reuse the executable. The cache lives
    # IN-REPO (committed) so the driver's fresh-environment invocation is
    # warm too — round 4's official bench timed out purely on cold
    # remote compiles (BENCH_r04.json rc=124; VERDICT r4 next-round #1).
    cache_dir = os.environ.get(
        "FMHR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Warm the device with a trivial program before compiling the large
    # step: on tunneled TPU backends the first program after a claim is
    # flaky for big graphs (observed "TPU device error" without this).
    t_claim = time.perf_counter()
    jax.block_until_ready(jnp.ones((8, 128)).sum())
    print(f"[bench] device claimed in {time.perf_counter() - t_claim:.1f}s",
          file=sys.stderr)

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing,
    )
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, _masked_l1
    from fmhr_tpu.raster import (render_scene, apply_antialias, AATopology)

    t_scene = time.perf_counter()
    ((H, W), n_views, subdiv, two_hands, base_refine, iters,
     fill) = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=subdiv, two_hands=two_hands,
        base_refine=base_refine, fill=fill)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    edges = jnp.asarray(topo.edges)
    degrees = jnp.asarray(topo.degrees)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_views, H, W, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((n_views, H, W)) > 0.3).astype(np.float32)
    )
    sh = jnp.asarray(
        np.tile(np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
                (n_views, 1))
    )
    w2cs = jnp.asarray(w2cs)
    projs = jnp.asarray(projs)
    verts0 = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)

    print(f"[bench] scene+topology in "
          f"{time.perf_counter() - t_scene:.1f}s", file=sys.stderr)
    opt = optax.adam(1e-4)

    # auto-size the deferred record budget once at setup (static after)
    from fmhr_tpu.raster.deferred import (audit_deferred_rows,
                                          audit_active_tiles,
                                          detect_cull_sign)
    # back-face culling, same policy as optim/ham.py: auto-detected from
    # the start mesh, nonzero only for closed consistently-wound
    # geometry where it is exact (the round-5 watertight template
    # qualifies; open meshes keep both orientations). FMHR_CULL=0 for
    # the A/B.
    cull_env = os.environ.get("FMHR_CULL", "auto")
    cull = (detect_cull_sign(verts, faces, w2cs, projs)
            if cull_env == "auto" else int(cull_env))
    live_pairs, rows_budget = audit_deferred_rows(
        project_verts(verts0, w2cs, projs), faces_j, (H, W), cull=cull)
    # active-tile grid compaction (audited per-view tile lists; the
    # kernels skip background tiles' grid steps, bit-identically).
    # FMHR_TILES_COMPACT=0 restores the dense grid for A/B.
    tiles_budget = None
    tiles_frac = 1.0
    if os.environ.get("FMHR_TILES_COMPACT", "1") != "0":
        from fmhr_tpu.raster.deferred import dense_tile_count

        _, tiles_budget = audit_active_tiles(
            project_verts(verts0, w2cs, projs), faces_j, (H, W), cull=cull)
        tiles_frac = tiles_budget / dense_tile_count(
            int(faces_j.shape[0]), (H, W))

    # oversize-chunk (global-list) cap audited from the start mesh (the
    # full-res pipeline overflowed the fixed 64 default in round 5)
    from fmhr_tpu.raster.deferred import audit_global_chunks
    _, global_cap = audit_global_chunks(
        project_verts(verts0, w2cs, projs), faces_j, (H, W), cull=cull)

    # FMHR_AA_BUDGET=audit switches the AA pass to the compact-pair path,
    # sized 2x from a concrete render of the start mesh (bit-identical to
    # dense when the budget fits) — for on-hardware dense-vs-compact A/B.
    aa_budget = None
    if os.environ.get("FMHR_AA_BUDGET") == "audit":
        from fmhr_tpu.raster.antialias import audit_aa_pairs
        _r, _f, _w = render_scene(
            verts0, faces_j, w2cs, projs,
            jnp.ones((V, 7), jnp.float32), (H, W),
            aa_topology=None, rows_budget=rows_budget)
        bh, bv = audit_aa_pairs(np.asarray(_r[..., 3]).astype(np.int64))
        aa_budget = (2 * bh, 2 * bv)
        del _r, _f, _w

    # The TILED training loss — exactly what optim/ham.py stage B runs on
    # TPU (tiled_loss="auto"): the step never leaves the kernels'
    # [B, T, C, P] layout (no untile/retile transposes; loss values and
    # grads match the image-layout formulation, tests/test_deferred.py).
    # Round 5 default: layout="compact" — the kernels write COMPACT
    # active-tile rows and ALL downstream math (AA, shading, losses)
    # runs on ~1/4 of the dense tile grid (FMHR_LAYOUT=tiled for A/B).
    # `--impl` (XLA-backend A/B) falls back to the image-layout loss.
    use_tiled = not args.impl
    layout = os.environ.get("FMHR_LAYOUT", "compact")
    if tiles_budget is None:
        layout = "tiled"            # compact requires the audited grid
    if use_tiled:
        from fmhr_tpu.raster.antialias import apply_antialias_tiled
        from fmhr_tpu.raster.deferred import tile_images

        imgs = tile_images(imgs, (H, W))            # [B, T, 3, P]
        masks = tile_images(masks, (H, W))          # [B, T, P]

    # View micro-batching (VERDICT r3 #1): exactly optim/ham.py's scheme —
    # the per-step view batch renders + backprops in chunks of `mb` views
    # with EXACT pooled-gradient accumulation, so the full-res demo
    # workload's per-pixel fwd+bwd residuals fit 16 GB HBM (unchunked it
    # requests 21.5 GB, scripts/tpu_logs/r3_demo_fullres.log). prod
    # resolves to no chunking (the whole step fits).
    print(f"[bench] budget audits in "
          f"{time.perf_counter() - t_scene:.1f}s cumulative",
          file=sys.stderr)
    from fmhr_tpu.optim.ham import (resolve_view_microbatch,
                                    accumulate_view_grads)
    mb = resolve_view_microbatch("auto", n_views, H, W,
                                 tile_active_frac=tiles_frac)

    # imgs/masks are step ARGUMENTS, not closure constants: baking ~44MB
    # of pixel data into the program bloats the executable the tunneled
    # backend must ship and has crashed large compiles outright.
    def view_terms_tiled(params, idx, imgs, masks):
        """((num, sse), (den, counters)) over the views `idx` — the same
        split as optim.ham.stage_b_view_terms_tiled (or its compact
        variant when layout='compact')."""
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j,
                                 incidence=topo.vert_slot_incidence)
        tr = render_scene(
            v, faces_j, w2cs[idx], projs[idx],
            jnp.concatenate(
                [normals, params["albedo"], jnp.ones_like(v[:, :1])], -1),
            (H, W), aa_topology=topo_aa, rows_budget=rows_budget,
            tiles_budget=tiles_budget, global_cap=global_cap,
            layout=layout, cull=cull, camera_grads=False,
        )
        if layout == "compact":
            from fmhr_tpu.optim.ham import stage_b_terms_compact

            m_sel = masks[idx]
            num, sse, den = stage_b_terms_compact(
                tr, imgs[idx], m_sel, m_sel, jnp.sum(m_sel ** 2),
                params["sh"][idx], 3)
            return (num, sse), (den, tr["counters"].sum(0))
        feat, aa_w = tr["feat"], tr["aa"]
        nrm = safe_normalize(feat[:, :, :3], axis=2)
        pred_mask = (apply_antialias_tiled(feat[:, :, 6:7], aa_w)[:, :, 0]
                     * tr["grid"]["valid"])
        valid = ((masks[idx] > 0) & (tr["ids"] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][idx][:, None, None, :], nrm, 3,
                          axis=2)
        pred = jnp.where(valid[:, :, None] > 0,
                         rad[:, :, None] * feat[:, :, 3:6], 0.0)
        pred = apply_antialias_tiled(pred, aa_w)
        num = jnp.sum(jnp.abs(pred - imgs[idx]) * valid[:, :, None])
        den = jnp.sum(valid) * 3.0
        sse = jnp.sum((pred_mask - masks[idx]) ** 2)
        return (num, sse), (den, tr["counters"].sum(0))

    def mesh_term(params):
        v = verts0 + params["delta"]
        return 200.0 * laplacian_smoothing(
            v, edges, degrees, nbr_incidence=topo.nbr_incidence)

    all_idx = jnp.arange(n_views)

    def loss_tiled(params, imgs, masks):
        (num, sse), (den, _) = view_terms_tiled(params, all_idx, imgs, masks)
        return (50.0 * num / jnp.maximum(den, 1.0) + mesh_term(params)
                + sse / (n_views * H * W))

    def vag_tiled(params, imgs, masks):
        """value_and_grad of the tiled loss: fused when the step fits,
        micro-batched EXACT accumulation otherwise (same trajectory)."""
        if mb >= n_views:
            return jax.value_and_grad(loss_tiled)(params, imgs, masks)
        mesh_val, g_mesh = jax.value_and_grad(mesh_term)(params)
        gn, gs, num, sse, den, _ = accumulate_view_grads(
            params, all_idx, mb,
            lambda pp, ix: view_terms_tiled(pp, ix, imgs, masks))
        D = jnp.maximum(den, 1.0)
        npx = n_views * H * W
        loss = 50.0 * num / D + sse / npx + mesh_val
        g = jax.tree.map(
            lambda a, b, c: 50.0 * a / D + b / npx + c, gn, gs, g_mesh)
        return loss, g

    def loss_image(params, imgs, masks):
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j,
                                 incidence=topo.vert_slot_incidence)
        rast, feat, aa_w = render_scene(
            v, faces_j, w2cs, projs,
            jnp.concatenate([normals, params["albedo"], jnp.ones_like(v[:, :1])], -1),
            (H, W), aa_topology=topo_aa, rows_budget=rows_budget,
            tiles_budget=tiles_budget, aa_budget=aa_budget,
            **({"global_cap": global_cap, "cull": cull}
               if not args.impl else {}),
            **({"impl": args.impl} if args.impl else {}),
        )
        nrm = safe_normalize(feat[..., :3])
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]
        valid = ((masks > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][:, None, None, :], nrm, 3)
        pred = jnp.where(valid[..., None] > 0, rad[..., None] * feat[..., 3:6], 0.0)
        pred = apply_antialias(pred, aa_w)
        return (
            50.0 * _masked_l1(pred, imgs, valid)
            + 200.0 * laplacian_smoothing(
                v, edges, degrees, nbr_incidence=topo.nbr_incidence)
            + jnp.mean((pred_mask - masks) ** 2)
        )

    if use_tiled:
        vag = vag_tiled
    else:
        def vag(params, imgs, masks):
            return jax.value_and_grad(loss_image)(params, imgs, masks)

    @jax.jit
    def step(params, state, imgs, masks):
        loss, g = vag(params, imgs, masks)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    # The measured form: `iters` chained steps inside ONE jit, exactly how
    # the real optimizers run (optim/ham.py drives stage A/B as jitted
    # lax.scan segments). A Python-level step loop instead measures the
    # per-dispatch latency of the remote/tunneled backend (~110 ms/step on
    # the axon tunnel vs ~60 ms of actual device time at `prod`).
    @jax.jit
    def run_chain(params, state, imgs, masks):
        def body(carry, _):
            params, state = carry
            loss, g = vag(params, imgs, masks)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(params, upd), state), loss

        (params, state), losses = jax.lax.scan(
            body, (params, state), None, length=iters)
        return params, state, losses

    params = {
        "delta": jnp.zeros_like(verts0),
        "albedo": jnp.full_like(verts0, 0.5),
        "sh": sh,
    }
    state = opt.init(params)

    # Stage the compiles: value_and_grad alone first, then the full chain.
    # The tunneled remote compiler is markedly more reliable when the large
    # program arrives after its main subgraph has been compiled once. The
    # separate single-`step` compile of rounds <=4 is gone from the hot
    # path (one fewer large cold compile); --trace compiles it on demand.
    t_setup = time.perf_counter()
    l, g = jax.jit(vag)(params, imgs, masks)
    jax.block_until_ready(l)
    print(f"[bench] vag compiled+ran in "
          f"{time.perf_counter() - t_setup:.1f}s", file=sys.stderr)

    t_c = time.perf_counter()
    params, state, losses = run_chain(params, state, imgs, masks)
    jax.block_until_ready(losses)
    print(f"[bench] chain compiled+ran in "
          f"{time.perf_counter() - t_c:.1f}s", file=sys.stderr)

    # Time TWO chains and take the faster: right after a heavy remote
    # cold-compile session the tunneled chip's first executions run far
    # below steady state (measured 2495 ms/step cold vs 74.8 ms warm at
    # prod, r5_cold1.log) — one extra chain is ~1 s warm and recovers
    # most of the gap cold. Force a host copy of the result INSIDE the
    # timed region: on the tunneled backend block_until_ready alone has
    # been observed to return before the execution actually completed
    # (demo preset read 0.05 ms/step), so time to data-on-host and
    # sanity-check it.
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        params, state, losses = run_chain(params, state, imgs, masks)
        losses_np = np.asarray(jax.device_get(losses))
        dt = min(dt, (time.perf_counter() - t0) / iters)
        assert np.isfinite(losses_np).all(), losses_np

    rays = n_views * H * W
    mrays = rays / dt / 1e6
    steps_per_s = 1.0 / dt

    out = {
        "metric": "Mrays/s/chip fwd+bwd rasterize+shade (HAM stage-B step)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_BASELINE_MRAYS, 4),
        "extra": {
            "preset": args.preset,
            # measurement mode (ADVICE r2): `iters` steps chained in one
            # jitted lax.scan = device time, matching how optim/ham.py
            # runs; rounds <= 2 used a Python dispatch loop whose numbers
            # include ~110 ms/step of tunnel dispatch latency.
            "timing": "scan-chained",
            "res": [H, W],
            "views": n_views,
            "faces": int(faces.shape[0]),
            "verts": int(V),
            "step_ms": round(dt * 1e3, 3),
            "ham_steps_per_s": round(steps_per_s, 3),
            "view_microbatch": int(mb) if use_tiled else n_views,
            "loss_first_last": [round(float(losses_np[0]), 4),
                                round(float(losses_np[-1]), 4)],
            "fill": fill,
            "cull": int(cull),
            "device": str(jax.devices()[0]),
        },
    }

    # Provisional JSON line the moment the measurement exists (flushed):
    # if an outer watchdog kills this process during the health/trace
    # extras below, stdout already carries a parseable result line
    # (round 4's official record was empty for exactly this reason).
    out["extra"]["provisional"] = True
    print(json.dumps(out), flush=True)
    del out["extra"]["provisional"]

    # capacity-health + realized coverage at the final mesh (the demo
    # preset must report all-zero overflow on a healthy run)
    t_health = time.perf_counter()
    if use_tiled:
        tr = render_scene(
            verts0 + params["delta"], faces_j, w2cs, projs,
            jnp.ones((V, 7), jnp.float32), (H, W), aa_topology=None,
            rows_budget=rows_budget, tiles_budget=tiles_budget,
            global_cap=global_cap, layout="tiled", cull=cull)
        out["extra"]["overflow"] = np.asarray(tr["counters"]).sum(0).tolist()
        cov_ids = np.asarray(tr["ids"] > 0)
        valid_np = np.asarray(tr["grid"]["valid"])
        out["extra"]["coverage"] = round(
            float((cov_ids & valid_np[None]).sum() / (n_views * H * W)), 4)

    print(f"[bench] health render in "
          f"{time.perf_counter() - t_health:.1f}s", file=sys.stderr)

    if args.trace:
        # op-level attribution of the PRODUCTION step (stderr; stdout
        # stays JSON lines for the driver)
        import tempfile

        from fmhr_tpu.utils.profiling import top_device_ops

        # trace 3 SINGLE-step dispatches, not the scan chain: the
        # chained trace is iters x every-op and its serialization from
        # the tunneled device has wedged past the bench timeout
        # (r4c_prod_trace, 2 attempts), while the r3 single-dispatch
        # traces transferred fine. Same program, same attribution.
        # Traced on THROWAWAY copies so the health report above is
        # identical with and without --trace (ADVICE r4).
        tdir = tempfile.mkdtemp(prefix="fmhr_bench_trace_")
        t_params, t_state = params, state
        with jax.profiler.trace(tdir):
            for _ in range(3):
                t_params, t_state, _l = step(t_params, t_state, imgs, masks)
            np.asarray(jax.device_get(_l))
        rows, total = top_device_ops(tdir, n_iters=3, top=30)
        if rows is None:
            print("[trace] no trace file found under", tdir,
                  file=sys.stderr)
        else:
            print(f"[trace] device ms/step total {total:.2f} "
                  f"(trace dir {tdir})", file=sys.stderr)
            for name, ms, c in rows:
                print(f"[trace] {ms:9.3f} ms x{c:<4d} {name[:90]}",
                      file=sys.stderr)

    if args.roofline:
        # winner pairs = distinct winning 128-face chunks per 8x128 tile
        from fmhr_tpu.utils.roofline import deferred_roofline
        rast, _, _ = render_scene(
            verts0 + params["delta"], faces_j, w2cs, projs,
            jnp.ones((V, 7), jnp.float32),
            (H, W), aa_topology=topo_aa, rows_budget=rows_budget,
            tiles_budget=tiles_budget,
        )
        from fmhr_tpu.raster.deferred import TILE_H, TILE_W
        ids = np.asarray(rast[..., 3]).astype(np.int64)
        Hp = -(-H // TILE_H) * TILE_H
        Wp = -(-W // TILE_W) * TILE_W
        idp = np.zeros((n_views, Hp, Wp), np.int64)
        idp[:, :H, :W] = ids
        tiles = idp.reshape(n_views, Hp // TILE_H, TILE_H,
                            Wp // TILE_W, TILE_W)
        tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(
            n_views, -1, TILE_H * TILE_W)
        chunk = np.where(tiles > 0, (tiles - 1) // 128, -1)
        pairs_b = sum(
            len(np.unique(t[t >= 0])) for v in chunk for t in v
        )
        out["extra"]["roofline"] = deferred_roofline(
            B=n_views, H=H, W=W, F=int(faces.shape[0]), C=7,
            pairs_a=int(np.sum(live_pairs)), pairs_b=int(pairs_b),
            fwd_ms=None, bwd_ms=None)
        out["extra"]["roofline"]["pairs_a"] = int(np.sum(live_pairs))
        out["extra"]["roofline"]["pairs_b"] = int(pairs_b)
    print(json.dumps(out))


def _run_streaming(argv, per_attempt: int) -> tuple[int | None, bool]:
    """Run one worker attempt, forwarding its stdout JSON lines to OUR
    stdout the moment they appear (so an outer watchdog that kills this
    whole process still leaves a parseable line behind — the round-4
    official bench record was empty for exactly this reason).

    Returns (returncode | None on timeout, saw_json).
    """
    import selectors

    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ, "out")
    sel.register(proc.stderr, selectors.EVENT_READ, "err")
    deadline = time.monotonic() + per_attempt
    saw_json = False
    err_tail: list[str] = []
    open_streams = 2
    while open_streams and time.monotonic() < deadline:
        for key, _ in sel.select(timeout=min(5.0, deadline - time.monotonic())):
            line = key.fileobj.readline()
            if not line:
                sel.unregister(key.fileobj)
                open_streams -= 1
                continue
            if key.data == "out":
                if line.startswith("{"):
                    print(line, end="", flush=True)
                    saw_json = True
            else:
                err_tail.append(line)
                sys.stderr.write(line)
    if time.monotonic() >= deadline and proc.poll() is None:
        proc.kill()
        proc.wait()
        return None, saw_json
    return proc.wait(), saw_json


def supervised() -> int:
    """Run the measurement in a child process with timeout + retries.

    The tunneled TPU backend occasionally hangs or faults on the first
    large compile; a poisoned claim recovers after a few minutes. The
    child re-invokes this script with --_worker. Budget (VERDICT r4 #1):
    2 attempts x 420 s + 60 s backoff + one 300 s binned fallback
    ~= 20 min worst case — and any attempt that got as far as the timed
    loop has already streamed its JSON line to stdout, so even the worst
    case usually leaves a result.
    """
    attempts = int(os.environ.get("FMHR_BENCH_ATTEMPTS", "2"))
    per_attempt = int(os.environ.get("FMHR_BENCH_TIMEOUT_S", "420"))
    backoff = int(os.environ.get("FMHR_BENCH_BACKOFF_S", "60"))
    base = [sys.executable, os.path.abspath(__file__), "--_worker"] + sys.argv[1:]
    # last-resort attempt falls back to the pure-XLA binned rasterizer so a
    # Mosaic compile regression degrades the number instead of the round
    plans = [(base, per_attempt)] * attempts + [
        (base + ["--impl", "binned"],
         int(os.environ.get("FMHR_BENCH_FALLBACK_TIMEOUT_S", "300")))]
    any_json = False
    for i, (argv, budget) in enumerate(plans):
        rc, saw_json = _run_streaming(argv, budget)
        any_json |= saw_json
        if rc == 0 and saw_json:
            return 0
        if rc is None:
            sys.stderr.write(f"bench attempt {i + 1} timed out\n")
            if saw_json:
                # the measurement line is already on stdout; don't burn
                # the remaining budget re-measuring what we have
                return 0
        if i + 1 < len(plans):
            time.sleep(backoff)
    return 0 if any_json else 1


if __name__ == "__main__":
    if "--_worker" in sys.argv:
        sys.argv.remove("--_worker")
        main()
    else:
        sys.exit(supervised())
