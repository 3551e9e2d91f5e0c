"""Five-config benchmark suite: one JSON line per BASELINE.md configuration.

The reference's de-facto benchmark is replaying its five dataset bags through
the five launch configs (README.md:102-145; cfg/*.yaml + launch/*.launch —
BASELINE.md table).  This suite reproduces each configuration's engine
parameters and sensor pipeline on synthetic worlds at real frame sizes and
measures, per config:

  * ms/frame      — on-device engine time (sensor + fusion + EDT + merge),
                    scanned-replay dispatch, best of N passes, link RTT
                    subtracted (same methodology as bench.py)
  * Mvox/s        — window voxels updated per second
  * edt_ms        — batch EDT alone over the case's canvas, chained on the
                    run's FINAL occupancy (the stage split's dominant term)

Run on the real TPU:  python bench_suite.py [--cases cow_lady,depthcam]
Prints one JSON line per case + a trailing summary line.  The shared tunnel
throttles 3-20x unpredictably: compare cases within one run, re-run for
absolute numbers.
"""
from __future__ import annotations


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_compile_cache()

import argparse
import json
import os
import time

import numpy as np

N_WARMUP = 2
N_FRAMES = 20
N_PASSES = 3
CHUNK = 40  # frames per scan program.  Round-5 finding (ADVICE r4): the
# round-4 chunk ladder (depthcam 40 -> 8.34, 160 -> 6.65 etc.) conflated
# program-quantum amortisation with a genuinely easier trajectory — chunk
# was coupled to the angular step, so longer programs got 1/chunk the
# per-frame motion.  With the step DECOUPLED (case_world_poses winds whole
# extra loops), the ladder is FLAT: depthcam 8.13/8.11/8.06 and
# ugv 6.52/6.69/6.91 ms/frame at 40/80/160
# (bench_artifacts/{depthcam,ugv}_chunk_ab_decoupled_20260821.jsonl), so
# 40 everywhere is the default; longer programs only matter in heavily
# throttled windows (per-program quantum F ~ 80-100 ms), which the suite's
# quiet-window gating avoids measuring in anyway.
CASE_CHUNK = {}
K_EDT = 8

# Trajectory sampling granularity (ADVICE r4): the angular step is FIXED at
# BASE_FRAMES poses per closed loop regardless of chunk.  Previously
# n_frames == chunk sampled the same circle chunk-times finer, so longer
# programs got genuinely easier frames (per-frame motion, scroll count and
# gated-EDT work all ~1/chunk — the same signature as the throttle
# quantum).  Now longer programs wind chunk/BASE_FRAMES full loops of the
# SAME 40-pose circle (closed wrap -> ordinary scrolls), so chunk varies
# ONLY the per-program fixed cost being amortised, and per-frame device
# work matches a real fixed-frame-rate sensor.
BASE_FRAMES = 40


def case_world_poses(cfg, chunk):
    """(world, poses_m, n_frames) at the fixed BASE_FRAMES step granularity."""
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory

    extent = min(cfg.local_size_m[0] * 0.45, 4.5)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=extent,
                              height=max(cfg.local_size_m[2], 2.5))
    loops = max(1, (chunk + BASE_FRAMES - 1) // BASE_FRAMES)
    base = circular_trajectory(n_frames=BASE_FRAMES, radius=extent * 0.35,
                               height=cfg.local_size_m[2] * 0.4, closed=True)
    return world, base * loops, BASE_FRAMES * loops

# Per-case targets: BASELINE.md names only the cow-lady 10 ms budget; the
# others reuse it as the common "real-time at 2 Hz with huge margin" bar.
TARGET_MS = 10.0


def _link_latency():
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = int(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return float(np.median(lat))


def _make_frames(case, cfg, world, poses):
    """(batch_fn, per-frame fallback data) for the case's sensor pipeline."""
    from gie_mapping_tpu.runtime.datasets import BoxWorld  # noqa: F401

    K = len(poses)
    if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        n_rays = cfg.max_raycast_points
        clouds = [world.pointcloud(p, n_rays=n_rays, max_range=8.0, seed=i)
                  for i, p in enumerate(poses)]
        return "pointcloud", clouds, {}
    if case == "scan2D":
        scans = [world.scan_2d(p, n_beams=720) for p in poses]
        return "scan", np.stack([s[0] for s in scans]), {
            "theta_min": scans[0][1], "theta_inc": scans[0][2]}
    if case == "depthcam":
        imgs = [world.depth_image(p, rows=96, cols=128, fx=80.0, fy=80.0,
                                  max_range=6.0) for p in poses]
        d0 = imgs[0]
        return "depth", np.stack([im[0] for im in imgs]), {
            "fx": d0[1], "fy": d0[2], "cx": d0[3], "cy": d0[4]}
    if case == "laser3D":
        scans = [world.multiscan(p) for p in poses]
        s0 = scans[0]
        return "multiscan", np.stack([s[0] for s in scans]), {
            "theta_min": s0[1], "theta_inc": s0[2], "phi_min": s0[3],
            "phi_inc": s0[4]}
    raise KeyError(case)


def bench_case(case: str, link_ms: float):
    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.ops.edt_batch import batch_edt
    from gie_mapping_tpu.utils.config import load_config

    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False)
    if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=16384, fuse_raycast=True)
    cfg = load_config(case, **overrides)

    chunk = CASE_CHUNK.get(case, CHUNK)
    world, poses_m, n_frames = case_world_poses(cfg, chunk)
    poses = poses_m[:N_WARMUP] + poses_m  # closed loop: passes wrap with an
    # ordinary scroll -> each pass plans as one scan program
    kind, data, kw = _make_frames(case, cfg, world, poses)

    mapper = VolumetricMapper(cfg)
    if kind == "pointcloud":
        pts, val = mapper.stage_pointcloud_batch(data)
        run = lambda lo, hi: mapper.process_pointcloud_batch(
            poses[lo:hi], pts[lo:hi], val[lo:hi], chunk=chunk)
        warm = lambda i: mapper.process_pointcloud(poses[i], pts[i], val[i])
    else:
        dev = jnp.asarray(data)
        batch_call = {"scan": mapper.process_scan2d_batch,
                      "depth": mapper.process_depth_batch,
                      "multiscan": mapper.process_multiscan_batch}[kind]
        per_call = {"scan": mapper.process_scan2d,
                    "depth": mapper.process_depth,
                    "multiscan": mapper.process_multiscan}[kind]
        run = lambda lo, hi: batch_call(poses[lo:hi], dev[lo:hi], chunk=chunk,
                                        **kw)
        warm = lambda i: per_call(poses[i], dev[i], *kw.values())

    for i in range(N_WARMUP):
        warm(i)
    out = run(N_WARMUP, N_WARMUP + n_frames)
    _ = out.relax_iters  # sync (compile + first allocations done)

    per_pass = []
    for _p in range(N_PASSES):
        t0 = time.perf_counter()
        out = run(N_WARMUP, N_WARMUP + n_frames)
        _ = int(np.asarray(out.device("relax_iters")))
        per_pass.append((time.perf_counter() - t0) * 1e3 / n_frames
                        - link_ms / n_frames)
    ms = max(min(per_pass), 1e-6)

    # stage split: batch EDT alone over this case's canvas, on the final
    # occupancy (chained dispatches, one readback)
    import jax

    glb = mapper.state.vox_type
    mw = sum(cfg.canvas_size)
    variant = cfg.edt_env_variant
    p1 = cfg.edt_phase1
    mid = cfg.edt_mid

    @jax.jit
    def edt_chain(g):
        def body(g, _):
            r = batch_edt(g, max_width=mw, env_variant=variant,
                          p1=p1, mid=mid)["dist_sq"]
            g2 = (g + (r.reshape(-1)[0] % 1).astype(g.dtype)).astype(g.dtype)
            return g2, ()
        g, _ = jax.lax.scan(body, g, None, length=K_EDT)
        return g

    np.asarray(edt_chain(glb))
    edt_best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(edt_chain(glb))
        edt_best = min(edt_best,
                       ((time.perf_counter() - t0) * 1e3 - link_ms) / K_EDT)

    # ---- tail latency (VERDICT r4 item 4): a planner consuming frames at
    # the reference's 2 Hz cadence (volumetric_mapper.cpp:129) cares about
    # the WORST frame, which the chunked replay average hides.  Per-frame
    # timing inside one scan program is not observable, so the tail is
    # derived from measured STAGE costs in the same window:
    #   steady_ms   scroll-free replay of the same shapes (has_scrolls=False
    #               scan, same chunk -> includes the program-quantum share)
    #   scroll_ms   one compacted in-scan scroll step (chained _do_scroll)
    #   teleport_ms the full-canvas scroll path (forced-full worst case)
    # p50 ~= steady; p95 = steady + scroll where scrolls occur on > 5% of
    # frames (they do on every budget-line config); worst = steady +
    # teleport (teleport-scale jumps and force_full epochs).
    scroll_rate = (mapper.replay_scanned_scrolls
                   / max(mapper.replay_scanned_frames, 1))
    steady_poses = [poses_m[-1]] * n_frames
    if kind == "pointcloud":
        run_steady = lambda: mapper.process_pointcloud_batch(
            steady_poses, pts[N_WARMUP:], val[N_WARMUP:], chunk=chunk)
    else:
        run_steady = lambda: batch_call(
            steady_poses, dev[N_WARMUP:], chunk=chunk, **kw)
    out2 = run_steady()
    _ = int(np.asarray(out2.device("relax_iters")))  # compile + sync
    steady_best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out2 = run_steady()
        _ = int(np.asarray(out2.device("relax_iters")))
        steady_best = min(steady_best,
                          ((time.perf_counter() - t0) * 1e3 - link_ms)
                          / n_frames)

    from gie_mapping_tpu.map_state import _do_scroll

    st0 = mapper.state
    rows, cols = mapper._scroll_compact_rows(
        np.asarray(st0.origin_blk) + np.array([1, 0, 0]),
        prev=np.asarray(st0.origin_blk))

    def _scroll_chain(rows, cols):
        @jax.jit
        def chain(s):
            def body(s, _):
                delta = jnp.where((s.origin_blk[0] % 2) == 0, 1, -1)
                tgt = s.origin_blk.at[0].add(delta)
                return _do_scroll(s, tgt, cfg, compact_rows=rows,
                                  compact_cols=cols), ()
            s, _ = jax.lax.scan(body, s, None, length=K_EDT)
            # consume EVERY carried leaf: returning only origin_blk lets
            # XLA's while-loop simplifier delete the entire scroll as dead
            # code (burned-once lesson — sub-link-latency "measurements")
            return jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.float32(
                    y.reshape(-1)[0].astype(jnp.float32)),
                s, jnp.float32(0))
        np.asarray(chain(st0))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(chain(st0))
            best = min(best,
                       ((time.perf_counter() - t0) * 1e3 - link_ms) / K_EDT)
        return best

    scroll_best = _scroll_chain(rows, cols)
    # teleport = the path the mapper actually dispatches for teleport-scale
    # shifts (mapper._scroll_compact_rows: compact-full Pallas columns up
    # to 8k blocks, dense XLA beyond)
    cb = np.asarray(cfg.canvas_blocks)
    tp_rows, tp_cols = mapper._scroll_compact_rows(
        np.asarray(st0.origin_blk) + 10 * cb, prev=np.asarray(st0.origin_blk))
    teleport_best = _scroll_chain(tp_rows, tp_cols)
    p95 = steady_best + (scroll_best if scroll_rate > 0.05 else 0.0)

    return {
        "metric": f"{case}_ogm_edt_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
        "extra": {
            "case": case,
            "frames": n_frames,
            "dispatch_mode": f"scan_chunk_{chunk}",
            "mvoxels_per_s": round(cfg.map_volume * 1e3 / ms / 1e6, 2),
            "edt_ms": round(edt_best, 3),
            "steady_ms": round(steady_best, 3),
            "scroll_ms": round(scroll_best, 3),
            "teleport_ms": round(teleport_best, 3),
            "scroll_rate": round(scroll_rate, 3),
            "p50_ms": round(steady_best, 3),
            "p95_ms": round(p95, 3),
            "worst_ms": round(steady_best + teleport_best, 3),
            "canvas": list(cfg.canvas_size),
            "window": list(cfg.local_size),
            "sensor": kind,
            "env_variant": variant,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="scan2D,ugv_corridor,cow_lady,"
                    "depthcam,laser3D,uav_raycast_fine")
    ap.add_argument("--out", default=None,
                    help="also append results to this JSON-lines file")
    args = ap.parse_args()

    from bench import _wait_for_backend

    _wait_for_backend()
    link_ms = _link_latency() * 1e3

    # quietness context: the standard cow-lady EDT-chain probe (PERF.md §1;
    # < ~2.5 ms means a judgeable quiet window) recorded per run so suite
    # artifacts from different throttle windows can be compared honestly
    def _probe():
        import subprocess
        import sys as _sys
        watch = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "examples", "quiet_window_watch.py")
        try:
            out = subprocess.run([_sys.executable, watch, "--probe"],
                                 capture_output=True, text=True, timeout=1200)
            return round(float(out.stdout.strip().splitlines()[-1]), 3)
        except Exception:
            return None  # JSON null (NaN would be invalid JSON)

    # quiet-window gating + retries (same policy as bench.py, VERDICT r2
    # item 2b): wait for a quiet probe before measuring, then re-measure
    # below-baseline cases while the retry budget lasts, keeping the best
    QUIET_PROBE_MS = 2.5
    budget = float(os.environ.get("GIE_SUITE_RETRY_S", 900.0))
    deadline = time.time() + budget
    probe_ms = _probe()
    waits = 0
    while ((probe_ms is None or probe_ms >= QUIET_PROBE_MS)
           and time.time() < deadline):
        import sys as _sys
        print(f"suite: throttled window (probe {probe_ms} ms); waiting...",
              file=_sys.stderr)
        time.sleep(min(60.0, max(1.0, deadline - time.time())))
        probe_ms = _probe()
        waits += 1
    print(json.dumps({"metric": "suite_quietness_probe", "value": probe_ms,
                      "unit": "ms", "quiet_waits": waits,
                      "quiet": bool(probe_ms is not None
                                    and probe_ms < QUIET_PROBE_MS)}),
          flush=True)

    results = []
    for case in args.cases.split(","):
        r = bench_case(case.strip(), link_ms)
        r["extra"]["probe_ms"] = probe_ms
        results.append(r)
    # retry pass: below-target cases re-measure while budget remains.
    # Re-probe before each retry (ADVICE r3) — a retry inside a throttled
    # window wastes budget and would stamp a stale probe into the artifact;
    # cap retries per case so one genuinely-slow case can't eat everything.
    MAX_RETRIES = int(os.environ.get("GIE_SUITE_MAX_RETRIES", 3))
    for i, r in enumerate(results):
        retries = 0
        while (r["vs_baseline"] < 1.0 and retries < MAX_RETRIES
               and time.time() < deadline):
            p = _probe()
            if p is None or p >= QUIET_PROBE_MS:
                import sys as _sys
                print(f"suite: retry window throttled (probe {p} ms); "
                      "waiting...", file=_sys.stderr)
                time.sleep(min(60.0, max(1.0, deadline - time.time())))
                continue
            retries += 1
            r2 = bench_case(r["extra"]["case"], link_ms)
            r2["extra"]["probe_ms"] = p
            if r2["value"] < r["value"]:
                r = r2
            r["extra"]["throttle_retries"] = retries
            results[i] = r
    for r in results:
        print(json.dumps(r), flush=True)
    summary = {"metric": "suite_geomean_vs_baseline",
               "value": round(float(np.exp(np.mean(
                   [np.log(max(r["vs_baseline"], 1e-9)) for r in results]))), 3),
               "unit": "x", "link_latency_ms": round(link_ms, 2),
               "probe_ms_start": probe_ms,
               "probe_ms_end": _probe()}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for r in results + [summary]:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
