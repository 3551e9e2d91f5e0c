"""A/B: per-frame dispatch loop (unfused + fused raycast) vs batched
`lax.scan` replay, same workload as bench.py.  Passes are interleaved
round-robin so every variant rides the same throttle windows; per-variant
best-of-N is reported."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import numpy as np
import jax
import jax.numpy as jnp

N_RAYS = 16384
N_WARM = 3
N_FRAMES = 20
ROUNDS = 4


def link_latency():
    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return min(lat)


def main():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(max_raycast_points=N_RAYS, fuse_raycast=True,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=N_WARM + N_FRAMES, radius=1.5,
                                height=1.2)
    frames = [world.pointcloud(p, n_rays=N_RAYS, max_range=8.0, seed=i)
              for i, p in enumerate(poses)]

    chunks = [int(c) for c in (sys.argv[1:] or ["10", "20"])]

    def mk(fuse):
        m = VolumetricMapper(cfg.replace(fuse_raycast=fuse))
        p, v = m.stage_pointcloud_batch(frames)
        for i in range(N_WARM):
            out = m.process_pointcloud(poses[i], p[i], v[i])
        _ = int(np.asarray(out.device("relax_iters")))
        return m, p, v

    m0, p0, v0 = mk(False)
    m1, p1, v1 = mk(True)
    batchers = []
    for c in chunks:
        m, p, v = mk(True)
        out = m.process_pointcloud_batch(poses[N_WARM:], p[N_WARM:],
                                         v[N_WARM:], chunk=c)  # compile
        _ = int(np.asarray(out.device("relax_iters")))
        batchers.append((c, m, p, v))
    lat = link_latency()
    print(f"backend {jax.default_backend()}  rtt {lat*1e3:.1f} ms",
          file=sys.stderr)

    def loop_pass(m, p, v):
        t0 = time.perf_counter()
        for i in range(N_WARM, N_WARM + N_FRAMES):
            out = m.process_pointcloud(poses[i], p[i], v[i])
        _ = int(np.asarray(out.device("relax_iters")))
        return time.perf_counter() - t0 - lat

    def batch_pass(c, m, p, v):
        t0 = time.perf_counter()
        out = m.process_pointcloud_batch(poses[N_WARM:], p[N_WARM:],
                                         v[N_WARM:], chunk=c)
        _ = int(np.asarray(out.device("relax_iters")))
        return time.perf_counter() - t0 - lat

    variants = [("per-frame unfused", lambda: loop_pass(m0, p0, v0)),
                ("per-frame fused  ", lambda: loop_pass(m1, p1, v1))]
    for c, m, p, v in batchers:
        variants.append((f"batched k={c:<2}     ",
                         lambda c=c, m=m, p=p, v=v: batch_pass(c, m, p, v)))

    best = {name: 1e9 for name, _ in variants}
    for r in range(ROUNDS):
        for name, fn in variants:
            best[name] = min(best[name], fn())
    for name, _ in variants:
        print(f"{name}: {best[name]*1e3/N_FRAMES:.2f} ms/frame")


if __name__ == "__main__":
    main()
