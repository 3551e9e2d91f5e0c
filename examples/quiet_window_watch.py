"""Catch a QUIET window on the shared TPU and run the owed variant verdicts.

The EDT traffic variants (p1/mid/allin, cf) are all neutral under throttle
(docs/ROADMAP.md round-2 findings): throttled windows cap duty cycle, so
pass-count cuts cannot register.  PERF.md's criterion for a judgeable window
is a cow-lady default batch_edt chain < ~2.5 ms/iteration.  This watcher
probes on an interval (each probe is a short-lived subprocess so no TPU/
tunnel handle is held between probes; the persistent compile cache at
/tmp/jax_cache makes repeat probes cheap) and, when the probe is quiet,
runs the A/B payload scripts and saves their output under bench_artifacts/.

Usage:
  python examples/quiet_window_watch.py            # loop until quiet or 8 h
  python examples/quiet_window_watch.py --probe    # one probe, print ms

Courtesy lock: the watcher skips a cycle while /tmp/gie_tpu_busy exists
(touch it around your own interactive TPU measurements).
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BUSY = "/tmp/gie_tpu_busy"

# ordered by priority: variant verdicts first (the owed default-flip
# evidence), then committed-number artifacts, then stage bisects — quiet
# windows may not outlast the whole list
PAYLOADS = [
    # round-3: change-gated EDT quiet-window verdict (the flip/revert check)
    ("gate_ab", [sys.executable, os.path.join(HERE, "bench_edt_gate_ab.py")],
     {}),
    # round-3b: phase-1 cache quiet verdict (default-flip evidence)
    ("gate_p1c_ab",
     [sys.executable, os.path.join(HERE, "bench_edt_gate_ab.py"),
      "--variants", "p1c", "--cases", "cow_lady,depthcam"], {}),
    # round-4: full traffic-cut stack (p1c + block P-test together)
    ("gate_stack_ab",
     [sys.executable, os.path.join(HERE, "bench_edt_gate_ab.py"),
      "--variants", "stack", "--cases", "cow_lady,depthcam"], {}),
    # round-5: 5/16 gate-menu rung revert check (default vs old 3-rung)
    ("gate_rung_ab",
     [sys.executable, os.path.join(HERE, "bench_gate_rung_ab.py")], {}),
    # round-3: padded-capacity sensitivity of the pointcloud path
    ("raycast_capacity_ab",
     [sys.executable, os.path.join(HERE, "bench_raycast_capacity_ab.py")],
     {}),
    ("allin_ab", [sys.executable, os.path.join(HERE, "bench_edt_allin_ab.py")],
     {"AB_ROUNDS": "4"}),
    ("env_variants_ab",
     [sys.executable, os.path.join(HERE, "bench_env_variants_ab.py")], {}),
    # per-case suite + headline: the round's committed numbers from a quiet
    # window rather than whatever the driver's window gives
    ("bench_suite", [sys.executable, os.path.join(REPO, "bench_suite.py")], {}),
    ("bench_headline", [sys.executable, os.path.join(REPO, "bench.py")], {}),
    ("edt_parts", [sys.executable, os.path.join(HERE, "bench_edt_parts.py")],
     {}),
    # round-4: per-stage frame bisect (the 2x SoL-gap residue hunt) and the
    # relax-engine perf story (VERDICT r3 items 5 and 8)
    ("frame_parts",
     [sys.executable, os.path.join(HERE, "bench_frame_parts.py")], {}),
    # round-4: depthcam is the config riding the budget line — its stage
    # bisect in a quiet window locates the remaining structural cost
    ("frame_parts_depthcam",
     [sys.executable, os.path.join(HERE, "bench_frame_parts.py"),
      "--case", "depthcam"], {}),
    ("relax_ab", [sys.executable, os.path.join(HERE, "bench_relax_ab.py")],
     {}),
    # round-5: scroll-path + cliff verdicts in a quiet window
    ("scroll_parts_depthcam",
     [sys.executable, os.path.join(HERE, "bench_scroll_parts.py"),
      "--case", "depthcam"], {}),
    ("teleport_depthcam",
     [sys.executable, os.path.join(HERE, "bench_teleport.py"),
      "--case", "depthcam"], {}),
    ("online_ab",
     [sys.executable, os.path.join(HERE, "bench_online_ab.py")], {}),
    ("env_efficiency",
     [sys.executable, os.path.join(HERE, "bench_env_efficiency.py")], {}),
    ("scroll_parts",
     [sys.executable, os.path.join(HERE, "bench_scroll_parts.py")], {}),
]


def run_probe() -> float:
    """Time the cow-lady default batch_edt chain; one float on stdout (ms)."""
    sys.path.insert(0, REPO)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import numpy as np
    import jax.numpy as jnp
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    K = 12
    rng = np.random.default_rng(0)
    occ = np.zeros((152, 152, 80), np.int8)
    n = int(0.03 * 152 * 152 * 25)
    occ[rng.integers(0, 152, n), rng.integers(0, 152, n),
        rng.integers(20, 45, n)] = 2
    glb = jnp.asarray(occ)
    mw = 152 + 152 + 80

    @jax.jit
    def chain(g):
        def body(g, _):
            r = batch_edt(g, max_width=mw, env_variant="fusepay")["dist_sq"]
            return (g + (r.reshape(-1)[0] % 1).astype(g.dtype)).astype(g.dtype), ()
        g, _ = jax.lax.scan(body, g, None, length=K)
        return g

    np.asarray(chain(glb))  # compile (cached) + warm
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(glb))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true", help="one probe, print ms")
    ap.add_argument("--threshold", type=float, default=2.5)
    ap.add_argument("--semi-threshold", type=float, default=4.0,
                    help="probe below this (but above --threshold) fires ONE "
                    "allin A/B capture (semi-quiet tier), then keeps waiting")
    ap.add_argument("--interval", type=float, default=600.0, help="seconds")
    ap.add_argument("--max-hours", type=float, default=8.0)
    args = ap.parse_args()

    if args.probe:
        print(f"{run_probe():.3f}")
        return

    deadline = time.time() + args.max_hours * 3600
    cycle = 0
    while time.time() < deadline:
        cycle += 1
        if os.path.exists(BUSY):
            print(f"[watch] cycle {cycle}: busy lock present, skipping",
                  flush=True)
            time.sleep(args.interval)
            continue
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                capture_output=True, text=True, timeout=1200)
            ms = float(out.stdout.strip().splitlines()[-1])
        except Exception as e:
            print(f"[watch] cycle {cycle}: probe failed ({e}); tunnel may be "
                  "down — retrying next cycle", flush=True)
            time.sleep(args.interval)
            continue
        quiet = ms < args.threshold
        semi = (not quiet) and ms < args.semi_threshold
        print(f"[watch] cycle {cycle}: probe {ms:.2f} ms "
              f"({'QUIET' if quiet else 'semi-quiet' if semi else 'throttled'})",
              flush=True)
        if semi and not getattr(main, "_semi_done", False):
            # semi-quiet: grab the highest-priority verdict once, keep waiting
            main._semi_done = True
            ts = time.strftime("%Y%m%d_%H%M%S")
            art = os.path.join(REPO, "bench_artifacts", f"semiquiet_{ts}")
            os.makedirs(art, exist_ok=True)
            with open(os.path.join(art, "probe_ms.txt"), "w") as f:
                f.write(f"{ms:.3f}\n")
            name, cmd, env_extra = PAYLOADS[0]
            print(f"[watch] semi-quiet: running {name} ...", flush=True)
            with open(os.path.join(art, name + ".txt"), "w") as f:
                subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               env=dict(os.environ, **env_extra), timeout=3600)
            print(f"[watch] semi-quiet capture in {art}", flush=True)
        if not quiet:
            time.sleep(args.interval)
            continue

        # quiet window: fire the payloads, capture artifacts
        ts = time.strftime("%Y%m%d_%H%M%S")
        art = os.path.join(REPO, "bench_artifacts", f"quiet_{ts}")
        os.makedirs(art, exist_ok=True)
        with open(os.path.join(art, "probe_ms.txt"), "w") as f:
            f.write(f"{ms:.3f}\n")
        for name, cmd, env_extra in PAYLOADS:
            env = dict(os.environ, **env_extra)
            print(f"[watch] running {name} ...", flush=True)
            with open(os.path.join(art, name + ".txt"), "w") as f:
                subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               env=env, timeout=3600)
        print(f"[watch] done — artifacts in {art}", flush=True)
        return
    print("[watch] max duration reached without a quiet window", flush=True)


if __name__ == "__main__":
    main()
