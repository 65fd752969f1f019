"""Point-sharded distributed BA: solve time vs device count (1/2/4/8).

BASELINE.md's scaling target row asks for measured scaling evidence; this
report times `dist.ba_sharded.solve_sharded` on ONE fixed global-BA
problem while the point blocks shard over 1/2/4/8 mesh devices.

HONEST CAVEAT (printed into the JSON): in this container the devices are
N virtual CPU devices carved out of a 2-vCPU host, so wall-clock cannot
speed up with N — every "device" shares the same two cores. What the
numbers DO measure is the partitioning overhead of the sharded formula
(per-shard linearization + psum of the (K,6,6)/(K,6) reduced camera
system + replicated solve) versus the single-device solve of the same
problem: `overhead_vs_single = t_D / t_1`. On real ICI-connected chips
the per-shard work divides by D while the psum'd reduced system stays
(K,6) — the wire cost measured in test_dist.py — so low overhead here is
the mechanics evidence, and the real-speedup claim is deliberately NOT
made from CPU timings.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/ba_scaling_report.py [--kf 240] [--pts 8192]
(The script pins jax_platforms=cpu itself — the site config shadows the
JAX_PLATFORMS env var.)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=240)
    ap.add_argument("--pts", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import numpy as np

    from sdvl_tpu.dist import ba_sharded
    from sdvl_tpu.dist.mesh import make_mesh
    from tests.test_scale import _synthetic_ba_problem

    problem, _, _ = _synthetic_ba_problem(K=args.kf, P=args.pts, noise=0.01)
    n_avail = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8) if d <= n_avail]

    out = []
    t1 = None
    for d in sizes:
        mesh = make_mesh(d)
        fn = lambda p: ba_sharded.solve_sharded(  # noqa: E731
            p, mesh, huber=0.05, stage_iters=(4, 6))
        res = fn(problem)                      # compile + run
        jax.block_until_ready(res.poses)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res = fn(problem)
            jax.block_until_ready(res.poses)
            best = min(best, time.perf_counter() - t0)
        if t1 is None:
            t1 = best
        rec = {
            "metric": "ba_sharded_solve",
            "devices": d,
            "kf": args.kf,
            "points": args.pts,
            "solve_s": round(best, 3),
            "overhead_vs_single": round(best / t1, 3),
            "chi2": float(res.chi2),
            "note": "virtual CPU devices share 2 host cores: this "
                    "measures sharding overhead, not speedup",
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
