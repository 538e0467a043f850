"""Adversarial verification of the throughput protocol + analytic MFU.

Two checks on the headline fuser number (bench.py):
  1. Work-doubling: an executable that chains TWO passes over the
     sequence (second pass with internally perturbed odometry, both
     digested) must take ~2x the single-pass time.  If it doesn't, the
     measurement is seeing elision/memoization and is invalid.
  2. Trial telemetry: digest the Newton iteration counts to get the
     actually-executed trials/scan (the cond-gated chunks skip work
     after convergence), then compute analytic FLOPs/scan =
     executed_trials x per-trial pair FLOPs and MFU vs the f32 VPU
     peak.  XLA's cost_analysis undercounts while-loop bodies (counts
     one trip), so this hand count is the honest one.

Run ALONE on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.io import dataset

TRIAL_CHUNK = 6          # ops/d2d.py newton_match trial_chunk
VPU_PEAK = 7.7e12        # v5e f32 VPU (8x128 lanes x 4 MACs x ~0.94 GHz x 2)

# Per-pair FLOPs (hand count of d2d_analytic._pair_fgh ~130 incl. exp)
# at the canonical op point: 1024 cells x 25-cell window pairs per
# trial.  The fgh-reuse trial loop (ops/d2d.newton_match, round 3) pays
# exactly ONE fgh evaluation per trial (the trial point's derivatives
# double as the next linearization) — no separate acceptance probe.
PAIRS = 1024 * 25
FLOPS_PER_TRIAL = PAIRS * 130


def main():
    import bench

    params = bench.canonical_params()
    seq = bench.make_sequence()
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state = fuser.initialize(
        params, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    odom = seq.odom[1:]
    pts, mask = pts_all[1:], mask_all[1:]

    def one_pass(st, od):
        def body(s, x):
            tm, p, m = x
            ns, info = fuser.update.__wrapped__(s, params, tm, p, m)
            return ns, (ns.Tnow, info.score, info.iterations)

        final, (traj, scores, iters) = jax.lax.scan(
            body, st, (od, pts, mask)
        )
        digest = sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(final)
        )
        return traj, scores, iters, digest

    @jax.jit
    def run1(st, od):
        return one_pass(st, od)

    @jax.jit
    def run2(st, od):
        t1, s1, i1, d1 = one_pass(st, od)
        t2, s2, i2, d2 = one_pass(st, od + 1.3e-5)
        return t1 + t2, s1 + s2, i1 + i2, d1 + d2

    def timed(fn, reps=10):
        out = fn(state, odom)
        jax.block_until_ready(out)
        times = []
        for k in range(reps):
            t0 = time.perf_counter()
            out = fn(state, odom + (k + 1) * 1e-5)
            # Consume by VALUE (host readback), stronger than
            # block_until_ready on this relayed backend.
            _ = float(out[3])
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2], out

    t1, out1 = timed(run1)
    t2, _ = timed(run2)
    n_scans = int(seq.ranges.shape[0]) - 1
    iters = np.asarray(out1[2])
    # Executed trials: cond-gated chunks run in quanta of TRIAL_CHUNK.
    executed = np.ceil(iters / TRIAL_CHUNK) * TRIAL_CHUNK
    trials_per_scan = float(executed.mean())
    sps = n_scans / t1
    flops_scan = trials_per_scan * FLOPS_PER_TRIAL
    achieved = flops_scan * sps
    print(json.dumps({
        "t_single_ms": round(t1 * 1e3, 3),
        "t_double_ms": round(t2 * 1e3, 3),
        "double_ratio": round(t2 / t1, 3),
        "scans_per_sec_value_consumed": round(sps, 1),
        "mean_newton_iters": round(float(iters.mean()), 2),
        "executed_trials_per_scan": round(trials_per_scan, 2),
        "analytic_flops_per_scan": flops_scan,
        "achieved_flops_per_sec": achieved,
        "mfu_vs_f32_vpu": round(achieved / VPU_PEAK, 4),
    }))


if __name__ == "__main__":
    main()
