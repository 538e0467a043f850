"""On-hardware Pallas on/off comparison + FLOPs/MFU accounting.

VERDICT round-1 items 5/6: prove (or delete) the fused Pallas
pair-derivative kernel (ops/pallas_kernels.pair_fgh_reduce) with a
measured on/off number at the canonical operating point, and report
honest FLOPs/scan + MFU against chip peak.

Protocol (CLAUDE.md): whole workload in one jitted executable,
host-distinct inputs per rep, digest consumed, block per rep, median.
Run this ALONE on the TPU tunnel (one process at a time).

FLOPs are counted by XLA's own cost analysis of the CPU-compiled
executable (same HLO before backend fusion) in a subprocess — the
AOT lower/compile path over the TPU tunnel is unreliable.

Usage:
    python examples/bench_pallas_mfu.py            # TPU timing run
    python examples/bench_pallas_mfu.py --flops    # CPU FLOPs count
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if "--flops" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import MatcherParams
from ndt_feature_graph_tpu.fusion import fuser, scan_driver
from ndt_feature_graph_tpu.io import dataset

T_STEPS = 40

# Peak FLOP/s by device kind.  The D2D derivative workload is
# elementwise f32 (VPU), so MFU is reported against both the bf16 MXU
# peak (the marketing number) and the f32 VPU peak (the relevant
# ceiling): v5e VPU = 8 sublanes x 128 lanes x 4 MACs x ~0.94 GHz x 2.
PEAKS = {"bf16_mxu": 197e12, "f32_vpu": 7.7e12}


def make_inputs(params):
    import bench

    seq = bench.make_sequence()
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state = fuser.initialize(
        params, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    return state, seq.odom[1:], pts_all[1:], mask_all[1:]


def make_run(params):
    @jax.jit
    def run(state, odom, pts, mask):
        final, traj, scores = scan_driver.run_sequence.__wrapped__(
            params, state, odom, pts, mask
        )
        digest = sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(final)
        )
        return traj, scores, digest

    return run


def flops_mode():
    import bench

    params = bench.canonical_params()
    state, odom, pts, mask = make_inputs(params)
    out = {}
    for name, use_pallas in [("xla", False), ("pallas", True)]:
        p = params.replace(matcher=MatcherParams(use_pallas=use_pallas))
        if use_pallas:
            # Pallas custom calls carry no cost model; skip.
            out[name] = None
            continue
        run = make_run(p)
        cost = run.lower(state, odom, pts, mask).compile().cost_analysis()
        out[name] = float(cost.get("flops", float("nan"))) / (T_STEPS - 1)
    print(json.dumps(out))


def timing_mode():
    import bench

    params = bench.canonical_params()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    state, odom, pts, mask = make_inputs(params)
    print("inputs materialized", flush=True)

    results = {}
    traj_ref = None
    for name, use_pallas in [("xla", False), ("pallas", True)]:
        p = params.replace(matcher=MatcherParams(use_pallas=use_pallas))
        run = make_run(p)
        try:
            t0 = time.perf_counter()
            out = run(state, odom, pts, mask)
            float(out[2])  # block_until_ready is a NO-OP on the relay
            print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            times = []
            for k in range(10):
                odom_k = odom + (k + 1) * 1e-5
                t0 = time.perf_counter()
                out = run(state, odom_k, pts, mask)
                float(out[2])  # force via readback
                times.append(time.perf_counter() - t0)
            times.sort()
            sps = (T_STEPS - 1) / times[len(times) // 2]
            traj = np.asarray(out[0])
        except Exception as e:  # Mosaic compile failure etc.
            results[name] = {"error": f"{type(e).__name__}: {e}"[:400]}
            print(f"{name}: FAILED {results[name]['error']}", flush=True)
            continue
        if traj_ref is None:
            traj_ref = traj
            agree = True
        else:
            agree = bool(np.allclose(traj, traj_ref, atol=1e-2))
        results[name] = {
            "scans_per_sec": round(sps, 1),
            "traj_agrees": agree,
        }
        print(f"{name}: {sps:.1f} scans/s agree={agree}", flush=True)

    # FLOPs accounting on CPU (subprocess — TPU AOT path unreliable).
    try:
        fl = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops"],
            capture_output=True, text=True, timeout=600,
        )
        flops = json.loads(fl.stdout.strip().splitlines()[-1])
    except Exception as e:
        flops = {"error": str(e)[:200]}
    for name, r in results.items():
        fp = flops.get(name) if isinstance(flops, dict) else None
        if fp and "scans_per_sec" in r:
            achieved = fp * r["scans_per_sec"]
            r["flops_per_scan"] = fp
            r["achieved_flops_per_sec"] = achieved
            for pk, pv in PEAKS.items():
                r[f"mfu_vs_{pk}"] = round(achieved / pv, 5)
    print(json.dumps({"device": dev.device_kind, "results": results}))


if __name__ == "__main__":
    if "--flops" in sys.argv:
        flops_mode()
    else:
        timing_mode()
