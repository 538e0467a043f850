"""Measure the fleet curve with the sensor-window-bounded / bf16
gather bank (round-5 VMEM levers) against the round-4 full-grid
baseline, on the real chip.

Canonical op point (bench.py): 0.5 m resolution, 100x100 m map
(200x200 cells), 30 m range, 720 beams.  The window must cover
2*(range/res + n + slack) = 2*(60 + 2 + 6) = 136 cells.

Table bytes per stream (win-row layout, (2n+1)*8 ch):
  full-grid f32 : 200*204*40*4  = 6.53 MB
  window  f32   : 136*140*40*4  = 3.05 MB
  window  bf16  : 136*140*40*2  = 1.52 MB

Protocol: CLAUDE.md — whole sequence inside one executable,
host-distinct inputs per rep, scalar digest readback per rep, median.

Usage: python examples/probe_window_fleet.py [T]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ndt_feature_graph_tpu.fusion import scan_driver  # noqa: E402
from ndt_feature_graph_tpu.parallel import scaling  # noqa: E402

from bench import canonical_params  # noqa: E402

FLEET_T = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def measure(params, B, reps=3):
    states, odom, pts, mask = scaling.build_fleet_inputs(
        params, B, t_steps=FLEET_T, num_beams=720
    )

    @jax.jit
    def run(states, odom, pts, mask):
        finals, trajs, scores = (
            scan_driver.run_sequence_batch.__wrapped__(
                params, states, odom, pts, mask
            )
        )
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves((finals, trajs, scores))
        )

    float(run(states, odom, pts, mask))  # compile + force
    times = []
    for k in range(reps):
        t0 = time.perf_counter()
        float(run(states, odom + (k + 1) * 1e-5, pts, mask))
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]
    return B * (FLEET_T - 1) / t, times


def main():
    base = canonical_params()
    import os as _os

    only = _os.environ.get("PROBE_VARIANTS", "").split(",")
    variants = {
        "full_f32": base,
        "win136_f32": base.replace(gather_window_cells=136),
        "win136_bf16": base.replace(
            gather_window_cells=136, gather_table_bf16=True
        ),
        "blk136_bf16": base.replace(
            gather_window_cells=136, gather_table_bf16=True,
            gather_block=True,
        ),
        "blk136_f32": base.replace(
            gather_window_cells=136, gather_block=True
        ),
    }
    if only != [""]:
        variants = {k: v for k, v in variants.items() if k in only}
    occ_every = int(_os.environ.get("PROBE_OCC_EVERY", "1"))
    if occ_every != 1:
        variants = {
            f"{k}_occ{occ_every}": v.replace(occ_every=occ_every)
            for k, v in variants.items()
        }
    for name, p in variants.items():
        for B in (8, 16, 32, 64):
            try:
                sps, times = measure(p, B)
                print(
                    f"{name:12s} B={B:3d}  {sps:8.1f} scans/s  "
                    f"({sps / B:6.1f}/stream)  times={['%.2f' % t for t in times]}",
                    flush=True,
                )
            except Exception as e:  # OOM etc.
                print(f"{name:12s} B={B:3d}  FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
