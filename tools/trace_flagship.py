"""Op-level device trace of the flagship fwd+bwd frame (TPU).

Captures a jax.profiler trace of a few flagship dispatches and prints
the per-op time aggregation from the device plane of the xplane proto —
the ground truth for where the 13 ms/frame actually goes (stage-level
A/Bs in tools/measure_r3.py can't see inside a fused XLA module).

Usage: python tools/trace_flagship.py [outdir]
Env: V/W/H/K as in tools/profile_parts.py; VOLT_TRACE_FWD_ONLY=1 traces
the forward-only frame instead.
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from volumetricrenderer_tpu.config import (CameraConfig, MediumConfig,
                                           RenderConfig)
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import plan_sweep, sweep_render

VOLUME = int(os.environ.get("V", 256))
W = int(os.environ.get("W", 1920))
H = int(os.environ.get("H", 1080))
K = int(os.environ.get("K", 8))
FWD_ONLY = bool(int(os.environ.get("VOLT_TRACE_FWD_ONLY", "0")))

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/volt_trace"


def main():
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=W, height=H))
    grid = jax.block_until_ready(
        jax.jit(cloud_volume, static_argnums=(0,))(VOLUME, 7))
    plan = plan_sweep(cam, grid.shape, cfg)
    jax.block_until_ready(plan.seglen)
    print(f"base {plan.base_shape} slices {plan.slice_z.shape[0]} "
          f"band {plan.warp_band}", file=sys.stderr)

    def frame_loss(g, t):
        img = sweep_render(g * (1.0 + 0.0 * t), plan, cfg, medium)
        return jnp.sum(img[..., :3] ** 2)

    @jax.jit
    def step_k(g, t0):
        def body(c, i):
            if FWD_ONLY:
                return c + frame_loss(g, t0 + i), None
            loss, gr = jax.value_and_grad(frame_loss)(g, t0 + i)
            return c + loss + gr.ravel()[0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    t0 = time.perf_counter()
    float(step_k(grid, jnp.float32(0.0)))
    print(f"compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    t0 = time.perf_counter()
    float(step_k(grid, jnp.float32(1.0)))
    print(f"warm dispatch {(time.perf_counter()-t0)*1e3:.0f} ms",
          file=sys.stderr)

    with jax.profiler.trace(outdir):
        float(step_k(grid, jnp.float32(2.0)))

    analyze(outdir)


def analyze(d):
    """Aggregate the device 'XLA Ops' line of the Chrome-format trace:
    total per op kind, split into the warp scans (the while ops) and
    everything else. (The xplane.pb needs TF profiler protos that this
    image's TF build doesn't ship; the trace.json.gz carries the same
    device line.)"""
    import collections
    import gzip
    import json
    import re
    paths = sorted(glob.glob(
        os.path.join(d, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz found under", d)
        return
    data = json.load(gzip.open(paths[-1]))
    evs = data["traceEvents"] if isinstance(data, dict) else data
    tids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    ops = [e for e in evs if e.get("ph") == "X"
           and tids.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    if not ops:
        print("no XLA Ops line in trace")
        return
    whiles = sorted([e for e in ops if e["name"].startswith("while")],
                    key=lambda e: -e["dur"])
    # largest while = the frames scan; the rest = warp fwd/bwd scans
    warp_wins = [(w["ts"], w["ts"] + w["dur"]) for w in whiles[1:]]
    for w in whiles[1:]:
        pass
    print(f"\nwhile durations ms (largest = frame scan): "
          f"{[round(w['dur']/1e3, 2) for w in whiles[:17]]}")

    def root(n):
        return re.sub(r"\.\d+$", "", n)

    for label, pred in (
            ("warp scans", lambda e: any(a <= e["ts"] < b
                                         for a, b in warp_wins)),
            ("outside warp", lambda e: not any(a <= e["ts"] < b
                                               for a, b in warp_wins))):
        agg = collections.Counter()
        cnt = collections.Counter()
        for e in ops:
            if e["name"].startswith("while"):
                continue
            if pred(e):
                agg[root(e["name"])] += e["dur"] / 1000.0
                cnt[root(e["name"])] += 1
        tot = sum(agg.values())
        print(f"\n--- {label}: flat {tot/K:.2f} ms/frame ---")
        for n, ms in agg.most_common(20):
            print(f"{ms/K:9.3f} ms/frame  x{cnt[n]:6d}  {n[:100]}")


if __name__ == "__main__":
    main()
