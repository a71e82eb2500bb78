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
    from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(
        os.path.join(d, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane.pb found under", d)
        return
    sp = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        sp.ParseFromString(f.read())
    for plane in sp.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        md = plane.event_metadata
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                name = md[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                a = agg.setdefault(name, [0.0, 0])
                a[0] += dur
                a[1] += 1
        if not agg:
            continue
        tot = sum(v[0] for v in agg.values())
        print(f"\n=== plane {plane.name}: {len(agg)} op kinds, "
              f"sum {tot:.1f} ms (lines may overlap) ===")
        for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
            print(f"{ms/K:9.3f} ms/frame  x{n:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
