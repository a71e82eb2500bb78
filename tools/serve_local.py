"""Device-paced serve-loop throughput (round 5, VERDICT r4 missing 4).

The live serve loop measures 12.5-16.6 fps THROUGH the tunnel
(INTERACTIVE_r4.json: the ~42 ms RGB download paces it). The reference's
defining loop runs 60 fps vsync-capped locally
(TestMain.cpp:173-256, VulkanSwapchain.cpp:194-208). This tool measures
what a LOCAL (non-tunneled) chip would pace the loop at: the serve
renderer's own jitted frame function (render + device uint8-RGB present
conversion) over a walk of K distinct interaction states, all K frames
in ONE dispatch chain — HTTP, PNG and the tunnel download excluded, the
per-frame camera/plan variation included (every frame uses a different
plan of the serve family, scanned on device).

Usage: PYTHONPATH=/root/repo:/root/.axon_site PYTHONUNBUFFERED=1 \
       timeout 2400 python tools/serve_local.py
Env:   VOLT_SL_SIZE (512 image), VOLT_SL_K (32 states/dispatch),
       VOLT_SL_ITERS (4), VOLT_SL_OUT (INTERACTIVE_LOCAL_r5.json).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("VOLT_SL_SIZE", 512))
K = int(os.environ.get("VOLT_SL_K", 32))
ITERS = int(os.environ.get("VOLT_SL_ITERS", 4))
OUT = os.environ.get("VOLT_SL_OUT", "INTERACTIVE_LOCAL_r5.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from volumetricrenderer_tpu.config import PRESETS
    from volumetricrenderer_tpu.serve import InteractiveRenderer, _PAGE_BG

    preset = PRESETS["config2"]
    preset = dataclasses.replace(
        preset, camera=dataclasses.replace(preset.camera, width=SIZE,
                                           height=SIZE))
    res = {"what": "device-paced serve frame loop: the serve renderer's "
                   "jitted frame fn (render + uint8-RGB present) over a "
                   "walk of K distinct orbit states, K frames per "
                   "dispatch chain — the tunnel/HTTP-free loop pace a "
                   "local chip would deliver (TestMain.cpp:173-256 runs "
                   "60 fps vsync-capped)",
           "preset": preset.name, "width": SIZE, "height": SIZE,
           "states_per_dispatch": K, "iters": ITERS,
           "device": str(jax.devices()[0])}

    nul = jax.jit(lambda x: x + 1.0)
    float(nul(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(nul(jnp.float32(i)))
    null_s = (time.perf_counter() - t0) / 10
    res["null_dispatch_ms"] = round(null_s * 1e3, 2)

    t0 = time.perf_counter()
    r = InteractiveRenderer(preset)
    res["init_s"] = round(time.perf_counter() - t0, 1)
    log(f"renderer init {res['init_s']}s; dims {r.force_dims} "
        f"band {r.band}")

    # Walk the interaction lattice exactly like a user would: orbit +
    # elevate + dolly key steps; keep only states sharing ONE plan
    # signature so the K plans stack into a scanned pytree.
    from volumetricrenderer_tpu.ops.sweep import plan_signature
    keys = "ddddqqddwwddssddeeddddqqdddddddd"
    plans, sigs = [], {}
    t0 = time.perf_counter()
    while len(plans) < K:
        for k in keys:
            r.key(k)
            p = r._plan_cached(r.azim, r.elev, r.dist)
            sigs.setdefault(plan_signature(p), []).append(p)
        best = max(sigs.values(), key=len)
        if len(best) >= K:
            plans = best[:K]
            break
    res["plan_build_s"] = round(time.perf_counter() - t0, 1)
    res["n_signatures_walked"] = len(sigs)
    log(f"built {len(plans)} same-signature plans "
        f"({len(sigs)} signatures seen) in {res['plan_build_s']}s")

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
    grid, cfg, medium, light = r.grid, r.cfg, r.medium, r.light
    render_image = r._render_image
    use_shadow = (light is not None and light.shadow_steps > 0
                  and cfg.emission)

    @jax.jit
    def k_frames(g, plans_stacked, t0v):
        def body(c, xs):
            plan, i = xs
            lv = None
            if use_shadow:
                from volumetricrenderer_tpu.ops.lighting import \
                    light_transmittance_volume
                lv = light_transmittance_volume(g, light, cfg, medium)
            img = render_image(g * (1.0 + 0.0 * (t0v + i)), None, cfg,
                               medium, light, plan=plan, light_volume=lv,
                               backend="sweep")
            a = img[..., 3:4]
            rgb = img[..., :3] * a + _PAGE_BG * (1.0 - a)
            u8 = jnp.clip(rgb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
            return c + jnp.sum(u8[::128, ::128].astype(jnp.int32)), None
        out, _ = jax.lax.scan(body, jnp.int32(0),
                              (stacked, jnp.arange(K, dtype=jnp.float32)))
        return out

    t0 = time.perf_counter()
    int(k_frames(grid, stacked, jnp.float32(0.0)))
    res["compile_s"] = round(time.perf_counter() - t0, 1)
    log(f"compile {res['compile_s']}s")
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        int(k_frames(grid, stacked, jnp.float32(i + 1.0)))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    per = (med - null_s) / K
    res["ms_per_frame_device"] = round(per * 1e3, 2)
    res["fps_device_paced"] = round(1.0 / per, 1)
    res["dispatch_ms_all"] = [round(t * 1e3) for t in times]
    res["note"] = ("per-frame plan/camera varies (stacked plan pytree "
                   "scanned on device); excludes HTTP/PNG/tunnel "
                   "download, includes the uint8-RGB present conversion")
    out = json.dumps(res, indent=1)
    print(out, flush=True)
    with open(OUT, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
