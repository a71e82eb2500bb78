"""ANIM_r3 artifact: BASELINE config-4 at spec on the chip — 256^3 cloud
with the secondary light-march (shadow) sweep, 1080p, animated orbit
camera, all frames sharing ONE jit executable (animation_plans).

Writes ANIM_r3.json: fps (wall and dispatch-overhead-corrected), Mrays/s,
executable count. The per-frame dispatch pattern mirrors the reference's
interactive loop (TestMain.cpp:173-256): one render per vsync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/anim_config4.py
Env: VOLT_A_FRAMES (16), VOLT_A_OUT (ANIM_r3.json).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.cli import animation_plans
from volumetricrenderer_tpu.config import get_preset
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import orbit_camera
from volumetricrenderer_tpu.ops.lighting import light_transmittance_volume
from volumetricrenderer_tpu.render import render_image

FRAMES = int(os.environ.get("VOLT_A_FRAMES", 16))
OUT = os.environ.get("VOLT_A_OUT", "ANIM_r3.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t_all = time.perf_counter()
    preset = get_preset("config4")
    cfg, medium, light = preset.render, preset.medium, preset.light
    W, H = preset.camera.width, preset.camera.height

    t0 = time.perf_counter()
    grid = jax.block_until_ready(
        jax.jit(cloud_volume, static_argnums=(0,))(preset.volume.size, 7))
    cams = [orbit_camera(2 * math.pi * i / FRAMES,
                         fov_y_degrees=preset.camera.fov_y_degrees,
                         width=W, height=H) for i in range(FRAMES)]
    plans, n_sigs = animation_plans(cams, grid.shape, cfg)
    setup_s = time.perf_counter() - t0
    log(f"setup {setup_s:.0f}s; {FRAMES} frames share {n_sigs} "
        f"executable(s)")

    @jax.jit
    def frame(g, plan):
        lv = light_transmittance_volume(g, light, cfg, medium)
        return render_image(g, None, cfg, medium, light, plan=plan,
                            light_volume=lv, backend="sweep")

    # Warm ONE frame per distinct executable signature (an orbit crosses
    # several dominant-axis/sign sectors; each is its own compile) so the
    # timed loop measures steady-state interactive rate, not compiles.
    from volumetricrenderer_tpu.ops.sweep import plan_signature
    t0 = time.perf_counter()
    seen = set()
    for p in plans:
        sig = plan_signature(p)
        if sig not in seen:
            seen.add(sig)
            jax.block_until_ready(frame(grid, p))
    compile_s = time.perf_counter() - t0
    log(f"compile ({len(seen)} signatures): {compile_s:.0f}s")

    # null dispatch floor
    nul = jax.jit(lambda x: x + 1.0)
    float(nul(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(nul(jnp.float32(i)))
    null_s = (time.perf_counter() - t0) / 8

    t0 = time.perf_counter()
    for i in range(FRAMES):
        img = jax.block_until_ready(frame(grid, plans[i]))
    wall = time.perf_counter() - t0
    per_frame = wall / FRAMES
    corrected = max(per_frame - null_s, 1e-9)
    out = {
        "config": "config4 at spec",
        "volume": preset.volume.size, "width": W, "height": H,
        "shadow": "light-propagation sweep per frame "
                  f"(shadow_steps={light.shadow_steps} analogue)",
        "frames": FRAMES, "executables": n_sigs,
        "fps_wall": round(FRAMES / wall, 2),
        "ms_per_frame_wall": round(per_frame * 1e3, 1),
        "dispatch_overhead_ms": round(null_s * 1e3, 1),
        "fps_corrected": round(1.0 / corrected, 2),
        "mrays_per_s_corrected": round(W * H / corrected / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "setup_s": round(setup_s, 1),
        "total_s": round(time.perf_counter() - t_all, 1),
        "device": str(jax.devices()[0]),
    }
    s = json.dumps(out, indent=1)
    print(s, flush=True)
    open(OUT, "w").write(s + "\n")


if __name__ == "__main__":
    main()
