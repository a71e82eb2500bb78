"""FIT_r3 artifact: BASELINE config-3 inverse render AT SPEC on the chip —
256^3 voxel grid fitted to a 1024x1024 target rendered from the two-volume
cloud+smoke scene, differentiating through the production MXU sweep
(quadrature="sliced") end to end.

Writes FIT_r3.json: loss curve, per-step time, setup/compile times.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fit_config3.py
Env: VOLT_F_SIZE (256), VOLT_F_IMG (1024), VOLT_F_STEPS (40), VOLT_F_OUT.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.fit import fit_grid
from volumetricrenderer_tpu.models.scene import (bake_scene, cloud_volume,
                                                 config3_scene)
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.render import render_image

SIZE = int(os.environ.get("VOLT_F_SIZE", 256))
IMG = int(os.environ.get("VOLT_F_IMG", 1024))
STEPS = int(os.environ.get("VOLT_F_STEPS", 40))
OUT = os.environ.get("VOLT_F_OUT", "FIT_r3.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t_all = time.perf_counter()
    cfg = RenderConfig(emission=True, quadrature="sliced")
    med = MediumConfig(combine="single", density=8.0)
    light = LightConfig()
    cam = make_camera(CameraConfig(width=IMG, height=IMG))

    # Config-3 scene: cloud + smoke two-volume scene baked once (the
    # target of the inverse render), at the fitted grid's resolution.
    t0 = time.perf_counter()

    @jax.jit
    def build_target_grid():
        return bake_scene(config3_scene(SIZE), SIZE, cfg)

    true_grid = jax.block_until_ready(build_target_grid())
    from volumetricrenderer_tpu.ops.sweep import plan_sweep
    plan = plan_sweep(cam, true_grid.shape, cfg)  # host-side, outside jit
    target = jax.block_until_ready(
        jax.jit(lambda g: render_image(g, cam, cfg, med, light,
                                       plan=plan)[..., :3])(true_grid))
    setup_s = time.perf_counter() - t0
    log(f"target built+rendered in {setup_s:.0f}s")

    t0 = time.perf_counter()
    res = fit_grid(target, cam, cfg, med, light, grid_size=SIZE,
                   steps=STEPS, learning_rate=5e-2)
    fit_s = time.perf_counter() - t0
    losses = res.losses
    out = {
        "config": "config3 at spec",
        "volume": SIZE, "image": IMG, "steps": STEPS,
        "quadrature": "sliced (MXU sweep, fused kernels)",
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_drop_x": round(losses[0] / max(losses[-1], 1e-12), 1),
        "losses_every_5": [round(l, 8) for l in losses[::5]],
        "skipped_steps": res.skipped_steps,
        "fit_s": round(fit_s, 1),
        "ms_per_step_incl_dispatch": round(fit_s / STEPS * 1e3, 1),
        "setup_s": round(setup_s, 1),
        "total_s": round(time.perf_counter() - t_all, 1),
        "device": str(jax.devices()[0]),
    }
    s = json.dumps(out, indent=1)
    print(s, flush=True)
    open(OUT, "w").write(s + "\n")


if __name__ == "__main__":
    main()
