"""Compile-stability of animated cameras (VERDICT round 1 item 4): an
orbit's frames must share jit executables instead of recompiling per frame
(the reference runs a live 60 fps loop with camera updates,
TestMain.cpp:173-256)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.cli import animation_plans
from volumetricrenderer_tpu.config import MediumConfig, RenderConfig
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import orbit_camera
from volumetricrenderer_tpu.ops.sweep import (plan_signature, plan_sweep,
                                              sweep_render)

CFG = RenderConfig(emission=True, quadrature="sliced")
MED = MediumConfig(combine="single", density=8.0)
N_FRAMES = 8


def _orbit_cams(n=N_FRAMES, w=64, h=48):
    return [orbit_camera(2 * math.pi * i / n, width=w, height=h)
            for i in range(n)]


def test_animation_plans_share_shapes():
    grid = cloud_volume(16, seed=7)
    cams = _orbit_cams()
    plans, n_sigs = animation_plans(cams, grid.shape, CFG)
    assert len({p.base_shape for p in plans}) == 1
    assert len({p.warp_band for p in plans}) == 1
    # a full orbit crosses dominant axes; each (axis, sign) pair is one
    # executable (x/y flips plus the occasional z-dominant diagonal frame)
    # — far fewer than one per frame
    assert n_sigs <= 6, n_sigs
    assert n_sigs == len({plan_signature(p) for p in plans})


def test_animation_one_compile_per_signature():
    grid = cloud_volume(16, seed=7)
    cams = _orbit_cams()
    plans, n_sigs = animation_plans(cams, grid.shape, CFG)

    @jax.jit
    def frame(g, plan):
        return sweep_render(g, plan, CFG, MED)

    for p in plans:
        frame(grid, p)
    assert frame._cache_size() == n_sigs, (frame._cache_size(), n_sigs)


def test_forced_dims_render_matches_natural():
    """Forcing larger base dims is exact, not approximate: same image as
    the frame's natural plan (up to base-resolution resampling jitter)."""
    grid = cloud_volume(16, seed=7)
    cam = _orbit_cams()[1]
    natural = plan_sweep(cam, grid.shape, CFG,
                         supersample=CFG.sweep_supersample)
    forced = plan_sweep(cam, grid.shape, CFG,
                        supersample=CFG.sweep_supersample,
                        force_base_dims=(natural.base_shape[0] + 128,
                                         natural.base_shape[1] + 256))
    a = np.asarray(sweep_render(grid, natural, CFG, MED))
    b = np.asarray(sweep_render(grid, forced, CFG, MED))
    err = np.abs(a - b)
    assert err.mean() < 2e-3, err.mean()
    assert err.max() < 5e-2, err.max()


def test_animate_cli_smoke(tmp_path):
    import json

    from volumetricrenderer_tpu.cli import main
    out = str(tmp_path / "frames")
    rc = main(["animate", "--preset", "config1", "--volume-size", "8",
               "--width", "32", "--height", "24", "--frames", "4",
               "--orbit", "--out-dir", out])
    assert rc == 0
    lines = [json.loads(l) for l in
             open(f"{out}/metrics.jsonl")]
    frames = [l for l in lines if "frame" in l]
    assert len(frames) == 4 and all("fps" in l for l in frames)
    compiles = [l for l in lines if "n_compiles" in l]
    assert compiles and compiles[0]["n_compiles"] <= 4  # 4 frames
