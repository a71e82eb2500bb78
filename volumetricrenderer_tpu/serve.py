"""Live interactive rendering — the reference's defining behavior
(TestMain.cpp:173-256: a 60 fps loop where WASD/QE keys and the mouse
mutate the camera/MVP and the media scroll advances every frame) as a
TPU-native service.

A native window/swapchain does not exist on a headless TPU host, so the
present side is HTTP: `volumetricrenderer_tpu serve` runs a small stdlib
HTTP server whose index page captures key events (WASD/QE/RF — the
reference's bindings, Core/Keyboard.h analogue) and streams freshly
rendered frames; the render side is the SAME cached-executable plan
machinery the animate loop uses (cli.animation_plans): camera state maps
to a sweep plan whose signature is pre-unified over the reachable orbit
family, so every interaction re-renders through ONE compiled executable
instead of recompiling (the Vulkan analogue would be rebuilding the
pipeline per frame).

Controls (index page):
  A/D   orbit azimuth     W/S   dolly in/out
  Q/E   orbit elevation   R/F   media time scrub
  space play/pause the media clock

State lives server-side (one renderer, many viewers see the same scene,
like the reference's single window); rendering is serialized by a lock
(one TPU, one stream).
"""
from __future__ import annotations

import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

__all__ = ["InteractiveRenderer", "serve", "INDEX_HTML"]

# Orbit state limits: elevation away from the poles keeps a sweep axis
# well-defined; distance keeps the box in front of the camera.
_EL_LIM = 1.25
_DIST_MIN, _DIST_MAX = 1.6, 6.0

# Azimuth moves on an EXACT periodic lattice: N_AZ steps per full orbit,
# so a/d presses cycle through N_AZ distinct cameras and a full orbit
# revisits cached plans instead of minting new keys forever (the old
# 0.12 rad step never divided 2*pi, so azim accumulated unboundedly and
# every orbit churned the 512-entry plan cache — ADVICE r4).
N_AZ = 52
_AZ_STEP = 2 * math.pi / N_AZ  # ~0.1208 rad, ~= the old 0.12 feel
_EL_STEP = 0.08
_DOLLY = 1.08
_TIME_STEP = 0.25
# Pointer-drag pixels per orbit lattice step (drag quantizes onto the
# SAME azimuth/elevation lattice the keys use, so mouse-reached cameras
# hit the plan cache / compiled executables exactly like key-reached
# ones).
_DRAG_PX_PER_STEP = 24.0

# The viewer page's background (#111): frames are composited over it on
# DEVICE and shipped as RGB — same pixels the browser showed for the
# RGBA PNG, 25% fewer tunnel bytes.
_PAGE_BG = 0x11 / 255.0

# Render loop idles (stops dispatching frames) when no viewer has asked
# for one within this window.
_IDLE_S = 5.0

# Every Nth plan-cache MISS builds one non-trusted plan (device band
# readback) to audit that the trusted family band still covers the
# camera family — see InteractiveRenderer._plan_cached.
_BAND_AUDIT_EVERY = 16


class InteractiveRenderer:
    """Camera/clock state + cached-executable rendering for the live loop.

    Plans are built per frame (host-side geometry, cheap) but share jit
    executables: base dims, warp band and row window are unified up front
    by probing the reachable (azimuth, elevation, distance) family —
    exactly what cli.animation_plans does for a fixed orbit path,
    extended to the interactive state box."""

    def __init__(self, preset, probe: int = 6):
        import jax

        from .config import Preset
        from .models.scene import build_volume
        from .render import prepare_baked_scene, render_image
        from .utils.metrics import get_logger

        self.log = get_logger()
        self.preset: Preset = preset
        self.cfg = preset.render
        self.light = preset.light
        medium = preset.medium
        if preset.scene:
            from .models import scene as scene_mod
            volumes = getattr(scene_mod, preset.scene)(preset.volume.size)
            grid, medium, _ = prepare_baked_scene(volumes, self.cfg, medium)
        else:
            # jitted build: the eager noise graph is hundreds of small
            # dispatches (633 s once, through a slow tunnel — bench.py's
            # lesson)
            grid = jax.jit(lambda: build_volume(preset.volume))()
        self.grid = jax.block_until_ready(grid)
        self.medium = medium
        self.n_ch = grid.shape[-1] if grid.ndim == 4 else 1

        # --- interaction state (the reference's Camera + Clock) ---
        # World up is +Z (TestMain.cpp:225): orbit = spherical coords
        # around the preset's look-at center.
        center = np.asarray(preset.camera.center, np.float64)
        eye = np.asarray(preset.camera.eye, np.float64) - center
        self.dist = float(np.linalg.norm(eye))
        self.dist = min(max(self.dist, _DIST_MIN), _DIST_MAX)
        self._az0 = math.atan2(eye[1], eye[0])  # lattice origin
        self._az_idx = 0                        # integer steps, mod N_AZ
        self.elev = math.atan2(eye[2], math.hypot(eye[0], eye[1]))
        self.elev = min(max(self.elev, -_EL_LIM), _EL_LIM)
        self.media_t = 0.0
        self.playing = True
        self._last_tick = time.perf_counter()
        self.lock = threading.Lock()
        self.frames_rendered = 0
        from .ops.camera import look_at_camera
        self._look_at = look_at_camera
        self._render_image = render_image

        # --- executable-stable plan family over the reachable states ---
        import itertools

        from .ops.sweep import plan_base_dims, plan_sweep
        self._plan_sweep = plan_sweep
        cam_cfg = preset.camera
        azs = [2 * math.pi * i / probe for i in range(probe)]
        els = [-_EL_LIM, -0.6, 0.0, 0.6, _EL_LIM]
        dists = [_DIST_MIN, self.dist, _DIST_MAX]
        fh = fw = 128
        for az, el, d in itertools.product(azs, els, dists):
            cam = self._camera_at(az, el, d)
            try:
                hb, wb, _, _ = plan_base_dims(
                    cam, grid.shape[:3], self.cfg,
                    supersample=self.cfg.sweep_supersample)
            except ValueError:
                continue  # a pole-adjacent probe without a sweep axis
            fh, fw = max(fh, hb), max(fw, wb)
        self.force_dims = (fh, fw)
        # Unify band/row-window by building the probe plans at the forced
        # dims (plan arrays are cheap; executables are what matter).
        band = (1, 1, 1, 1)
        rw = cw = sw = None
        for az, el, d in itertools.product(azs, els, dists):
            try:
                p = self._plan_at(az, el, d, band=None, rw=None)
            except ValueError:
                continue
            band = (max(band[0], p.warp_band[0]),
                    max(band[1], p.warp_band[1]),
                    0 if 0 in (band[2], p.pix_band[0])
                    else max(band[2], p.pix_band[0]),
                    0 if 0 in (band[3], p.pix_band[1])
                    else max(band[3], p.pix_band[1]))
            rw = p.row_window if rw is None else (
                0 if 0 in (rw, p.row_window) else max(rw, p.row_window))
            cw = p.col_window if cw is None else (
                0 if 0 in (cw, p.col_window) else max(cw, p.col_window))
            sw = p.scatter_window if sw is None else (
                0 if 0 in (sw, p.scatter_window)
                else max(sw, p.scatter_window))
        # The probe grid cannot hit every reachable state; pad the band
        # 25% and quantize to 16 so in-between cameras still fall under
        # the unified (>= is exact) band instead of minting a new
        # executable per slightly-different rect.
        cc = preset.camera

        def pad16(x, lim):
            return min(-(-int(x * 1.25) // 16) * 16, lim)

        self.band = (pad16(band[0], cc.height), pad16(band[1], cc.width),
                     pad16(band[2], self.force_dims[0]) if band[2] else 0,
                     pad16(band[3], self.force_dims[1]) if band[3] else 0)
        self.row_window = rw or 0
        self.col_window = cw or 0
        self.scatter_window = sw or 0
        self.log.info("serve: base dims %s, band %s, row_window %d",
                      self.force_dims, self.band, self.row_window)

        self._jit_frame = None
        self._signatures = set()
        self._jax = jax
        # Plan cache on the interaction lattice: key steps mutate the
        # orbit state by FIXED increments, so (azim, elev, dist) live on
        # a discrete lattice and revisited states reuse their plan.
        # (A neighbor-prefetch thread was tried and REMOVED: the tunnel
        # serializes all device work, so prefetch plan builds stole the
        # same wall-clock the frames needed — measured slower.)
        self._plan_cache = {}
        self._plan_cache_cap = 512
        self._plan_misses = 0
        self._drag_px_x = 0.0
        self._drag_px_y = 0.0

    @property
    def azim(self):
        """Azimuth on the exact periodic lattice (wrapped to one orbit)."""
        return self._az0 + (self._az_idx % N_AZ) * _AZ_STEP

    def _plan_cached(self, az, el, d):
        key = (round(az, 6), round(el, 6), round(d, 6))
        plan = self._plan_cache.get(key)
        if plan is None:
            self._plan_misses += 1
            if self._plan_misses % _BAND_AUDIT_EVERY == 1:
                # Band audit (ADVICE r4): trust_band skips the device
                # band readback, so an interactive state the probe
                # lattice never saw could need a larger warp band than
                # the 25%-padded family one — which would silently clamp
                # warp tile rects (wrong edge pixels). Periodically
                # build one NON-trusted plan (one ~30 ms readback) and
                # grow the family band if it was undersized.
                probe = self._plan_at(az, el, d, band=None,
                                      rw=self.row_window)
                need = probe.warp_band + probe.pix_band
                if (need[0] > self.band[0] or need[1] > self.band[1]
                        or (self.band[2] and need[2] > self.band[2])
                        or (self.band[3] and need[3] > self.band[3])):
                    cc = self.preset.camera

                    def g16(n, cur, lim):
                        return min(-(-max(n, cur) // 16) * 16, lim)

                    grown = (g16(need[0], self.band[0], cc.height),
                             g16(need[1], self.band[1], cc.width),
                             g16(need[2], self.band[2],
                                 self.force_dims[0]) if self.band[2]
                             else 0,
                             g16(need[3], self.band[3],
                                 self.force_dims[1]) if self.band[3]
                             else 0)
                    self.log.warning(
                        "serve: family warp band %s undersized for state "
                        "(az=%.3f el=%.3f d=%.3f, needs %s); growing to "
                        "%s (new executable)", self.band, az, el, d,
                        need, grown)
                    self.band = grown
                    self._plan_cache.clear()  # stale-band plans
            plan = self._plan_at(az, el, d, self.band, self.row_window)
            if len(self._plan_cache) >= self._plan_cache_cap:
                self._plan_cache.pop(next(iter(self._plan_cache)))
            self._plan_cache[key] = plan
        return plan

    # -- camera/plan plumbing ------------------------------------------
    def _camera_at(self, az, el, d):
        cc = self.preset.camera
        center = np.asarray(cc.center, np.float32)
        eye = center + d * np.asarray(
            [math.cos(el) * math.cos(az), math.cos(el) * math.sin(az),
             math.sin(el)], np.float32)
        return self._look_at(eye, center, np.asarray(cc.up, np.float32),
                             cc.fov_y_degrees, cc.width, cc.height)

    def _plan_at(self, az, el, d, band, rw):
        cam = self._camera_at(az, el, d)
        plan = self._plan_sweep(
            cam, self.grid.shape[:3], self.cfg,
            supersample=self.cfg.sweep_supersample,
            force_base_dims=self.force_dims,
            min_warp_band=band,
            # the probed+padded family band is THE band: skip the only
            # synchronous device round trip in the per-frame plan build
            trust_band=band is not None)
        if rw is not None:
            import dataclasses

            def unify(mine, theirs):
                return 0 if 0 in (mine, theirs) else max(mine, theirs)

            plan = dataclasses.replace(
                plan,
                row_window=unify(rw, plan.row_window),
                col_window=unify(self.col_window, plan.col_window),
                scatter_window=unify(self.scatter_window,
                                     plan.scatter_window))
        return plan

    # -- input (the reference's Keyboard handler) ----------------------
    def key(self, k: str):
        with self.lock:
            if k == "a":
                self._az_idx = (self._az_idx - 1) % N_AZ
            elif k == "d":
                self._az_idx = (self._az_idx + 1) % N_AZ
            elif k == "q":
                self.elev = max(self.elev - _EL_STEP, -_EL_LIM)
            elif k == "e":
                self.elev = min(self.elev + _EL_STEP, _EL_LIM)
            elif k == "w":
                self.dist = max(self.dist / _DOLLY, _DIST_MIN)
            elif k == "s":
                self.dist = min(self.dist * _DOLLY, _DIST_MAX)
            elif k == "r":
                self.media_t += _TIME_STEP
            elif k == "f":
                self.media_t = max(self.media_t - _TIME_STEP, 0.0)
            elif k == " ":
                self.playing = not self.playing
            return self.state()

    # -- mouse (the reference's Mouse class: relative-mode deltas +
    # scroll, Core/Mouse.h:5-44 — constructed but unused by TestMain;
    # here it drives the same orbit/dolly state as the keys) ----------
    def drag(self, dx: float, dy: float):
        """Pointer-drag orbit: horizontal pixels -> azimuth lattice
        steps, vertical -> elevation steps. Deltas accumulate
        server-side and convert to WHOLE lattice steps (residuals kept),
        so every reachable camera stays on the key lattice and plans/
        executables cache exactly as for key input."""
        with self.lock:
            self._drag_px_x += float(dx)
            self._drag_px_y += float(dy)
            sx = int(self._drag_px_x / _DRAG_PX_PER_STEP)
            sy = int(self._drag_px_y / _DRAG_PX_PER_STEP)
            self._drag_px_x -= sx * _DRAG_PX_PER_STEP
            self._drag_px_y -= sy * _DRAG_PX_PER_STEP
            if sx:
                self._az_idx = (self._az_idx + sx) % N_AZ
            if sy:
                el = self.elev - sy * _EL_STEP  # drag up = look from above
                self.elev = min(max(el, -_EL_LIM), _EL_LIM)
            return self.state()

    def wheel(self, dy: float):
        """Scroll dolly (Mouse.h scroll callback): one notch = one W/S
        key step on the distance lattice."""
        with self.lock:
            if dy < 0:
                self.dist = max(self.dist / _DOLLY, _DIST_MIN)
            elif dy > 0:
                self.dist = min(self.dist * _DOLLY, _DIST_MAX)
            return self.state()

    def state(self):
        return {"azim": round(self.azim, 3), "elev": round(self.elev, 3),
                "dist": round(self.dist, 3), "t": round(self.media_t, 3),
                "playing": self.playing,
                "frames": self.frames_rendered}

    # -- the frame loop body (TestMain.cpp:226-244 analogue) -----------
    def dispatch_frame(self):
        """Enqueue one frame render for the CURRENT interaction state and
        return the (not yet ready) device array — the async half of the
        frames-in-flight pipeline (the reference runs
        MAX_FRAMES_IN_FLIGHT=2, VulkanRenderer.h:60: frame N+1 records
        while N is still on the GPU; here frame N+1 computes on chip
        while N's pixels download through the tunnel)."""
        import jax
        import jax.numpy as jnp

        with self.lock:
            now = time.perf_counter()
            if self.playing:
                self.media_t += now - self._last_tick
            self._last_tick = now
            az, el, d, t = self.azim, self.elev, self.dist, self.media_t
        plan = self._plan_cached(az, el, d)
        scroll = None
        if self.medium.combine == "reference":
            from .ops.integrate import reference_media_scroll
            scroll = reference_media_scroll(t, n_channels=self.n_ch)
        if self._jit_frame is None:
            cfg, medium, light = self.cfg, self.medium, self.light
            use_shadow = (light is not None and light.shadow_steps > 0
                          and cfg.emission)
            render_image = self._render_image

            @jax.jit
            def frame_fn(g, plan, scroll):
                lv = None
                if use_shadow:
                    from .ops.lighting import light_transmittance_volume
                    lv = light_transmittance_volume(g, light, cfg, medium,
                                                    scroll=scroll)
                img = render_image(g, None, cfg, medium, light,
                                   scroll=scroll, plan=plan,
                                   light_volume=lv, backend="sweep")
                # uint8 RGB ON DEVICE: the image download dominates the
                # live frame through the tunnel (measured 126 of 140 ms
                # for f32 RGBA at 512^2, and still 56 of ~95 ms for
                # uint8 RGBA); 8-bit unorm is the present format anyway
                # (the reference's swapchain is RGBA8). Alpha is
                # composited over the viewer page's background here —
                # exactly what the browser did with the RGBA PNG — which
                # drops another 25% of the downloaded bytes.
                a = img[..., 3:4]
                rgb = img[..., :3] * a + _PAGE_BG * (1.0 - a)
                return jnp.clip(rgb * 255.0 + 0.5, 0.0,
                                255.0).astype(jnp.uint8)

            self._jit_frame = frame_fn
        img = self._jit_frame(self.grid, plan, scroll)
        from .ops.sweep import plan_signature
        sig = plan_signature(plan)
        if sig not in self._signatures:
            self._signatures.add(sig)
            self.log.info("serve: compiled executable %d (sig %s)",
                          len(self._signatures), sig)
        self.frames_rendered += 1
        return img

    def render_frame(self) -> np.ndarray:
        """Dispatch + fetch one frame synchronously (tests, one-offs)."""
        return np.asarray(self.dispatch_frame())


INDEX_HTML = """<!doctype html>
<html><head><title>volumetricrenderer_tpu — live</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;
     display:flex;flex-direction:column;align-items:center}
img{image-rendering:auto;margin-top:8px;max-width:96vw}
#hud{padding:6px}
</style></head><body>
<div id="hud">A/D orbit &nbsp; Q/E elevate &nbsp; W/S dolly &nbsp;
R/F time &nbsp; space pause &nbsp; drag orbit &nbsp; wheel dolly —
<span id="st"></span></div>
<img id="v" src="/frame.png">
<script>
const img = document.getElementById('v'), st = document.getElementById('st');
let frames = 0, t0 = performance.now();
img.onload = () => {            // continuous streaming: re-request on load
  frames++;
  if (frames % 10 === 0) {
    const fps = 10000 / (performance.now() - t0); t0 = performance.now();
    st.textContent = fps.toFixed(1) + ' fps';
  }
  img.src = '/frame.png?' + Date.now();
};
img.onerror = () => setTimeout(() => img.src = '/frame.png?' + Date.now(), 500);
window.addEventListener('keydown', e => {
  const k = e.key === ' ' ? 'space' : e.key.toLowerCase();
  if ('adqwesrf'.includes(k) || k === 'space')
    fetch('/key?k=' + k).catch(()=>{});
});
// mouse: drag orbits, wheel dollies (the reference's Mouse class,
// Core/Mouse.h — relative-mode deltas + scroll). Deltas batch per
// animation frame; the server quantizes them onto the key lattice.
let drag = null, accX = 0, accY = 0, sendQueued = false;
function flushDrag() {
  sendQueued = false;
  if (accX || accY) {
    fetch('/drag?dx=' + accX + '&dy=' + accY).catch(()=>{});
    accX = 0; accY = 0;
  }
}
img.addEventListener('pointerdown', e => {
  drag = {x: e.clientX, y: e.clientY};
  img.setPointerCapture(e.pointerId); e.preventDefault();
});
img.addEventListener('pointermove', e => {
  if (!drag) return;
  accX += e.clientX - drag.x; accY += e.clientY - drag.y;
  drag = {x: e.clientX, y: e.clientY};
  if (!sendQueued) { sendQueued = true; requestAnimationFrame(flushDrag); }
});
img.addEventListener('pointerup', e => { drag = null; flushDrag(); });
img.addEventListener('wheel', e => {
  e.preventDefault();
  fetch('/wheel?dy=' + Math.sign(e.deltaY)).catch(()=>{});
}, {passive: false});
img.style.touchAction = 'none';
</script></body></html>"""


class FrameLoop:
    """Free-running render loop + latest-frame buffer — the reference's
    continuous while-loop renderer (TestMain.cpp:173-256 renders EVERY
    iteration, input or not) with HTTP as the swapchain.

    One thread renders the current interaction state back-to-back,
    saturating the tunnel's serial dispatch+download path; `/frame.png`
    blocks until a frame NEWER than the one it last served exists, so a
    client's PNG-encode/transfer/decode time overlaps the next frame's
    render instead of adding to it (measured: the blocking render-per-
    request loop was ~95 ms serial per frame — 29 dispatch + 56 download
    + 10 png — of which only the render belongs on the critical path).
    The loop idles after _IDLE_S without a frame request."""

    def __init__(self, renderer: InteractiveRenderer):
        self.renderer = renderer
        self.cond = threading.Condition()
        self.seq = 0
        self.img: Optional[np.ndarray] = None
        self._last_want = time.perf_counter()
        self._stop = False
        self._err: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        # Two frames in flight (the reference's MAX_FRAMES_IN_FLIGHT=2):
        # dispatch frame N+1 (async — XLA queues it on the device), THEN
        # fetch frame N's pixels; N's download through the tunnel
        # overlaps N+1's on-chip compute. Measured at 512^2: serial
        # dispatch-wait (29 ms) + download was the loop floor; with the
        # pipeline only max(download, compute) paces it.
        pending = None
        while True:
            with self.cond:
                if self._stop:
                    return
                idle = time.perf_counter() - self._last_want > _IDLE_S
            if idle and pending is None:
                time.sleep(0.05)
                continue
            try:
                cur = None if idle else self.renderer.dispatch_frame()
                if pending is not None:
                    img = np.asarray(pending)  # downloads frame N
                    with self.cond:
                        self.seq += 1
                        self.img = img
                        self._err = None  # a fresh frame clears the error
                        self.cond.notify_all()
                pending = cur
            except BaseException as e:  # surface in the handler, keep loop
                pending = None
                with self.cond:
                    self._err = e
                    self.cond.notify_all()
                time.sleep(0.5)

    def next_frame(self, after_seq: int, timeout: float = 600.0):
        """Block until a frame with seq > after_seq; return (seq, img)."""
        with self.cond:
            self._last_want = time.perf_counter()
            self.cond.notify_all()
            ok = self.cond.wait_for(
                lambda: self.seq > after_seq or self._err is not None
                or self._stop, timeout)
            if self._err is not None:
                # STICKY until a new frame succeeds: every concurrent
                # waiter fails fast instead of only the first one (the
                # rest would otherwise block out the full timeout while
                # the loop keeps failing — ADVICE r4).
                raise self._err
            if not ok or self._stop:
                raise TimeoutError("no frame rendered in time")
            return self.seq, self.img

    def stop(self):
        with self.cond:
            self._stop = True
            self.cond.notify_all()
        self.thread.join(timeout=30)


def _make_handler(loop: FrameLoop):
    from .utils.image import encode_png

    renderer = loop.renderer

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: per-request connections intermittently eat
        # multi-second SYN-retransmit stalls (measured even on loopback);
        # every response carries Content-Length so 1.1 is safe.
        protocol_version = "HTTP/1.1"
        # No Nagle: small keep-alive responses otherwise wait out the
        # ~40 ms delayed-ACK timer (measured on every /key request).
        disable_nagle_algorithm = True

        def log_message(self, *a):  # quiet
            pass

        def setup(self):
            super().setup()
            # per-connection frame cursor: each keep-alive viewer gets
            # every frame at most once (never the same frame twice, so
            # reported fps is honest render throughput)
            self._served_seq = 0

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path.startswith("/frame.png"):
                    self._served_seq, img = loop.next_frame(
                        self._served_seq)
                    # low compression: encode latency is frame latency
                    png = encode_png(img, level=1)
                    self._send(200, "image/png", png)
                elif self.path.startswith("/key"):
                    from urllib.parse import parse_qs, urlparse
                    q = parse_qs(urlparse(self.path).query)
                    k = q.get("k", [""])[0]
                    state = renderer.key(" " if k == "space" else k)
                    self._send(200, "application/json",
                               json.dumps(state).encode())
                elif self.path.startswith("/drag"):
                    from urllib.parse import parse_qs, urlparse
                    q = parse_qs(urlparse(self.path).query)
                    dx = float(q.get("dx", ["0"])[0])
                    dy = float(q.get("dy", ["0"])[0])
                    self._send(200, "application/json",
                               json.dumps(renderer.drag(dx, dy)).encode())
                elif self.path.startswith("/wheel"):
                    from urllib.parse import parse_qs, urlparse
                    q = parse_qs(urlparse(self.path).query)
                    dy = float(q.get("dy", ["0"])[0])
                    self._send(200, "application/json",
                               json.dumps(renderer.wheel(dy)).encode())
                elif self.path.startswith("/state"):
                    self._send(200, "application/json",
                               json.dumps(renderer.state()).encode())
                else:
                    self._send(200, "text/html", INDEX_HTML.encode())
            except BrokenPipeError:
                pass

    return Handler


def serve(preset, port: int = 8788, frames: Optional[int] = None,
          host: str = "127.0.0.1"):
    """Run the live loop. frames=N: self-drive mode — issue synthetic key
    events and fetch N frames through the real HTTP stack, report fps,
    then exit (the headless CI/evidence mode; INTERACTIVE_r4.json).

    host: bind address. Default loopback — the server exposes camera
    control and rendered frames with no auth, so exposing it to a
    network is a deliberate choice (--host 0.0.0.0)."""
    renderer = InteractiveRenderer(preset)
    loop = FrameLoop(renderer)
    httpd = ThreadingHTTPServer((host, port), _make_handler(loop))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    renderer.log.info("serving live renderer on http://localhost:%d", port)
    if frames is None:
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            loop.stop()
            httpd.shutdown()
        return None

    # --- self-drive evidence mode ---
    # ONE persistent HTTP/1.1 connection (http.client): fresh
    # per-request sockets intermittently hit multi-second SYN-retransmit
    # stalls even on loopback — measured, and it capped the loop at
    # ~2 fps while direct rendering ran ~10.
    import http.client

    keys = "adqwesrf"
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

    def get(path):
        conn.request("GET", path)
        return conn.getresponse().read()

    sizes = []
    # Warmup: visit every key state once so executable compiles and
    # first-visit plan builds land here (reported separately), then
    # measure the steady-state loop — what a user interacting with an
    # already-running viewer experiences.
    t_first = time.perf_counter()
    get("/frame.png")
    for k in keys:
        get(f"/key?k={k}")
        get("/frame.png")
    # mouse path (drag orbit + wheel dolly) through the same HTTP stack
    st_before = json.loads(get("/state"))
    drag_state = json.loads(get("/drag?dx=48&dy=-24"))
    wheel_state = json.loads(get("/wheel?dy=1"))
    mouse_ok = (drag_state["azim"] != st_before["azim"]
                and drag_state["elev"] != st_before["elev"]
                and wheel_state["dist"] != drag_state["dist"])
    get("/frame.png")
    compile_s = time.perf_counter() - t_first
    t0 = time.perf_counter()
    for i in range(frames):
        get(f"/key?k={keys[i % len(keys)]}")
        sizes.append(len(get("/frame.png")))
    dt = time.perf_counter() - t0
    state = json.loads(get("/state"))
    conn.close()
    loop.stop()
    httpd.shutdown()
    result = {
        "what": "live interactive loop: HTTP key events mutate orbit "
                "camera + media clock; every frame re-renders through "
                "cached executables (TestMain.cpp:173-256 analogue)",
        "preset": renderer.preset.name,
        "width": renderer.preset.camera.width,
        "height": renderer.preset.camera.height,
        "frames": frames,
        "fps": round(frames / dt, 2),
        "ms_per_frame": round(dt / frames * 1e3, 1),
        "warmup_s": round(compile_s, 1),
        "n_executables": len(renderer._signatures),
        "mouse_drag_wheel_ok": mouse_ok,
        "final_state": state,
        "png_bytes_mean": int(np.mean(sizes)),
    }
    renderer.log.info("self-drive: %.1f fps over %d frames, "
                      "%d executable(s)", result["fps"], frames,
                      result["n_executables"])
    return result
