"""Image output — the swapchain/present analogue. The reference presents
frames to a window via the Vulkan swapchain (VulkanSwapchain.cpp:39-70); on
a headless TPU pod the equivalent is writing frames to disk. Pure-stdlib
PNG encoder (zlib deflate, filter 0) — no external image dependency.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["to_uint8", "write_png", "write_ppm"]


def to_uint8(img):
    """float image in [0,1] (H, W, {1,3,4}) -> uint8, with clamping (the
    GPU's implicit unorm conversion on present)."""
    arr = np.asarray(img, dtype=np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path, img):
    """Write an image to PNG. img: uint8 or float (H, W) / (H, W, C) with
    C in {1, 3, 4}."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(data)
    return path


def write_ppm(path, img):
    """Fast uncompressed PPM (P6) writer for high-frame-rate dumps."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[2] == 4:
        arr = arr[:, :, :3]
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(arr.tobytes())
    return path


class AsyncFrameWriter:
    """Pipelined frame presentation: PNG encodes/writes run on a small
    thread pool so the render loop never blocks on disk — the headless
    analogue of the reference's frames-in-flight present queue
    (MAX_FRAMES_IN_FLIGHT=2, VulkanRenderer.cpp:13: the GPU renders frame
    N+1 while frame N is presented). zlib/file IO release the GIL, so
    threads give real overlap. Use as a context manager; exit joins all
    pending writes and re-raises the first failure."""

    def __init__(self, workers: int = 2):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=workers,
                                        thread_name_prefix="frame-writer")
        self._pending = []

    def write(self, path, img):
        """img must be host data (np.asarray any device array first)."""
        arr = np.asarray(img)
        self._pending.append(self._pool.submit(write_png, path, arr))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        errs = [f.exception() for f in self._pending]
        self._pool.shutdown(wait=True)
        self._pending.clear()
        for e in errs:
            if e is not None:
                raise e
        return False
