"""Tests for volume building (TestMain.cpp:43-92 parity) and end-to-end
preset rendering."""
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (PRESETS, VolumeConfig, build_volume,
                                    get_preset, render_preset)
from volumetricrenderer_tpu.config import NoiseChannelConfig
from volumetricrenderer_tpu.models.scene import (build_channel, cloud_volume,
                                                 smoke_volume,
                                                 two_volume_grid)


def test_build_channel_normalized_inverted():
    ch = np.asarray(build_channel("perlin", 16, 0.19, 3))
    assert ch.shape == (16, 16, 16)
    assert ch.min() >= 0.0 and ch.max() <= 1.0
    # min-max normalization makes both extremes present
    np.testing.assert_allclose(ch.min(), 0.0, atol=1e-6)
    np.testing.assert_allclose(ch.max(), 1.0, atol=1e-6)


def test_sharpen_pow4():
    a = np.asarray(build_channel("perlin", 8, 0.19, 3, sharpen_power=1))
    b = np.asarray(build_channel("perlin", 8, 0.19, 3, sharpen_power=4))
    np.testing.assert_allclose(b, a ** 4, rtol=1e-5, atol=1e-6)


def test_build_volume_reference_recipe():
    # Default recipe = the reference's 4 channels (TestMain.cpp:59-62)
    cfg = VolumeConfig(size=16)
    g = np.asarray(build_volume(cfg))
    assert g.shape == (16, 16, 16, 4)
    assert g.min() >= 0.0 and g.max() <= 1.0
    # channels must differ (the reference intended 4 distinct fields)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(g[..., i], g[..., j])


def test_quantize_uint8():
    cfg = VolumeConfig(size=8, quantize_uint8=True)
    g = np.asarray(build_volume(cfg))
    lattice = np.round(g * 255.0)
    np.testing.assert_allclose(g * 255.0, lattice, atol=1e-4)


def test_cloud_smoke_volumes():
    for maker in (cloud_volume, smoke_volume, two_volume_grid):
        v = np.asarray(maker(16))
        assert v.shape == (16, 16, 16)
        assert v.min() >= 0.0 and v.max() <= 1.0 + 1e-6
        assert v.max() > 0.5  # normalized to use the range


def test_render_preset_config1_end_to_end():
    p = get_preset("config1")
    # shrink for test speed
    import dataclasses
    p = dataclasses.replace(
        p,
        volume=dataclasses.replace(p.volume, size=16),
        camera=dataclasses.replace(p.camera, width=32, height=32),
        render=dataclasses.replace(p.render, max_steps=32),
    )
    img = np.asarray(render_preset(p))
    assert img.shape == (32, 32, 4)
    assert np.all(np.isfinite(img))
    assert img[..., :3].max() > 0.01  # something visible
    assert img[..., :3].min() >= 0.0


def test_all_presets_constructible():
    for name in PRESETS:
        p = get_preset(name)
        assert p.volume.size >= 64
