"""Offline map-tile math: coordinates, URLs, stitching from canned tiles."""

import numpy as np
import pytest

from teochat_tpu.serve.maptiles import (
    BASEMAP_SOURCES,
    TEMPORAL_BASEMAPS,
    center_crop_square,
    deg2num,
    get_temporal_map_image_paths,
    get_temporal_map_images,
    num2deg,
    plan_view,
    render_map_view,
    stitch_tiles,
    tile_url,
)


def test_deg2num_known_points():
    # (0, 0) is the exact center of the map at every zoom
    for z in (0, 1, 5):
        x, y = deg2num(0.0, 0.0, z)
        assert x == pytest.approx(2 ** z / 2)
        assert y == pytest.approx(2 ** z / 2)
    # top-left corner of the mercator square
    x, y = deg2num(85.0511287798066, -180.0, 3)
    assert x == pytest.approx(0.0)
    assert y == pytest.approx(0.0, abs=1e-9)


def test_deg2num_roundtrip():
    lat, lon = 37.7749, -122.4194  # San Francisco
    x, y = deg2num(lat, lon, 12)
    lat2, lon2 = num2deg(x, y, 12)
    assert lat2 == pytest.approx(lat, abs=1e-9)
    assert lon2 == pytest.approx(lon, abs=1e-9)


def test_tile_url_templates_match_reference():
    assert tile_url("Google Maps", 3, 5, 7) == (
        "https://mt0.google.com/vt/lyrs=s&hl=en&x=3&y=5&z=7"
    )
    # USGS swaps to {z}/{y}/{x} order
    assert tile_url("United States Geological Survey", 3, 5, 7).endswith(
        "/tile/7/5/3"
    )
    assert tile_url("PlanetScope Q2 2024", 1, 2, 3, planet_api_key="KEY") == (
        "https://tiles.planet.com/basemaps/v1/planet-tiles/"
        "global_quarterly_2024q2_mosaic/gmap/3/1/2.png?api_key=KEY"
    )


def test_planet_requires_api_key():
    with pytest.raises(ValueError, match="Planet API key"):
        tile_url("PlanetScope Q3 2023", 0, 0, 0)


def _coord_tile(x, y, tile_px=256):
    """Canned tile encoding its own (x, y) and per-pixel position."""
    t = np.zeros((tile_px, tile_px, 3), np.uint8)
    t[..., 0] = x % 256
    t[..., 1] = y % 256
    t[..., 2] = (np.arange(tile_px)[:, None] + np.arange(tile_px)[None, :]) % 256
    return t


def test_plan_and_stitch_exact_pixels():
    lat, lon, zoom, size = 10.0, 20.0, 6, 512
    tiles, origin = plan_view(lat, lon, zoom, size)
    assert len(set(tiles)) >= 4  # a 512px view spans at least 2x2 tiles
    canned = {t: _coord_tile(*t) for t in tiles}
    img = stitch_tiles(canned, origin, size, zoom)
    assert img.shape == (size, size, 3)
    # every pixel must come from the right tile: check the four corners
    px0, py0 = origin
    for vy in (0, size - 1):
        for vx in (0, size - 1):
            gx, gy = px0 + vx, py0 + vy
            tx, ty = gx // 256, gy // 256
            assert img[vy, vx, 0] == tx % 256
            assert img[vy, vx, 1] == ty % 256
            assert img[vy, vx, 2] == (gy % 256 + gx % 256) % 256


def test_render_map_view_fetches_urls():
    seen = []

    def fetcher(url):
        seen.append(url)
        return np.full((256, 256, 3), 7, np.uint8)

    img = render_map_view(0.0, 0.0, 4, "Google Maps", fetcher=fetcher)
    assert img.shape == (512, 512, 3) and (img == 7).all()
    assert all(u.startswith("https://mt0.google.com/") for u in seen)
    assert len(seen) == len(set(seen))  # each tile fetched once


def test_center_crop_square():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = center_crop_square(img)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out, img[1:5])
    assert center_crop_square(np.zeros((4, 6, 3), np.uint8)).shape == (4, 4, 3)


def test_temporal_sequence_order_and_paths(tmp_path):
    calls = []

    def fetcher(url):
        calls.append(url)
        return np.zeros((256, 256, 3), np.uint8)

    imgs = get_temporal_map_images(
        5.0, 5.0, 5, fetcher=fetcher, planet_api_key="K"
    )
    assert len(imgs) == 4
    # quarter order matches the reference (Q3 2023 first)
    order = [q for q in ("2023q3", "2024q2", "2024q1", "2023q4")]
    mosaics = []
    for u in calls:
        tag = u.split("global_quarterly_")[1].split("_")[0]
        if not mosaics or mosaics[-1] != tag:
            mosaics.append(tag)
    assert mosaics == order

    first, others = get_temporal_map_image_paths(
        5.0, 5.0, 5, fetcher=fetcher, planet_api_key="K", tmpdir=str(tmp_path)
    )
    assert first.endswith(".png") and len(others) == 3
    from PIL import Image

    assert Image.open(first).size == (512, 512)


def test_default_fetcher_explains_egress():
    with pytest.raises(RuntimeError, match="egress"):
        render_map_view(0.0, 0.0, 3, "Google Maps")


def test_basemap_registry_complete():
    assert set(TEMPORAL_BASEMAPS) <= set(BASEMAP_SOURCES)
    assert len(BASEMAP_SOURCES) == 6  # google + 4 planet quarters + usgs
