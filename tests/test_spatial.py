"""Spatial kernel tests: geometry ground truths, CRS round trips."""

from __future__ import annotations

import math

import numpy as np
import pytest

from n2khab_mhq_data_spark.spatial.crs import (
    lambert72_to_wgs84,
    lambert72_to_wgs84_full,
    wgs84_to_bd72,
    wgs84_to_lambert72,
    wgs84_to_lambert72_full,
)
from n2khab_mhq_data_spark.spatial.geometry import (
    circle_left_area,
    circle_strip_area,
    points_in_polygon,
)


def test_points_in_polygon_concave():
    # L-shaped polygon: unit tests beyond convex grid cells
    poly = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
    x = np.array([1.0, 3.0, 3.0, 5.0, 1.0])
    y = np.array([1.0, 1.0, 3.0, 1.0, 3.0])
    assert points_in_polygon(x, y, poly).tolist() == [
        True, True, False, False, True,
    ]


def test_circle_areas():
    r = 9.0
    full = math.pi * r * r
    assert circle_left_area(np.array([r]), r)[0] == pytest.approx(full)
    assert circle_left_area(np.array([-r]), r)[0] == pytest.approx(0.0)
    assert circle_left_area(np.array([0.0]), r)[0] == pytest.approx(full / 2)
    # strip symmetric around 0 plus complement = full circle
    a = circle_strip_area(np.array([-3.0]), np.array([3.0]), r)[0]
    b = circle_strip_area(np.array([-9.0]), np.array([-3.0]), r)[0]
    c = circle_strip_area(np.array([3.0]), np.array([9.0]), r)[0]
    assert a + b + c == pytest.approx(full)
    assert b == pytest.approx(c)


def test_lcc_round_trip():
    lon = np.array([3.5, 4.367486, 5.5])
    lat = np.array([50.2, 50.8, 51.3])
    x, y = wgs84_to_lambert72(lon, lat)
    lon2, lat2 = lambert72_to_wgs84(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # central meridian maps to false easting
    x0, _ = wgs84_to_lambert72(np.array([4 + 22 / 60 + 2.952 / 3600]),
                               np.array([50.5]))
    assert x0[0] == pytest.approx(150000.013, abs=1e-6)


def test_datum_shift_magnitude():
    # BD72 vs WGS84 differs by ~100 m over Belgium (sanity band, not a
    # control-point assertion — see crs.py docstring)
    lon, lat = np.array([4.35]), np.array([50.85])
    xf, yf = wgs84_to_lambert72_full(lon, lat)
    xp, yp = wgs84_to_lambert72(lon, lat)
    d = math.hypot(float(xf[0] - xp[0]), float(yf[0] - yp[0]))
    assert 30 < d < 300


def test_full_datum_round_trip():
    lon = np.array([3.5, 4.35, 5.5])
    lat = np.array([50.2, 50.85, 51.3])
    x, y = wgs84_to_lambert72_full(lon, lat)
    lon2, lat2 = lambert72_to_wgs84_full(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
