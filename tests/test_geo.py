"""Geometry function tests (F1-F4) — golden invariants for the pure-NumPy
NZTM transverse Mercator, bearing, and plane construction, plus the
GeoJSON-scan and plane-pipeline queries end-to-end on Spark."""

from __future__ import annotations

import math

import numpy as np
import pytest

from nshm2022db_spark.functions.geo import (
    dedupe_consecutive,
    dip_direction,
    initial_bearing,
    nztm_to_wgs,
    planes_from_trace,
    wgs_to_nztm,
)

# NZTM natural origin: lat 0, lon 173 → exactly (false northing, false
# easting) by definition of the projection.
def test_nztm_natural_origin():
    n, e = wgs_to_nztm(np.array([0.0]), np.array([173.0]))
    assert abs(n[0] - 10_000_000.0) < 1e-6
    assert abs(e[0] - 1_600_000.0) < 1e-6


def test_nztm_central_meridian_easting_exact():
    lats = np.linspace(-48.0, -34.0, 15)
    _, e = wgs_to_nztm(lats, np.full_like(lats, 173.0))
    assert np.allclose(e, 1_600_000.0, atol=1e-6)


def test_nztm_roundtrip_over_domain():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-48.0, -34.0, 500)
    lon = rng.uniform(166.0, 179.0, 500)
    n, e = wgs_to_nztm(lat, lon)
    lat2, lon2 = nztm_to_wgs(n, e)
    assert np.allclose(lat, lat2, atol=1e-9)
    assert np.allclose(lon, lon2, atol=1e-9)


def test_nztm_central_meridian_scale():
    # Projected length of a short meridian arc on the central meridian is
    # k0 × true length. True meridian distance computed independently from
    # the ellipsoid radius of curvature M(φ).
    a, f = 6_378_137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    phi = math.radians(-41.0)
    M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    dphi = 1000.0 / M  # ~1 km of latitude
    n, _ = wgs_to_nztm(
        np.array([-41.0, -41.0 + math.degrees(dphi)]), np.array([173.0, 173.0])
    )
    assert abs((n[1] - n[0]) - 0.9996 * 1000.0) < 1e-3


def test_initial_bearing_cardinal():
    assert abs(initial_bearing(173.0, -41.0, 173.0, -40.0) - 0.0) < 1e-9  # north
    assert abs(initial_bearing(173.0, -41.0, 174.0, -41.0) - 90.0) < 0.5  # ~east
    assert abs(initial_bearing(173.0, -40.0, 173.0, -41.0) - 180.0) < 1e-9


def test_dip_direction_strike_plus_90():
    # Due-north strike → dip direction due east.
    dd = dip_direction(np.array([173.0, -41.0]), np.array([173.0, -40.0]))
    assert abs(dd - 90.0) < 1e-9


def test_dedupe_consecutive():
    pts = np.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0], [3.0, 4.0], [1.0, 2.0]])
    out = dedupe_consecutive(pts)
    assert out.tolist() == [[1.0, 2.0], [3.0, 4.0], [1.0, 2.0]]


def test_planes_from_trace_geometry():
    trace = np.array([[172.0, -42.0], [172.2, -41.9], [172.4, -41.8]])
    top, bottom, dip, dip_dir = 2.0, 12.0, 45.0, 135.0
    planes = planes_from_trace(trace, top, bottom, dip, dip_dir)
    assert len(planes) == 2  # one per consecutive pair

    p = planes[0]
    # Top edge is the trace segment at top depth (lat, lon, depth rows).
    assert np.allclose(p[0], [-42.0, 172.0, top])
    assert np.allclose(p[1], [-41.9, 172.2, top])
    assert p[2][2] == bottom and p[3][2] == bottom

    # Down-dip horizontal offset length in NZTM recovers
    # (bottom-top)/tan(dip) km to < 1 mm, along azimuth 135°.
    n_top, e_top = wgs_to_nztm(p[0][0:1], p[0][1:2])
    n_bot, e_bot = wgs_to_nztm(p[3][0:1], p[3][1:2])
    dn, de = n_bot[0] - n_top[0], e_bot[0] - e_top[0]
    expected = (bottom - top) / math.tan(math.radians(dip)) * 1000.0
    assert abs(math.hypot(dn, de) - expected) < 1e-3
    assert abs(math.degrees(math.atan2(de, dn)) % 360.0 - dip_dir) < 1e-9


def test_planes_vertical_dip_no_offset():
    trace = np.array([[172.0, -42.0], [172.2, -41.9]])
    (p,) = planes_from_trace(trace, 0.0, 10.0, 90.0, 270.0)
    # Vertical plane: bottom corners directly beneath top corners.
    assert np.allclose(p[3][:2], p[0][:2], atol=1e-12)
    assert np.allclose(p[2][:2], p[1][:2], atol=1e-12)


def test_planes_infer_dip_dir_when_none():
    trace = np.array([[173.0, -41.0], [173.0, -40.0]])  # due-north strike
    (p,) = planes_from_trace(trace, 0.0, 10.0, 45.0, None)
    # Inferred dip dir = 90° → bottom corners displaced due east.
    n_t, e_t = wgs_to_nztm(p[0][0:1], p[0][1:2])
    n_b, e_b = wgs_to_nztm(p[3][0:1], p[3][1:2])
    assert abs(n_b[0] - n_t[0]) < 1.0  # no northward component to ~1 m
    assert e_b[0] - e_t[0] > 9000.0


@pytest.mark.usefixtures("spark")
class TestGeometryQueries:
    def test_geojson_scan(self, spark, sf_dir):
        from nshm2022db_spark.queries.geometry import geojson_scan

        rows = geojson_scan(spark, sf_dir).collect()
        assert len(rows) == 25
        by_id = {r.fault_nshm_id: r for r in rows}
        assert by_id[0].dip_dir is None  # inference path marker
        assert by_id[1].dip_dir == 53.0
        assert by_id[3].n_points == 4

    def test_geometry_planes(self, spark, sf_dir):
        from nshm2022db_spark.queries.geometry import geometry_planes

        rows = geometry_planes(spark, sf_dir).collect()
        # 25 faults × (4 trace points → 3 segments)
        assert len(rows) == 75
        r = rows[0]
        assert r.top_depth == 0.0 and r.bottom_depth == 10.0
        # Top corners echo the synthesized trace for fault 0, segment 0.
        assert abs(r.top_left_lon - 166.0) < 1e-9
        assert abs(r.top_left_lat - -47.0) < 1e-9
        assert abs(r.top_right_lon - 166.05) < 1e-9
