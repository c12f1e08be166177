"""Map-projection engine tests: roundtrips + defining differential
properties (independent of the implementation's formulas).

Each projection family is verified against the metric property that
DEFINES it (Snyder, USGS PP 1395):
  * eqdc  — meridian scale h == 1 everywhere; parallel scale k == 1 at
            the standard parallels,
  * lcc   — conformal: h == k everywhere; k == 1 at standard parallels,
  * aea   — equal-area: h * k == 1 everywhere,
  * tmerc — scale k_0 along the central meridian; y == k0*(M - M0) there,
  * merc  — k == 1 at lat_ts; x == a*m(lat_ts)*dlon,
plus forward∘inverse roundtrips. The south_america eqdc CRS is exercised
end-to-end through ComputeNetwork (reference behavior:
preprocessing.py:149-155, minus its pyproj axis-order swap — see
sbayes_tpu/data/proj.py docstring).
"""
import numpy as np
import pytest

from sbayes_tpu.data.proj import Projection, _M, _m, parse_proj4


pytestmark = pytest.mark.smoke

SA_CRS = ("+proj=eqdc +lat_0=-32 +lon_0=-60 +lat_1=-5 +lat_2=-42 "
          "+x_0=0 +y_0=0 +ellps=aust_SA +units=m +no_defs")

CASES = {
    "eqdc": SA_CRS,
    "lcc": "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +ellps=GRS80",
    "aea": "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=clrk66",
    "tmerc": "+proj=tmerc +lat_0=0 +lon_0=9 +k_0=0.9996 +x_0=500000 +ellps=WGS84",
    "utm": "+proj=utm +zone=19 +south +ellps=WGS84",
    "merc": "+proj=merc +lat_ts=20 +lon_0=10 +ellps=WGS84",
    "eqc": "+proj=eqc +lat_ts=30 +lon_0=5 +ellps=WGS84",
}
DOMAINS = {  # (lon_range, lat_range) where each test CRS is well-behaved
    "eqdc": ((-80, -40), (-50, 5)),
    "lcc": ((-120, -75), (25, 50)),
    "aea": ((-120, -75), (25, 50)),
    "tmerc": ((6, 12), (-60, 60)),
    "utm": ((-72, -66), (-50, -5)),
    "merc": ((-170, 170), (-70, 70)),
    "eqc": ((-170, 170), (-80, 80)),
}


def _grid(name, n=7):
    (lo0, lo1), (la0, la1) = DOMAINS[name]
    lons, lats = np.meshgrid(np.linspace(lo0, lo1, n), np.linspace(la0, la1, n))
    return lons.ravel(), lats.ravel()


def _scales(prj, lon, lat):
    """Numeric meridian/parallel scale factors h, k via finite differences."""
    p = prj.params
    d = 1e-6  # degrees
    x0, y0 = prj.forward(lon, lat)
    xp, yp = prj.forward(lon, lat + d)
    xl, yl = prj.forward(lon + d, lat)
    dphi = np.radians(d)
    dlam = np.radians(d)
    sin2 = np.sin(np.radians(lat)) ** 2
    R_m = p.a * (1 - p.e2) / (1 - p.e2 * sin2) ** 1.5      # meridian curvature
    N_cos = p.a / np.sqrt(1 - p.e2 * sin2) * np.cos(np.radians(lat))
    h = np.hypot(xp - x0, yp - y0) * p.to_meter / (R_m * dphi)
    k = np.hypot(xl - x0, yl - y0) * p.to_meter / (N_cos * dlam)
    return h, k


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip(name):
    prj = Projection(CASES[name])
    lons, lats = _grid(name)
    x, y = prj.forward(lons, lats)
    lons2, lats2 = prj.inverse(x, y)
    np.testing.assert_allclose(lons2, lons, atol=1e-8)
    np.testing.assert_allclose(lats2, lats, atol=1e-8)


def test_eqdc_meridian_scale_is_one():
    prj = Projection(CASES["eqdc"])
    lons, lats = _grid("eqdc")
    h, _ = _scales(prj, lons, lats)
    np.testing.assert_allclose(h, 1.0, rtol=1e-5)


def test_eqdc_standard_parallels_true_scale():
    prj = Projection(CASES["eqdc"])
    for lat in (-5.0, -42.0):
        _, k = _scales(prj, np.array([-70.0, -55.0]), np.array([lat, lat]))
        np.testing.assert_allclose(k, 1.0, rtol=1e-5)


def test_lcc_conformal_and_standard_parallels():
    prj = Projection(CASES["lcc"])
    lons, lats = _grid("lcc")
    h, k = _scales(prj, lons, lats)
    np.testing.assert_allclose(h, k, rtol=1e-4)
    for lat in (33.0, 45.0):
        _, k1 = _scales(prj, np.array([-100.0]), np.array([lat]))
        np.testing.assert_allclose(k1, 1.0, rtol=1e-5)


def test_aea_equal_area():
    prj = Projection(CASES["aea"])
    lons, lats = _grid("aea")
    h, k = _scales(prj, lons, lats)
    np.testing.assert_allclose(h * k, 1.0, rtol=1e-4)


def test_tmerc_central_meridian():
    prj = Projection(CASES["tmerc"])
    p = prj.params
    lats = np.linspace(-60, 60, 9)
    x, y = prj.forward(np.full_like(lats, 9.0), lats)
    np.testing.assert_allclose(x, 500000.0, atol=1e-6)
    expected_y = p.k_0 * (_M(p, np.radians(lats)) - _M(p, p.lat_0))
    np.testing.assert_allclose(y, expected_y, atol=1e-6)
    _, k = _scales(prj, np.array([9.0, 9.0]), np.array([-30.0, 40.0]))
    np.testing.assert_allclose(k, 0.9996, rtol=1e-6)


def test_merc_true_scale_at_lat_ts():
    prj = Projection(CASES["merc"])
    p = prj.params
    h, k = _scales(prj, np.array([0.0, 50.0]), np.array([20.0, 20.0]))
    np.testing.assert_allclose(k, 1.0, rtol=1e-6)
    np.testing.assert_allclose(h, 1.0, rtol=1e-4)
    x, _ = prj.forward(11.0, 0.0)
    np.testing.assert_allclose(x, p.a * _m(p, p.lat_ts) * np.radians(1.0), rtol=1e-9)


def test_parse_proj4_params():
    p = parse_proj4(SA_CRS)
    assert p.proj == "eqdc"
    assert p.a == 6378160.0  # aust_SA
    np.testing.assert_allclose(np.degrees(p.lat_0), -32.0)
    np.testing.assert_allclose(np.degrees(p.lat_1), -5.0)
    np.testing.assert_allclose(np.degrees(p.lat_2), -42.0)
    with pytest.raises(ValueError):
        Projection("+proj=robin +ellps=WGS84")  # unsupported family


def test_south_america_network_unprojects():
    """The real south_america dataset goes through the projected-CRS path:
    unprojected coordinates must land inside South America and distances
    must be geodesics of those coordinates (not planar eqdc distances)."""
    import csv
    from pathlib import Path

    from sbayes_tpu.data.geo import ComputeNetwork, vincenty_inverse

    feats = Path("/root/reference/experiments/south_america/data/features.csv")
    if not feats.exists():
        pytest.skip("reference dataset not available")
    ids, xs, ys = [], [], []
    with open(feats) as f:
        for row in csv.DictReader(f):
            ids.append(row["id"])
            xs.append(float(row["x"]))
            ys.append(float(row["y"]))
    locations = np.column_stack([xs, ys])

    net = ComputeNetwork({"id": ids, "locations": locations}, crs=SA_CRS)
    assert net.lat_lon is not None, "projected CRS fell back to planar"
    lons, lats = net.lat_lon[:, 0], net.lat_lon[:, 1]
    assert np.all((-85 < lons) & (lons < -30)), lons[[np.argmin(lons), np.argmax(lons)]]
    assert np.all((-60 < lats) & (lats < 15)), lats[[np.argmin(lats), np.argmax(lats)]]

    d = net.dist_mat
    assert np.allclose(d, d.T) and np.all(d >= 0)
    expected = vincenty_inverse(lats[0], lons[0], lats[1], lons[1])
    np.testing.assert_allclose(d[0, 1], expected, rtol=1e-9)
    # eqdc is nearly distance-true near its parallels: the planar distance
    # should approximate (but not equal) the geodesic to within a few %.
    planar = np.linalg.norm(locations[0] - locations[1])
    assert abs(planar - d[0, 1]) / d[0, 1] < 0.05
