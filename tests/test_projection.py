"""Polar stereographic projection (reference src/util/projection.cc role:
recompute lat/lon from the grid mapping without PROJ)."""

import numpy as np
import pytest

from pism_tpu.util import projection as prj


def test_forward_inverse_roundtrip_north():
    ps = prj.PolarStereographic(central_meridian=-45.0,
                                standard_parallel=70.0)   # EPSG:3413
    lat = np.array([60.0, 70.0, 75.5, 89.0, 90.0])
    lon = np.array([-60.0, -45.0, 10.0, 179.0, -45.0])
    x, y = ps.forward(lat, lon)
    lat2, lon2 = ps.inverse(x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # longitude undefined at the exact pole
    np.testing.assert_allclose(lon2[:-1], lon[:-1], atol=1e-9)
    # central meridian maps to x = 0, y < 0 (pole at the origin, grid
    # south along +y... i.e. ice sheet at negative y for EPSG:3413)
    x0, y0 = ps.forward(70.0, -45.0)
    assert abs(x0) < 1e-6 and y0 < -2.0e6


def test_true_scale_at_standard_parallel():
    """k = 1 at lat_ts: a small meridian step maps to its ellipsoidal arc
    length (independent check of the Snyder constants)."""
    ps = prj.PolarStereographic(central_meridian=-45.0,
                                standard_parallel=70.0)
    dphi = 1e-3   # degrees
    _, y1 = ps.forward(70.0, -45.0)
    _, y2 = ps.forward(70.0 + dphi, -45.0)
    a, e = prj.A_WGS84, prj.E_WGS84
    phi = np.deg2rad(70.0)
    M_prime = a * (1 - e * e) / (1 - (e * np.sin(phi)) ** 2) ** 1.5
    arc = M_prime * np.deg2rad(dphi)
    assert abs(y2 - y1) == pytest.approx(arc, rel=1e-5)


def test_south_hemisphere():
    ps = prj.PolarStereographic(central_meridian=0.0,
                                standard_parallel=-71.0)  # EPSG:3031
    lat = np.array([-90.0, -85.0, -71.0, -65.0])
    lon = np.array([0.0, 45.0, -120.0, 170.0])
    x, y = ps.forward(lat, lon)
    lat2, lon2 = ps.inverse(x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2[1:], lon[1:], atol=1e-9)
    # EPSG:3031 convention: lon 0 is +y (grid north), lon 90E is +x
    x9, y9 = ps.forward(-71.0, 90.0)
    assert x9 > 2e6 and abs(y9) < 1e-6
    x0, y0 = ps.forward(-71.0, 0.0)
    assert abs(x0) < 1e-6 and y0 > 2e6


def test_parse_proj_string_and_cf():
    ps = prj.from_proj_string(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
        "+datum=WGS84 +units=m")
    assert ps.standard_parallel == 70.0 and ps.central_meridian == -45.0
    ps2 = prj.from_cf_mapping({
        "grid_mapping_name": "polar_stereographic",
        "latitude_of_projection_origin": -90.0,
        "standard_parallel": 71.0,
        "straight_vertical_longitude_from_pole": 0.0})
    assert ps2.standard_parallel == -71.0
    # round 5: UTM/transverse Mercator is a supported non-polar CRS
    tm = prj.from_proj_string("+proj=utm +zone=22")
    assert tm.central_meridian == -51.0
    with pytest.raises(ValueError):
        prj.from_proj_string("+proj=lcc +lat_1=50")


def test_latitude_fallback_from_file(tmp_path):
    """The CLI's latitude source of last resort: compute lat from the
    input file's projection metadata when no lat variable exists."""
    import jax.numpy as jnp

    from pism_tpu import Grid
    from pism_tpu.io.bootstrap import latitude_from_projection
    from pism_tpu.io.nc4 import File

    grid = Grid(Mx=9, My=9, Lx=700e3, Ly=700e3, y0=-2.2e6)
    p = str(tmp_path / "noproj.nc")
    with File(p, "w") as f:
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
    assert latitude_from_projection(p, grid) is None

    p2 = str(tmp_path / "proj.nc")
    with File(p2, "w") as f:
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.set_global_attr("proj",
                          "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45")
    lat = latitude_from_projection(p2, grid)
    assert lat is not None
    # Greenland-ish block: latitudes in a plausible band, increasing
    # toward the pole (decreasing |y|)
    assert 55.0 < lat.min() < lat.max() < 85.0
    assert lat[-1, 4] > lat[0, 4]  # y0 < 0: larger y (row -1) is closer to pole


def test_transverse_mercator_round_trip():
    """UTM forward/inverse round trip + a known fixed point: the central
    meridian maps to x = false easting with k0-scaled northing."""
    import numpy as np

    from pism_tpu.util import projection as prj

    tm = prj.from_proj_string("+proj=utm +zone=22")   # lon_0 = -51 (Greenland S)
    lat = np.array([60.0, 64.0, 70.0])
    lon = np.array([-52.0, -50.0, -48.0])
    x, y = tm.forward(lat, lon)
    lat2, lon2 = tm.inverse(x, y)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    x0, y0 = tm.forward(45.0, -51.0)
    assert abs(x0 - 500000.0) < 1e-6
    # CF mapping round trip
    tm2 = prj.from_cf_mapping(tm.cf_mapping())
    x3, y3 = tm2.forward(lat, lon)
    np.testing.assert_allclose(x3, x, atol=1e-9)


def test_lonlat_bounds():
    """Cell-corner lon/lat bounds: corners of adjacent cells coincide and
    the cell center lies inside its corner quadrilateral (lat monotone)."""
    import numpy as np

    from pism_tpu import Grid
    from pism_tpu.util import projection as prj

    ps = prj.PolarStereographic(central_meridian=-45.0,
                                standard_parallel=70.0)
    grid = Grid(Mx=8, My=6, Lx=200e3, Ly=150e3, y0=-2000e3)
    lon_b, lat_b = prj.lonlat_bounds_for_grid(grid, ps)
    assert lon_b.shape == (6, 8, 4) and lat_b.shape == (6, 8, 4)
    # SE corner of cell (j, i) == SW corner of cell (j, i+1)
    np.testing.assert_allclose(lat_b[:, :-1, 1], lat_b[:, 1:, 0], atol=1e-9)
    np.testing.assert_allclose(lon_b[:, :-1, 1], lon_b[:, 1:, 0], atol=1e-9)
    # NW corner of cell (j, i) == SW corner of cell (j+1, i)
    np.testing.assert_allclose(lat_b[:-1, :, 3], lat_b[1:, :, 0], atol=1e-9)
    lon_c, lat_c = prj.lonlat_for_grid(grid, ps)
    assert (lat_c >= lat_b.min(axis=-1) - 1e-9).all()
    assert (lat_c <= lat_b.max(axis=-1) + 1e-9).all()
