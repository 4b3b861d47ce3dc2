"""Grid projections: polar stereographic lat/lon computation.

Rebuild of PISM's projection support (``src/util/projection.cc``): the
reference uses PROJ to (re)compute the mandatory ``lat``/``lon`` fields
from the input file's CF grid mapping or ``proj`` attribute
(``grid.recompute_longitude_and_latitude``). PROJ is not available in
this environment, so the ellipsoidal polar stereographic projection —
the mapping of essentially every ice-sheet dataset (EPSG:3413 Greenland,
EPSG:3031 Antarctica) — is implemented directly from Snyder (1987,
"Map Projections — A Working Manual", eqs. 21-33..21-41 and 26-16..26-18).

Supported inputs: a PROJ.4-style string (``+proj=stere +lat_0=90
+lat_ts=70 +lon_0=-45 ...``) or a CF ``polar_stereographic`` grid-mapping
attribute dict.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: WGS84
A_WGS84 = 6378137.0
E_WGS84 = 0.0818191908426215


def _t_snyder(phi, e):
    """Snyder's t(phi) = tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin
    phi))^(e/2), eq. 15-9."""
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (e / 2.0)


def _m_snyder(phi, e):
    """m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi), eq. 14-15."""
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


@dataclass(frozen=True)
class PolarStereographic:
    """Ellipsoidal polar stereographic with a standard parallel.

    ``standard_parallel`` and the hemisphere sign follow the CF/EPSG
    conventions: positive for the north grids (EPSG:3413 has 70),
    negative for the south (EPSG:3031 has -71).
    """

    central_meridian: float = -45.0     # lon_0 [degrees]
    standard_parallel: float = 70.0     # lat_ts [degrees]
    false_easting: float = 0.0
    false_northing: float = 0.0
    a: float = A_WGS84
    e: float = E_WGS84

    @property
    def _south(self) -> bool:
        return self.standard_parallel < 0.0

    def _consts(self):
        s = -1.0 if self._south else 1.0
        phi_ts = np.deg2rad(abs(self.standard_parallel))
        # rho(phi) = a m(phi_ts) t(phi)/t(phi_ts)  (Snyder 21-34)
        scale = self.a * _m_snyder(phi_ts, self.e) / _t_snyder(phi_ts, self.e)
        return s, scale

    def forward(self, lat, lon):
        """(lat, lon) degrees -> (x, y) meters."""
        lat = np.asarray(lat, float)
        lon = np.asarray(lon, float)
        s, scale = self._consts()
        t = _t_snyder(np.deg2rad(s * lat), self.e)
        rho = scale * t
        dlam = np.deg2rad(s * (lon - self.central_meridian))
        x = s * rho * np.sin(dlam) + self.false_easting
        y = -s * rho * np.cos(dlam) + self.false_northing
        return x, y

    def inverse(self, x, y):
        """(x, y) meters -> (lat, lon) degrees."""
        x = np.asarray(x, float) - self.false_easting
        y = np.asarray(y, float) - self.false_northing
        s, scale = self._consts()
        xs, ys = s * x, s * y
        rho = np.hypot(xs, ys)
        t = rho / scale
        # iterate phi = pi/2 - 2 atan(t ((1 - e sin phi)/(1 + e sin
        # phi))^(e/2))  (Snyder 7-9); converges in a few rounds
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(6):
            es = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (self.e / 2.0))
        lam = np.deg2rad(self.central_meridian) + np.arctan2(xs, -ys)
        lat = s * np.rad2deg(phi)
        lon = s * (np.rad2deg(lam) - self.central_meridian) \
            + self.central_meridian
        lon = (lon + 180.0) % 360.0 - 180.0
        # the exact pole has undefined longitude; pin it to the central
        # meridian for a deterministic field
        lat = np.where(rho == 0.0, s * 90.0, lat)
        return lat, lon


def from_proj_string(proj: str) -> PolarStereographic:
    """Parse a PROJ.4-style ``+proj=stere`` string (the reference stores
    one in the ``proj`` global attribute of its output files)."""
    kv = {}
    for tok in str(proj).split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
    if kv.get("proj") not in ("stere", "sterea"):
        raise ValueError(f"unsupported projection {kv.get('proj')!r} "
                         "(only polar stereographic is implemented)")
    lat_0 = float(kv.get("lat_0", 90.0))
    lat_ts = float(kv.get("lat_ts", lat_0))
    if abs(lat_0) != 90.0:
        raise ValueError("only the polar aspect (lat_0 = +-90) is supported")
    return PolarStereographic(
        central_meridian=float(kv.get("lon_0", 0.0)),
        standard_parallel=lat_ts if lat_0 > 0 else -abs(lat_ts),
        false_easting=float(kv.get("x_0", 0.0)),
        false_northing=float(kv.get("y_0", 0.0)))


def from_cf_mapping(attrs) -> PolarStereographic:
    """Build from CF ``polar_stereographic`` grid-mapping attributes."""
    def get(name, default=None):
        v = attrs.get(name, default)
        if isinstance(v, bytes):
            v = v.decode()
        if isinstance(v, (list, tuple, np.ndarray)):
            v = np.asarray(v).ravel()[0]
        return v

    name = get("grid_mapping_name", "polar_stereographic")
    if name != "polar_stereographic":
        raise ValueError(f"unsupported grid mapping {name!r}")
    lat0 = float(get("latitude_of_projection_origin", 90.0))
    ts = get("standard_parallel",
             get("scale_factor_at_projection_origin"))
    if ts is None:
        ts = lat0
    ts = float(ts)
    return PolarStereographic(
        central_meridian=float(
            get("straight_vertical_longitude_from_pole",
                get("longitude_of_projection_origin", 0.0))),
        standard_parallel=ts if lat0 > 0 else -abs(ts),
        false_easting=float(get("false_easting", 0.0)),
        false_northing=float(get("false_northing", 0.0)))


def lonlat_for_grid(grid, ps: PolarStereographic):
    """(lon, lat) 2D fields [degrees] for the grid's cell centers."""
    X, Y = np.meshgrid(grid.x, grid.y)
    lat, lon = ps.inverse(X, Y)
    return lon, lat
