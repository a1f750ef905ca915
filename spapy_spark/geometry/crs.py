"""CRS transforms from scratch (the pyproj role, vectorized numpy).

The reference transforms vectors with pyproj and rasters with
gdal.Warp (/root/reference/SpaReferencing.py:162-357).  pyproj is not
available here; this module implements the projections the engine's
workloads actually use, on the WGS84 ellipsoid:

- EPSG:4326 (geographic) ↔ EPSG:3857 (spherical Web Mercator)
- EPSG:4326 ↔ UTM zones 1-60 N/S (EPSG:326xx/327xx) via the Karney-
  Krüger series (same formulation proj uses; |error| < 1e-9 m within
  a zone), matching the reference's UTM shortcut
  (/root/reference/SpaRasters.py:624-635).

Arbitrary-EPSG pipelines are out of scope — a documented divergence
from pyproj's full database (SURVEY §2.3).

All functions are array-in/array-out for use inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)
_K0 = 0.9996  # UTM scale factor
_FE = 500000.0  # false easting
_FN_S = 10000000.0  # false northing, southern hemisphere

# Karney-Krüger 6th-order alpha/beta coefficients in n = f/(2-f)
_N = _F / (2.0 - _F)
_ALPHA = [
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16,
    13 * _N**2 / 48 - 3 * _N**3 / 5,
    61 * _N**3 / 240,
]
_BETA = [
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96,
    _N**2 / 48 + _N**3 / 15,
    17 * _N**3 / 480,
]
# rectifying radius
_A1 = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)


# ---------------------------------------------------------------------------
# Web Mercator
# ---------------------------------------------------------------------------

_R = 6378137.0  # spherical radius used by EPSG:3857


def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2 * np.arctan(np.exp(y / _R)) - np.pi / 2)
    return lon, lat


# ---------------------------------------------------------------------------
# UTM (transverse Mercator, Karney-Krüger series)
# ---------------------------------------------------------------------------


def utm_zone(lon, lat) -> np.ndarray:
    """Standard zone number per longitude (no Norway/Svalbard special
    cases — same simplification as the reference's UTMZoneFromLonLat)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    """Forward transverse Mercator to UTM easting/northing (meters)."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon0 = np.radians(float(zone) * 6.0 - 183.0)
    # conformal latitude
    e = np.sqrt(_E2)
    t = np.sinh(
        np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat))
    )
    xi_p = np.arctan2(t, np.cos(lon - lon0))
    eta_p = np.arcsinh(np.sin(lon - lon0) / np.hypot(t, np.cos(lon - lon0)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = _FE + _K0 * _A1 * eta
    y = _K0 * _A1 * xi
    if south:
        y = y + _FN_S
    return x, y


def utm_to_lonlat(x, y, zone: int, south: bool = False):
    """Inverse transverse Mercator from UTM easting/northing."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = y - _FN_S
    xi = y / (_K0 * _A1)
    eta = (x - _FE) / (_K0 * _A1)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    e = np.sqrt(_E2)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # fixed-point iteration conformal → geodetic latitude
    lat = chi.copy()
    for _ in range(6):
        lat = np.arcsin(
            np.tanh(
                np.arctanh(np.sin(chi)) + e * np.arctanh(e * np.sin(lat))
            )
        )
    lon0 = float(zone) * 6.0 - 183.0
    lon = lon0 + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    return lon, np.degrees(lat)


# ---------------------------------------------------------------------------
# Conic projections (Snyder 1987 ellipsoidal formulas): Albers Equal
# Area + Lambert Conformal Conic — the projections the reference's own
# tests use (Albers proj-dict + EPSG:26941,
# /root/reference/SpaPyTests/Tests/SpaReferencingTest.py:56-89)
# ---------------------------------------------------------------------------

_E = np.sqrt(_E2)


def _q_authalic(lat):
    s = np.sin(lat)
    return (1 - _E2) * (
        s / (1 - _E2 * s * s)
        - (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s))
    )


def _m_radius(lat):
    return np.cos(lat) / np.sqrt(1 - _E2 * np.sin(lat) ** 2)


class Albers:
    """Albers Equal-Area conic (2 standard parallels, ellipsoidal)."""

    def __init__(self, lat_1, lat_2, lat_0=0.0, lon_0=0.0, x_0=0.0, y_0=0.0):
        p1, p2 = np.radians(lat_1), np.radians(lat_2)
        self.lat0, self.lon0 = np.radians(lat_0), np.radians(lon_0)
        self.x0, self.y0 = x_0, y_0
        m1, m2 = _m_radius(p1), _m_radius(p2)
        q1, q2 = _q_authalic(p1), _q_authalic(p2)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = _A * np.sqrt(self.C - self.n * _q_authalic(self.lat0)) / self.n

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64))
        phi = np.radians(np.asarray(lat, np.float64))
        rho = _A * np.sqrt(self.C - self.n * _q_authalic(phi)) / self.n
        th = self.n * (lam - self.lon0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        x = np.asarray(x, np.float64) - self.x0
        y = self.rho0 - (np.asarray(y, np.float64) - self.y0)
        rho = np.hypot(x, y) * np.sign(self.n)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        q = (self.C - (rho * self.n / _A) ** 2) / self.n
        phi = np.arcsin(np.clip(q / 2, -1, 1))
        for _ in range(8):
            s = np.sin(phi)
            phi = phi + (1 - _E2 * s * s) ** 2 / (2 * np.cos(phi)) * (
                q / (1 - _E2)
                - s / (1 - _E2 * s * s)
                + (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s))
            )
        lam = self.lon0 + th / self.n
        return np.degrees(lam), np.degrees(phi)


def _t_conformal(lat):
    s = np.sin(lat)
    return np.tan(np.pi / 4 - lat / 2) / (
        (1 - _E * s) / (1 + _E * s)
    ) ** (_E / 2)


class LambertConformal:
    """Lambert Conformal Conic (2SP, ellipsoidal) — e.g. EPSG:26941."""

    def __init__(self, lat_1, lat_2, lat_0=0.0, lon_0=0.0, x_0=0.0, y_0=0.0):
        p1, p2 = np.radians(lat_1), np.radians(lat_2)
        self.lat0, self.lon0 = np.radians(lat_0), np.radians(lon_0)
        self.x0, self.y0 = x_0, y_0
        m1, m2 = _m_radius(p1), _m_radius(p2)
        t1, t2 = _t_conformal(p1), _t_conformal(p2)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = _A * self.F * _t_conformal(self.lat0) ** self.n

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64))
        phi = np.radians(np.asarray(lat, np.float64))
        rho = _A * self.F * _t_conformal(phi) ** self.n
        th = self.n * (lam - self.lon0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        x = np.asarray(x, np.float64) - self.x0
        y = self.rho0 - (np.asarray(y, np.float64) - self.y0)
        rho = np.hypot(x, y) * np.sign(self.n)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        t = (rho / (_A * self.F)) ** (1 / self.n)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            s = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - _E * s) / (1 + _E * s)) ** (_E / 2)
            )
        return np.degrees(self.lon0 + th / self.n), np.degrees(phi)


class TransverseMercator:
    """General Transverse Mercator (Karney series, same machinery as
    the UTM kernels) with arbitrary natural origin, scale factor and
    false origin — the parameterization TM-based state-plane zones use
    (e.g. EPSG:2260 NY East).  The reference reaches these through
    pyproj (/root/reference/SpaReferencing.py:128-135); here the
    series is evaluated directly on the WGS84 ellipsoid (GRS80 differs
    below 0.1 mm at these latitudes).
    """

    def __init__(self, lat_0=0.0, lon_0=0.0, k_0=1.0, x_0=0.0, y_0=0.0):
        self.lat0, self.lon0 = float(lat_0), float(lon_0)
        self.k0, self.x0, self.y0 = float(k_0), float(x_0), float(y_0)
        # meridian-arc offset of the latitude of natural origin
        self.xi0 = 0.0 if lat_0 == 0.0 else float(
            self._xi_eta(np.array([self.lon0]), np.array([self.lat0]))[0][0]
        )

    def _xi_eta(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon0 = np.radians(self.lon0)
        e = np.sqrt(_E2)
        t = np.sinh(np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat)))
        xi_p = np.arctan2(t, np.cos(lon - lon0))
        eta_p = np.arcsinh(np.sin(lon - lon0) / np.hypot(t, np.cos(lon - lon0)))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(_ALPHA, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return xi, eta

    def forward(self, lon, lat):
        xi, eta = self._xi_eta(lon, lat)
        x = self.x0 + self.k0 * _A1 * eta
        y = self.y0 + self.k0 * _A1 * (xi - self.xi0)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        xi = (y - self.y0) / (self.k0 * _A1) + self.xi0
        eta = (x - self.x0) / (self.k0 * _A1)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(_BETA, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        e = np.sqrt(_E2)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        lat = chi.copy()
        for _ in range(6):
            lat = np.arcsin(
                np.tanh(
                    np.arctanh(np.sin(chi)) + e * np.arctanh(e * np.sin(lat))
                )
            )
        lon = self.lon0 + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
        return lon, np.degrees(lat)


# one projected unit = ``to_meter`` meters (proj4 +units / +to_meter
# semantics: the projection computes meters, the CRS publishes units;
# false origins x_0/y_0 stay in meters as PROJ defines them)
_UNIT_TO_METER = {
    "m": 1.0,
    "meter": 1.0,
    "metre": 1.0,
    "us-ft": 1200.0 / 3937.0,
    "ft": 0.3048,
}


class _Scaled:
    """Unit adapter: wraps a meters-native projection into a CRS whose
    axis unit is ``to_meter`` meters (us survey foot state planes)."""

    def __init__(self, base, to_meter: float):
        self.base, self.to_meter = base, float(to_meter)

    def forward(self, lon, lat):
        x, y = self.base.forward(lon, lat)
        return x / self.to_meter, y / self.to_meter

    def inverse(self, x, y):
        return self.base.inverse(
            np.asarray(x, np.float64) * self.to_meter,
            np.asarray(y, np.float64) * self.to_meter,
        )


class _UTM:
    """Dict/proj4 front-end wrapper over the Karney UTM kernels."""

    def __init__(self, zone: int, south: bool = False):
        self.zone, self.south = int(zone), bool(south)

    def forward(self, lon, lat):
        return lonlat_to_utm(lon, lat, self.zone, south=self.south)

    def inverse(self, x, y):
        return utm_to_lonlat(x, y, self.zone, south=self.south)


class _WebMercator:
    def forward(self, lon, lat):
        return lonlat_to_webmercator(lon, lat)

    def inverse(self, x, y):
        return webmercator_to_lonlat(x, y)


class _LonLat:
    def forward(self, lon, lat):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)

    inverse = forward


# ---------------------------------------------------------------------------
# Datum shifts (geographic CRSes on non-WGS84 ellipsoids)
# ---------------------------------------------------------------------------
# The reference handles any datum through pyproj
# (/root/reference/SpaReferencing.py:162-271).  Here geographic-side
# shifts are implemented exactly: geodetic→geocentric on the source
# ellipsoid, a 3/7-parameter Helmert to WGS84 ECEF (EPSG method 9603 /
# 9606 position-vector), geocentric→geodetic on WGS84.  Heights are
# taken as 0 (2-D engine).  PROJECTED CRSes on foreign ellipsoids
# still raise — the projection kernels above are WGS84-parameterized,
# and silently projecting NAD27 coordinates with WGS84 constants would
# be off by hundreds of meters.

#: proj4 ellipsoid registry entries used by the datums below: (a, 1/f)
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "clrk66": (6378206.4, 294.9786982),     # Clarke 1866 (NAD27)
    "airy": (6377563.396, 299.3249646),     # Airy 1830 (OSGB36)
    "intl": (6378388.0, 297.0),             # International 1924 (ED50)
}

#: datum → (ellipsoid key, towgs84 params) — proj4 registry values
#: (3-param: dx,dy,dz in meters; 7-param adds rx,ry,rz arcsec + scale
#: ppm, position-vector sign convention)
_DATUMS = {
    "WGS84": ("WGS84", (0.0, 0.0, 0.0)),
    "NAD83": ("GRS80", (0.0, 0.0, 0.0)),
    "NAD27": ("clrk66", (-8.0, 160.0, 176.0)),
    "OSGB36": ("airy", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
    "ED50": ("intl", (-87.0, -98.0, -121.0)),
}


def _geodetic_to_ecef(lon, lat, a: float, rf: float):
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    sphi = np.sin(phi)
    n = a / np.sqrt(1.0 - e2 * sphi * sphi)
    x = n * np.cos(phi) * np.cos(lam)
    y = n * np.cos(phi) * np.sin(lam)
    z = n * (1.0 - e2) * sphi
    return x, y, z


def _ecef_to_geodetic(x, y, z, a: float, rf: float):
    """Bowring's closed-form first guess + 2 Newton refinements —
    sub-nanometer for earth-surface points."""
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.hypot(x, y)
    lam = np.arctan2(y, x)
    theta = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(theta) ** 3,
                     p - e2 * a * np.cos(theta) ** 3)
    for _ in range(2):
        sphi = np.sin(phi)
        n = a / np.sqrt(1.0 - e2 * sphi * sphi)
        h = p / np.cos(phi) - n
        phi = np.arctan2(z, p * (1.0 - e2 * n / (n + h)))
    return np.degrees(lam), np.degrees(phi)


def _helmert(x, y, z, p, inverse: bool = False):
    """3- or 7-parameter Helmert (position-vector, EPSG 9606; the
    small-angle form proj's +towgs84 uses)."""
    if len(p) == 3:
        dx, dy, dz = p
        rx = ry = rz = 0.0
        s = 0.0
    else:
        dx, dy, dz, rx_s, ry_s, rz_s, s_ppm = p
        asec = np.pi / 648000.0
        rx, ry, rz = rx_s * asec, ry_s * asec, rz_s * asec
        s = s_ppm * 1e-6
    m = 1.0 + s
    if not inverse:
        x2 = m * (x - rz * y + ry * z) + dx
        y2 = m * (rz * x + y - rx * z) + dy
        z2 = m * (-ry * x + rx * y + z) + dz
        return x2, y2, z2
    # exact small-form inverse: undo translation, then solve the
    # rotation+scale by its own (orthogonal-to-first-order) transpose;
    # one fixed-point refinement kills the second-order residual
    u, v, w = x - dx, y - dy, z - dz
    x1, y1, z1 = u / m, v / m, w / m
    for _ in range(2):
        x1 = (u / m) - (-rz * y1 + ry * z1)
        y1 = (v / m) - (rz * x1 - rx * z1)
        z1 = (w / m) - (-ry * x1 + rx * y1)
    return x1, y1, z1


class _LonLatDatum:
    """Geographic CRS on a foreign datum.  ``inverse`` (native lon/lat
    → WGS84 lon/lat) and ``forward`` (WGS84 → native) follow the same
    orientation contract as the projected classes above."""

    def __init__(self, a: float, rf: float, towgs84):
        self.a, self.rf = float(a), float(rf)
        self.towgs84 = tuple(float(v) for v in towgs84)

    def inverse(self, lon, lat):
        x, y, z = _geodetic_to_ecef(lon, lat, self.a, self.rf)
        x, y, z = _helmert(x, y, z, self.towgs84)
        return _ecef_to_geodetic(x, y, z, *_ELLIPSOIDS["WGS84"])

    def forward(self, lon, lat):
        x, y, z = _geodetic_to_ecef(lon, lat, *_ELLIPSOIDS["WGS84"])
        x, y, z = _helmert(x, y, z, self.towgs84, inverse=True)
        return _ecef_to_geodetic(x, y, z, self.a, self.rf)


def _datum_of(d: dict):
    """proj dict → _LonLatDatum when it names a shifted datum /
    towgs84 / foreign ellipsoid; None for WGS84-equivalent."""
    datum = str(d.get("datum", "")).upper() if "datum" in d else None
    ellps = d.get("ellps")
    tow = d.get("towgs84")
    if tow is not None:
        if isinstance(tow, str):
            tow = [float(v) for v in tow.split(",")]
        a, rf = _ELLIPSOIDS.get(str(ellps or "WGS84"),
                                _ELLIPSOIDS["WGS84"])
        if "a" in d:
            a = float(d["a"])
        if "rf" in d:
            rf = float(d["rf"])
        if len(tuple(tow)) not in (3, 7):
            raise ValueError("towgs84 needs 3 or 7 parameters")
        if all(float(v) == 0.0 for v in tow) and abs(a - 6378137.0) < 1.0:
            return None
        return _LonLatDatum(a, rf, tow)
    if datum:
        if datum in ("WGS84", "NAD83"):
            return None
        if datum not in _DATUMS:
            raise ValueError(f"unsupported datum {datum!r}")
        ek, tow = _DATUMS[datum]
        a, rf = _ELLIPSOIDS[ek]
        return _LonLatDatum(a, rf, tow)
    if ellps and str(ellps) not in ("WGS84", "GRS80"):
        raise ValueError(
            f"ellps {ellps!r} needs +datum or +towgs84 to define the "
            "shift to WGS84"
        )
    return None


def parse_proj4(s: str) -> dict:
    """'+proj=aea +lat_1=29.5 …' → proj dict (the reference accepts
    proj4 strings alongside dicts/EPSG ints,
    /root/reference/SpaReferencing.py:128-135)."""
    out: dict = {}
    for tok in s.split():
        if not tok.startswith("+"):
            continue
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            try:
                out[k] = float(v) if k not in ("proj", "ellps", "datum",
                                               "units") else v
            except ValueError:
                out[k] = v
        else:
            out[body] = True
    return out


def from_proj_dict(d: dict):
    """Build a projection from a proj-style dict or proj4 string — the
    reference's input surface ({'proj': 'aea', 'lat_1': …, …} as in
    its own Albers test, /root/reference/SpaPyTests/Tests/
    SpaReferencingTest.py:56-89, plus utm/merc/longlat shortcuts)."""
    if isinstance(d, str):
        d = wkt_to_proj_dict(d) if "[" in d else parse_proj4(d)
    proj = d.get("proj")
    kw = {k: float(d[k]) for k in ("lat_1", "lat_2", "lat_0", "lon_0",
                                   "x_0", "y_0") if k in d}
    if proj == "aea":
        base = Albers(**kw)
    elif proj == "lcc":
        base = LambertConformal(**kw)
    elif proj == "tmerc":
        k0 = float(d.get("k_0", d.get("k", 1.0)))
        base = TransverseMercator(
            lat_0=kw.get("lat_0", 0.0), lon_0=kw.get("lon_0", 0.0),
            k_0=k0, x_0=kw.get("x_0", 0.0), y_0=kw.get("y_0", 0.0),
        )
    elif proj == "utm":
        base = _UTM(int(d["zone"]), south=bool(d.get("south", False)))
    elif proj in ("merc", "webmerc"):
        base = _WebMercator()
    elif proj in ("longlat", "latlong"):
        base = _datum_of(d) or _LonLat()
    else:
        raise ValueError(f"unsupported proj {proj!r}")
    to_m = d.get("to_meter")
    if to_m is None and "units" in d:
        u = str(d["units"]).lower()
        if u not in _UNIT_TO_METER:
            raise ValueError(f"unsupported units {d['units']!r}")
        to_m = _UNIT_TO_METER[u]
    if to_m is not None and float(to_m) != 1.0:
        return _Scaled(base, float(to_m))
    return base


# EPSG → proj-dict shortcuts for common projected CRSes (public PROJ
# registry definitions; NAD83/GRS80 ellipsoid ≈ WGS84 well below the
# engine's mm tolerance).  Anything not listed still works via a proj4
# string or proj dict; UTM codes resolve by prefix in ``norm``.
_EPSG_CONICS = {
    # NAD83 California zone 1 (meters)
    "epsg:26941": dict(proj="lcc", lat_1=41.666666666, lat_2=40.0,
                       lat_0=39.333333333, lon_0=-122.0,
                       x_0=2000000.0, y_0=500000.0),
    # NAD83 New York Long Island (US survey feet) — the LCC+units case
    "epsg:2263": dict(proj="lcc", lat_1=41.03333333333333,
                      lat_2=40.66666666666666, lat_0=40.16666666666666,
                      lon_0=-74.0, x_0=300000.0000000001, y_0=0.0,
                      units="us-ft"),
    # NAD83 California zone 5 (US survey feet)
    "epsg:2229": dict(proj="lcc", lat_1=35.46666666666667,
                      lat_2=34.03333333333333, lat_0=33.5, lon_0=-118.0,
                      x_0=2000000.0001016, y_0=500000.0001016001,
                      units="us-ft"),
    # NAD83 New York East (Transverse Mercator, US survey feet)
    "epsg:2260": dict(proj="tmerc", lat_0=38.83333333333334, lon_0=-74.5,
                      k=0.9999, x_0=150000.0000000001, y_0=0.0,
                      units="us-ft"),
    # CONUS Albers (meters)
    "epsg:5070": dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=23.0,
                      lon_0=-96.0, x_0=0.0, y_0=0.0),
    # California Albers (meters)
    "epsg:3310": dict(proj="aea", lat_1=34.0, lat_2=40.5, lat_0=0.0,
                      lon_0=-120.0, x_0=0.0, y_0=-4000000.0),
    # RGF93 / Lambert-93 (meters)
    "epsg:2154": dict(proj="lcc", lat_1=49.0, lat_2=44.0, lat_0=46.5,
                      lon_0=3.0, x_0=700000.0, y_0=6600000.0),
}


# ---------------------------------------------------------------------------
# WKT front-end (WKT1 / ESRI WKT / common WKT2) — the reference accepts
# WKT strings via pyproj (/root/reference/SpaReferencing.py:128-135);
# here the same strings route to the from-scratch kernels above.
# ---------------------------------------------------------------------------

import re as _re

_WKT_NAME_RE = _re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*")


class _WktNode:
    __slots__ = ("name", "args")

    def __init__(self, name, args):
        self.name, self.args = name, args

    def children(self, *names):
        return [a for a in self.args
                if isinstance(a, _WktNode) and a.name in names]


def _wkt_node(s: str, i: int):
    m = _WKT_NAME_RE.match(s, i)
    if not m or m.end() >= len(s) or s[m.end()] not in "[(":
        raise ValueError(f"bad WKT at offset {i}")
    name, i = m.group(1), m.end() + 1
    args = []
    while True:
        while i < len(s) and s[i].isspace():
            i += 1
        if i >= len(s):
            raise ValueError("unterminated WKT")
        c = s[i]
        if c in ")]":  # empty node / trailing close
            i += 1
            break
        if c == '"':
            j = s.index('"', i + 1)
            args.append(s[i + 1:j])
            i = j + 1
        else:
            m2 = _WKT_NAME_RE.match(s, i)
            if m2 and m2.end() < len(s) and s[m2.end()] in "[(":
                child, i = _wkt_node(s, i)
                args.append(child)
            else:
                j = i
                while s[j] not in ",)]":
                    j += 1
                tok = s[i:j].strip()
                i = j
                try:
                    args.append(float(tok))
                except ValueError:
                    args.append(tok)
        while i < len(s) and s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        if s[i] in ")]":
            i += 1
            break
    return _WktNode(name.upper(), args), i


def _pnorm(s: str) -> str:
    return _re.sub(r"[^a-z0-9]", "", str(s).lower())


# projection-method → kernel family (WKT1 and WKT2 spellings)
_WKT_METHODS = {
    "transversemercator": "tmerc",
    "gausskruger": "tmerc",
    "lambertconformalconic2sp": "lcc",
    "lambertconicconformal2sp": "lcc",
    "lambertconformalconic": "lcc",
    "albersconicequalarea": "aea",
    "albersequalarea": "aea",
    "albers": "aea",
    "mercator1sp": "webmerc",
    "mercatorvarianta": "webmerc",
    "popularvisualisationpseudomercator": "webmerc",
    "mercatorauxiliarysphere": "webmerc",
}

# parameter-name → proj key (WKT1 and WKT2 spellings)
_WKT_PARAMS = {
    "standardparallel1": "lat_1",
    "latitudeof1ststandardparallel": "lat_1",
    "standardparallel2": "lat_2",
    "latitudeof2ndstandardparallel": "lat_2",
    "latitudeoforigin": "lat_0",
    "latitudeofcenter": "lat_0",
    "latitudeoffalseorigin": "lat_0",
    "latitudeofnaturalorigin": "lat_0",
    "centralmeridian": "lon_0",
    "longitudeofcenter": "lon_0",
    "longitudeoffalseorigin": "lon_0",
    "longitudeofnaturalorigin": "lon_0",
    "scalefactor": "k",
    "scalefactoratnaturalorigin": "k",
    "falseeasting": "x_0",
    "eastingatfalseorigin": "x_0",
    "falsenorthing": "y_0",
    "northingatfalseorigin": "y_0",
}

_GEOG_NAMES = ("GEOGCS", "GEOGCRS", "GEODCRS", "GEOGRAPHICCRS",
               "BASEGEOGCRS", "BASEGEODCRS")


def _wkt_walk(node):
    yield node
    for a in node.args:
        if isinstance(a, _WktNode):
            yield from _wkt_walk(a)


#: DATUM-name fragments → _DATUMS keys (WKT1 spellings vary:
#: 'D_North_American_1927', 'North_American_Datum_1927', …)
_WKT_DATUM_HINTS = (
    ("1927", "NAD27"), ("NAD27", "NAD27"),
    ("1983", "NAD83"), ("NAD83", "NAD83"),
    ("OSGB", "OSGB36"), ("ORDNANCE", "OSGB36"),
    ("EUROPEAN", "ED50"), ("ED50", "ED50"),
    ("WGS", "WGS84"),
)


def _geog_wkt_dict(root) -> dict:
    """Geographic WKT → longlat proj dict carrying the datum shift.
    A TOWGS84 node wins; else the DATUM name is matched against known
    datums; an unknown name on a non-WGS84 spheroid raises (never
    silently treat NAD27 degrees as WGS84 degrees)."""
    d: dict = {"proj": "longlat"}
    for n in _wkt_walk(root):
        if n.name == "TOWGS84":
            d["towgs84"] = [float(v) for v in n.args
                            if isinstance(v, float)]
    a_axis, rf = 6378137.0, 298.257223563
    for n in _wkt_walk(root):
        if n.name in ("SPHEROID", "ELLIPSOID"):
            nums = [v for v in n.args if isinstance(v, float)]
            if len(nums) >= 2:
                a_axis, rf = nums[0], nums[1]
            break
    if "towgs84" in d:
        d["a"], d["rf"] = a_axis, rf
        return d
    datum_name = ""
    for n in _wkt_walk(root):
        if n.name in ("DATUM", "TRF", "GEODETICDATUM"):
            datum_name = str(n.args[0]).upper() if n.args else ""
            break
    for frag, key in _WKT_DATUM_HINTS:
        if frag in datum_name:
            d["datum"] = key
            return d
    if abs(a_axis - 6378137.0) > 1.0:
        raise ValueError(
            f"unknown geographic datum {datum_name!r} on a non-WGS84 "
            f"spheroid (a={a_axis}) — provide TOWGS84"
        )
    return d


def wkt_to_proj_dict(s: str) -> dict:
    """WKT CRS string → proj-style dict routed to the engine's kernel
    families.  Handles WKT1/ESRI (PROJCS/PROJECTION/PARAMETER/UNIT)
    and common WKT2 (PROJCRS/CONVERSION/METHOD, LENGTHUNIT).  WKT
    false origins are expressed in the CRS's own linear unit and are
    converted to meters here (proj x_0/y_0 semantics); non-meter units
    become ``to_meter`` so outputs publish in the CRS unit.  Ellipsoids
    other than WGS84/GRS80 raise rather than misproject (NAD27/Clarke
    1866 would be off by hundreds of meters)."""
    root, _ = _wkt_node(s, 0)
    if root.name in _GEOG_NAMES:
        return _geog_wkt_dict(root)
    if root.name not in ("PROJCS", "PROJCRS", "PROJECTEDCRS"):
        raise ValueError(f"unsupported WKT root {root.name}")
    for n in _wkt_walk(root):
        if n.name in ("SPHEROID", "ELLIPSOID"):
            a_axis = next(v for v in n.args if isinstance(v, float))
            if abs(a_axis - 6378137.0) > 1.0:
                raise ValueError(
                    f"unsupported ellipsoid a={a_axis} (WGS84/GRS80 only)"
                )
            break
    proj_nodes = root.children("PROJECTION")
    if proj_nodes:  # WKT1: PROJECTION + flat PARAMETERs under PROJCS
        method, scope = proj_nodes[0].args[0], root
    else:  # WKT2: CONVERSION[ "...", METHOD[...], PARAMETER... ]
        conv = root.children("CONVERSION")
        if not conv:
            raise ValueError("WKT has neither PROJECTION nor CONVERSION")
        meth = conv[0].children("METHOD")
        if not meth:
            raise ValueError("WKT CONVERSION lacks METHOD")
        method, scope = meth[0].args[0], conv[0]
    key = _pnorm(method)
    if key not in _WKT_METHODS:
        raise ValueError(f"unsupported WKT projection {method!r}")
    d: dict = {"proj": _WKT_METHODS[key]}
    for p in scope.children("PARAMETER"):
        pk = _WKT_PARAMS.get(_pnorm(p.args[0]))
        if pk is not None:
            d[pk] = next(v for v in p.args[1:] if isinstance(v, float))
    # linear unit: WKT1 = UNIT directly under PROJCS; WKT2 = LENGTHUNIT
    # anywhere outside the base geographic CRS (axes/params agree)
    unit = 1.0
    unit_nodes = [u for u in root.children("UNIT")]
    if not unit_nodes:
        for n in root.args:
            if isinstance(n, _WktNode) and n.name not in _GEOG_NAMES:
                unit_nodes.extend(
                    u for u in _wkt_walk(n) if u.name == "LENGTHUNIT"
                )
    if unit_nodes:
        unit = float(next(v for v in unit_nodes[0].args
                          if isinstance(v, float)))
    if unit != 1.0:
        d["x_0"] = d.get("x_0", 0.0) * unit  # WKT false origins are in
        d["y_0"] = d.get("y_0", 0.0) * unit  # CRS units; proj wants m
        d["to_meter"] = unit
    return d


# ---------------------------------------------------------------------------
# Dispatch + DataFrame operator
# ---------------------------------------------------------------------------


def transform_arrays(x, y, src, dst):
    """Transform coordinate arrays between supported CRS specs.

    Specs: 'epsg:4326', 'epsg:3857', 'epsg:326XX'/'epsg:327XX' (UTM),
    'epsg:26941' (CA zone 1 LCC), or a proj-style dict ({'proj':
    'aea'|'lcc', 'lat_1': …}) — mirroring the reference's Albers
    proj-dict input (/root/reference/SpaPyTests/Tests/
    SpaReferencingTest.py:56-89).
    """
    def norm(spec):
        if isinstance(spec, dict):
            return spec
        if isinstance(spec, int):
            spec = f"epsg:{spec}"
        if spec.lstrip().startswith("+"):
            return parse_proj4(spec)
        if "[" in spec:  # WKT1 / WKT2 string
            return wkt_to_proj_dict(spec)
        s = spec.lower()
        if s in _EPSG_CONICS:
            return _EPSG_CONICS[s]
        if s == "epsg:4267":  # NAD27 geographic
            return dict(proj="longlat", datum="NAD27")
        if s == "epsg:4277":  # OSGB36 geographic
            return dict(proj="longlat", datum="OSGB36")
        if s == "epsg:4230":  # ED50 geographic
            return dict(proj="longlat", datum="ED50")
        if s == "epsg:4269":  # NAD83 geographic (≈ WGS84, mm-level)
            return "epsg:4326"
        if s.startswith("epsg:269") and len(s) == 10:
            # NAD83 UTM north zones (26901-26923) — GRS80 ≈ WGS84 here
            return dict(proj="utm", zone=int(s[8:]))
        return s

    src, dst = norm(src), norm(dst)
    if src == dst:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    # normalize to lon/lat
    if isinstance(src, dict):
        lon, lat = from_proj_dict(src).inverse(x, y)
    elif src == "epsg:4326":
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    elif src == "epsg:3857":
        lon, lat = webmercator_to_lonlat(x, y)
    elif src.startswith("epsg:326"):
        lon, lat = utm_to_lonlat(x, y, int(src[8:]), south=False)
    elif src.startswith("epsg:327"):
        lon, lat = utm_to_lonlat(x, y, int(src[8:]), south=True)
    else:
        raise ValueError(f"unsupported source CRS {src!r}")
    if isinstance(dst, dict):
        return from_proj_dict(dst).forward(lon, lat)
    if dst == "epsg:4326":
        return lon, lat
    if dst == "epsg:3857":
        return lonlat_to_webmercator(lon, lat)
    if dst.startswith("epsg:326"):
        return lonlat_to_utm(lon, lat, int(dst[8:]), south=False)
    if dst.startswith("epsg:327"):
        return lonlat_to_utm(lon, lat, int(dst[8:]), south=True)
    raise ValueError(f"unsupported target CRS {dst!r}")


def transform_geom(geom: dict, src: str, dst: str) -> dict | None:
    """Transform a geometry dict (recursive over coordinate arrays),
    mirroring /root/reference/SpaReferencing.py:324-356's recursion and
    its coordinate hygiene (SpaReferencing.py:223-245): transformed
    coords that are NaN / ±1e30 / non-finite are DROPPED; a ring needs
    ≥3 survivors, a LineString ≥2; emptied parts fall out of Multi*
    containers; a fully-emptied geometry returns None (the reference's
    null result).  Divergence (documented): the reference silently
    drops polygon interior rings ("deal with interior polys later");
    here holes are transformed and filtered like any ring."""
    t = geom["type"]

    def tx(arr):
        a = np.asarray(arr, dtype=np.float64)
        one = a.ndim == 1
        if one:
            a = a.reshape(1, 2)
        x, y = transform_arrays(a[:, 0], a[:, 1], src, dst)
        keep = (np.isfinite(x) & np.isfinite(y)
                & (x != 1e30) & (y != 1e30)
                & (x != -1e30) & (y != -1e30))
        out = np.column_stack([x, y])[keep]
        if one:
            return out[0] if len(out) else None
        return out

    if t == "Point":
        c = tx(geom["coordinates"])
        return None if c is None else {"type": t, "coordinates": c}
    if t in ("LineString", "MultiPoint"):
        c = tx(geom["coordinates"])
        need = 2 if t == "LineString" else 1
        return ({"type": t, "coordinates": c} if len(c) >= need
                else None)
    if t == "Polygon":
        rings = [tx(r) for r in geom["coordinates"]]
        if not rings or len(rings[0]) < 3:
            return None
        return {"type": t,
                "coordinates": [r for r in rings if len(r) >= 3]}
    if t == "MultiLineString":
        parts = [tx(r) for r in geom["coordinates"]]
        parts = [r for r in parts if len(r) >= 2]
        return {"type": t, "coordinates": parts} if parts else None
    if t == "MultiPolygon":
        polys = []
        for p in geom["coordinates"]:
            g = transform_geom({"type": "Polygon", "coordinates": p},
                               src, dst)
            if g is not None:
                polys.append(g["coordinates"])
        return {"type": t, "coordinates": polys} if polys else None
    raise ValueError(t)


def transform_df(df, src: str, dst: str, geometry: str = "geometry"):
    """DataFrame operator: reproject every feature's WKB geometry."""
    from ..operators.vector import _geom_map

    return _geom_map(df, lambda g: transform_geom(g, src, dst), geometry)
