"""CRS conversions implemented from published formulas, pure NumPy.

Replaces the reference's use of ``pyproj.Transformer.from_crs(src,
'EPSG:4326', always_xy=True)`` (completePixleOutput.py:59-62) for the
CRS families the reference actually touches:

- ``EPSG:4326``  geographic WGS84 (identity)
- ``EPSG:3857``  spherical Web-Mercator
- ``EPSG:326zz`` / ``EPSG:327zz`` WGS84 UTM north/south zones
  (e.g. EPSG:32643, cf. test2.py:1095)

UTM uses the Karney/Krueger transverse-Mercator series to n^6
(accuracy well below 1 mm inside a zone); coefficients from
C. F. F. Karney, "Transverse Mercator with an accuracy of a few
nanometers", J. Geodesy 85 (2011) -- public formulas.

All functions are vectorized ``float64 -> float64`` with always_xy
(lon, lat) ordering, like the reference's transformer.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)
_E = np.sqrt(_E2)
_N = WGS84_F / (2.0 - WGS84_F)

# Rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
_A_RECT = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

_ALPHA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
        - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
        13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440
        + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
        61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
        + 167603 * _N**6 / 181440,
        49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
        34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
        212378941 * _N**6 / 319334400,
    ]
)

_BETA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
        - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
        _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
        - 1118711 * _N**6 / 3870720,
        17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
        + 5569 * _N**6 / 90720,
        4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
        4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
        20648693 * _N**6 / 638668800,
    ]
)

_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_SOUTH = 10000000.0

_WEBMERC_R = 6378137.0  # spherical radius of EPSG:3857

# Series inversion of the conformal latitude chi -> geodetic phi
# (Snyder 1987 eq. 3-5, extended to e^8): phi = chi + sum d_2j sin(2j chi)
_E4 = _E2 * _E2
_E6 = _E4 * _E2
_E8 = _E6 * _E2
_D_CHI = np.array(
    [
        _E2 / 2 + 5 * _E4 / 24 + _E6 / 12 + 13 * _E8 / 360,
        7 * _E4 / 48 + 29 * _E6 / 240 + 811 * _E8 / 11520,
        7 * _E6 / 120 + 81 * _E8 / 1120,
        4279 * _E8 / 161280,
    ]
)


def _tm_series(xi, eta, coefs):
    """sum_j coefs[j]*sin(2j xi)*cosh(2j eta) and
    sum_j coefs[j]*cos(2j xi)*sinh(2j eta), via angle-addition
    recurrences -- 4 transcendentals total instead of 4 per term."""
    s, c = np.sin(2.0 * xi), np.cos(2.0 * xi)
    sh, ch = np.sinh(2.0 * eta), np.cosh(2.0 * eta)
    S, C, SH, CH = s, c, sh, ch
    acc_xi = coefs[0] * S * CH
    acc_eta = coefs[0] * C * SH
    for j in range(1, len(coefs)):
        S, C = S * c + C * s, C * c - S * s
        SH, CH = SH * ch + CH * sh, CH * ch + SH * sh
        acc_xi += coefs[j] * S * CH
        acc_eta += coefs[j] * C * SH
    return acc_xi, acc_eta


def utm_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray, zone: int, south: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> UTM (easting, northing) meters."""
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64)) - lon0
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))

    sphi = np.sin(phi)
    # conformal latitude tau'
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))

    d_xi, d_eta = _tm_series(xi_p, eta_p, _ALPHA)
    xi = xi_p + d_xi
    eta = eta_p + d_eta

    easting = _UTM_FE + _UTM_K0 * _A_RECT * eta
    northing = _UTM_K0 * _A_RECT * xi
    if south:
        northing = northing + _UTM_FN_SOUTH
    return easting, northing


def utm_inverse(
    easting: np.ndarray, northing: np.ndarray, zone: int, south: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """UTM (easting, northing) meters -> (lon, lat) degrees."""
    e = np.asarray(easting, dtype=np.float64)
    n = np.asarray(northing, dtype=np.float64)
    if south:
        n = n - _UTM_FN_SOUTH
    xi = n / (_UTM_K0 * _A_RECT)
    eta = (e - _UTM_FE) / (_UTM_K0 * _A_RECT)

    d_xi, d_eta = _tm_series(xi, eta, _BETA)
    xi_p = xi - d_xi
    eta_p = eta - d_eta

    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    tau_p = np.sin(xi_p) / np.hypot(sinh_eta, cos_xi)
    lam = np.arctan2(sinh_eta, cos_xi)

    # conformal -> geodetic latitude by the classical sin(2j chi)
    # series (no Newton loop); sin/cos of chi come from tau'
    # algebraically, so the only transcendental is the arctan.
    chi = np.arctan(tau_p)
    inv_h = 1.0 / np.hypot(1.0, tau_p)
    sin_chi = tau_p * inv_h
    cos_chi = inv_h
    s2, c2 = 2.0 * sin_chi * cos_chi, 1.0 - 2.0 * sin_chi * sin_chi
    S, C = s2, c2
    phi = chi + _D_CHI[0] * S
    for j in range(1, len(_D_CHI)):
        S, C = S * c2 + C * s2, C * c2 - S * s2
        phi = phi + _D_CHI[j] * S

    lon0 = zone * 6.0 - 183.0
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _conformal_to_geodetic(tau_p: np.ndarray) -> np.ndarray:
    """chi-series tail of :func:`utm_inverse` (tau' -> phi radians)."""
    chi = np.arctan(tau_p)
    inv_h = 1.0 / np.hypot(1.0, tau_p)
    sin_chi = tau_p * inv_h
    cos_chi = inv_h
    s2, c2 = 2.0 * sin_chi * cos_chi, 1.0 - 2.0 * sin_chi * sin_chi
    S, C = s2, c2
    phi = chi + _D_CHI[0] * S
    for j in range(1, len(_D_CHI)):
        S, C = S * c2 + C * s2, C * c2 - S * s2
        phi = phi + _D_CHI[j] * S
    return phi


def utm_inverse_grid(
    easting_1d: np.ndarray,
    northing_1d: np.ndarray,
    zone: int,
    south: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """UTM inverse over a separable grid: eastings vary only along
    columns, northings only along rows (axis-aligned rasters, the
    reference's north-up GeoTIFFs).  Returns row-major FLATTENED
    (lon, lat) of shape ``len(northing_1d) * len(easting_1d)``.

    Identical mathematics to :func:`utm_inverse`, but the grid
    structure moves every sin/cos/sinh/cosh from O(h*w) to O(h+w):

    - the Krueger series sum_j beta_j sin(2j xi) cosh(2j eta) is an
      outer product of per-row and per-column harmonic vectors;
    - sin/cos(xi - dxi) and sinh(eta - deta) expand by the exact
      angle-addition identities, where sin/cos/sinh/cosh of the
      *corrections* (|d| < 1e-3 inside a UTM zone) are evaluated by
      their Taylor series to the d^6/d^7 term -- truncation error
      ~1e-25, far below float64 resolution, so results agree with
      the pointwise path to machine precision (asserted in tests).

    Remaining per-point transcendentals: hypot, arctan2, arctan.
    ~2.5x faster than pointwise :func:`utm_inverse` on large tiles.
    """
    e = np.asarray(easting_1d, dtype=np.float64)
    n = np.asarray(northing_1d, dtype=np.float64)
    if south:
        n = n - _UTM_FN_SOUTH
    xi_r = n / (_UTM_K0 * _A_RECT)          # (h,)
    eta_c = (e - _UTM_FE) / (_UTM_K0 * _A_RECT)  # (w,)

    # per-axis harmonic tables (h- and w-length vectors only)
    s2, c2 = np.sin(2.0 * xi_r), np.cos(2.0 * xi_r)
    sh2, ch2 = np.sinh(2.0 * eta_c), np.cosh(2.0 * eta_c)
    S, C, SH, CH = s2, c2, sh2, ch2
    d_xi = _BETA[0] * np.multiply.outer(S, CH)
    d_eta = _BETA[0] * np.multiply.outer(C, SH)
    for j in range(1, len(_BETA)):
        S, C = S * c2 + C * s2, C * c2 - S * s2
        SH, CH = SH * ch2 + CH * sh2, CH * ch2 + SH * sh2
        d_xi += _BETA[j] * np.multiply.outer(S, CH)
        d_eta += _BETA[j] * np.multiply.outer(C, SH)

    # sin/cos/sinh/cosh of the small corrections by Taylor series
    # (|d_xi|,|d_eta| <= sum|beta_j| cosh(2j eta) ~ 1e-3 in-zone)
    dx2 = d_xi * d_xi
    sin_dx = d_xi * (1.0 - dx2 / 6.0 * (1.0 - dx2 / 20.0 * (1.0 - dx2 / 42.0)))
    cos_dx = 1.0 - dx2 / 2.0 * (1.0 - dx2 / 12.0 * (1.0 - dx2 / 30.0))
    de2 = d_eta * d_eta
    sinh_de = d_eta * (1.0 + de2 / 6.0 * (1.0 + de2 / 20.0 * (1.0 + de2 / 42.0)))
    cosh_de = 1.0 + de2 / 2.0 * (1.0 + de2 / 12.0 * (1.0 + de2 / 30.0))

    sin_xi = np.sin(xi_r)[:, None]
    cos_xi_r = np.cos(xi_r)[:, None]
    sinh_eta_c = np.sinh(eta_c)[None, :]
    cosh_eta_c = np.cosh(eta_c)[None, :]

    # xi' = xi - d_xi ; eta' = eta - d_eta  (exact angle addition)
    sin_xi_p = sin_xi * cos_dx - cos_xi_r * sin_dx
    cos_xi_p = cos_xi_r * cos_dx + sin_xi * sin_dx
    sinh_eta_p = sinh_eta_c * cosh_de - cosh_eta_c * sinh_de

    tau_p = sin_xi_p / np.hypot(sinh_eta_p, cos_xi_p)
    lam = np.arctan2(sinh_eta_p, cos_xi_p)
    phi = _conformal_to_geodetic(tau_p)

    lon0 = zone * 6.0 - 183.0
    return (np.rad2deg(lam) + lon0).ravel(), np.rad2deg(phi).ravel()


def webmercator_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = _WEBMERC_R * np.deg2rad(lon)
    y = _WEBMERC_R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def webmercator_inverse(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / _WEBMERC_R)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / _WEBMERC_R)) - np.pi / 2.0)
    return lon, lat


# ------------------------------------------------------------------ conic
# Lambert Conformal Conic (2SP) and Albers Equal-Area, ellipsoidal,
# from Snyder 1987 "Map Projections: A Working Manual" eqs 15-1..15-11
# and 14-1..14-11 (public formulas; worked examples pp. 296/292 are the
# test oracles).  Parameterized by ellipsoid so NAD83/GRS80 codes and
# Snyder's Clarke-1866 examples both work.

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101


def _conic_consts(p: dict) -> dict:
    a = p["a"]
    e2 = p.get("e2", p["f"] * (2.0 - p["f"]) if "f" in p else None)
    return {"a": a, "e2": e2, "e": np.sqrt(e2)}


def _m(phi, e2):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _t(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
    )


def lcc_forward(lon_deg, lat_deg, p: dict):
    """(lon, lat) deg -> LCC-2SP (x, y) m (Snyder 15-1..15-4)."""
    c = _conic_consts(p)
    a, e2, e = c["a"], c["e2"], c["e"]
    phi0, lam0 = np.deg2rad(p["lat0"]), np.deg2rad(p["lon0"])
    phi1, phi2 = np.deg2rad(p["sp1"]), np.deg2rad(p["sp2"])
    m1, m2 = _m(phi1, e2), _m(phi2, e2)
    t0, t1, t2 = _t(phi0, e), _t(phi1, e), _t(phi2, e)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = m1 / (n * t1**n)
    rho0 = a * F * t0**n
    phi = np.deg2rad(np.asarray(lat_deg, np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, np.float64))
    rho = a * F * _t(phi, e) ** n
    th = n * (lam - lam0)
    return (
        p.get("fe", 0.0) + rho * np.sin(th),
        p.get("fn", 0.0) + rho0 - rho * np.cos(th),
    )


def lcc_inverse(x, y, p: dict):
    """LCC-2SP (x, y) m -> (lon, lat) deg (Snyder 15-5..15-11 with the
    chi-series inversion instead of the iterative eq 7-9)."""
    c = _conic_consts(p)
    a, e2, e = c["a"], c["e2"], c["e"]
    phi0, lam0 = np.deg2rad(p["lat0"]), np.deg2rad(p["lon0"])
    phi1, phi2 = np.deg2rad(p["sp1"]), np.deg2rad(p["sp2"])
    m1, m2 = _m(phi1, e2), _m(phi2, e2)
    t0, t1, t2 = _t(phi0, e), _t(phi1, e), _t(phi2, e)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = m1 / (n * t1**n)
    rho0 = a * F * t0**n
    xr = np.asarray(x, np.float64) - p.get("fe", 0.0)
    yr = rho0 - (np.asarray(y, np.float64) - p.get("fn", 0.0))
    rho = np.sign(n) * np.hypot(xr, yr)
    th = np.arctan2(np.sign(n) * xr, np.sign(n) * yr)
    t = (rho / (a * F)) ** (1.0 / n)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    # chi -> phi by the same sin(2j chi) series as the TM inverse, but
    # with THIS ellipsoid's eccentricity
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    d = (
        e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360,
        7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520,
        7 * e6 / 120 + 81 * e8 / 1120,
        4279 * e8 / 161280,
    )
    phi = chi
    for j, dj in enumerate(d, start=1):
        phi = phi + dj * np.sin(2.0 * j * chi)
    return np.rad2deg(th / n + lam0), np.rad2deg(phi)


def _q(phi, e, e2):
    s = np.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def albers_forward(lon_deg, lat_deg, p: dict):
    """(lon, lat) deg -> Albers equal-area (x, y) m (Snyder 14-1..14-5)."""
    c = _conic_consts(p)
    a, e2, e = c["a"], c["e2"], c["e"]
    phi0, lam0 = np.deg2rad(p["lat0"]), np.deg2rad(p["lon0"])
    phi1, phi2 = np.deg2rad(p["sp1"]), np.deg2rad(p["sp2"])
    m1, m2 = _m(phi1, e2), _m(phi2, e2)
    q0, q1, q2 = _q(phi0, e, e2), _q(phi1, e, e2), _q(phi2, e, e2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    phi = np.deg2rad(np.asarray(lat_deg, np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, np.float64))
    rho = a * np.sqrt(C - n * _q(phi, e, e2)) / n
    th = n * (lam - lam0)
    return (
        p.get("fe", 0.0) + rho * np.sin(th),
        p.get("fn", 0.0) + rho0 - rho * np.cos(th),
    )


def albers_inverse(x, y, p: dict):
    """Albers (x, y) m -> (lon, lat) deg (Snyder 14-6..14-11 +
    authalic-latitude series 3-18)."""
    c = _conic_consts(p)
    a, e2, e = c["a"], c["e2"], c["e"]
    phi0, lam0 = np.deg2rad(p["lat0"]), np.deg2rad(p["lon0"])
    phi1, phi2 = np.deg2rad(p["sp1"]), np.deg2rad(p["sp2"])
    m1, m2 = _m(phi1, e2), _m(phi2, e2)
    q0, q1, q2 = _q(phi0, e, e2), _q(phi1, e, e2), _q(phi2, e, e2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    xr = np.asarray(x, np.float64) - p.get("fe", 0.0)
    yr = rho0 - (np.asarray(y, np.float64) - p.get("fn", 0.0))
    rho = np.hypot(xr, yr)
    th = np.arctan2(xr, yr) if n >= 0 else np.arctan2(-xr, -yr)
    q = (C - (rho * n / a) ** 2) / n
    q_p = _q(np.pi / 2.0, e, e2)
    beta = np.arcsin(np.clip(q / q_p, -1.0, 1.0))
    e4, e6 = e2 * e2, e2**3
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
        + (761 * e6 / 45360) * np.sin(6 * beta)
    )
    # the e^6-truncated series leaves ~1e-8 deg; two Newton steps on
    # q(phi) = q (Snyder eq. 3-16) take it to machine precision
    for _ in range(2):
        s = np.sin(phi)
        one = 1.0 - e2 * s * s
        phi = phi + one * one / (2.0 * np.cos(phi) * (1.0 - e2)) * (
            q - _q(phi, e, e2)
        )
    return np.rad2deg(th / n + lam0), np.rad2deg(phi)


# conic EPSG registry (GRS80 codes a reference user would hit)
_CONIC_CRS: dict[int, tuple[str, dict]] = {
    # RGF93 / Lambert-93 (France)
    2154: ("lcc", {"a": GRS80_A, "f": GRS80_F, "lat0": 46.5, "lon0": 3.0,
                   "sp1": 49.0, "sp2": 44.0, "fe": 700000.0, "fn": 6600000.0}),
    # NAD83 / Conus Albers
    5070: ("albers", {"a": GRS80_A, "f": GRS80_F, "lat0": 23.0,
                      "lon0": -96.0, "sp1": 29.5, "sp2": 45.5,
                      "fe": 0.0, "fn": 0.0}),
    # NAD83 / California Albers
    3310: ("albers", {"a": GRS80_A, "f": GRS80_F, "lat0": 0.0,
                      "lon0": -120.0, "sp1": 34.0, "sp2": 40.5,
                      "fe": 0.0, "fn": -4000000.0}),
}


def _parse_crs(crs: str) -> tuple[str, int, bool]:
    """-> (kind, zone, south); kind in {'geographic', 'webmercator', 'utm'}."""
    code = crs.strip().upper()
    if not code.startswith("EPSG:"):
        raise ValueError(f"unsupported CRS: {crs!r}")
    num = int(code[5:])
    if num == 4326:
        return "geographic", 0, False
    if num == 3857:
        return "webmercator", 0, False
    if 32601 <= num <= 32660:
        return "utm", num - 32600, False
    if 32701 <= num <= 32760:
        return "utm", num - 32700, True
    if num in _CONIC_CRS:
        return _CONIC_CRS[num][0], num, False
    raise ValueError(f"unsupported CRS: {crs!r}")


class Transformer:
    """Vectorized coordinate transformer, always (x, y) = (lon-ish, lat-ish).

    Mirrors the reference's one-transformer-per-file pattern
    (completePixleOutput.py:59, SURVEY ST1): construct once (per actor),
    call ``transform`` per batch.
    """

    def __init__(self, src_crs: str, dst_crs: str = "EPSG:4326"):
        self.src = _parse_crs(src_crs)
        self.dst = _parse_crs(dst_crs)

    def transform(
        self, xs: np.ndarray, ys: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        kind, zone, south = self.src
        if kind == "geographic":
            lon, lat = np.asarray(xs, np.float64), np.asarray(ys, np.float64)
        elif kind == "webmercator":
            lon, lat = webmercator_inverse(xs, ys)
        elif kind == "lcc":
            lon, lat = lcc_inverse(xs, ys, _CONIC_CRS[zone][1])
        elif kind == "albers":
            lon, lat = albers_inverse(xs, ys, _CONIC_CRS[zone][1])
        else:
            lon, lat = utm_inverse(xs, ys, zone, south)

        kind, zone, south = self.dst
        if kind == "geographic":
            return lon, lat
        if kind == "webmercator":
            return webmercator_forward(lon, lat)
        if kind == "lcc":
            return lcc_forward(lon, lat, _CONIC_CRS[zone][1])
        if kind == "albers":
            return albers_forward(lon, lat, _CONIC_CRS[zone][1])
        return utm_forward(lon, lat, zone, south)

    def transform_grid(
        self, x_cols: np.ndarray, y_rows: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Transform an axis-aligned grid given by its 1-D column x's
        and row y's; returns row-major FLATTENED (lon, lat) of length
        ``len(y_rows) * len(x_cols)``.

        UTM->geographic uses the separable :func:`utm_inverse_grid`
        (O(h+w) transcendentals); webmercator->geographic is exactly
        separable (lon from x alone, lat from y alone); everything
        else broadcasts and calls the pointwise path -- same result,
        no speedup.
        """
        x = np.asarray(x_cols, dtype=np.float64)
        y = np.asarray(y_rows, dtype=np.float64)
        h, w = len(y), len(x)
        src_kind, zone, south = self.src
        dst_kind = self.dst[0]
        if dst_kind == "geographic":
            if src_kind == "utm":
                return utm_inverse_grid(x, y, zone, south)
            if src_kind == "webmercator":
                lon_c, _ = webmercator_inverse(x, np.zeros_like(x))
                _, lat_r = webmercator_inverse(np.zeros_like(y), y)
                return (
                    np.broadcast_to(lon_c[None, :], (h, w)).ravel().copy(),
                    np.broadcast_to(lat_r[:, None], (h, w)).ravel().copy(),
                )
            if src_kind == "geographic":
                return (
                    np.broadcast_to(x[None, :], (h, w)).ravel().copy(),
                    np.broadcast_to(y[:, None], (h, w)).ravel().copy(),
                )
        xx = np.broadcast_to(x[None, :], (h, w)).ravel()
        yy = np.broadcast_to(y[:, None], (h, w)).ravel()
        return self.transform(xx, yy)
