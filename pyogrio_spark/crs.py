"""CRS identification and serialization without a PROJ database.

Reference behavior anchor: ``get_crs``
(/root/reference/pyogrio/_io.pyx:426-478) reports ``EPSG:<code>`` when
the layer SRS identifies to an EPSG authority, else the WKT string; the
writers persist the caller's CRS instead of assuming one
(/root/reference/pyogrio/_io.pyx:2810-2816). This container carries no
GDAL/PROJ, so:

- **identification** reads the ``AUTHORITY``/``ID`` nodes of the WKT
  itself, falling back to a name table of ubiquitous CRSs (Esri ``.prj``
  files routinely omit authorities) and the WGS84-UTM zone naming
  pattern;
- **serialization** emits full WKT for the well-known table and
  WGS84-UTM zones, and an authority-bearing ``LOCAL_CS`` skeleton for
  any other EPSG code — identification round-trips through every
  format, but exact projection parameters for arbitrary codes would
  need a PROJ database (documented divergence, not a silent one).

Accepted CRS spellings everywhere a writer takes ``crs=``: an int EPSG
code, ``"EPSG:<code>"`` (any case), or a WKT string.
"""

from __future__ import annotations

import re

# Full WKT1 for the CRSs that cover the overwhelming majority of real
# datasets (values are the standard public definitions).
_WGS84_GEOGCS = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]'
)

WKT_BY_EPSG: dict[int, str] = {
    4326: _WGS84_GEOGCS + ',AUTHORITY["EPSG","4326"]]',
    4269: (
        'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
        'SPHEROID["GRS_1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433],'
        'AUTHORITY["EPSG","4269"]]'
    ),
    3857: (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        + _WGS84_GEOGCS
        + '],PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0],PARAMETER["False_Northing",0],'
        'PARAMETER["Central_Meridian",0],PARAMETER["Standard_Parallel_1",0],'
        'PARAMETER["Auxiliary_Sphere_Type",0],UNIT["Meter",1],'
        'AUTHORITY["EPSG","3857"]]'
    ),
    27700: (
        'PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",'
        'DATUM["D_OSGB_1936",SPHEROID["Airy_1830",6377563.396,299.3249646]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",400000],PARAMETER["False_Northing",-100000],'
        'PARAMETER["Central_Meridian",-2],PARAMETER["Scale_Factor",0.9996012717],'
        'PARAMETER["Latitude_Of_Origin",49],UNIT["Meter",1],'
        'AUTHORITY["EPSG","27700"]]'
    ),
    # geographic CRSs of the two other datums this module's projected
    # systems sit on (standard public definitions)
    4258: (
        'GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",'
        'SPHEROID["GRS_1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433],'
        'AUTHORITY["EPSG","4258"]]'
    ),
    4267: (
        'GEOGCS["GCS_North_American_1927",DATUM["D_North_American_1927",'
        'SPHEROID["Clarke_1866",6378206.4,294.9786982]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433],'
        'AUTHORITY["EPSG","4267"]]'
    ),
    # RGF93 / Lambert-93 — the French national grid
    2154: (
        'PROJCS["RGF_1993_Lambert_93",GEOGCS["GCS_RGF_1993",'
        'DATUM["D_RGF_1993",SPHEROID["GRS_1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",700000],PARAMETER["False_Northing",6600000],'
        'PARAMETER["Central_Meridian",3],PARAMETER["Standard_Parallel_1",49],'
        'PARAMETER["Standard_Parallel_2",44],PARAMETER["Latitude_Of_Origin",46.5],'
        'UNIT["Meter",1],AUTHORITY["EPSG","2154"]]'
    ),
    # ETRS89-extended / LAEA Europe — the EU statistical grid
    3035: (
        'PROJCS["ETRS_1989_LAEA",GEOGCS["GCS_ETRS_1989",'
        'DATUM["D_ETRS_1989",SPHEROID["GRS_1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
        'PARAMETER["False_Easting",4321000],PARAMETER["False_Northing",3210000],'
        'PARAMETER["Central_Meridian",10],PARAMETER["Latitude_Of_Origin",52],'
        'UNIT["Meter",1],AUTHORITY["EPSG","3035"]]'
    ),
    # NAD83 / Conus Albers — the US national-extent equal-area grid
    5070: (
        'PROJCS["NAD_1983_Contiguous_USA_Albers",'
        'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
        'SPHEROID["GRS_1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Albers"],'
        'PARAMETER["False_Easting",0],PARAMETER["False_Northing",0],'
        'PARAMETER["Central_Meridian",-96],PARAMETER["Standard_Parallel_1",29.5],'
        'PARAMETER["Standard_Parallel_2",45.5],PARAMETER["Latitude_Of_Origin",23],'
        'UNIT["Meter",1],AUTHORITY["EPSG","5070"]]'
    ),
}

# --------------------------------------------- NAD83 State Plane (meters)
# The highest-traffic SPCS83 zones, both projection families (standard
# public SPCS83 parameters; serialization-only — identification
# round-trips through the AUTHORITY node regardless).
# Lambert Conformal Conic 2SP zones:
#   code -> (esri zone name, sp1, sp2, lat0, cm, false_e, false_n)
_SP_LCC: dict[int, tuple] = {
    # California zones I-VI (FIPS 0401-0406)
    26941: ("California_I_FIPS_0401", 41.6666666667, 40.0, 39.3333333333, -122.0, 2000000, 500000),
    26942: ("California_II_FIPS_0402", 39.8333333333, 38.3333333333, 37.6666666667, -122.0, 2000000, 500000),
    26943: ("California_III_FIPS_0403", 38.4333333333, 37.0666666667, 36.5, -120.5, 2000000, 500000),
    26944: ("California_IV_FIPS_0404", 37.25, 36.0, 35.3333333333, -119.0, 2000000, 500000),
    26945: ("California_V_FIPS_0405", 35.4666666667, 34.0333333333, 33.5, -118.0, 2000000, 500000),
    26946: ("California_VI_FIPS_0406", 33.8833333333, 32.7833333333, 32.1666666667, -116.25, 2000000, 500000),
    # Texas zones (FIPS 4201-4205)
    32137: ("Texas_North_FIPS_4201", 36.1833333333, 34.65, 34.0, -101.5, 200000, 1000000),
    32138: ("Texas_North_Central_FIPS_4202", 33.9666666667, 32.1333333333, 31.6666666667, -98.5, 600000, 2000000),
    32139: ("Texas_Central_FIPS_4203", 31.8833333333, 30.1166666667, 29.6666666667, -100.3333333333, 700000, 3000000),
    32140: ("Texas_South_Central_FIPS_4204", 30.2833333333, 28.3833333333, 27.8333333333, -99.0, 600000, 4000000),
    32141: ("Texas_South_FIPS_4205", 27.8333333333, 26.1666666667, 25.6666666667, -98.5, 300000, 5000000),
    # New York Long Island (FIPS 3104)
    32118: ("New_York_Long_Island_FIPS_3104", 41.0333333333, 40.6666666667, 40.1666666667, -74.0, 300000, 0),
    # Florida North (FIPS 0903)
    26960: ("Florida_North_FIPS_0903", 30.75, 29.5833333333, 29.0, -84.5, 600000, 0),
    # Washington (FIPS 4601-4602)
    32148: ("Washington_North_FIPS_4601", 48.7333333333, 47.5, 47.0, -120.8333333333, 500000, 0),
    32149: ("Washington_South_FIPS_4602", 47.3333333333, 45.8333333333, 45.3333333333, -120.5, 500000, 0),
    # round-7 growth: remaining high-traffic LCC zones
    # Pennsylvania (FIPS 3701-3702)
    32128: ("Pennsylvania_North_FIPS_3701", 41.95, 40.8833333333, 40.1666666667, -77.75, 600000, 0),
    32129: ("Pennsylvania_South_FIPS_3702", 40.9666666667, 39.9333333333, 39.3333333333, -77.75, 600000, 0),
    # Colorado (FIPS 0501-0503)
    26953: ("Colorado_North_FIPS_0501", 40.7833333333, 39.7166666667, 39.3333333333, -105.5, 914401.8289, 304800.6096),
    26954: ("Colorado_Central_FIPS_0502", 39.75, 38.45, 37.8333333333, -105.5, 914401.8289, 304800.6096),
    26955: ("Colorado_South_FIPS_0503", 38.4333333333, 37.2333333333, 36.6666666667, -105.5, 914401.8289, 304800.6096),
    # Ohio (FIPS 3401-3402)
    32122: ("Ohio_North_FIPS_3401", 41.7, 40.4333333333, 39.6666666667, -82.5, 600000, 0),
    32123: ("Ohio_South_FIPS_3402", 40.0333333333, 38.7333333333, 38.0, -82.5, 600000, 0),
    # Virginia (FIPS 4501-4502)
    32146: ("Virginia_North_FIPS_4501", 39.2, 38.0333333333, 37.6666666667, -78.5, 3500000, 2000000),
    32147: ("Virginia_South_FIPS_4502", 37.9666666667, 36.7666666667, 36.3333333333, -78.5, 3500000, 1000000),
    # North Carolina (FIPS 3200), Maryland (FIPS 1900)
    32119: ("North_Carolina_FIPS_3200", 36.1666666667, 34.3333333333, 33.75, -79.0, 609601.22, 0),
    26985: ("Maryland_FIPS_1900", 39.45, 38.3, 37.6666666667, -77.0, 400000, 0),
    # Massachusetts Mainland (FIPS 2001)
    26986: ("Massachusetts_Mainland_FIPS_2001", 42.6833333333, 41.7166666667, 41.0, -71.5, 200000, 750000),
    # Michigan (FIPS 2111-2113)
    26988: ("Michigan_North_FIPS_2111", 47.0833333333, 45.4833333333, 44.7833333333, -87.0, 8000000, 0),
    26989: ("Michigan_Central_FIPS_2112", 45.7, 44.1833333333, 43.3166666667, -84.3666666667, 6000000, 0),
    26990: ("Michigan_South_FIPS_2113", 43.6666666667, 42.1, 41.5, -84.3666666667, 4000000, 0),
    # Oregon (FIPS 3601-3602)
    32126: ("Oregon_North_FIPS_3601", 46.0, 44.3333333333, 43.6666666667, -120.5, 2500000, 0),
    32127: ("Oregon_South_FIPS_3602", 44.0, 42.3333333333, 41.6666666667, -120.5, 1500000, 0),
}
# Transverse Mercator zones:
#   code -> (esri zone name, lat0, cm, scale, false_e, false_n)
_SP_TM: dict[int, tuple] = {
    # New York East/Central/West (FIPS 3101-3103)
    32115: ("New_York_East_FIPS_3101", 38.8333333333, -74.5, 0.9999, 150000, 0),
    32116: ("New_York_Central_FIPS_3102", 40.0, -76.5833333333, 0.9999, 250000, 0),
    32117: ("New_York_West_FIPS_3103", 40.0, -78.5833333333, 0.9999, 350000, 0),
    # Florida East/West (FIPS 0901-0902)
    26958: ("Florida_East_FIPS_0901", 24.3333333333, -81.0, 0.999941177, 200000, 0),
    26959: ("Florida_West_FIPS_0902", 24.3333333333, -82.0, 0.999941177, 200000, 0),
    # round-7 growth: remaining high-traffic TM zones
    # Illinois (FIPS 1201-1202)
    26971: ("Illinois_East_FIPS_1201", 36.6666666667, -88.3333333333, 0.999975, 300000, 0),
    26972: ("Illinois_West_FIPS_1202", 36.6666666667, -90.1666666667, 0.999941177, 700000, 0),
    # Georgia (FIPS 1001-1002)
    26966: ("Georgia_East_FIPS_1001", 30.0, -82.1666666667, 0.9999, 200000, 0),
    26967: ("Georgia_West_FIPS_1002", 30.0, -84.1666666667, 0.9999, 700000, 0),
    # Arizona (FIPS 0201-0203)
    26948: ("Arizona_East_FIPS_0201", 31.0, -110.1666666667, 0.9999, 213360, 0),
    26949: ("Arizona_Central_FIPS_0202", 31.0, -111.9166666667, 0.9999, 213360, 0),
    26950: ("Arizona_West_FIPS_0203", 31.0, -113.75, 0.999933333, 213360, 0),
    # New Jersey (FIPS 2900)
    32111: ("New_Jersey_FIPS_2900", 38.8333333333, -74.5, 0.9999, 150000, 0),
}


def _stateplane_wkt(code: int) -> str:
    if code in _SP_LCC:
        zone, sp1, sp2, lat0, cm, fe, fn = _SP_LCC[code]
        return (
            f'PROJCS["NAD_1983_StatePlane_{zone}",'
            + _NAD83_GEOGCS
            + '],PROJECTION["Lambert_Conformal_Conic"],'
            f'PARAMETER["False_Easting",{fe}],PARAMETER["False_Northing",{fn}],'
            f'PARAMETER["Central_Meridian",{cm}],'
            f'PARAMETER["Standard_Parallel_1",{sp1}],'
            f'PARAMETER["Standard_Parallel_2",{sp2}],'
            f'PARAMETER["Latitude_Of_Origin",{lat0}],UNIT["Meter",1],'
            f'AUTHORITY["EPSG","{code}"]]'
        )
    zone, lat0, cm, k0, fe, fn = _SP_TM[code]
    return (
        f'PROJCS["NAD_1983_StatePlane_{zone}",'
        + _NAD83_GEOGCS
        + '],PROJECTION["Transverse_Mercator"],'
        f'PARAMETER["False_Easting",{fe}],PARAMETER["False_Northing",{fn}],'
        f'PARAMETER["Central_Meridian",{cm}],PARAMETER["Scale_Factor",{k0}],'
        f'PARAMETER["Latitude_Of_Origin",{lat0}],UNIT["Meter",1],'
        f'AUTHORITY["EPSG","{code}"]]'
    )


# name fragment (case/sep-insensitive) -> EPSG code, for authority-less
# .prj files; checked longest-first so Web-Mercator wins over its own
# embedded GCS_WGS_1984
_NAME_TABLE: list[tuple[str, int]] = [
    ("wgs1984webmercatorauxiliarysphere", 3857),
    ("wgs84pseudomercator", 3857),
    ("webmercator", 3857),
    ("britishnationalgrid", 27700),
    ("rgf1993lambert93", 2154),
    ("lambert93", 2154),
    ("etrs1989laea", 3035),
    ("laeaeurope", 3035),
    ("contiguoususaalbers", 5070),
    ("conusalbers", 5070),
    ("gcsnorthamerican1927", 4267),
    ("nad1927", 4267),
    ("nad27", 4267),
    ("gcsnorthamerican1983", 4269),
    ("nad83", 4269),
    ("gcsetrs1989", 4258),
    ("gcswgs1984", 4326),
    ("wgs84", 4326),
    ("wgs1984", 4326),
]

# state-plane fragments ("stateplanecaliforniaifips0401" matches both the
# Esri meter name and the _Feet variant's prefix); inserted at the front
# so the specific zone wins over the generic nad83 datum fragment
_NAME_TABLE[:0] = [
    ("stateplane" + re.sub(r"[^a-z0-9]", "", zone[0].lower()), code)
    for code, zone in list(_SP_LCC.items()) + list(_SP_TM.items())
]

_UTM_RE = re.compile(r"WGS[_ ]?1984[_ ]?UTM[_ ]?Zone[_ ]?(\d{1,2})([NS])", re.IGNORECASE)
_ETRS_UTM_RE = re.compile(r"ETRS[_ ]?(?:19)?89[_ ]?(?:/ )?UTM[_ ]?[Zz]one[_ ]?(\d{1,2})N", re.IGNORECASE)
_NAD83_UTM_RE = re.compile(r"NAD[_ ]?(?:19)?83[_ ]?(?:/ )?UTM[_ ]?[Zz]one[_ ]?(\d{1,2})N", re.IGNORECASE)

_ETRS89_GEOGCS = (
    'GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",'
    'SPHEROID["GRS_1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]'
)


_NAD83_GEOGCS = (
    'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
    'SPHEROID["GRS_1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]'
)


def _utm_wkt(code: int) -> str:
    if 25828 <= code <= 25838:  # ETRS89 / UTM zone N (European grids)
        zone = code - 25800
        geogcs, name = _ETRS89_GEOGCS, f"ETRS_1989_UTM_Zone_{zone}N"
        north = True
    elif 26901 <= code <= 26923:  # NAD83 / UTM zone N (North America)
        zone = code - 26900
        geogcs, name = _NAD83_GEOGCS, f"NAD_1983_UTM_Zone_{zone}N"
        north = True
    else:
        north = code < 32700
        zone = code - (32600 if north else 32700)
        geogcs, name = _WGS84_GEOGCS, f'WGS_1984_UTM_Zone_{zone}{"N" if north else "S"}'
    cm = zone * 6 - 183
    return (
        f'PROJCS["{name}",'
        + geogcs
        + '],PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000],'
        f'PARAMETER["False_Northing",{0 if north else 10000000}],'
        f'PARAMETER["Central_Meridian",{cm}],PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0],UNIT["Meter",1],'
        f'AUTHORITY["EPSG","{code}"]]'
    )


def epsg_from_wkt(wkt: str) -> int | None:
    """Identify the EPSG code of a WKT string (or an ``EPSG:<code>``
    spelling), None when unidentifiable. Mirrors GDAL's
    AutoIdentifyEPSG order: explicit authority first, then name."""
    if not wkt:
        return None
    s = wkt.strip()
    m = re.fullmatch(r"(?i)EPSG:(\d+)", s)
    if m:
        return int(m.group(1))
    # root authority: WKT1 AUTHORITY[...] / WKT2 ID[...] — the ROOT node's
    # is serialized last in well-formed WKT, so take the final match
    auth = re.findall(r'(?:AUTHORITY|ID)\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', s)
    if auth:
        return int(auth[-1])
    m = _UTM_RE.search(s)
    if m:
        zone = int(m.group(1))
        if 1 <= zone <= 60:
            return (32600 if m.group(2).upper() == "N" else 32700) + zone
    m = _ETRS_UTM_RE.search(s)
    if m:
        zone = int(m.group(1))
        if 28 <= zone <= 38:
            return 25800 + zone
    m = _NAD83_UTM_RE.search(s)
    if m:
        zone = int(m.group(1))
        if 1 <= zone <= 23:
            return 26900 + zone
    # name match on the ROOT name (first quoted string)
    nm = re.search(r'^\s*\w+\s*\[\s*"([^"]*)"', s)
    if nm:
        flat = re.sub(r"[^a-z0-9]", "", nm.group(1).lower())
        for frag, code in _NAME_TABLE:
            if frag in flat:
                return code
    return None


def crs_to_epsg(crs) -> int | None:
    """Any accepted CRS spelling -> EPSG code or None."""
    if crs is None:
        return None
    if isinstance(crs, (int,)):
        return int(crs)
    return epsg_from_wkt(str(crs))


def crs_to_wkt(crs) -> str:
    """Any accepted CRS spelling -> WKT to persist (e.g. into a .prj).
    WKT input passes through unchanged; EPSG codes get the full known
    definition or the identification-only skeleton."""
    if crs is None:
        crs = 4326
    if isinstance(crs, str) and "[" in crs:
        return crs  # already WKT
    code = crs_to_epsg(crs)
    if code is None:
        raise ValueError(f"cannot interpret crs {crs!r} (want int EPSG, 'EPSG:n', or WKT)")
    if code in WKT_BY_EPSG:
        return WKT_BY_EPSG[code]
    if (
        32601 <= code <= 32660
        or 32701 <= code <= 32760
        or 25828 <= code <= 25838
        or 26901 <= code <= 26923
    ):
        return _utm_wkt(code)
    if code in _SP_LCC or code in _SP_TM:
        return _stateplane_wkt(code)
    # identification-only skeleton: round-trips the code through every
    # format reader; full parameters need a PROJ database (module doc)
    return f'LOCAL_CS["EPSG:{code}",UNIT["Meter",1],AUTHORITY["EPSG","{code}"]]'


def display_crs(wkt_or_code) -> str | None:
    """Reader-side convention (reference get_crs parity): ``EPSG:<code>``
    when identifiable, else the raw WKT."""
    if wkt_or_code is None:
        return None
    if isinstance(wkt_or_code, int):
        return f"EPSG:{wkt_or_code}"
    code = epsg_from_wkt(str(wkt_or_code))
    return f"EPSG:{code}" if code is not None else str(wkt_or_code)


def crs_to_projjson(crs) -> dict | None:
    """Reduced PROJJSON for Arrow geometry-field metadata (the
    ``geoarrow.wkb`` extension the reference's ``ogr_open_arrow``
    attaches for GDAL >= 3.8, _io.pyx:2145-2151; consumers read
    ``crs.id.authority``/``crs.id.code`` — tests/test_arrow.py:290-296).
    Full PROJJSON parameter trees need a PROJ database (module doc);
    name + authority identification round-trips the code, which is the
    contract the extension exists for."""
    code = crs_to_epsg(crs)
    if code is None:
        return None
    wkt = crs_to_wkt(code)
    kind = (
        "GeographicCRS"
        if wkt.lstrip().upper().startswith("GEOGCS")
        else "ProjectedCRS"
    )
    name = wkt.split('"', 2)[1] if '"' in wkt else f"EPSG:{code}"
    return {
        "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
        "type": kind,
        "name": name,
        "id": {"authority": "EPSG", "code": int(code)},
    }
