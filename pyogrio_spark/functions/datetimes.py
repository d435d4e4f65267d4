"""Datetime parsing helpers mirroring the reference's read semantics.

pyogrio reads datetimes as ISO strings first and then parses, keeping
ms precision and normalizing mixed UTC offsets
(/root/reference/pyogrio/geopandas.py:44-135: _try_parse_datetime —
mixed-offset columns either convert to UTC (default) or stay strings;
sub-ms is rounded to ms, geopandas.py:126-133).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_iso_datetime_utc(col: str) -> Column:
    """ISO8601 string with any fixed offset -> UTC timestamp (the
    reference's mixed_offsets_as_utc=True default)."""
    return F.to_timestamp(F.col(col), "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX")


def parse_iso_datetime_naive(col: str) -> Column:
    """Offset-less ISO8601 string -> naive (NTZ) timestamp."""
    return F.to_timestamp(F.col(col), "yyyy-MM-dd'T'HH:mm:ss[.SSS]").cast("timestamp_ntz")


def truncate_to_ms(col: str) -> Column:
    """GDAL keeps millisecond precision; sub-ms is dropped
    (/root/reference/pyogrio/geopandas.py:126-133)."""
    ts = F.col(col).cast("timestamp")
    us = F.unix_micros(ts)
    return F.timestamp_micros((us / 1000).cast("bigint") * 1000)


_OFFSET_RE = r"(Z|[+-]\d{2}:?\d{2})$"
_ISO_SPACE_RE = r"^(\d{4}-\d{2}-\d{2}) "


def try_parse_datetime_column(
    df: DataFrame,
    col: str,
    datetime_as_string: bool = False,
    mixed_offsets_as_utc: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Column-level mirror of the reference's ``_try_parse_datetime``
    decision matrix (/root/reference/pyogrio/geopandas.py:44-135) for a
    STRING column of ISO-ish datetimes:

    - ``datetime_as_string``: normalized ISO strings ('T' separator),
      no parsing;
    - any unparseable value: the original strings come back unchanged
      (reference warns and returns the input series);
    - mixed UTC offsets + ``mixed_offsets_as_utc`` (default): one UTC
      instant column (TIMESTAMP);
    - mixed offsets, ``mixed_offsets_as_utc=False``: original strings —
      Spark's analogue of the reference's object-dtype datetimes (no
      per-row tz exists in a TIMESTAMP column);
    - single shared offset: TIMESTAMP (UTC instant);
    - all offset-less: naive TIMESTAMP_NTZ.

    Results are truncated to millisecond precision (GDAL's limit,
    reference geopandas.py:126-133). Costs ONE columnar aggregate to
    classify the column — a single pass, fine at any scale.
    """
    out_col = out_col or col
    s = F.col(col)
    norm = F.regexp_replace(s, _ISO_SPACE_RE, "$1T")
    if datetime_as_string:
        return df.withColumn(out_col, norm)

    off = F.regexp_extract(norm, _OFFSET_RE, 1)
    parsed = norm.try_cast("timestamp")  # ISO8601 with optional offset/fraction; NULL on malformed (ANSI-safe)
    stats = df.agg(
        F.count_distinct(F.when(s.isNotNull(), F.when(off == "", F.lit("<naive>")).otherwise(off))).alias("n_off"),
        F.max(F.when(s.isNotNull() & parsed.isNull(), 1).otherwise(0)).alias("any_bad"),
        F.max(F.when(off != "", 1).otherwise(0)).alias("any_aware"),
    ).first()
    if stats["any_bad"]:
        import warnings

        warnings.warn(f"Error parsing datetimes in column {col!r}, original strings are returned", stacklevel=2)
        return df.withColumn(out_col, s)
    mixed = (stats["n_off"] or 0) > 1
    if mixed and not mixed_offsets_as_utc:
        return df.withColumn(out_col, s)
    if stats["any_aware"] or mixed:
        # UTC instants (naive rows in a mixed column read as UTC, like
        # pandas to_datetime(utc=True))
        return df.withColumn(out_col, F.date_trunc("MILLISECOND", parsed))
    # all naive -> NTZ; ms-truncate on the string (date_trunc would
    # coerce NTZ back to TIMESTAMP)
    ms = F.regexp_replace(norm, r"(\.\d{3})\d+", "$1")
    return df.withColumn(out_col, ms.try_cast("timestamp_ntz"))


def datetimes_as_strings(df: DataFrame, cols: list[str], fmt: str = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX") -> DataFrame:
    """The write-side ``datetime_as_string`` behavior: keep offsets as
    ISO strings rather than forcing a single zone
    (/root/reference/pyogrio/geopandas.py:376-399)."""
    for c in cols:
        df = df.withColumn(c, F.date_format(F.col(c), fmt))
    return df
