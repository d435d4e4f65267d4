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


def datetimes_as_strings(df: DataFrame, cols: list[str], fmt: str = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX") -> DataFrame:
    """The write-side ``datetime_as_string`` behavior: keep offsets as
    ISO strings rather than forcing a single zone
    (/root/reference/pyogrio/geopandas.py:376-399)."""
    for c in cols:
        df = df.withColumn(c, F.date_format(F.col(c), fmt))
    return df
