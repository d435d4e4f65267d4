from pyogrio_spark.functions.geo import (  # noqa: F401
    bounds_columns,
    cell_id_column,
    geom_type_column,
    point_lonlat_columns,
    span_digest,
)
