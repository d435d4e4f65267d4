from pyogrio_spark.geometry.wkb import (  # noqa: F401
    GEOM_TYPE_NAMES,
    bounds,
    bounds_many,
    decode_points,
    encode_linestring,
    encode_multipolygon,
    encode_point,
    encode_points,
    encode_polygon,
    geom_type_name,
    parse_wkb,
)
from pyogrio_spark.geometry.predicates import (  # noqa: F401
    PreparedPolygon,
    points_in_polygon,
    seg_intersects_box,
)
