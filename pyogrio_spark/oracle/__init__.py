from pyogrio_spark.oracle.geo_oracle import (  # noqa: F401
    oracle_bbox_filter,
    oracle_knn,
    oracle_mask_filter,
    oracle_pip_join,
    oracle_range_join,
    oracle_tiles,
    oracle_zonal,
)
