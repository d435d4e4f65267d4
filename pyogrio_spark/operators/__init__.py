from pyogrio_spark.operators.spatial_join import point_in_polygon_join, zones_cell_cover  # noqa: F401
from pyogrio_spark.operators.knn import knn_join  # noqa: F401
from pyogrio_spark.operators.range_join import bbox_range_join  # noqa: F401
from pyogrio_spark.operators.zonal import zonal_stats  # noqa: F401
from pyogrio_spark.operators.tiling import adaptive_tiles, assign_tiles  # noqa: F401
