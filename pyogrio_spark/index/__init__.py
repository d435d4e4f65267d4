from pyogrio_spark.index.grid import (  # noqa: F401
    MAX_RES,
    cell_bounds,
    cell_expr_sql,
    cell_of,
    cell_res,
    cell_to_xy,
    cell_width_deg,
    children,
    cover_bbox,
    disk,
    parent,
    xy_to_cell,
)
