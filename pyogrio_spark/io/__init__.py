from pyogrio_spark.io.reader import (  # noqa: F401
    list_layers,
    read_bounds,
    read_info,
    read_table,
)
from pyogrio_spark.io.writer import read_committed, write_table  # noqa: F401
