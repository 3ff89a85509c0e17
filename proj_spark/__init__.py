"""proj_spark — a PySpark-native cartographic transform + spatial-join/tiling
engine with the query capabilities of PROJ (see SURVEY.md)."""

from .crs import create, create_crs_to_crs  # noqa: F401
from .ops import available_ops, create_operator, Pipeline  # noqa: F401

__version__ = "0.1.0"
