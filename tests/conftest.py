"""Shared test setup: grid-file resolution.

Mirrors the reference's own test harness, which stages select grids from
``data/tests/`` under their production names before running gie
(reference data/CMakeLists.txt:77-105 — e.g. ``egm96_15_downsampled.gtx``
is installed as ``egm96_15.gtx`` and ``ntv2_0_downsampled.gsb`` as
``ntv2_0.gsb`` in the ``for_tests`` directory).
"""

import os

_REF_DATA = "/root/reference/data"

if "PROJ_SPARK_GRID_PATH" not in os.environ and os.path.isdir(_REF_DATA):
    os.environ["PROJ_SPARK_GRID_PATH"] = (
        os.path.join(_REF_DATA, "tests") + ":" + _REF_DATA)

from proj_spark.gridfiles import register_grid_file  # noqa: E402

for _name, _file in (("egm96_15.gtx", "egm96_15_downsampled.gtx"),
                     ("ntv2_0.gsb", "ntv2_0_downsampled.gsb")):
    _p = os.path.join(_REF_DATA, "tests", _file)
    if os.path.isfile(_p):
        register_grid_file(_name, _p)
