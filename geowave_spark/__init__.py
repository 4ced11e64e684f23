"""geowave_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Capability parity target: aniroodh-ravikumar/geowave (LocationTech GeoWave
fork); see SURVEY.md for the blueprint and file:line citations.  Everything
here is DataFrame/SQL-first: cell keys are Column bit arithmetic
(sqlcells.py), exact geometry refinement is Arrow-batched pandas UDFs
(functions/geo_udfs.py), and the operators compose Catalyst-optimizable
plans (operators/*).
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the package must not pull pyspark.ml etc. eagerly
    if name == "SpatialFrame":
        from .api import SpatialFrame

        return SpatialFrame
    raise AttributeError(name)
