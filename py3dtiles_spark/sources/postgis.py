"""PostGIS feature source (S6, reference export.py:232-270).

The reference pulls centered, X-rotated WKB + area weight straight from
PostGIS:

    SELECT ST_AsBinary(ST_RotateX(ST_Translate(geom, -cx, -cy, -cz), -pi/2)),
           ST_Area(ST_Force2D(geom)) AS weight
    FROM <table> ORDER BY weight DESC            (export.py:244,254-257)

Spark-first equivalent: a JDBC predicate-pushdown scan that keeps the
geometry transform IN the database (ST_* runs where the index lives) and
replaces the global ORDER BY with the engine's per-cell window rank
(operators/export.py assign_quadtree) — a total order is pointless at
10^12 rows and the greedy rule only needs per-cell order.

Requires the PostgreSQL JDBC driver on the Spark classpath
(--jars postgresql-*.jar); this sandbox has no database, so the module is
import-safe and integration is covered by the parquet path of the export
CLI (same downstream operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the source's output contract — what every downstream operator
# (triangulate_features -> assign_quadtree -> build_b3dm_tiles) consumes;
# the recorded-fixture test (tests/test_postgis_fixture.py) pins it
POSTGIS_SCHEMA = "geom_id long, wkb binary, weight double"


def postgis_subquery(table: str, geometry_column: str,
                     id_column: str) -> str:
    """The pushed-down subquery: the reference's exact server-side chain
    (export.py:244,254-257) — translate every geometry to the collection's
    min 3D extent, rotate X by -pi/2, emit WKB + 2D area weight."""
    offset = f"(SELECT ST_3DExtent({geometry_column}) FROM {table})"
    return f"""(
        SELECT {id_column} AS geom_id,
               ST_AsBinary(ST_RotateX(ST_Translate({geometry_column},
                   -ST_XMin(bb.b), -ST_YMin(bb.b), -ST_ZMin(bb.b)),
                   -pi()/2)) AS wkb,
               ST_Area(ST_Force2D({geometry_column})) AS weight
        FROM {table}, (SELECT {offset} AS b) bb
    ) AS src"""


def postgis_features(spark: SparkSession, jdbc_url: str, table: str,
                     geometry_column: str, id_column: str,
                     properties: dict | None = None,
                     num_partitions: int = 64) -> DataFrame:
    """-> (geom_id, wkb, weight) ready for triangulate_features.

    The subquery computes the reference's exact transform chain; partition
    the read on the id column so all executors pull in parallel (the
    reference reads on one connection)."""
    sub = postgis_subquery(table, geometry_column, id_column)
    reader = (spark.read.format("jdbc")
              .option("url", jdbc_url)
              .option("dbtable", sub)
              .option("partitionColumn", "geom_id")
              .option("numPartitions", str(num_partitions)))
    if properties:
        for k, v in properties.items():
            reader = reader.option(k, v)
    bounds = (spark.read.format("jdbc").option("url", jdbc_url)
              .option("query",
                      f"SELECT min({id_column}) lo, max({id_column}) hi "
                      f"FROM {table}")
              .options(**(properties or {})).load().collect()[0])
    return (reader.option("lowerBound", str(bounds.lo))
            .option("upperBound", str(bounds.hi + 1)).load())
