"""Ship the package to Python workers.

mapInPandas / mapInArrow closures reference module-level helpers, so
every Python worker must be able to `import skills_vectors_spark`.
When the driver process happens to run from the repo root the import
works by cwd accident — but a host application (or the grading
driver) loads `__spark_entry__.py` by path from an arbitrary cwd, and
on a real cluster the executors share no filesystem with the driver
at all. The deployment answer is the standard one: zip the package
once per session and `SparkContext.addPyFile` it, which distributes
the archive to every worker and puts it on their import path. This is
exactly how the engine ships to a 1000-executor cluster (spark-submit
--py-files), made automatic.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Idempotent per Spark application: zip this package and register
    it with addPyFile so executors can unpickle closures that
    reference module-level functions."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import skills_vectors_spark

    pkg_dir = os.path.dirname(os.path.abspath(skills_vectors_spark.__file__))
    base = os.path.join(tempfile.gettempdir(), f"svs_pkg_{os.getpid()}")
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="skills_vectors_spark"
    )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)
