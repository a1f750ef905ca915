"""Ship the pure-Python package to executors (spark-submit --py-files
equivalent, done programmatically so any SparkSession works).

The north rule mandates a ``spark-submit --py-files`` deploy shape —
a single pure-Python zip, no JVM artifacts.  :func:`ship_package`
builds that zip on demand and registers it with the active
SparkContext so UDF workers can ``import spapy_spark`` regardless of
the driver's cwd/PYTHONPATH.  Idempotent per context.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_FLAG = "_spapy_spark_shipped"


def build_zip(dest_dir: str | None = None) -> str:
    """Zip the spapy_spark package; returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if dest_dir is None:
        dest_dir = tempfile.mkdtemp(prefix="spapy_zip_")
    path = os.path.join(dest_dir, "spapy_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return path


def ship_package(spark) -> None:
    """Make spapy_spark importable on executors (idempotent)."""
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _FLAG, True)
