"""Ship this package to Python workers.

mapInPandas / UDF closures reference modules of this package; executors
(and even local-mode Python workers when the driver was launched from a
different cwd) must be able to import them. ``ensure_shipped`` zips the
package once per SparkContext and registers it with ``addPyFile`` —
the same mechanism spark-submit --py-files uses, so it is cluster-safe.
Every operator that runs Python worker code calls it first.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_insurance_helper_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"insurance_helper_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, parent))
    try:
        sc.addPyFile(zpath)
    except Exception:
        # already registered under this name in this context — fine
        pass
    setattr(sc, _FLAG, True)
