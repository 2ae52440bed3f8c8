"""Self-shipping: make `diagon_spark` importable on executor Python workers.

On a real cluster the package ships via `spark-submit --py-files
diagon_spark.zip` (north_rule). For ad-hoc drivers (notebooks, scripts run
from any cwd) the public entry points call ensure_shipped(), which zips
the installed package once per session and registers it with
SparkContext.addPyFile — the idiomatic PySpark dependency mechanism.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         f"diagon_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zpath)
    _shipped.add(key)
