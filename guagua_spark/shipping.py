"""Runtime package shipping: make ``guagua_spark`` importable inside
executor Python workers regardless of how the SparkSession was built.

The engine's worker closures and the operators' pandas UDFs reference
module-level symbols, which pickle BY REFERENCE — the worker process
must be able to ``import guagua_spark``. Exporting PYTHONPATH works only
if done BEFORE the JVM forks (our ``get_spark`` does); a host
application that built its own session first would get
ModuleNotFoundError on the first task. ``sc.addPyFile`` works at any
point: the zip is shipped to every current and future executor and
prepended to the worker's sys.path. On a real cluster this is also
exactly how you deploy this package (--py-files equivalent).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_guagua_spark_shipped"


def ensure_shipped(sc) -> None:
    """Idempotently ship the guagua_spark package to executors."""
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"guagua_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _, files in os.walk(pkg_dir):
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        z.write(full, os.path.relpath(full, parent))
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_ATTR, True)
