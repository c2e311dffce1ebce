"""spark-submit --py-files packaging (BASELINE.json:6 'Packaged for
spark-submit --py-files') + in-session equivalent.

``make_pyfiles_zip`` produces the zip you pass to
``spark-submit --py-files``; ``ensure_importable`` does the same thing
for an already-running session (driver notebooks, the graft driver's
entry harness) via ``sc.addPyFile`` — without it, Python workers
unpickling our pandas-UDF closures raise ModuleNotFoundError when the
driver wasn't launched from the repo root (observed in verification).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession

_REPO = pathlib.Path(__file__).resolve().parent.parent
_PACKAGES = ("engine", "oracle", "fixtures")
_marker_attr = "_search_engine_spark_pyfiles"


def make_pyfiles_zip(out_path: str | None = None) -> str:
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "search_engine_spark_pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in _PACKAGES:
            root = _REPO / pkg
            for p in sorted(root.rglob("*")):
                if p.suffix in (".py", ".json") and "__pycache__" not in p.parts:
                    z.write(p, p.relative_to(_REPO))
    return out_path


def ensure_importable(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _marker_attr, False):
        return
    sc.addPyFile(make_pyfiles_zip())
    setattr(sc, _marker_attr, True)
