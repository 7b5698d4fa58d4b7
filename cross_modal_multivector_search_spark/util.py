"""Worker-import insurance.

Arrow UDF closures reference this package by module name; Spark's Python
workers import it on their side. When the driving process runs from a
different cwd without PYTHONPATH pointing here, that import fails with
ModuleNotFoundError. ``ensure_workers_can_import`` ships a zip of the
package via ``sc.addPyFile`` (idempotent per SparkContext) so workers
can always resolve it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, path = tempfile.mkstemp(suffix=".zip", prefix="cmms_spark_")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)


# One sc.broadcast per (session, payload object): the gemm/search
# operators broadcast their driver-resident handles (index, pre-fetched
# query matrices) on EVERY invocation, which re-pickles megabytes and
# mints a new broadcast id each call — reused Python workers then
# unpickle the identical value once per id instead of once per process.
# Caching by object identity (the payloads are themselves cached for
# process lifetime: _INDEX_CACHE / _QSETS_CACHE / _QVECS_CACHE) makes
# repeated searches reuse one broadcast id end-to-end. The payload is
# pinned in the entry so a recycled id() can never alias a new object.
# Bounded FIFO (r16): a library caller looping over FRESH payload
# tuples mints a new entry per call; past the bound the oldest entries
# are dropped, Python GC releases the payload+Broadcast pair, and
# Spark's ContextCleaner unpersists the executor blocks (explicit
# unpersist here could break a still-cached plan whose closure holds
# the Broadcast). The engine's own long-lived payloads number ~10.
_BC_CACHE: dict[tuple, tuple] = {}
_BC_CACHE_MAX = 64


def cached_broadcast(spark: SparkSession, obj):
    key = (spark.sparkContext.applicationId, id(obj))
    hit = _BC_CACHE.get(key)
    if hit is not None and hit[0] is obj:
        return hit[1]
    bc = spark.sparkContext.broadcast(obj)
    if hit is None and len(_BC_CACHE) >= _BC_CACHE_MAX:
        _BC_CACHE.pop(next(iter(_BC_CACHE)))
    _BC_CACHE[key] = (obj, bc)
    return bc
