"""Index aliases: atomic serving-pointer indirection over catalogs.

The Elasticsearch alias / Iceberg current-snapshot-pointer pattern: a
rebuild writes a NEW catalog directory, validates it, then atomically
swaps the alias — readers opened before the swap keep their pinned root
(snapshot isolation: a catalog's tables are immutable once its build
stages complete), readers opened after resolve the new generation.
Rollback is the same swap in reverse; nothing is copied or deleted.

The alias itself is a JSON pointer file updated via the
write-temp-then-``os.replace`` idiom — atomic on POSIX, the same
durability contract the stage manifests use (catalog.py
write_manifest). On an object store this file is the Iceberg
``version-hint``/metadata-pointer seam.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from .catalog import IndexCatalog


def set_alias(alias_path: str, target_dir: str) -> None:
    """Point ``alias_path`` at ``target_dir`` atomically. The previous
    target (if any) is preserved in the pointer history for audit /
    rollback tooling."""
    target_dir = os.path.abspath(target_dir)
    if not os.path.isdir(target_dir):
        raise FileNotFoundError(f"alias target is not a directory: {target_dir}")
    history = []
    if os.path.exists(alias_path):
        with open(alias_path) as f:
            prev = json.load(f)
        history = (prev.get("history") or [])[-9:]
        history.append(
            {"target": prev["target"], "replaced_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        )
    os.makedirs(os.path.dirname(os.path.abspath(alias_path)), exist_ok=True)
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"target": target_dir, "history": history}, f, indent=2)
    os.replace(tmp, alias_path)


def resolve_alias(alias_path: str) -> str:
    """Current target directory of the alias."""
    with open(alias_path) as f:
        return json.load(f)["target"]


def open_alias(spark: SparkSession, alias_path: str) -> IndexCatalog:
    """Open the catalog the alias CURRENTLY points at. The returned
    catalog pins the resolved root — a later swap does not retarget it
    (snapshot isolation for in-flight readers; a WandSession opened over
    it keeps serving the old generation until reopened)."""
    return IndexCatalog(spark, resolve_alias(alias_path))
