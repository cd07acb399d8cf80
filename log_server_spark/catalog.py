"""Parquet-directory warehouse.

The production design point is an Iceberg catalog (atomic snapshot commits,
file-level stats pruning, ``rewrite_data_files`` compaction — see SURVEY.md
§1.5). This container ships no Iceberg runtime jar, so tables are plain
parquet directories behind the same narrow interface; swapping
``format="iceberg"`` in is a config change, not a redesign. Semantics we rely
on (append-only writes + idempotence via the lineage protocol in
plans/pipeline.py) hold for both backends.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        for _dirpath, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)
