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

    def write_small(self, rows: list[tuple], schema_ddl: str, name: str) -> None:
        """Append a tiny table (lineage/metrics rows) driver-side via pyarrow.

        A 2-row bookkeeping append costs ~3 s as a Spark job in local mode
        (job scheduling + committer); pyarrow writes it in milliseconds. The
        files are plain parquet parts, so ``read`` sees them like any other.
        """
        import time as _time

        import pyarrow as pa
        import pyarrow.parquet as pq

        _TYPES = {
            "string": pa.string(),
            "long": pa.int64(),
            "double": pa.float64(),
            "timestamp": pa.timestamp("us", tz="UTC"),
        }
        fields = []
        for part in schema_ddl.split(","):
            col, typ = part.strip().rsplit(" ", 1)
            fields.append(pa.field(col, _TYPES[typ]))
        schema = pa.schema(fields)
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        tbl = pa.table({f.name: pa.array(list(c), f.type) for f, c in zip(schema, cols)})
        d = self.path(name)
        os.makedirs(d, exist_ok=True)
        fn = os.path.join(d, f"part-{_time.time_ns():020d}.parquet")
        pq.write_table(tbl, fn)

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)
