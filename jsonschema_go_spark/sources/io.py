"""TableIO — thin storage seam so Iceberg is a config swap (SURVEY.md §7).

The north rule targets Iceberg tables; this sandbox has plain parquet. All
reads/writes go through this seam:

- ``format="iceberg"`` → ``spark.read.format("iceberg").load(name)``,
  appends via ``writeTo(name).append()``, snapshot ids available for drift
  pairs;
- ``format="parquet"`` (sandbox default) → path-based parquet with an
  append mode fallback.

Nothing else in the engine knows which one is active.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableIO:
    spark: SparkSession
    format: str = "parquet"  # or "iceberg"
    base_path: Optional[str] = None  # parquet root; ignored for iceberg

    def _path(self, name: str) -> str:
        if self.base_path is None:
            return name
        return f"{self.base_path.rstrip('/')}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.format == "iceberg":
            return self.spark.read.format("iceberg").load(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        try:
            self.read(name).schema
            return True
        except Exception:
            return False

    def append(self, df: DataFrame, name: str, partition_by: Optional[list] = None) -> None:
        if self.format == "iceberg":
            df.writeTo(name).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def delete_partition(self, name: str, col: str, value) -> None:
        """Idempotent-resume primitive: drop one partition's output so a
        re-processed bucket never appends duplicates (at-least-once → exactly-
        once per bucket). No-op when the table/partition doesn't exist."""
        if self.format == "iceberg":
            # honor the no-op contract on a fresh run: the output table does
            # not exist before the first bucket's append
            if not self.spark.catalog.tableExists(name):
                return
            self.spark.sql(f"DELETE FROM {name} WHERE {col} = {value}")
            return
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(f"{self._path(name)}/{col}={value}")
        fs = p.getFileSystem(hconf)
        if fs.exists(p):
            fs.delete(p, True)

    def overwrite(self, df: DataFrame, name: str, partition_by: Optional[list] = None) -> None:
        if self.format == "iceberg":
            df.writeTo(name).createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))
