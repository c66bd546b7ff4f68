"""Resumable pipeline runner — snapshot checkpoints + per-partition
lineage and metrics (north rule; no reference analogue, the reference
is single-process — SURVEY.md §7.4).

Storage is a parquet + atomic-manifest catalog (Iceberg-style commit
semantics without requiring the Iceberg runtime jar: data files land
first, the snapshot manifest JSON is renamed into place last, so a
snapshot is visible iff fully written).  Resume = skip every stage
whose output snapshot for this run_id is committed.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotCatalog:
    """Tables as directories of snapshots; manifest rename = commit."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _mdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifests")

    def snapshots(self, table: str) -> List[dict]:
        mdir = self._mdir(table)
        if not os.path.isdir(mdir):
            return []
        out = []
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def latest(self, table: str) -> Optional[dict]:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    def write(self, df: DataFrame, table: str, meta: Optional[dict] = None) -> dict:
        snap_id = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self._tdir(table), f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(data_dir)
        rows = df.sparkSession.read.parquet(data_dir).count()
        manifest = {
            "snapshot_id": snap_id,
            "table": table,
            "path": data_dir,
            "rows": rows,
            "schema": df.schema.simpleString(),
            "created_ms": int(time.time() * 1000),
            "meta": meta or {},
        }
        mdir = self._mdir(table)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".{snap_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(mdir, f"{snap_id}.json"))  # commit point
        return manifest

    def read(self, spark: SparkSession, table: str, snapshot_id: Optional[str] = None) -> DataFrame:
        if snapshot_id is None:
            m = self.latest(table)
            if m is None:
                raise FileNotFoundError(f"no committed snapshot for {table}")
        else:
            m = next(s for s in self.snapshots(table) if s["snapshot_id"] == snapshot_id)
        return spark.read.parquet(m["path"])

    # -- lineage ---------------------------------------------------------
    def append_lineage(self, spark: SparkSession, rows: List[dict]):
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(rows))
        ldir = os.path.join(self.root, "_lineage")
        df.coalesce(1).write.mode("append").parquet(ldir)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "_lineage"))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergCatalog:
    """Same catalog interface over real Iceberg tables (used when the
    runtime jar is present — a cluster deployment; the sandbox has no
    jar, so this path is exercised only by interface tests there).

    Requires a configured Spark catalog, e.g.:
      spark.sql.catalog.geospark = org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.geospark.type = hadoop
      spark.sql.catalog.geospark.warehouse = <root>
    Snapshot ids come from Iceberg's own metadata tables; `write` is an
    atomic replace commit; `merge_amend` is the cluster-scale analogue
    of gpkg amend (gpkg.clj:1148-1374) via MERGE INTO.
    """

    def __init__(self, spark: SparkSession, catalog_name: str = "geospark",
                 namespace: str = "pipeline"):
        self.spark = spark
        self.cat = catalog_name
        self.ns = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.cat}.{self.ns}")

    def _fq(self, table: str) -> str:
        return f"{self.cat}.{self.ns}.{table}"

    def snapshots(self, table: str) -> List[dict]:
        try:
            rows = self.spark.sql(
                f"SELECT snapshot_id, committed_at FROM {self._fq(table)}.snapshots "
                "ORDER BY committed_at"
            ).collect()
        except Exception:
            return []
        return [
            {"snapshot_id": str(r["snapshot_id"]), "table": table,
             "created_ms": int(r["committed_at"].timestamp() * 1000), "meta": {}}
            for r in rows
        ]

    def latest(self, table: str) -> Optional[dict]:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    def write(self, df: DataFrame, table: str, meta: Optional[dict] = None) -> dict:
        df.writeTo(self._fq(table)).using("iceberg").createOrReplace()
        m = self.latest(table)
        m = dict(m or {})
        m["rows"] = self.spark.table(self._fq(table)).count()
        m["meta"] = meta or {}
        return m

    def read(self, spark: SparkSession, table: str,
             snapshot_id: Optional[str] = None) -> DataFrame:
        if snapshot_id is None:
            return spark.table(self._fq(table))
        return spark.read.option("snapshot-id", snapshot_id).table(self._fq(table))

    def merge_amend(self, df: DataFrame, table: str, key: str, set_cols: List[str]):
        """MERGE INTO join-update (cluster-scale amend semantics)."""
        df.createOrReplaceTempView("__amend_src")
        sets = ", ".join(f"t.{c} = s.{c}" for c in set_cols)
        cols = ", ".join([key] + set_cols)
        vals = ", ".join(f"s.{c}" for c in [key] + set_cols)
        self.spark.sql(
            f"MERGE INTO {self._fq(table)} t USING __amend_src s ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )

    def append_lineage(self, spark: SparkSession, rows: List[dict]):
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(rows))
        df.writeTo(self._fq("_lineage")).using("iceberg").createOrReplace() \
            if self.latest("_lineage") is None else df.writeTo(self._fq("_lineage")).append()

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.table(self._fq("_lineage"))


def catalog_for(spark: SparkSession, root: str, prefer_iceberg: bool = True):
    """Engine-native storage selection (SURVEY §7.1): real Iceberg when
    the runtime jar + a configured catalog exist, else the parquet +
    atomic-manifest fallback with the same commit semantics."""
    if prefer_iceberg and iceberg_available(spark):
        cat = spark.conf.get("spark.sql.catalog.geospark", None)
        if cat is not None:
            return IcebergCatalog(spark)
    return SnapshotCatalog(root)


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, Dict[str, DataFrame]], DataFrame]


class Pipeline:
    """Ordered stages; each commits `{run_id}__{stage}` and appends
    per-partition lineage (run_id, stage, partition_id, rows, wall_ms,
    snapshot_id).  Re-running the same run_id resumes after the last
    committed stage."""

    def __init__(self, spark: SparkSession, catalog: SnapshotCatalog, run_id: str):
        self.spark = spark
        self.catalog = catalog
        self.run_id = run_id
        self.stages: List[Stage] = []

    def stage(self, name: str, fn) -> "Pipeline":
        self.stages.append(Stage(name, fn))
        return self

    def _table(self, stage_name: str) -> str:
        return f"{self.run_id}__{stage_name}"

    def run(self, verbose: bool = True) -> Dict[str, DataFrame]:
        outputs: Dict[str, DataFrame] = {}
        for st in self.stages:
            table = self._table(st.name)
            existing = self.catalog.latest(table)
            if existing is not None:
                if verbose:
                    print(f"[pipeline] resume: skipping committed stage {st.name} "
                          f"(snapshot {existing['snapshot_id']}, {existing['rows']} rows)")
                outputs[st.name] = self.catalog.read(self.spark, table)
                continue
            t0 = time.time()
            df = st.fn(self.spark, outputs)
            manifest = self.catalog.write(df, table, meta={"run_id": self.run_id, "stage": st.name})
            wall_ms = int((time.time() - t0) * 1000)
            committed = self.catalog.read(self.spark, table)
            per_part = (
                committed.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("rows_out"))
                .collect()
            )
            self.catalog.append_lineage(
                self.spark,
                [
                    {
                        "run_id": self.run_id,
                        "stage": st.name,
                        "partition_id": int(r["partition_id"]),
                        "rows_out": int(r["rows_out"]),
                        "wall_ms": wall_ms,
                        "snapshot_id": manifest["snapshot_id"],
                    }
                    for r in per_part
                ],
            )
            if verbose:
                print(f"[pipeline] stage {st.name}: {manifest['rows']} rows in {wall_ms} ms "
                      f"→ snapshot {manifest['snapshot_id']}")
            outputs[st.name] = committed
        return outputs
