"""Catalog registration — the Glue-crawler equivalent (reference S10).

The reference registers its mart by running a crawler that re-infers
schema + partitions into the Glue Data Catalog
(utils/glue_utils.py:24-55, doc/architecture.md:250-263). Spark-native:
declare an external partitioned table over the written path and recover
partitions from the Hive directory layout — synchronous, no polling, no
schema re-inference drift (the DDL pins the schema the writer produced).

At scale partition recovery is a listing of partition directories only
(no data read); for very high partition counts prefer incremental
``ALTER TABLE ... ADD PARTITION`` per write, or a table format (Delta /
Iceberg) whose log replaces directory listing entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_partitioned_table(
    spark: SparkSession,
    name: str,
    path: str,
    partition_cols: list[str],
    sample: DataFrame | None = None,
) -> None:
    """Register an external partitioned Parquet table over ``path``.

    Schema comes from ``sample`` (the frame that was written) when given,
    else from reading the path's Parquet footers once. Partition columns
    are declared, not inferred — the Hive layout `col=value/` is the
    contract.
    """
    src = sample if sample is not None else spark.read.parquet(path)
    data_fields = [
        f for f in src.schema.fields if f.name not in set(partition_cols)
    ]
    part_fields = {f.name: f for f in src.schema.fields if f.name in set(partition_cols)}
    cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in data_fields)
    parts_ddl = ", ".join(
        f"`{c}` {part_fields[c].dataType.simpleString() if c in part_fields else 'string'}"
        for c in partition_cols
    )
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({cols_ddl}) USING parquet "
        f"PARTITIONED BY ({parts_ddl}) LOCATION '{path}'"
    )
    recover_partitions(spark, name)


def recover_partitions(spark: SparkSession, name: str) -> None:
    """MSCK-equivalent: sync catalog partitions with the directory layout."""
    spark.sql(f"ALTER TABLE `{name}` RECOVER PARTITIONS")


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
