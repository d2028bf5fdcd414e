package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Builder for the lake's scan relations, carrying catalog-table
  * STATISTICS (row count, size, per-column min/max/NDV/nulls).
  *
  * Why a shim: a lake table's exact statistics live in the manifest, but
  * `spark.read.parquet` produces a `LogicalRelation` whose only statistic
  * is the summed file size — so join ordering and broadcast choice on
  * lake tables ride AQE's RUNTIME repair (the first shuffle of a wrong
  * initial plan is already materialized by the time AQE converts it).
  * `LogicalRelation.computeStats` prefers `catalogTable.stats` when
  * present; building the relation with a stats-bearing `CatalogTable`
  * hands Catalyst the same numbers a Hive-metastore table would carry,
  * and the cost-based rules (FilterEstimation, JoinEstimation, join
  * reorder) then shape the INITIAL plan. `Dataset.ofRows` and the
  * `LogicalRelation` constructor are `private[sql]`, hence this package. */
object RelationStats {
  /** Build a parquet scan over a caller-supplied [[FileIndex]] (the
    * manifest-backed one) carrying catalog statistics — the combination
    * `spark.read.parquet` cannot express: file listing AND file
    * skipping come from lake metadata (no filesystem listing, pushed
    * filters prune files at plan time), and the relation's stats come
    * from the manifest (CBO shapes the initial plan). */
  def manifestScan(spark: org.apache.spark.sql.SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      schema: org.apache.spark.sql.types.StructType,
      ct: CatalogTable): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = org.apache.spark.sql.types.StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(cs)
    classic.Dataset.ofRows(cs, new LogicalRelation(
      rel,
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      Some(ct), false, None))
  }
}
