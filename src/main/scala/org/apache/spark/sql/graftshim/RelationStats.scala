package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Attach catalog-table STATISTICS (row count, size, per-column min/max/
  * NDV) to the root `LogicalRelation` of a freshly-built scan DataFrame.
  *
  * Why a shim: a lake table's exact statistics live in the manifest, but
  * `spark.read.parquet` produces a `LogicalRelation` whose only statistic
  * is the summed file size — so join ordering and broadcast choice on
  * lake tables ride AQE's RUNTIME repair (the first shuffle of a wrong
  * initial plan is already materialized by the time AQE converts it).
  * `LogicalRelation.computeStats` prefers `catalogTable.stats` when
  * present; grafting a stats-bearing `CatalogTable` onto the relation
  * hands Catalyst the same numbers a Hive-metastore table would carry,
  * and the cost-based rules (FilterEstimation, JoinEstimation, join
  * reorder) then shape the INITIAL plan. `Dataset.ofRows` and the
  * `LogicalRelation` constructor are `private[sql]`, hence this package.
  *
  * The transform is applied to the scan root ONLY (the DataFrame as
  * handed in is a bare relation); anything else is returned unchanged —
  * degrading to default size-only stats, never to wrong answers. */
object RelationStats {
  def attach(df: DataFrame, ct: CatalogTable): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed match {
      case lr: LogicalRelation =>
        classic.Dataset.ofRows(ds.sparkSession, lr.copy(catalogTable = Some(ct)))
      case _ => df
    }
  }

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
