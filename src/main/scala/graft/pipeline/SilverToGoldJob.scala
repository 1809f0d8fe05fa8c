package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeCatalog

/** Silver → gold: the aggregate-mart layer that completes the medallion
  * pattern (the reference stops at silver; its README frames gold as the
  * natural next layer). Gold tables are derived full-refresh marts —
  * deterministic functions of silver — so the job recomputes and
  * atomically overwrites (a new snapshot) rather than merging: a mart's
  * group-by keys collapse arbitrarily many silver rows, making
  * incremental maintenance a retraction problem; at 100 TB you'd switch
  * to partition-scoped refresh (recompute only partitions whose silver
  * inputs changed, detected via the silver snapshot diff).
  */
final class SilverToGoldJob(
    spark: SparkSession,
    catalog: LakeCatalog,
    namespace: String,
    silverTable: String = "silver_orders",
    goldTable: String = "gold_orders_by_state") {

  /** Recompute the mart; returns the number of gold rows. The count is
    * taken from the written gold table (tiny) — counting `mart` first
    * would execute the silver aggregation twice. */
  def run(): Long = {
    val silver = catalog.loadTable(namespace, silverTable).scan()
    val mart = buildMart(silver)
    val gold =
      if (catalog.tableExists(namespace, goldTable))
        catalog.loadTable(namespace, goldTable)
      else {
        catalog.createNamespace(namespace)
        catalog.createTable(namespace, goldTable, mart.schema,
          properties = PipelineDefaults.tableProperties)
      }
    gold.overwrite(mart)
    gold.scan().count()
  }

  /** Revenue/volume per destination state — the canonical mart over the
    * silver orders contract. */
  private[pipeline] def buildMart(silver: DataFrame): DataFrame =
    silver.groupBy(col("destinationstate"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("price") * col("quantity")), 2).as("revenue"),
        round(avg(col("price")), 2).as("avg_price"),
        countDistinct(col("category")).as("n_categories"))
}
