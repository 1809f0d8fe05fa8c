package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.lake.LakeCatalog

/** Sequential, fail-fast medallion run: RawToBronze → BronzeToSilver
  * (≡ reference X1, aws-step-function/step-function.json:3-70 — a 2-step
  * DAG where either step's failure aborts the pipeline). Exceptions
  * propagate; checkpoints were only written after their step's table
  * commit, so a re-run resumes exactly where the failure left off.
  */
final class PipelineRunner(
    spark: SparkSession,
    catalog: LakeCatalog,
    rawDir: String,
    checkpointDir: String,
    namespace: String = "example_namespace",
    bronzeTable: String = "bronze_orders",
    silverTable: String = "silver_orders",
    fixedTime: Option[java.sql.Timestamp] = None) {

  /** Returns (bronzeRowsAppended, silverRowsMerged). */
  def runOnce(): (Long, Long) = {
    val bronzeRows = new RawToBronzeJob(spark, catalog, rawDir,
      s"$checkpointDir/raw_to_bronze.json", namespace, bronzeTable,
      fixedTime = fixedTime).run()
    val silverRows = new BronzeToSilverJob(spark, catalog, namespace,
      bronzeTable, silverTable,
      s"$checkpointDir/bronze_to_silver.json").run()
    (bronzeRows, silverRows)
  }
}
