package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-style CSV batch scan + audit enrichment.
  *
  * ≡ reference S3 + P1/F1-F3 (scripts/raw-bronze.py:119-130,210-218):
  * multi-file tab-separated read with header + schema inference, then the
  * three audit columns: `input_file` (row provenance), `processed_time`
  * (ingest time), `processed_date` (derived partition key).
  *
  * Schema inference costs one extra pass over the files — acceptable on
  * incremental batches (each file is read exactly once per pipeline run);
  * for a fixed-contract feed pass `schema` to skip it.
  */
object CsvIngest {

  /** The one option set both the batch and streaming ingest paths use —
    * a format change here applies to both. */
  def csvOptions(sep: String = "\t"): Map[String, String] = Map(
    "sep" -> sep,
    "header" -> "true",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss[.SSSSSS]")

  def read(spark: SparkSession, paths: Seq[String], sep: String = "\t",
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(paths.nonEmpty, "no input files")
    val r = spark.read.options(csvOptions(sep))
    schema match {
      case Some(s) => r.schema(s).csv(paths: _*)
      case None    => r.option("inferSchema", "true").csv(paths: _*)
    }
  }

  /** Audit enrichment (≡ scripts/raw-bronze.py:210-218). `fixedTime` lets
    * tests inject a clock instead of `current_timestamp()`
    * (SURVEY.md §7.3.5 — never assert on wall-clock columns). */
  def enrich(df: DataFrame,
      fixedTime: Option[java.sql.Timestamp] = None): DataFrame = {
    val ts = fixedTime.map(t => lit(t)).getOrElse(current_timestamp())
    df.withColumn("input_file", input_file_name())
      .withColumn("processed_time", ts)
      .withColumn("processed_date", date_format(ts, "yyyy-MM-dd"))
  }
}
