package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.lake.LakeCatalog
import graft.sources.CsvIngest

/** The idiomatic Structured-Streaming expression of the raw→bronze step
  * (SURVEY.md §2.1 S1 alternative): `readStream.csv` + `Trigger
  * .AvailableNow`, with Spark's transactional seen-files log replacing
  * the hand-rolled mtime checkpoint, and `foreachBatch` appending each
  * micro-batch to the bronze [[graft.lake.LakeTable]].
  *
  * Exactly-once: file pickup comes from the streaming checkpoint
  * (source offsets commit after the batch function returns), and the
  * table append is [[graft.lake.LakeTable.appendOnce]] keyed on
  * (checkpoint dir, micro-batch id) — a batch replayed after a crash
  * between the table commit and the streaming-offset commit finds its
  * own transaction watermark in the snapshot properties and skips, so
  * bronze content is exactly-once (vs the reference's at-least-once
  * replay contract, scripts/raw-bronze.py:250-255).
  */
final class StreamingRawToBronze(
    spark: SparkSession,
    catalog: LakeCatalog,
    rawDir: String,
    checkpointDir: String,
    namespace: String,
    table: String,
    partitionBy: Seq[String] = Seq("processed_date"),
    fixedTime: Option[java.sql.Timestamp] = None) {

  /** Drain everything currently in rawDir into bronze; returns rows
    * appended across this run's micro-batches. */
  def run(): Long = {
    // no-op on an empty raw dir (the normal "nothing new yet" case the
    // batch job handles by returning 0)
    val dirPath = new org.apache.hadoop.fs.Path(rawDir)
    // sessionState.newHadoopConf() folds runtime `spark.conf.set("fs...")`
    // entries on top of the sparkContext conf (parity with LakeTable)
    val hfs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(dirPath) ||
        !hfs.globStatus(new org.apache.hadoop.fs.Path(rawDir, "*.csv"))
          .exists(_.isFile)) return 0L

    // the file stream source needs a declared schema. It must be STABLE
    // across runs of the same checkpoint (a re-inference could flip a
    // column's type and silently null-corrupt casts on append), and
    // re-inferring over already-ingested files costs a full data pass —
    // so: bronze exists → its schema (minus audit columns) is the
    // contract; else infer once from the current files.
    val schema =
      if (catalog.tableExists(namespace, table)) {
        val audit = Set("input_file", "processed_time", "processed_date")
        org.apache.spark.sql.types.StructType(
          catalog.loadTable(namespace, table).schema.fields
            .filterNot(f => audit(f.name)))
      } else
        CsvIngest.read(spark, Seq(s"$rawDir/*.csv")).schema

    val appended = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = spark.readStream
      .options(CsvIngest.csvOptions())
      .option("pathGlobFilter", "*.csv") // stray _SUCCESS/.tmp files skip
      .schema(schema)
      .csv(rawDir)

    val q = CsvIngest.enrich(stream, fixedTime).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one evaluation of the batch: cache, count once, append, release
        batch.persist()
        try {
          val rows = batch.count()
          if (rows > 0) {
            // txn app id = the checkpoint dir: stable across restarts
            // of this query, distinct across queries/sinks
            val lt =
              if (catalog.tableExists(namespace, table))
                catalog.loadTable(namespace, table)
              else {
                catalog.createNamespace(namespace)
                catalog.createTable(namespace, table, batch.schema,
                  partitionBy,
                  graft.pipeline.PipelineDefaults.tableProperties)
              }
            val before = lt.currentSnapshotId
            val after = lt.appendOnce(batch, checkpointDir, batchId)
            if (!before.contains(after)) appended.addAndGet(rows)
          }
        } finally batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
    appended.get()
  }
}
