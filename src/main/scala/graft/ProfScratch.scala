package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-bench for optimization work (not part of the driver
  * contract). Times labeled sub-phases of heavy queries. */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.lake.NoForkLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) AS s").write.format("noop")
      .mode("overwrite").save()

    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-40s best=${times.min}%.3f s  all=" +
        times.map(t => f"$t%.2f").mkString(","))
    }

    import graft.operators.{IncrementalDedup, TextDedup}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 3 =!= 0)

    time("shingles")(docs.select(TextDedup.shingles(col("text"), 3)))
    time("shingle-hashes")(docs.select(
      transform(TextDedup.shingles(col("text"), 3), s => xxhash64(s))))
    time("buildIndex(corpus)")(IncrementalDedup.buildIndex(corpus))
    val batch = docs.where(col("doc_id") % 3 === 0)
    time("admit(batch all, idx df)")(IncrementalDedup.admit(
      IncrementalDedup.buildIndex(corpus), corpus, batch,
      bands = 64, threshold = 0.5))
    time("minHashPairs")(TextDedup.minHashPairs(docs))
    time("ngramJaccardPairs")(TextDedup.ngramJaccardPairs(docs, n = 3,
      threshold = 0.5, maxDocFreq = Some(100)))
    // does DataFrameWriter.option reach the job hadoop conf? write with
    // marksuccessfuljobs=false and check _SUCCESS absence
    val w2 = java.nio.file.Files.createTempDirectory("graft-opt").toString
    spark.range(5).write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(s"$w2/t")
    println("[scratch] _SUCCESS present: " +
      new java.io.File(s"$w2/t/_SUCCESS").exists())
    spark.stop()
  }
}
