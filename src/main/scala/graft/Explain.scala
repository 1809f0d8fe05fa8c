package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more queries —
  * the loop used to check that filters reach the Parquet scan
  * (PushedFilters), projections prune (ReadSchema), dims broadcast, and
  * operators stay inside WholeStageCodegen spans.
  *
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // no-fork local fs: without libhadoop, Hadoop's local fs forks a
      // `chmod` per created file/dir (~20 ms each) — see
      // graft.lake.FastLocalFs; file:// only, no semantic change
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.lake.NoForkLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[graft.lake.NoForkLocalFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
