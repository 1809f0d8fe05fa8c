package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeCatalog
import graft.pipeline.PipelineRunner

/** Volume smoke for the medallion pipeline: synthesizes CDC-style
  * tab-CSV drops from the orders table (insert drop + an update drop
  * touching ~1/3 of the keys), replays them through
  * raw → bronze → silver, and checks the end state against the
  * DataFrame-computed expectation.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [workDir]
  * At sf0.1 this pushes ~150k inserts + ~50k updates through CSV
  * inference, bronze append, snapshot-incremental read, the dedup
  * window, and a COW merge over ~57 partitions — the pipeline's
  * behavior at 4 orders of magnitude above the reference fixture.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val workDir = args.lift(1).getOrElse(
      Files.createTempDirectory("graft-scale").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = orders.count()

    // CDC rows in the reference's raw schema: Op + business columns;
    // o_orderkey plays invoiceid, o_orderpriority plays the silver
    // partition column (destinationstate analog)
    def asCdc(df: org.apache.spark.sql.DataFrame, op: String) = df.select(
      lit(op).as("Op"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .as("replicadmstimestamp"),
      col("o_orderkey").as("invoiceid"),
      col("o_custkey").as("itemid"),
      col("o_orderstatus").as("category"),
      round(col("o_totalprice"), 2).as("price"),
      lit(1).as("quantity"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
      col("o_orderpriority").as("destinationstate"),
      lit("Standard").as("shippingtype"),
      lit("smoke").as("referral"))

    def writeDrop(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      df.coalesce(4).write.mode("overwrite")
        .option("sep", "\t").option("header", "true").csv(dir)
      // move into the raw dir as the pipeline expects flat CSV drops
      val raw = Paths.get(s"$workDir/raw")
      Files.createDirectories(raw)
      val st = Files.list(Paths.get(dir))
      try st.filter(_.toString.endsWith(".csv"))
        .forEach { f =>
          Files.move(f, raw.resolve(f.getFileName),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          raw.resolve(f.getFileName).toFile
            .setLastModified(System.currentTimeMillis())
        }
      finally st.close()
    }

    val cat = new LakeCatalog(spark, s"$workDir/warehouse")
    val runner = new PipelineRunner(spark, cat, s"$workDir/raw",
      s"$workDir/ckpt")

    println(s"[scale] drop 1: $n inserts")
    var t0 = System.nanoTime()
    writeDrop(asCdc(orders, "I"), s"$workDir/stage1")
    val (b1, s1) = runner.runOnce()
    println(f"[scale] run 1: bronze +$b1, silver $s1 in ${(System.nanoTime()-t0)/1e9}%.1f s")
    require(b1 == n && s1 == n, s"run1 expected $n/$n, got $b1/$s1")

    val updates = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderstatus", lit("UPDATED"))
    val nUpd = updates.count()
    println(s"[scale] drop 2: $nUpd updates")
    // no sleep: same-tick drops are handled by the boundary-file names
    t0 = System.nanoTime()
    writeDrop(asCdc(updates, "U"), s"$workDir/stage2")
    val (b2, s2) = runner.runOnce()
    println(f"[scale] run 2: bronze +$b2, silver $s2 in ${(System.nanoTime()-t0)/1e9}%.1f s")
    require(b2 == nUpd && s2 == nUpd, s"run2 expected $nUpd, got $b2/$s2")

    val silver = cat.loadTable("example_namespace", "silver_orders").scan()
    val silverN = silver.count()
    val updatedN = silver.where(col("category") === "UPDATED").count()
    val bronzeN = cat.loadTable("example_namespace", "bronze_orders")
      .scan().count()
    println(s"[scale] end state: bronze=$bronzeN silver=$silverN updated=$updatedN")
    require(bronzeN == n + nUpd, "bronze must be append-only")
    require(silverN == n, "silver must stay keyed-unique")
    require(updatedN == nUpd, "updates must win in silver")
    println("[scale] PASS")
    spark.stop()
  }
}
