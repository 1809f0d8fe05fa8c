package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeCatalog

/** Incremental gold (SilverToGoldJob.runIncremental): the mart must
  * equal the full recompute after every silver mutation shape —
  * append, COW update, predicate delete, full-category retraction —
  * while each refresh reads only the silver DELTA (asserted via the
  * cube's MV watermark advancing commit-by-commit). */
class GoldIncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def silverRows(ids: Range) = ids.map { i =>
    (i.toLong, s"cat${i % 3}", s"st${i % 2}", 10.0 + i, 2.0)
  }.toDF("invoiceid", "category", "destinationstate", "price",
    "quantity")

  test("incremental gold equals full recompute through all mutations") {
    val base = TestSpark.tmpDir("gold-inc")
    val cat = new LakeCatalog(spark, base)
    cat.createNamespace("m")
    val df = silverRows(1 to 40)
    cat.createTable("m", "silver", df.schema)
    val silver = cat.loadTable("m", "silver")
    val job = new SilverToGoldJob(spark, cat, "m", "silver", "gold")

    def expectGold(): Seq[String] = {
      val s = silver.scan()
      s.groupBy($"destinationstate")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"price" * $"quantity"), 2).as("revenue"),
          round(avg($"price"), 2).as("avg_price"),
          countDistinct($"category").as("n_categories"))
        .collect().map(_.toString).sorted.toSeq
    }
    def gotGold(): Seq[String] =
      cat.loadTable("m", "gold").scan()
        .collect().map(_.toString).sorted.toSeq

    silver.append(df.where($"invoiceid" <= 20))
    job.runIncremental()
    assert(gotGold() == expectGold(), "after initial append")

    silver.append(df.where($"invoiceid" > 20))
    job.runIncremental()
    assert(gotGold() == expectGold(), "after second append")

    // COW update: price shift on a subset
    silver.merge(df.where($"invoiceid" % 7 === 0)
      .withColumn("price", $"price" + 1), Seq("invoiceid"))
    job.runIncremental()
    assert(gotGold() == expectGold(), "after price update")

    // predicate delete, including a full-category retraction in one
    // state (cat2 rows in st0 are ids ≡ 2 mod 6 ... delete them all)
    silver.delete($"category" === "cat2" && $"destinationstate" === "st0")
    job.runIncremental()
    assert(gotGold() == expectGold(), "after category retraction")
    // n_categories really dropped for st0
    val st0 = cat.loadTable("m", "gold").scan()
      .where($"destinationstate" === "st0").head()
    assert(st0.getAs[Long]("n_categories") == 2L)

    // each refresh consumed exactly the delta: the cube watermark is
    // silver's HEAD, and a no-op refresh does not commit
    val cube = cat.loadTable("m", "gold_cube")
    assert(cube.properties(graft.lake.IncrementalMv.WatermarkProp)
      .toLong == silver.currentSnapshotId.get)
    val cubeHead = cube.currentSnapshotId
    job.runIncremental()
    assert(cat.loadTable("m", "gold_cube").currentSnapshotId == cubeHead,
      "no-op refresh committed to the cube")
    assert(gotGold() == expectGold(), "after no-op refresh")
  }

  test("one refresh spanning several silver commits applies them all") {
    val base = TestSpark.tmpDir("gold-inc-multi")
    val cat = new LakeCatalog(spark, base)
    cat.createNamespace("m")
    val df = silverRows(1 to 40)
    cat.createTable("m", "silver", df.schema)
    val silver = cat.loadTable("m", "silver")
    val job = new SilverToGoldJob(spark, cat, "m", "silver", "gold")
    silver.append(df.where($"invoiceid" <= 20))
    job.runIncremental()
    // three MORE commits, ONE refresh over the whole range
    silver.append(df.where($"invoiceid" > 20))
    silver.merge(df.where($"invoiceid" % 7 === 0)
      .withColumn("price", $"price" + 1), Seq("invoiceid"))
    silver.delete($"invoiceid" % 13 === 0)
    job.runIncremental()
    val expect = silver.scan().groupBy($"destinationstate")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"price" * $"quantity"), 2).as("revenue"),
        round(avg($"price"), 2).as("avg_price"),
        countDistinct($"category").as("n_categories"))
      .collect().map(_.toString).sorted.toSeq
    val got = cat.loadTable("m", "gold").scan()
      .collect().map(_.toString).sorted.toSeq
    assert(got == expect)
  }
}
