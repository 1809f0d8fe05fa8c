package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Storage-partitioned (bucketed) scans: a table partitioned by a
  * single `bucket(N, col)` transform writes files with Spark's own
  * bucket-id function AND Spark's `_NNNNN` bucket file-name suffix, so
  * the scan claims a real BucketSpec and reports
  * `HashPartitioning(col, N)`. Joins and aggregations on the source
  * column then skip the table-side shuffle — the co-located-join shape
  * that matters at 100 TB. Files from pre-bucket eras disable the
  * claim (plans stay correct, just not bucketed). */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String) = TestSpark.tmpDir(tag) + "/t"

  /** Plan-shape assertions need the plain (non-AQE) physical plan —
    * under AQE the tree hides behind AdaptiveSparkPlanExec. The claim
    * itself is AQE-independent. */
  private def withAqeOff[A](body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prior)
  }

  private def plan(df: DataFrame) = df.queryExecution.executedPlan

  private def shuffles(df: DataFrame): Int =
    plan(df).collect { case s: ShuffleExchangeExec => s }.size

  private def bucketedScans(df: DataFrame): Seq[Boolean] =
    plan(df).collect { case s: FileSourceScanExec => s.bucketedScan }

  test("single-bucket-field scan claims the BucketSpec; groupBy skips the shuffle") {
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val lt = LakeTable.create(spark, freshRoot("bj-agg"), df.schema,
      partitionBy = Seq("bucket(4, k)"))
    lt.append(df)
    withAqeOff {
      val agg = lt.scan().groupBy("k").agg(count(lit(1)).as("n"))
      assert(bucketedScans(agg) == Seq(true))
      assert(shuffles(agg) == 0)
      assert(agg.count() == 1000L)
    }
  }

  test("bucket-co-located join: zero shuffles, exact result") {
    val left = (1L to 500L).map(i => (i, i * 2)).toDF("k", "a")
    val right = (250L to 750L).map(i => (i, s"r$i")).toDF("k", "b")
    val lt1 = LakeTable.create(spark, freshRoot("bj-l"), left.schema,
      partitionBy = Seq("bucket(8, k)"))
    val lt2 = LakeTable.create(spark, freshRoot("bj-r"), right.schema,
      partitionBy = Seq("bucket(8, k)"))
    lt1.append(left)
    lt2.append(right)
    withAqeOff {
      // SMJ path (no broadcast): both sides must come in pre-partitioned
      val joined = lt1.scan().hint("merge")
        .join(lt2.scan().hint("merge"), "k")
      assert(shuffles(joined) == 0, plan(joined).toString)
      assert(joined.count() == 251L)
      // values survive the bucketed read intact
      val r = joined.where(col("k") === 300L).select("a", "b").collect().head
      assert((r.getLong(0), r.getString(1)) == (600L, "r300"))
    }
  }

  test("mixed eras (pre-bucket files) fall back to a plain scan, correctly") {
    val df = (1L to 300L).map(i => (i, i.toString)).toDF("k", "v")
    val lt = LakeTable.create(spark, freshRoot("bj-mixed"), df.schema)
    lt.append(df.where(col("k") <= 150))        // unpartitioned era
    lt.evolvePartitionSpec(Seq("bucket(4, k)"))
    lt.append(df.where(col("k") > 150))         // bucketed era
    val scan = lt.scan()
    // bucketed claim only on the bucketed era's sub-scan (if any); the
    // union output must still be exact
    assert(scan.count() == 300L)
    val agg = scan.groupBy("k").agg(count(lit(1)))
    assert(agg.count() == 300L)
    // after compaction under the current (bucketed) spec, the whole
    // table is one era and the claim comes back
    lt.compact()
    withAqeOff {
      val agg2 = lt.scan().groupBy("k").agg(count(lit(1)).as("n"))
      assert(bucketedScans(agg2) == Seq(true))
      assert(shuffles(agg2) == 0)
      assert(agg2.count() == 300L)
    }
  }

  test("bucket ids in file names match Spark's own bucket-id function") {
    val df = (1L to 200L).map(i => (i, i)).toDF("k", "x")
    val lt = LakeTable.create(spark, freshRoot("bj-ids"), df.schema,
      partitionBy = Seq("bucket(4, k)"))
    lt.append(df)
    val snap = lt.currentSnapshot.get
    // every live file: dir value == parsed name suffix == Spark's
    // pmod(hash(k), 4) for the rows within
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    snap.liveFiles.foreach { f =>
      val dirVal = f.split('/').collectFirst {
        case seg if seg.startsWith("k_bucket_4=") =>
          seg.stripPrefix("k_bucket_4=").toInt
      }.get
      val named = BucketingUtils.getBucketId(f.split('/').last)
      assert(named.contains(dirVal), s"$f: name/dir bucket mismatch")
    }
    // row-level: recompute with Spark's hash() and compare to the
    // file's bucket (read back per-file via input_file_name)
    val withBucket = lt.scan()
      .withColumn("expected", pmod(hash(col("k")), lit(4)))
    val files = withBucket.withColumn("file", input_file_name())
    val bad = files.where(
      !col("file").contains(concat(lit("k_bucket_4="),
        col("expected").cast("string"), lit("/"))))
    assert(bad.count() == 0L)
  }

  test("two-bucket-field or renamed-source tables never claim a spec") {
    val df = (1L to 100L).map(i => (i, i + 1000L, i.toString))
      .toDF("k", "j", "v")
    val lt = LakeTable.create(spark, freshRoot("bj-two"), df.schema,
      partitionBy = Seq("bucket(2, k)", "bucket(2, j)"))
    lt.append(df)
    withAqeOff {
      val scans = bucketedScans(lt.scan().groupBy("k").count())
      assert(scans.forall(_ == false))
      assert(lt.scan().count() == 100L)
    }
  }
}
