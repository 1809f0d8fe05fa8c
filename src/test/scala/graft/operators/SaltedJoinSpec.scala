package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The salt must be a deterministic function of row content: a retried
  * map task re-salting rows differently than its first attempt would
  * route them to different reducers and duplicate/lose join rows (the
  * failure mode compact()'s salt comment forbids). */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join") {
    val big = (1L to 2000L).map(i => (i % 7, i)).toDF("k", "v")
    val small = (0L to 6L).map(k => (k, s"name$k")).toDF("k", "name")
    val salted = SaltedJoin.join(big, small, Seq("k"), saltFactor = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect()
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt expression is deterministic (no monotonically_increasing_id)") {
    val big = (1L to 100L).map(i => (i % 3, i)).toDF("k", "v")
    val small = (0L to 2L).map(k => (k, s"n$k")).toDF("k", "name")
    val plan = SaltedJoin.join(big, small, Seq("k"), saltFactor = 4)
      .queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("monotonically"),
      s"nondeterministic salt in plan:\n$plan")
    // and all expressions in the plan tree report deterministic
    val q = SaltedJoin.join(big, small, Seq("k"), saltFactor = 4)
    q.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach(e =>
        assert(e.deterministic, s"nondeterministic expression: $e"))
    }
  }

  test("left-outer salted join keeps unmatched skewed rows exactly once") {
    val big = Seq((1L, "a"), (2L, "b"), (9L, "zz")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val got = SaltedJoin.join(big, small, Seq("k"), 4, "left_outer")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq ==
      Seq((1L, "a", "x"), (2L, "b", "y"), (9L, "zz", null)))
  }

  test("spreadDuplicates splits a hot key of byte-identical rows") {
    // the documented limitation of the content-hash salt: identical rows
    // all hash to ONE salt. With spreadDuplicates the source split is
    // mixed in, so duplicates arriving from different input partitions
    // fan out across salts.
    val spark = TestSpark.spark
    val dup = spark.range(0, 2000, 1, 8) // 8 input partitions
      .select(lit(1L).as("k"), lit("same-bytes").as("v"))
    val contentSalts = dup
      .withColumn("s", SaltedJoin.saltExpr(dup, 16, spreadDuplicates = false))
      .select("s").distinct().count()
    assert(contentSalts == 1L,
      "content-hash salt must (by design) collapse identical rows")
    val spreadSalts = dup
      .withColumn("s", SaltedJoin.saltExpr(dup, 16, spreadDuplicates = true))
      .select("s").distinct().count()
    assert(spreadSalts > 1L,
      s"spreadDuplicates must fan identical rows out, got $spreadSalts salt(s)")
    // and the join stays correct
    val small = Seq((1L, "x")).toDF("k", "name")
    val got = SaltedJoin.join(dup, small, Seq("k"), 16,
      spreadDuplicates = true)
      .agg(count(lit(1)).as("n")).head().getLong(0)
    assert(got == 2000L)
  }
}
