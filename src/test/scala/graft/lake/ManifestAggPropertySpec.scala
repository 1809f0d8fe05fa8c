package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized SOUNDNESS sweep for the metadata-aggregate rewrite:
  * whatever mix of partitioning, nulls, edge values, multi-batch
  * appends, and COW deletes a table accumulated, the aggregate VALUES
  * must equal the ground truth computed from the rows we know we kept —
  * whether the rule rewrote the plan or fell back. (Plan-shape
  * assertions live in ManifestAggSpec; this is the "never a wrong
  * answer" net.) */
case class MAggRow(k: Long, s: Option[String], x: Option[Double],
    p: Option[String])

class ManifestAggPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type R = MAggRow
  private def R(k: Long, s: Option[String], x: Option[Double],
      p: Option[String]): MAggRow = MAggRow(k, s, x, p)

  test("property: metadata aggregates equal ground truth on random tables") {
    val rnd = new scala.util.Random(11)
    val edgeLongs = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L)
    val edgeStrs = Seq("", "a", "zzz", "Ω-unicode", " lead", "trail ")
    val edgeDbls = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, Double.MaxValue)

    (1 to 6).foreach { trial =>
      var kept = Vector.empty[R]
      def batch(n: Int): Seq[R] = (1 to n).map { _ =>
        val k = if (rnd.nextInt(8) == 0)
          edgeLongs(rnd.nextInt(edgeLongs.size))
        else rnd.nextLong() % 100000L
        val s = if (rnd.nextInt(5) == 0) None
          else Some(edgeStrs(rnd.nextInt(edgeStrs.size)) + rnd.nextInt(100))
        val x = if (rnd.nextInt(4) == 0) None
          else if (rnd.nextInt(6) == 0)
            Some(edgeDbls(rnd.nextInt(edgeDbls.size)))
          else Some(rnd.nextGaussian())
        val p = if (rnd.nextInt(6) == 0) None
          else Some(s"p${rnd.nextInt(3)}")
        R(k, s, x, p)
      }
      val partitioned = rnd.nextBoolean()
      val schema = batch(1).toDF().schema
      val t = LakeTable.create(spark,
        TestSpark.tmpDir(s"maggprop$trial") + "/t", schema,
        partitionBy = if (partitioned) Seq("p") else Nil)
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        val b = batch(20 + rnd.nextInt(60))
        kept = kept ++ b
        t.append(b.toDF().repartition(1 + rnd.nextInt(3)))
      }
      if (rnd.nextBoolean()) {
        val dropKeys = kept.map(_.k).distinct
          .filter(_ => rnd.nextInt(3) == 0)
        if (dropKeys.nonEmpty) {
          t.deleteByKeys(dropKeys.toDF("k"), Seq("k"))
          kept = kept.filterNot(r => dropKeys.contains(r.k))
        }
      }

      // global aggregates
      val r = t.scan().agg(
        count(lit(1)).as("n"), count($"s").as("ns"),
        min($"k").as("mnk"), max($"k").as("mxk"),
        min($"s").as("mns"), max($"s").as("mxs"),
        min($"x").as("mnx"), max($"x").as("mxx")).collect().head
      assert(r.getLong(0) == kept.size, s"trial $trial n")
      assert(r.getLong(1) == kept.count(_.s.isDefined), s"trial $trial ns")
      if (kept.nonEmpty) {
        assert(r.getLong(2) == kept.map(_.k).min, s"trial $trial mnk")
        assert(r.getLong(3) == kept.map(_.k).max, s"trial $trial mxk")
        val ss = kept.flatMap(_.s)
        if (ss.nonEmpty) {
          assert(r.getString(4) == ss.min, s"trial $trial mns")
          assert(r.getString(5) == ss.max, s"trial $trial mxs")
        } else assert(r.isNullAt(4) && r.isNullAt(5))
        // FP min/max under Spark's SQL semantics: NaN is the largest
        // value; -0.0 == 0.0 (either bit pattern is a correct answer,
        // which is exactly why the rewrite refuses zero folded bounds)
        val xs = kept.flatMap(_.x)
        if (xs.nonEmpty) {
          val expMn = xs.reduce((a, b) =>
            if (a.isNaN) b else if (b.isNaN) a else if (b < a) b else a)
          val expMx = xs.reduce((a, b) =>
            if (a.isNaN || b.isNaN) Double.NaN else if (b > a) b else a)
          val (gMn, gMx) = (r.getDouble(6), r.getDouble(7))
          assert(gMn.isNaN == expMn.isNaN && (gMn.isNaN || gMn == expMn),
            s"trial $trial mnx: $gMn vs $expMn")
          assert(gMx.isNaN == expMx.isNaN && (gMx.isNaN || gMx == expMx),
            s"trial $trial mxx: $gMx vs $expMx")
        } else assert(r.isNullAt(6) && r.isNullAt(7))
      }

      // grouped by the partition column (rewrite eligible only when
      // partitioned, but the VALUES must hold either way)
      val got = t.scan().groupBy($"p")
        .agg(count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"))
        .collect()
        .map(row => ((if (row.isNullAt(0)) None else Some(row.getString(0))),
          (row.getLong(1), row.getLong(2), row.getLong(3)))).toMap
      val exp = kept.groupBy(_.p).map { case (p, rs) =>
        p -> ((rs.size.toLong, rs.map(_.k).min, rs.map(_.k).max))
      }
      assert(got == exp, s"trial $trial grouped (partitioned=$partitioned)")

      // FILTERED aggregates (rewrite eligible only when the split is
      // provable — partitioned equality usually is; the VALUES must
      // hold whichever path answered)
      val fv = Seq(Some("p0"), Some("p1"), Some("p2"), None)(rnd.nextInt(4))
      val cond = fv.map(v => $"p" === v).getOrElse($"p".isNull)
      val fr = t.scan().where(cond).agg(
        count(lit(1)).as("n"), count($"s").as("ns"),
        min($"k").as("mn"), max($"k").as("mx")).collect().head
      val fkept = kept.filter(r => r.p == fv)
      assert(fr.getLong(0) == fkept.size, s"trial $trial filtered n")
      assert(fr.getLong(1) == fkept.count(_.s.isDefined),
        s"trial $trial filtered ns")
      if (fkept.nonEmpty) {
        assert(fr.getLong(2) == fkept.map(_.k).min &&
          fr.getLong(3) == fkept.map(_.k).max, s"trial $trial filtered mm")
      } else assert(fr.isNullAt(2) && fr.isNullAt(3))
    }
  }
}
