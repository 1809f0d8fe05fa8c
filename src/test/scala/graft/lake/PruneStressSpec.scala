package graft.lake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
/** Seeded randomized sweep of the manifest-pruned read path against
  * brute-force filtering — denser and cheaper per-case than the
  * ScalaCheck property, with FP edge values (±0.0, NaN) and exact
  * data-value literals emphasized. Caught the upstream -0.0 equality
  * pushdown hole (see NormalizeZeroComparisonLiterals). */
class PruneStressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  test("pruned scan ≡ brute force across random tables/predicates") {
    val rnd = new scala.util.Random(sys.env.getOrElse("STRESS_SEED", "42").toLong)
    def randVal(): Double = rnd.nextInt(11) match {
      case 0 => 0.0
      case 1 => -0.0
      case 2 => Double.NaN
      case _ => rnd.nextDouble() * 200 - 100
    }
    var failures = 0
    (1 to 60).foreach { iter =>
      val nb = 1 + rnd.nextInt(4)
      val batches = (1 to nb).map(_ => (1 to (1 + rnd.nextInt(40)))
        .map(_ => (rnd.nextInt(101).toLong - 50, randVal(),
          Seq("a", "b", "c", "dd")(rnd.nextInt(4)))).toList).toList
      def cmp(): org.apache.spark.sql.Column = {
        val allX = batches.flatten.map(_._2)
        val c = rnd.nextInt(3) match {
          case 0 => ("k", lit(Seq(-50L, 0L, 50L,
            rnd.nextInt(101).toLong - 50)(rnd.nextInt(4))))
          case 1 => ("x", lit(Seq(0.0, -0.0, -100.0, 100.0,
            allX(rnd.nextInt(allX.size)),
            rnd.nextDouble() * 200 - 100)(rnd.nextInt(6))))
          case 2 => ("s", lit(Seq("a", "b", "c", "dd")(rnd.nextInt(4))))
        }
        rnd.nextInt(3) match {
          case 0 => col(c._1) === c._2
          case 1 => col(c._1) < c._2
          case 2 => col(c._1) >= c._2
        }
      }
      val p = rnd.nextInt(4) match {
        case 0 | 1 => cmp()
        case 2 => cmp() && cmp()
        case 3 => cmp() || cmp()
      }
      val root = TestSpark.tmpDir("stress-prune") + "/t"
      val first = batches.head.toDF("k", "x", "s")
      val t = LakeTable.create(spark, root, first.schema)
      batches.foreach(b => t.append(b.toDF("k", "x", "s").coalesce(1)))
      val pruned = t.scan().where(p).collect().map(_.toSeq.toString).sorted.toList
      val brute = batches.flatten.toDF("k", "x", "s").where(p)
        .collect().map(_.toSeq.toString).sorted.toList
      if (pruned != brute) {
        failures += 1
        println(s"ITER $iter MISMATCH pred=$p")
        println(s"  pruned(${pruned.size}) missing=${brute.diff(pruned)} extra=${pruned.diff(brute)}")
        println(s"  batches=$batches")
      }
      t.drop()
    }
    assert(failures == 0, s"$failures mismatches")
  }
}
