package graft.lake

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz of the DELETE-ARTIFACT composition space: random
  * interleavings of appends, MOR keyed merges (equality deletes), MOR
  * predicate deletes (position deletes), equality→position conversion,
  * position→vector consolidation, and full compaction — checked after
  * EVERY op against a driver-side model of the table's key→value
  * state. What it guards: the three delete representations coexist on
  * one table in any order (a merge after a consolidation, a
  * consolidation over a half-converted history, a compact folding all
  * three), and every representation change is content-neutral. */
class DvFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(seed: Int, steps: Int): Unit = {
    val rnd = new Random(seed)
    val t = LakeTable.create(spark,
      TestSpark.tmpDir(s"dvfuzz-$seed") + "/t",
      Seq((0L, "")).toDF("id", "v").schema,
      properties = Map(
        LakeTable.PROP_DELETE_MODE -> "merge-on-read",
        LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 0L
    def df(rows: Seq[(Long, String)]) = rows.toDF("id", "v")

    (1 to steps).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append fresh ids
          val n = 1 + rnd.nextInt(40)
          val rows = (0 until n).map { _ =>
            nextId += 1; (nextId, s"a$step-$nextId")
          }
          t.append(df(rows).repartition(1 + rnd.nextInt(3)))
          rows.foreach { case (k, v) => model(k) = v }
        case 3 | 4 | 5 => // MOR keyed merge: updates + inserts
          val updates = model.keys.toSeq.sorted
            .filter(_ => rnd.nextInt(5) == 0).take(30)
            .map(k => (k, s"u$step-$k"))
          val inserts = (0 until rnd.nextInt(10)).map { _ =>
            nextId += 1; (nextId, s"i$step-$nextId")
          }
          val src = updates ++ inserts
          if (src.nonEmpty) {
            t.merge(df(src), Seq("id"))
            src.foreach { case (k, v) => model(k) = v }
          }
        case 6 | 7 => // MOR predicate delete (position artifacts)
          val m = 2 + rnd.nextInt(9)
          val r = rnd.nextInt(m)
          t.delete(col("id") % m === r.toLong &&
            col("id") <= nextId)
          model.keys.toSeq.filter(k => k % m == r)
            .foreach(model.remove)
        case 8 => rnd.nextInt(3) match {
          case 0 => t.convertEqualityDeletes()
          case 1 => t.consolidateDeleteVectors()
          case _ => // convert THEN consolidate — the full ladder
            t.convertEqualityDeletes()
            t.consolidateDeleteVectors()
        }
        case 9 => t.compact(1 + rnd.nextInt(2))
      }
      val got = t.scan().collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == model.toMap,
        s"seed $seed step $step diverged: table ${got.size} rows vs " +
          s"model ${model.size}; extra=${(got.keySet -- model.keySet)
            .take(5)}, missing=${(model.keySet -- got.keySet).take(5)}")
    }
    // end state sanity: artifacts fold away under compact
    t.compact(1)
    val s = t.currentSnapshot.get
    assert(s.deleteFiles.isEmpty && s.posDeleteFiles.isEmpty &&
      s.dvFiles.isEmpty)
    assert(t.countRows() == model.size.toLong)
  }

  test("random delete-representation interleavings stay model-exact " +
      "(seed 42)") { run(42, 40) }

  test("random delete-representation interleavings stay model-exact " +
      "(seed 7)") { run(7, 40) }
}
