package graft.lake

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz of the Delta HANDOFF under CONTINUOUS publish:
  * a random COW mutation ladder (appends, star merges, predicate
  * deletes, updates, compaction) publishes to ONE Delta log after
  * every commit, with periodic checkpoints folding the log. Checks,
  * against a driver-side model of every published state:
  *   - the live scan reproduces the final model,
  *   - versionAsOf reproduces EVERY recorded historical model (through
  *     checkpoint seeds and remove actions alike),
  *   - append-only stretches read back exactly via incrementalScan.
  * What it guards beyond the example specs: the publish delta
  * computation (adds/removes from canonical-key set difference), the
  * checkpoint writer/reader pair, and version replay compose over
  * ARBITRARY histories. */
class DeltaRoundtripFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(seed: Int, steps: Int, partitioned: Boolean,
      mor: Boolean = false, lineage: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val base = Seq((0L, "", 0L)).toDF("id", "v", "g")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir(s"dfuzz-$seed") + "/t", base.schema,
      partitionBy = if (partitioned) Seq("g") else Nil,
      // MOR deletes → position artifacts → consolidated DVs: the
      // publishes below carry REAL Delta deletion vectors, so the
      // whole fuzz drives the DV encode/replay/decode path
      properties = (if (mor)
        Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read")
      else Map.empty[String, String]) ++
        (if (lineage) Map(LakeTable.PROP_ROW_LINEAGE -> "true")
        else Map.empty[String, String]))
    val dir = TestSpark.tmpDir(s"dfuzz-$seed") + "/delta"
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 0L
    def df(rows: Seq[(Long, String)]) =
      rows.map { case (k, v) => (k, v, k % 5) }.toDF("id", "v", "g")

    // (delta version, model snapshot, appendOnlySincePrev)
    val history = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, String], Boolean)]
    var sawDv = false
    (1 to steps).foreach { step =>
      val appendOnly = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          val n = 1 + rnd.nextInt(30)
          val rows = (0 until n).map { _ =>
            nextId += 1; (nextId, s"a$step-$nextId")
          }
          t.append(df(rows).repartition(1 + rnd.nextInt(2)))
          rows.foreach { case (k, v) => model(k) = v }
          true
        case 4 | 5 =>
          val updates = model.keys.toSeq.sorted
            .filter(_ => rnd.nextInt(4) == 0).take(20)
            .map(k => (k, s"u$step-$k"))
          val inserts = (0 until rnd.nextInt(8)).map { _ =>
            nextId += 1; (nextId, s"i$step-$nextId")
          }
          val src = updates ++ inserts
          if (src.nonEmpty) {
            t.merge(df(src), Seq("id"))
            src.foreach { case (k, v) => model(k) = v }
          }
          src.nonEmpty && updates.isEmpty
        case 6 | 7 =>
          val m = 2 + rnd.nextInt(9)
          val r = rnd.nextInt(m)
          t.delete(col("id") % m === r.toLong && col("id") <= nextId)
          model.keys.toSeq.filter(k => k % m == r)
            .foreach(model.remove)
          false
        case 8 =>
          val upd = model.keys.toSeq.sorted.headOption
          upd.foreach { k =>
            t.update(col("id") === k, Map("v" -> lit(s"w$step")))
            model(k) = s"w$step"
          }
          false
        case 9 =>
          t.compact(1 + rnd.nextInt(2)); false
      }
      // loose position deletes fold into exportable DVs first
      if (mor && t.currentSnapshot.exists(_.posDeleteFiles.nonEmpty))
        t.consolidateDeleteVectors()
      DeltaExport.publish(t, dir)
      val stNow = DeltaImport.state(spark, dir, None)
      if (stNow.adds.exists(_.dv.isDefined)) sawDv = true
      val v = stNow.version
      // publish is idempotent per graft snapshot: a no-op step (empty
      // merge) re-publishes the same version — record once
      if (!history.lastOption.exists(_._1 == v))
        history += ((v, model.toMap, appendOnly))
      if (step % 7 == 0) DeltaExport.checkpoint(spark, dir)
    }

    def read(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    def shape(m: Map[Long, String]) =
      m.map { case (k, v) => k -> (v, k % 5) }

    // a MOR ladder that never published a DV proved nothing — fail
    // the FIXTURE, not silently narrow the coverage
    assert(!mor || sawDv,
      s"seed $seed: no published version carried a deletion vector")
    // final live state
    assert(read(DeltaImport.scan(spark, dir)) == shape(history.last._2),
      s"seed $seed: final scan diverged")
    // row-tracking leg: after an ARBITRARY COW ladder the foreign
    // lineage read resolves exactly the ids graft's own lineage scan
    // holds (merges/updates preserved them via the materialized
    // column, appends via baseRowId blocks)
    if (lineage) {
      def ids(df: org.apache.spark.sql.DataFrame, c: String) =
        df.select(col("id"), col(c)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val own = ids(t.scanWithLineage(), LakeTable.ROW_ID_COL)
      val foreign = ids(DeltaImport.lineageScan(spark, dir), "_row_id")
      assert(foreign == own,
        s"seed $seed: rowTracking ids diverged from graft lineage")
    }
    // every recorded version time-travels back exactly
    history.foreach { case (v, m, _) =>
      assert(read(DeltaImport.scan(spark, dir, Some(v))) == shape(m),
        s"seed $seed: versionAsOf $v diverged")
    }
    // append-only stretches: incremental read = model difference
    history.sliding(2).foreach {
      case scala.collection.mutable.ArrayBuffer(
          (v0, m0, _), (v1, m1, ao)) if ao =>
        val got = read(DeltaImport.incrementalScan(spark, dir, v0,
          Some(v1)))
        val want = shape(m1).view.filterKeys(k => !m0.contains(k)).toMap
        assert(got == want,
          s"seed $seed: incremental ($v0,$v1] diverged")
      case _ => ()
    }
  }

  test("random publish histories: scan, versionAsOf, and incremental " +
      "reads model-exact (seed 7, unpartitioned)") {
    run(7, 22, partitioned = false)
  }

  test("random publish histories model-exact (seed 23, " +
      "identity-partitioned)") {
    run(23, 22, partitioned = true)
  }

  test("random MERGE-ON-READ histories publish deletion vectors: " +
      "scan, versionAsOf across DV growth, and checkpointed DV " +
      "descriptors all model-exact (seed 41)") {
    run(41, 22, partitioned = false, mor = true)
  }

  test("random MOR + identity-partitioned DV histories model-exact " +
      "(seed 59)") {
    run(59, 22, partitioned = true, mor = true)
  }

  test("random ROW-LINEAGE histories: every published state " +
      "model-exact AND foreign rowTracking ids equal graft's own " +
      "(seed 83)") {
    run(83, 22, partitioned = false, lineage = true)
  }
}
