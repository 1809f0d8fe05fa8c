package graft.lake

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz of the Iceberg HANDOFF: the same random
  * mutation ladder as [[DvFuzzSpec]] (appends, MOR keyed merges →
  * equality deletes, MOR predicate deletes → position artifacts,
  * conversion, DV consolidation, compaction) — but checked through
  * EXPORT + the general reader: every few steps the table exports to
  * fresh Iceberg v2 metadata and [[IcebergImport.scan]] must
  * reproduce the driver-side model exactly. What it guards beyond
  * DvFuzzSpec: the export encoding (sequence numbers, delete
  * re-encodings, partition values) and the import decoding compose
  * correctly over ARBITRARY artifact states, not just the
  * hand-picked ladders in the example-based specs. */
class IcebergRoundtripFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(seed: Int, steps: Int, partitioned: Boolean,
      formatVersion: Int = 2, lineage: Boolean = false,
      variant: Boolean = false): Unit = {
    val rnd = new Random(seed)
    // the variant leg rides a SEMI-STRUCTURED column derived from
    // (id, v) through every MOR artifact state — its expectation is
    // reconstructible from the same driver model
    def withVar(df0: org.apache.spark.sql.DataFrame) =
      if (!variant) df0
      else df0.selectExpr("id", "v", "g",
        "parse_json(concat('{\"n\":', id, ',\"s\":\"', v, '\"}')) AS w")
    val base = withVar(Seq((0L, "", 0L)).toDF("id", "v", "g"))
    val t = LakeTable.create(spark,
      TestSpark.tmpDir(s"icefuzz-$seed") + "/t", base.schema,
      partitionBy = if (partitioned) Seq("g") else Nil,
      properties = Map(
        LakeTable.PROP_DELETE_MODE -> "merge-on-read",
        LakeTable.PROP_MERGE_MODE -> "merge-on-read") ++
        (if (lineage) Map(LakeTable.PROP_ROW_LINEAGE -> "true")
         else Map.empty))
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 0L
    def df(rows: Seq[(Long, String)]) =
      withVar(rows.map { case (k, v) => (k, v, k % 5) }
        .toDF("id", "v", "g"))

    var exports = 0
    var sawPuffinDv = false
    (1 to steps).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val n = 1 + rnd.nextInt(40)
          val rows = (0 until n).map { _ =>
            nextId += 1; (nextId, s"a$step-$nextId")
          }
          t.append(df(rows).repartition(1 + rnd.nextInt(3)))
          rows.foreach { case (k, v) => model(k) = v }
        case 3 | 4 | 5 =>
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
        case 6 | 7 =>
          val m = 2 + rnd.nextInt(9)
          val r = rnd.nextInt(m)
          t.delete(col("id") % m === r.toLong && col("id") <= nextId)
          model.keys.toSeq.filter(k => k % m == r)
            .foreach(model.remove)
        case 8 => rnd.nextInt(3) match {
          case 0 => t.convertEqualityDeletes()
          case 1 => t.consolidateDeleteVectors()
          case _ =>
            t.convertEqualityDeletes()
            t.consolidateDeleteVectors()
        }
        case 9 => t.compact(1 + rnd.nextInt(2))
      }
      if (step % 5 == 0 || step == steps) {
        exports += 1
        // a v3 export encodes position deletes as puffin DVs, which
        // requires them consolidated — a legal public op that leaves
        // the row set untouched, so the model is unaffected
        if (formatVersion == 3) t.consolidateDeleteVectors()
        val meta = IcebergExport.export(t,
          TestSpark.tmpDir(s"icefuzz-$seed-out$step"),
          formatVersion = formatVersion)
        if (formatVersion == 3 && IcebergImport.load(meta,
            spark.sessionState.newHadoopConf()).deleteEntries
            .exists(_.format == "puffin"))
          sawPuffinDv = true
        val scanned =
          if (!variant) IcebergImport.scan(spark, meta)
          else IcebergImport.scan(spark, meta).selectExpr("id", "v",
            "g", "variant_get(w, '$.n', 'long')",
            "variant_get(w, '$.s', 'string')")
        val got = scanned.collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)) ->
            (if (variant) (r.getLong(3), r.getString(4))
            else (r.getLong(0), ""))))
          .toMap
        val want = model.map { case (k, v) => k -> ((v, k % 5) ->
          (if (variant) (k, v) else (k, ""))) }.toMap
        assert(got == want,
          s"seed $seed step $step export diverged: import ${got.size} " +
            s"rows vs model ${want.size}; " +
            s"extra=${(got.keySet -- want.keySet).take(5)}, " +
            s"missing=${(want.keySet -- got.keySet).take(5)}")
        if (lineage && formatVersion == 3) {
          // L37 round-trip: the importer's _row_id (materialized
          // column ∪ first_row_id + position) must equal graft's own
          // lineage scan, row for row
          val gotIds = IcebergImport.scan(spark, meta,
              withRowLineage = true)
            .select("id", "_row_id").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val wantIds = t.scanWithLineage()
            .select("id", "_row_id").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(gotIds == wantIds,
            s"seed $seed step $step lineage diverged: " +
              (gotIds.toSet -- wantIds.toSet).take(5).toString +
              " vs " + (wantIds.toSet -- gotIds.toSet).take(5))
        }
      }
    }
    assert(exports >= steps / 5)
    // coverage guard (the DeltaRoundtripFuzzSpec precedent): a v3 run
    // whose ladder never produced a puffin DV would silently stop
    // exercising the v3 delete path — fail the FIXTURE instead
    if (formatVersion == 3)
      assert(sawPuffinDv,
        s"seed $seed: no export carried puffin deletion vectors — " +
          "the v3 fuzz lost its DV coverage")
  }

  test("random artifact states export + import model-exact " +
      "(seed 42, unpartitioned)") { run(42, 25, partitioned = false) }

  test("random artifact states export + import model-exact " +
      "(seed 11, identity-partitioned)") { run(11, 25, partitioned = true) }

  test("random artifact states export + import model-exact as V3 " +
      "puffin-DV trees (seed 73, unpartitioned)") {
    run(73, 25, partitioned = false, formatVersion = 3)
  }

  test("random artifact states export + import model-exact as V3 " +
      "(seed 29, identity-partitioned)") {
    run(29, 25, partitioned = true, formatVersion = 3)
  }

  test("random artifact states round-trip ROW LINEAGE as V3 " +
      "(seed 57): imported _row_id ≡ graft's L37 scan at every " +
      "export point") {
    run(57, 25, partitioned = false, formatVersion = 3,
      lineage = true)
  }

  test("random artifact states round-trip a VARIANT column as V3 " +
      "(seed 91, identity-partitioned): semi-structured values " +
      "survive every MOR artifact state, compaction, and the " +
      "puffin-DV export") {
    run(91, 25, partitioned = true, formatVersion = 3,
      variant = true)
  }
}
