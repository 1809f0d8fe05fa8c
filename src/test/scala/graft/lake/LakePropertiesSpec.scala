package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.TestSpark
import graft.operators.Dedup

/** Randomized invariants from SURVEY.md §5: merge idempotency, the
  * incremental-scan partition property, and dedup's max-per-key law. */
class LakePropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, minTests: Int): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minTests)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Int)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0, 1000)))

  test("property: merging the same batch twice ≡ once") {
    check(Prop.forAllNoShrink(rowsGen, rowsGen) { (tgt, srcRaw) =>
      val root = TestSpark.tmpDir("prop-merge") + "/t"
      val tdf = tgt.toDF("id", "v")
      val t = LakeTable.create(spark, root, tdf.schema)
      t.append(tdf)
      // source must be ≤1 row per key (the merge contract)
      val src = srcRaw.groupBy(_._1).map(_._2.maxBy(_._2)).toList
        .toDF("id", "v")
      t.merge(src, Seq("id"))
      val once = t.scan().orderBy("id", "v").collect().toSeq
      t.merge(src, Seq("id"))
      val twice = t.scan().orderBy("id", "v").collect().toSeq
      t.drop()
      once == twice
    }, 5)
  }

  test("property: MOR merging the same batch twice ≡ once") {
    check(Prop.forAllNoShrink(rowsGen, rowsGen) { (tgt, srcRaw) =>
      val root = TestSpark.tmpDir("prop-mor") + "/t"
      val tdf = tgt.toDF("id", "v")
      val t = LakeTable.create(spark, root, tdf.schema,
        properties = Map(LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
      t.append(tdf)
      val src = srcRaw.groupBy(_._1).map(_._2.maxBy(_._2)).toList
        .toDF("id", "v")
      t.merge(src, Seq("id"))
      val once = t.scan().orderBy("id", "v").collect().toSeq
      t.merge(src, Seq("id"))
      val twice = t.scan().orderBy("id", "v").collect().toSeq
      t.drop()
      once == twice
    }, 5)
  }

  test("property: full scan ≡ union of incremental scans") {
    check(Prop.forAllNoShrink(rowsGen, rowsGen, rowsGen) { (b1, b2, b3) =>
      val root = TestSpark.tmpDir("prop-inc") + "/t"
      val df1 = b1.toDF("id", "v")
      val t = LakeTable.create(spark, root, df1.schema)
      val s0 = t.currentSnapshotId.get
      val s1 = t.append(df1)
      val s2 = t.append(b2.toDF("id", "v"))
      val s3 = t.append(b3.toDF("id", "v"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      val full = rows(t.scan())
      val pieces = rows(t.incrementalScan(s0, s1)) ++
        rows(t.incrementalScan(s1, s2)) ++ rows(t.incrementalScan(s2, s3))
      t.drop()
      full == pieces.sorted
    }, 5)
  }

  test("property: changelog replays to the final state") {
    check(Prop.forAllNoShrink(rowsGen, rowsGen,
      Gen.listOf(Gen.chooseNum(0L, 12L))) { (b1, b2, delKeys) =>
      val root = TestSpark.tmpDir("prop-changes") + "/t"
      val tdf = b1.toDF("id", "v")
      val t = LakeTable.create(spark, root, tdf.schema,
        properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
      t.append(tdf)
      val src = b2.groupBy(_._1).map(_._2.maxBy(_._2)).toList.toDF("id", "v")
      t.merge(src, Seq("id")) // COW merge
      if (delKeys.nonEmpty)
        t.deleteByKeys(delKeys.toDF("id"), Seq("id")) // MOR delete file
      val ch = t.changes(1L, t.currentSnapshotId.get)
      val replayed = ch
        .where(col(LakeTable.CHANGE_TYPE_COL) === "insert")
        .select("id", "v")
        .exceptAll(ch.where(col(LakeTable.CHANGE_TYPE_COL) === "delete")
          .select("id", "v"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      val fin = t.scan().collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      t.drop()
      replayed == fin
    }, 3)
  }

  test("property: FloatType partition values decode to the exact widened double") {
    // the ADVICE regression: raw.toDouble ("0.1" -> 0.1d) diverges from
    // the boundExpr encoding (0.1f -> 0.10000000149d); the decode must
    // round-trip through Float for every finite float
    check(Prop.forAll(org.scalacheck.Arbitrary.arbitrary[Float]) { f =>
      (f.isNaN || f.isInfinite) || {
        val enc = FileStats.encodePartitionValue(
          org.apache.spark.sql.types.FloatType, f.toString).get
        val expected = f.toDouble
        (enc.min.toDouble == expected || (expected == 0.0 &&
          enc.min.toDouble == -0.0 && enc.max.toDouble == 0.0)) &&
        (enc.max.toDouble == expected || expected == 0.0)
      }
    }, 200)
  }

  test("property: partition spec strings parse stably") {
    val name = Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))
    check(Prop.forAll(name) { c =>
      PartitionSpec.parse(c) ==
        PartitionSpec.Field(c, PartitionSpec.Identity, c)
    }, 50)
    check(Prop.forAll(name, Gen.chooseNum(1, 1024)) { (c, n) =>
      val f = PartitionSpec.parse(s"bucket($n, $c)")
      f.source == c && f.transform == PartitionSpec.Bucket(n) &&
        f.dirName == s"${c}_bucket_$n" && !f.isIdentity
    }, 50)
  }

  test("property: manifest-pruned scans never lose rows (FileIndex)") {
    // The FileIndex prunes on EVERY read now — a wrong prune is a
    // silently missing row anywhere in the engine. Random multi-file
    // tables (FP edge values included) × a predicate grammar: the
    // pruned scan must equal brute-force filtering of all rows.
    val valGen = Gen.frequency(
      (8, Gen.chooseNum(-100.0, 100.0)),
      (1, Gen.const(0.0)), (1, Gen.const(-0.0)),
      (1, Gen.const(Double.NaN)))
    val rowG = Gen.zip(Gen.chooseNum(-50L, 50L), valGen,
      Gen.oneOf("a", "b", "c", "dd"))
    val batchG = Gen.nonEmptyListOf(rowG).map(_.take(40))
    val batchesG = Gen.nonEmptyListOf(batchG).map(_.take(4))
    sealed trait P { def toCol: org.apache.spark.sql.Column }
    case class Cmp(c: String, op: Int, k: Long, d: Double, s: String)
        extends P {
      def toCol = {
        val lhs = col(c)
        val lit0: org.apache.spark.sql.Column = c match {
          case "k" => lit(k); case "x" => lit(d); case _ => lit(s)
        }
        op match {
          case 0 => lhs === lit0
          case 1 => lhs < lit0
          case 2 => lhs >= lit0
        }
      }
    }
    case class Both(a: P, b: P, and: Boolean) extends P {
      def toCol = if (and) a.toCol && b.toCol else a.toCol || b.toCol
    }
    val cmpG: Gen[P] = for {
      c <- Gen.oneOf("k", "x", "s"); op <- Gen.chooseNum(0, 2)
      k <- Gen.chooseNum(-50L, 50L); d <- Gen.chooseNum(-100.0, 100.0)
      s <- Gen.oneOf("a", "b", "c", "dd")
    } yield Cmp(c, op, k, d, s)
    val predG: Gen[P] = Gen.frequency(
      (3, cmpG),
      (1, Gen.zip(cmpG, cmpG, Gen.oneOf(true, false))
        .map { case (a, b, j) => Both(a, b, j) }))
    check(Prop.forAllNoShrink(batchesG, predG) { (batches, p) =>
      val root = TestSpark.tmpDir("prop-prune") + "/t"
      val first = batches.head.toDF("k", "x", "s")
      val t = LakeTable.create(spark, root, first.schema)
      batches.foreach(b => t.append(b.toDF("k", "x", "s").coalesce(1)))
      val pruned = t.scan().where(p.toCol)
        .collect().map(_.toSeq).toList
      val brute = batches.flatten.toDF("k", "x", "s").where(p.toCol)
        .collect().map(_.toSeq).toList
      t.drop()
      // NaN-containing tuples sort pain: compare as multisets of strings
      pruned.map(_.toString).sorted == brute.map(_.toString).sorted
    }, 15)
  }

  test("property: binPack preserves content for any batches and target") {
    // the partial-rewrite path must be lossless for EVERY packing
    // shape: random small batches, a random byte target (sometimes
    // tiny → nothing packs, sometimes huge → everything packs), rows
    // with duplicate values (conservation can't lean on distinctness)
    val rowG = Gen.zip(Gen.chooseNum(-20L, 20L), Gen.oneOf("a", "b"))
    val batchG = Gen.nonEmptyListOf(rowG).map(_.take(20))
    val batchesG = Gen.nonEmptyListOf(batchG).map(_.take(5))
    val targetG = Gen.oneOf(1L, 512L, 4096L, 1L << 20)
    check(Prop.forAllNoShrink(batchesG, targetG) { (batches, target) =>
      val root = TestSpark.tmpDir("prop-binpack") + "/t"
      val first = batches.head.toDF("k", "s")
      val t = LakeTable.create(spark, root, first.schema)
      batches.foreach(b => t.append(b.toDF("k", "s").coalesce(1)))
      val before = t.scan().collect().map(_.toSeq.toString).sorted.toList
      val filesBefore = t.currentSnapshot.get.liveFiles.size
      t.binPack(target)
      val after = t.scan().collect().map(_.toSeq.toString).sorted.toList
      val filesAfter = t.currentSnapshot.get.liveFiles.size
      t.drop()
      before == after && filesAfter <= filesBefore
    }, 10)
  }

  test("property: convertEqualityDeletes is read-invariant for any merge mix") {
    // random merge sequences build arbitrary delete-era stacks
    // (updates, inserts, re-updates of the same key); conversion must
    // never change what a scan returns
    val keyG = Gen.chooseNum(1L, 15L)
    val mergeG = Gen.nonEmptyListOf(Gen.zip(keyG, Gen.identifier.map(_.take(4))))
      .map(_.take(6))
    val mergesG = Gen.nonEmptyListOf(mergeG).map(_.take(3))
    check(Prop.forAllNoShrink(mergesG) { merges =>
      val root = TestSpark.tmpDir("prop-convert") + "/t"
      val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      val t = LakeTable.create(spark, root, df.schema,
        properties = Map(LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
      t.append(df.coalesce(1))
      merges.foreach { m =>
        t.merge(m.distinctBy(_._1).toDF("id", "v"), Seq("id"))
      }
      val before = t.scan().collect().map(_.toSeq.toString).sorted.toList
      t.convertEqualityDeletes()
      val noEq = t.currentSnapshot.get.deleteFiles.isEmpty
      val after = t.scan().collect().map(_.toSeq.toString).sorted.toList
      t.drop()
      noEq && before == after
    }, 8)
  }

  test("property: pruned scans never lose rows across a type widen") {
    // widenColumnType leaves narrow-era files in place and retypes the
    // scan schema: random int/float batches, a widen (int->long,
    // float->double) at a random point in the append sequence, more
    // batches in the wide domain, then wide-typed predicates — the
    // pruned scan must equal brute-force filtering (stats written in
    // the narrow era must re-parse soundly under the wide type, and
    // parquet pushdown must upcast rather than drop rows)
    val rowG = Gen.zip(Gen.chooseNum(-50, 50), Gen.oneOf(
      Gen.chooseNum(-100.0f, 100.0f), Gen.const(0.0f), Gen.const(-0.0f)))
    val batchG = Gen.nonEmptyListOf(rowG).map(_.take(30))
    val batchesG = Gen.nonEmptyListOf(batchG).map(_.take(3))
    val wideRowG = Gen.zip(
      Gen.oneOf(Gen.chooseNum(-50L, 50L), Gen.chooseNum(3000000000L, 3000000050L)),
      Gen.chooseNum(-100.0, 100.0))
    val wideBatchesG = Gen.listOf(Gen.nonEmptyListOf(wideRowG).map(_.take(30)))
      .map(_.take(2))
    val predG = for {
      c <- Gen.oneOf("k", "x")
      op <- Gen.chooseNum(0, 2)
      k <- Gen.oneOf(Gen.chooseNum(-50L, 50L),
        Gen.chooseNum(3000000000L, 3000000050L))
      d <- Gen.chooseNum(-100.0, 100.0)
    } yield {
      val lhs = col(c)
      val rhs = if (c == "k") lit(k) else lit(d)
      op match {
        case 0 => lhs === rhs
        case 1 => lhs < rhs
        case 2 => lhs >= rhs
      }
    }
    check(Prop.forAllNoShrink(batchesG, wideBatchesG, predG) {
      (narrow, wide, p) =>
        val root = TestSpark.tmpDir("prop-widen") + "/t"
        val first = narrow.head.toDF("k", "x")
        val t = LakeTable.create(spark, root, first.schema)
        narrow.foreach(b => t.append(b.toDF("k", "x").coalesce(1)))
        t.widenColumnType("k", org.apache.spark.sql.types.LongType)
        t.widenColumnType("x", org.apache.spark.sql.types.DoubleType)
        wide.foreach(b => t.append(b.toDF("k", "x").coalesce(1)))
        val all = narrow.flatten.map { case (k, x) => (k.toLong, x.toDouble) } ++
          wide.flatten
        val pruned = t.scan().where(p)
          .collect().map(_.toSeq.toString).sorted.toList
        val brute = all.toDF("k", "x").where(p)
          .collect().map(_.toSeq.toString).sorted.toList
        t.drop()
        pruned == brute
    }, 10)
  }

  test("property: pruned scans never lose rows — ntz/decimal/string columns") {
    // Round 7's two pruning bugs both lived in type-encoding corners
    // (fp ±0.0 equality, NTZ literal casts), so the FileIndex soundness
    // sweep must cover every stat-domain family: timestamp_ntz (exact
    // literal pruning via raw wall-clock micros), decimal (NO stats
    // support — the conservative keep-everything fallback must still be
    // lossless), and strings (unsigned-UTF8 bounds), alongside longs.
    import java.time.LocalDateTime
    val baseTs = LocalDateTime.of(2020, 1, 1, 0, 0, 0)
    val tsGen = Gen.chooseNum(0L, 200000L).map(baseTs.plusSeconds)
    val decGen = Gen.chooseNum(-10000L, 10000L).map(c => BigDecimal(c) / 100)
    val rowG = Gen.zip(Gen.chooseNum(-50L, 50L), tsGen, decGen,
      Gen.oneOf("a", "b", "c", "dd"))
    val batchG = Gen.nonEmptyListOf(rowG).map(_.take(30))
    val batchesG = Gen.nonEmptyListOf(batchG).map(_.take(4))
    val predG: Gen[org.apache.spark.sql.Column] = for {
      c <- Gen.oneOf("k", "ts", "dec", "s")
      op <- Gen.chooseNum(0, 2)
      k <- Gen.chooseNum(-50L, 50L)
      tsSecs <- Gen.chooseNum(0L, 200000L)
      // the round-7 trap: a TZ timestamp literal against the NTZ column
      // wraps the COLUMN in a cast — pruning must go conservative, not
      // wrong. Mix both literal spellings.
      tzTrap <- Gen.oneOf(true, false)
      cents <- Gen.chooseNum(-10000L, 10000L)
      str <- Gen.oneOf("a", "b", "c", "dd")
    } yield {
      val lhs = col(c)
      val rhs: org.apache.spark.sql.Column = c match {
        case "k" => lit(k)
        case "ts" =>
          if (tzTrap)
            lit(baseTs.plusSeconds(tsSecs).toString).cast("timestamp")
          else lit(baseTs.plusSeconds(tsSecs))
        case "dec" => lit(BigDecimal(cents) / 100)
        case _ => lit(str)
      }
      op match {
        case 0 => lhs === rhs
        case 1 => lhs < rhs
        case 2 => lhs >= rhs
      }
    }
    check(Prop.forAllNoShrink(batchesG, predG) { (batches, p) =>
      val root = TestSpark.tmpDir("prop-prune-t") + "/t"
      val first = batches.head.toDF("k", "ts", "dec", "s")
      val t = LakeTable.create(spark, root, first.schema)
      batches.foreach(b =>
        t.append(b.toDF("k", "ts", "dec", "s").coalesce(1)))
      val pruned = t.scan().where(p)
        .collect().map(_.toSeq.toString).sorted.toList
      val brute = batches.flatten.toDF("k", "ts", "dec", "s").where(p)
        .collect().map(_.toSeq.toString).sorted.toList
      t.drop()
      pruned == brute
    }, 12)
  }

  test("property: predicate DELETE ≡ brute-force anti-filter (both modes)") {
    // The metadata-delete prover must never over-drop: random batches
    // (nulls included) × random range/equality predicates, in COW and
    // MOR — surviving rows must equal NOT-TRUE filtering of all rows.
    val rowG = Gen.zip(Gen.chooseNum(-40L, 40L),
      Gen.option(Gen.chooseNum(-40L, 40L)), Gen.oneOf("a", "b", "c"))
    val batchesG = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(rowG).map(_.take(25))).map(_.take(3))
    val predG: Gen[org.apache.spark.sql.Column] = for {
      k <- Gen.chooseNum(-40L, 40L)
      c <- Gen.oneOf[org.apache.spark.sql.Column](
        col("k") < k, col("k") >= k, col("x") === k, col("x").isNull,
        col("k") < k && col("s") === "a", lit(true))
    } yield c
    val morG = Gen.oneOf(true, false)
    check(Prop.forAllNoShrink(batchesG, predG, morG) { (batches, p, mor) =>
      val root = TestSpark.tmpDir("prop-del") + "/t"
      val first = batches.head.toDF("k", "x", "s")
      val t = LakeTable.create(spark, root, first.schema,
        properties =
          if (mor) Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read")
          else Map.empty)
      batches.foreach(b => t.append(b.toDF("k", "x", "s").coalesce(1)))
      t.delete(p)
      val got = t.scan().collect().map(_.toSeq.toString).sorted.toList
      val want = batches.flatten.toDF("k", "x", "s")
        .where(!coalesce(p, lit(false)))
        .collect().map(_.toSeq.toString).sorted.toList
      t.drop()
      got == want
    }, 15)
  }

  test("property: dedup keeps the max-ordered row per key") {
    check(Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "seq")
      val got = Dedup.latestPerKey(df, Seq("k"), Seq(col("v"), col("seq")))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
        .toMap
      val want = rows.zipWithIndex
        .map { case ((k, v), i) => (k, (v, i.toLong)) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      got == want
    }, 10)
  }
}
