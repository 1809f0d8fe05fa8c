package graft.lake

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Catalog-level multi-table transactions: stage-on-branch, PREPARED
  * marker as the decision point, idempotent roll-forward recovery. */
class LakeTransactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(tag: String): LakeCatalog = {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir(tag))
    cat.createNamespace("ns")
    Seq("t1", "t2").foreach { t =>
      val df = Seq((1L, "base")).toDF("id", "v")
      cat.createTable("ns", t, df.schema)
      cat.loadTable("ns", t).append(df)
    }
    cat
  }

  test("both tables publish together; nothing visible before commit") {
    val cat = freshCatalog("txn-ok")
    val results = cat.transaction("ns") { txn =>
      txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
      txn.append("t2", Seq((2L, "b")).toDF("id", "v"))
      txn.append("t2", Seq((3L, "c")).toDF("id", "v"))
      // nothing has committed while the body runs
      assert(cat.loadTable("ns", "t1").scan().count() == 1)
      assert(cat.loadTable("ns", "t2").scan().count() == 1)
      // read-your-writes preview
      assert(txn.scan("t1").count() == 2)
      assert(txn.scan("t2").count() == 3)
    }
    assert(results.keySet == Set("t1", "t2"))
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 3)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("body failure rolls back: no table moves, nothing staged") {
    val cat = freshCatalog("txn-rb")
    val before1 = cat.loadTable("ns", "t1").currentSnapshotId
    intercept[RuntimeException] {
      cat.transaction("ns") { txn =>
        txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
        sys.error("boom")
      }
    }
    val t1 = cat.loadTable("ns", "t1")
    assert(t1.currentSnapshotId == before1)
    assert(t1.scan().count() == 1)
    assert(cat.pendingTransactions("ns").isEmpty)
    // the staged changeset was discarded, not orphaned
    assert(t1.branchChangesets(
      cat.pendingTransactions("ns").headOption.getOrElse("txn-none"))
      .isEmpty)
  }

  test("crash mid-publish rolls FORWARD via recoverTransactions") {
    val cat = freshCatalog("txn-crash")
    val id = "deadbeef0001"
    val t1 = cat.loadTable("ns", "t1")
    val t2 = cat.loadTable("ns", "t2")
    // replicate the protocol up to the crash: stage both, write the
    // PREPARED marker, publish ONLY t1, then "crash"
    t1.appendToBranch(s"txn-$id", Seq((2L, "a")).toDF("id", "v"))
    t2.appendToBranch(s"txn-$id", Seq((2L, "b")).toDF("id", "v"))
    val fs = new Path(cat.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(cat.warehouse, s"ns/_txns/$id.json")
    fs.mkdirs(marker.getParent)
    LakeTable.writeStringExclusive(fs, marker,
      s"""{"id":"$id","tables":["t1","t2"]}""")
    t1.fastForwardBranch(s"txn-$id", txn = Some((s"ctxn-$id", 1L)))
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 1) // torn state

    assert(cat.pendingTransactions("ns") == Seq(id))
    val recovered = cat.recoverTransactions("ns")
    assert(recovered == Seq(id))
    // t2 rolled forward; t1 NOT double-published
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("replayed publish with the txn watermark is a no-op") {
    val cat = freshCatalog("txn-replay")
    val t1 = cat.loadTable("ns", "t1")
    t1.appendToBranch("txn-x", Seq((2L, "a")).toDF("id", "v"))
    val snap = t1.fastForwardBranch("txn-x", txn = Some(("ctxn-x", 1L)))
    assert(t1.scan().count() == 2)
    // a crash between commit and staged cleanup replays the publish
    // with changesets parked again: the watermark must swallow it
    t1.appendToBranch("txn-x", Seq((2L, "a")).toDF("id", "v"))
    val again = t1.fastForwardBranch("txn-x", txn = Some(("ctxn-x", 1L)))
    assert(again == snap)
    assert(t1.scan().count() == 2)
    assert(t1.branchChangesets("txn-x").isEmpty) // leftovers cleared
  }

  test("read transaction pins every table against concurrent commits") {
    val cat = freshCatalog("txn-read")
    cat.readTransaction("ns", Seq("t1", "t2")) { read =>
      assert(read("t1").count() == 1)
      // a full write transaction lands mid-read-transaction
      cat.transaction("ns") { txn =>
        txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
        txn.append("t2", Seq((2L, "b")).toDF("id", "v"))
      }
      // pinned reads stay on the pre-commit snapshots, consistently
      assert(read("t1").count() == 1)
      assert(read("t2").count() == 1)
      intercept[IllegalArgumentException](read("t3"))
    }
    // unpinned readers see the committed pair
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
  }

  test("concurrent transactions on the same tables both publish") {
    val cat = freshCatalog("txn-conc")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 3).map { n =>
      new Thread(() =>
        try cat.transaction("ns") { txn =>
          txn.append("t1", Seq((10L + n, s"a$n")).toDF("id", "v"))
          txn.append("t2", Seq((20L + n, s"b$n")).toDF("id", "v"))
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    // txn branches are id-namespaced and fast-forwards are
    // append-shaped commits under optimistic retry: no lost commit
    assert(cat.loadTable("ns", "t1").scan().count() == 4)
    assert(cat.loadTable("ns", "t2").scan().count() == 4)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("empty transaction commits nothing and leaves no marker") {
    val cat = freshCatalog("txn-empty")
    val results = cat.transaction("ns") { _ => () }
    assert(results.isEmpty)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("deterministic-id transaction replayed end-to-end is exactly-once") {
    val cat = freshCatalog("txn-det")
    def runOnce(): Map[String, Long] =
      cat.transactionWithId("ns", "batch-7") { txn =>
        txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
        txn.append("t2", Seq((2L, "b")).toDF("id", "v"))
      }
    val first = runOnce()
    // full replay (crash between table commit and offset commit): the
    // same id publishes NOTHING new — same snapshots, same counts
    val second = runOnce()
    assert(second == first)
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("deterministic-id replay discards a crashed attempt's staging") {
    val cat = freshCatalog("txn-stale")
    // a prior attempt with this id crashed pre-marker, leaving staging
    cat.loadTable("ns", "t1").appendToBranch("txn-batch-3",
      Seq((99L, "stale")).toDF("id", "v"))
    cat.transactionWithId("ns", "batch-3") { txn =>
      txn.append("t1", Seq((2L, "fresh")).toDF("id", "v"))
    }
    val rows = cat.loadTable("ns", "t1").scan()
      .collect().map(_.getString(1)).sorted.toSeq
    // only the replayed body's rows published — the stale row is gone
    assert(rows == Seq("base", "fresh"))
  }

  test("SQL transaction: INSERT batch publishes atomically") {
    val cat = freshCatalog("txn-sql")
    val results = cat.sqlTransaction("ns", Seq(
      "INSERT INTO t1 VALUES (2, 'a'), (3, 'b')",
      "INSERT INTO t2 SELECT id + 10, v FROM t1"))
    assert(results.keySet == Set("t1", "t2"))
    assert(cat.loadTable("ns", "t1").scan().count() == 3)
    // the INSERT..SELECT read COMMITTED t1 (1 row) — the transaction's
    // own staged rows are not visible to SQL statements inside it
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
  }

  test("SQL transaction: non-INSERT statement rolls the batch back") {
    val cat = freshCatalog("txn-sql-rb")
    intercept[UnsupportedOperationException] {
      cat.sqlTransaction("ns", Seq(
        "INSERT INTO t1 VALUES (2, 'a')",
        "DELETE FROM t2 WHERE id = 1"))
    }
    assert(cat.loadTable("ns", "t1").scan().count() == 1)
    assert(cat.loadTable("ns", "t2").scan().count() == 1)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("CALL system.recover_transactions() completes a torn publish") {
    val cat = freshCatalog("txn-sqlrec")
    val id = "cafebabe0002"
    val t1 = cat.loadTable("ns", "t1")
    val t2 = cat.loadTable("ns", "t2")
    t1.appendToBranch(s"txn-$id", Seq((2L, "a")).toDF("id", "v"))
    t2.appendToBranch(s"txn-$id", Seq((2L, "b")).toDF("id", "v"))
    val fs = new Path(cat.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(cat.warehouse, s"ns/_txns/$id.json")
    fs.mkdirs(marker.getParent)
    LakeTable.writeStringExclusive(fs, marker,
      s"""{"id":"$id","tables":["t1","t2"]}""")
    t1.fastForwardBranch(s"txn-$id", txn = Some((s"ctxn-$id", 1L)))

    val out = cat.sql("ns", "CALL system.recover_transactions()")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq(id))
    assert(cat.loadTable("ns", "t1").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("versioned transactions keep ONE watermark property per app") {
    val cat = freshCatalog("txn-versioned")
    (0L to 2L).foreach { v =>
      cat.transactionVersioned("ns", "fanout", v) { txn =>
        txn.append("t1", Seq((100L + v, s"v$v")).toDF("id", "v"))
        txn.append("t2", Seq((200L + v, s"v$v")).toDF("id", "v"))
      }
    }
    val t1 = cat.loadTable("ns", "t1")
    assert(t1.scan().count() == 4)
    // ONE stable watermark, updated in place — not one per run
    val wmarks = t1.properties.keys.filter(_.startsWith("txn.")).toSeq
    assert(wmarks == Seq("txn.fanout"), wmarks.toString)
    assert(t1.properties("txn.fanout") == "2")
    // replay of an already-applied version is a no-op on every table
    val before = t1.currentSnapshotId
    cat.transactionVersioned("ns", "fanout", 1L) { txn =>
      txn.append("t1", Seq((999L, "dup")).toDF("id", "v"))
      txn.append("t2", Seq((999L, "dup")).toDF("id", "v"))
    }
    assert(cat.loadTable("ns", "t1").currentSnapshotId == before)
    assert(cat.loadTable("ns", "t1").scan().count() == 4)
    assert(cat.loadTable("ns", "t2").scan().count() == 4)
  }

  test("ctxn watermarks survive the replay grace window, then GC") {
    val cat = freshCatalog("txn-gc")
    cat.transactionWithId("ns", "adhoc1") { txn =>
      txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
    }
    assert(cat.loadTable("ns", "t1").properties
      .contains("txn.ctxn-adhoc1"))
    // an immediate follow-up publish must NOT collect a fresh
    // watermark — the grace window is what keeps a crashed caller's
    // prompt replay exactly-once
    cat.transactionWithId("ns", "adhoc2") { txn =>
      txn.append("t1", Seq((3L, "b")).toDF("id", "v"))
    }
    val mid = cat.loadTable("ns", "t1").properties
    assert(mid.contains("txn.ctxn-adhoc1"), mid.toString)
    // ... and the replay does skip on it (no duplicate rows)
    cat.transactionWithId("ns", "adhoc1") { txn =>
      txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
    }
    assert(cat.loadTable("ns", "t1").scan().count() == 3)
    // age the watermark past the grace window with plain commits;
    // the next publish then collects every out-of-grace entry
    val t1 = cat.loadTable("ns", "t1")
    (1L to LakeCatalog.CtxnGraceSnapshots).foreach { i =>
      t1.append(Seq((100L + i, "f")).toDF("id", "v"))
    }
    cat.transactionWithId("ns", "adhoc3") { txn =>
      txn.append("t1", Seq((4L, "c")).toDF("id", "v"))
    }
    val props = cat.loadTable("ns", "t1").properties
    assert(!props.contains("txn.ctxn-adhoc1"), props.toString)
    assert(!props.contains("txn.ctxn-adhoc2"), props.toString)
    assert(props.contains("txn.ctxn-adhoc3"))
    assert(cat.loadTable("ns", "t1").scan().count() ==
      3 + LakeCatalog.CtxnGraceSnapshots + 1)
  }

  test("versioned appIds cannot squat the ctxn watermark namespace") {
    val cat = freshCatalog("txn-ctxn-prefix")
    intercept[IllegalArgumentException] {
      cat.transactionVersioned("ns", "ctxn-jobs", 1L) { txn =>
        txn.append("t1", Seq((2L, "a")).toDF("id", "v"))
      }
    }
  }

  test("recovery processes later markers past an unrecoverable one") {
    val cat = freshCatalog("txn-rec-multi")
    val fs = new Path(cat.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(cat.warehouse, "ns/_txns"))
    // marker 'a-bad': staging lost, no watermark — unrecoverable until
    // an operator re-stages or discards it
    LakeTable.writeStringExclusive(fs,
      new Path(cat.warehouse, "ns/_txns/a-bad.json"),
      """{"id":"a-bad","app":"ctxn-a-bad","version":1,"tables":["t1"]}""")
    // marker 'b-torn': staged on t2 but never published — a genuine
    // torn publish that recovery must still roll forward
    cat.loadTable("ns", "t2")
      .appendToBranch("txn-b-torn", Seq((2L, "b")).toDF("id", "v"))
    LakeTable.writeStringExclusive(fs,
      new Path(cat.warehouse, "ns/_txns/b-torn.json"),
      """{"id":"b-torn","app":"ctxn-b-torn","version":1,""" +
        """"tables":["t2"]}""")
    val e = intercept[IllegalStateException](
      cat.recoverTransactions("ns"))
    assert(e.getMessage.contains("a-bad"))
    // the poisoned marker stays for retry; b-torn completed anyway
    assert(cat.pendingTransactions("ns") == Seq("a-bad"))
    assert(cat.loadTable("ns", "t2").scan().count() == 2)
    assert(cat.loadTable("ns", "t2").properties
      .contains("txn.ctxn-b-torn"))
  }

  test("in-flight transaction's watermark survives a concurrent GC") {
    // crash mid-publish (marker left), then an unrelated transaction
    // publishes on the same table: the pending txn's watermark must
    // NOT be collected (its marker still exists), so recovery stays
    // exactly-once
    val cat = freshCatalog("txn-gc-pending")
    val id = "tornpub1"
    val t1 = cat.loadTable("ns", "t1")
    t1.appendToBranch(s"txn-$id", Seq((2L, "a")).toDF("id", "v"))
    val fs = new Path(cat.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(cat.warehouse, s"ns/_txns/$id.json")
    fs.mkdirs(marker.getParent)
    LakeTable.writeStringExclusive(fs, marker,
      s"""{"id":"$id","app":"ctxn-$id","version":1,"tables":["t1"]}""")
    // the torn txn already published t1 (crash before marker delete)
    t1.fastForwardBranch(s"txn-$id", txn = Some((s"ctxn-$id", 1L)))
    // unrelated publish GC's stale watermarks — must keep tornpub1's
    cat.transactionWithId("ns", "bystander") { txn =>
      txn.append("t1", Seq((5L, "c")).toDF("id", "v"))
    }
    assert(cat.loadTable("ns", "t1").properties
      .contains(s"txn.ctxn-$id"))
    // recovery is then a clean no-op for t1
    assert(cat.recoverTransactions("ns") == Seq(id))
    assert(cat.loadTable("ns", "t1").scan().count() == 3)
    assert(cat.pendingTransactions("ns").isEmpty)
  }

  test("read transaction pins an initially-empty table as EMPTY") {
    val cat = freshCatalog("txn-read-empty")
    val df = Seq((1L, "x")).toDF("id", "v")
    cat.createTable("ns", "t3", df.schema) // no rows committed
    cat.readTransaction("ns", Seq("t1", "t3")) { read =>
      assert(read("t3").count() == 0)
      assert(read("t3").schema.fieldNames.toSeq == Seq("id", "v"))
      // a commit lands mid-body — the pinned read must NOT see it
      cat.loadTable("ns", "t3").append(df)
      assert(read("t3").count() == 0)
    }
    assert(cat.loadTable("ns", "t3").scan().count() == 1)
  }

  test("recovery refuses to drop a committed txn on lost staging") {
    // marker present, no watermark, no staged changesets: something is
    // genuinely wrong (a replay discarded staging and crashed before
    // restaging) — recovery must propagate and LEAVE the marker so a
    // rerun of the replay can restage, never silently delete it
    val cat = freshCatalog("txn-rec-strict")
    val id = "loststage1"
    val fs = new Path(cat.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(cat.warehouse, s"ns/_txns/$id.json")
    fs.mkdirs(marker.getParent)
    LakeTable.writeStringExclusive(fs, marker,
      s"""{"id":"$id","app":"ctxn-$id","version":1,"tables":["t1"]}""")
    val e = intercept[IllegalStateException](
      cat.recoverTransactions("ns"))
    assert(e.getCause.isInstanceOf[IllegalArgumentException])
    assert(cat.pendingTransactions("ns") == Seq(id))
  }
}
