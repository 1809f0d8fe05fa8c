package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrent MERGE/DELETE conflict semantics across REAL process
  * boundaries: two child JVMs (own SparkSessions, nothing shared but
  * the table directory) each compute a COW rewrite against the SAME
  * base snapshot, rendezvous at a file barrier immediately before the
  * commit CAS, then race. The protocol must guarantee, per
  * `commit.conflict-mode`:
  *
  *  - `recompute`: the loser re-executes against the winner's HEAD —
  *    both effects land, final state is exactly ONE of the two serial
  *    schedules (serializable isolation, like running the ops one
  *    after the other);
  *  - `fail` (default): the loser surfaces
  *    ConcurrentModificationException and applies NOTHING — the
  *    winner's commit is never partially overwritten or dropped.
  *
  * In-JVM deterministic twins: [[ConflictRetrySpec]]. Append-only
  * cross-process races: [[CrossProcessRaceSpec]]. */
class CrossProcessConflictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def javaBin = new java.io.File(new java.io.File(
    sys.props("java.home"), "bin"), "java").getAbsolutePath

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(root: String, writerId: Int, op: String,
      lo: Long, hi: Long, barrier: String): (Process, java.io.File) = {
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Duser.timezone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.lake.CrossProcessRewriteMain",
      root, writerId.toString, op, lo.toString, hi.toString, barrier))
    val log = java.io.File.createTempFile(s"xconf-w$writerId-", ".log")
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log).start()
    (p, log)
  }

  private def setup(tag: String, mode: Option[String]): String = {
    val root = TestSpark.tmpDir(tag) + "/t"
    val df = spark.range(1, 101).select(col("id"), lit("base").as("v"))
    val t = LakeTable.create(spark, root, df.schema)
    mode.foreach(m => t.setProperties(
      Map(LakeTable.PROP_CONFLICT_MODE -> m)))
    t.append(df)
    root
  }

  private def runChildren(root: String, tag: String,
      a: (String, Long, Long), b: (String, Long, Long)): Seq[Int] = {
    val barrier = TestSpark.tmpDir(s"$tag-barrier")
    val children = Seq(
      spawn(root, 1, a._1, a._2, a._3, barrier),
      spawn(root, 2, b._1, b._2, b._3, barrier))
    children.map { case (p, log) =>
      val done = p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); fail(s"child hung: $log") }
      val code = p.exitValue()
      if (code != 0 && code != 42) System.err.println(
        s"child ${log.getName} failed ($code):\n" +
          new String(java.nio.file.Files.readAllBytes(log.toPath)))
      log.delete()
      code
    }
  }

  test("recompute: overlapping cross-process merge vs delete " +
      "serializes — both effects land, state is a serial schedule") {
    val root = setup("xconf-overlap", Some("recompute"))
    // writer 1 merges ids 1..10 → W1; writer 2 deletes ids 1..5
    val codes = runChildren(root, "xconf-overlap",
      ("merge", 1L, 10L), ("delete", 1L, 5L))
    assert(codes == Seq(0, 0), s"exit codes: $codes")
    val t = LakeTable.load(spark, root)
    val w1 = t.scan().where(col("v") === "W1").count()
    val n = t.scan().count()
    // delete;merge → 100 rows, ids 1..10 = W1. merge;delete → 95 rows,
    // ids 6..10 = W1. ANY other state means a commit was half-dropped.
    assert((n == 100L && w1 == 10L) || (n == 95L && w1 == 5L),
      s"not a serial schedule: count=$n, w1=$w1")
    // both rewrites really committed: create + setProperties +
    // init append + 2 rewrites
    assert(t.history.count() == 5)
  }

  test("recompute: non-overlapping cross-process merges both land") {
    val root = setup("xconf-disjoint", Some("recompute"))
    val codes = runChildren(root, "xconf-disjoint",
      ("merge", 1L, 10L), ("merge", 51L, 60L))
    assert(codes == Seq(0, 0), s"exit codes: $codes")
    val t = LakeTable.load(spark, root)
    assert(t.scan().count() == 100)
    assert(t.scan().where(col("v") === "W1").count() == 10)
    assert(t.scan().where(col("v") === "W2").count() == 10)
    assert(t.history.count() == 5)
  }

  test("fail mode: overlapping cross-process merges — loser fails " +
      "cleanly, winner's commit fully intact") {
    val root = setup("xconf-fail", None) // default commit.conflict-mode
    val codes = runChildren(root, "xconf-fail",
      ("merge", 1L, 10L), ("merge", 5L, 15L))
    // barrier makes the conflict deterministic: exactly one child wins
    assert(codes.sorted == Seq(0, 42), s"exit codes: $codes")
    val winner = if (codes(0) == 0) "W1" else "W2"
    val t = LakeTable.load(spark, root)
    assert(t.scan().count() == 100)
    // ONLY the winner's rows changed — the loser applied nothing
    val vals = t.scan().select("v").distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("base", winner), s"mixed state: $vals")
    val changed = t.scan().where(col("v") === winner).count()
    assert(changed == (if (winner == "W1") 10L else 11L))
    assert(t.history.count() == 3) // create + init + winner only
  }
}
