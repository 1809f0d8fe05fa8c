package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: attribute one query's wall time (optimization guide §1).
  *
  * Per query it prints, after a noop-sink run under the Bench session
  * shape: total wall seconds, every Spark job's duration with its
  * call-site (which action inside the query paid), and the LakeTable
  * commit-path timer profile (c.* / af.* labels). The gap between the
  * job-sum and the wall is driver-side work (planning, fs metadata,
  * commit protocol outside jobs).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        runMain graft.Prof <queryName> [queryName...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt.max(1)
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // no-fork local fs: without libhadoop, Hadoop's local fs forks a
      // `chmod` per created file/dir (~20 ms each) — see
      // graft.lake.FastLocalFs; file:// only, no semantic change
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.lake.NoForkLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[graft.lake.NoForkLocalFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so the first profiled query is not charged
    // classloading + first codegen
    spark.range(1000000).selectExpr("sum(id) AS s", "count(*) AS n")
      .write.format("noop").mode("overwrite").save()

    // job-time attribution: description/callSite -> summed ms
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    // (stageName, nTasks, wallMs, executorRunTimeMs)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // prefer the graft op label; fall back to the action call site
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          jobs.add(site -> (System.nanoTime() - t0))
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        stages.add((si.name, si.numTasks, wall,
          si.taskMetrics.executorRunTime))
      }
    })

    import graft.lake.LakeTable.{timers, timersEnabled}
    import scala.jdk.CollectionConverters._
    names.foreach { n =>
      (1 to reps).foreach { rep =>
        jobs.clear(); stages.clear(); timers.clear(); timersEnabled.set(true)
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"[$n] FAILED: ${e.getMessage.take(300)}") }
        val wall = (System.nanoTime() - t0) / 1e9
        timersEnabled.set(false)
        spark.catalog.clearCache()
        // let the async listener bus drain before reading the queues
        Thread.sleep(300)
        val bySite = jobs.asScala.toSeq.groupBy(_._1)
          .map { case (site, xs) =>
            (site, xs.size, xs.map(_._2).sum / 1e6) }
          .toSeq.sortBy(-_._3)
        val jobSum = bySite.map(_._3).sum / 1000.0
        println(f"\n===== $n rep$rep wall=$wall%.2f s, " +
          f"jobs=${jobs.size} ($jobSum%.2f s in jobs, " +
          f"${wall - jobSum}%.2f s driver-side) =====")
        bySite.take(30).foreach { case (site, cnt, ms) =>
          println(f"  $ms%9.1f ms  x$cnt%-4d $site") }
        val st = stages.asScala.toSeq
        val stWall = st.map(_._3).sum / 1000.0
        val stRun = st.map(_._4).sum / 1000.0
        println(f"  stages=${st.size} wall-sum=$stWall%.2f s " +
          f"taskRun-sum=$stRun%.2f s; slowest:")
        st.sortBy(-_._3).take(12).foreach { case (nm, nt, w, r) =>
          println(f"    $w%6d ms wall $r%6d ms run  $nt%4d tasks  ${nm.take(70)}") }
        val prof = timers.asScala.toSeq
          .map { case (k, v) => k -> v.get / 1e6 }.sortBy(-_._2)
        if (prof.nonEmpty)
          println("  lake timers: " + prof.map { case (k, ms) =>
            f"$k=$ms%.0f ms" }.mkString(", "))
      }
    }
    spark.stop()
  }
}
