package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: per-job / per-stage wall breakdown for a declared query —
  * the "where does the time go" companion to BenchOne. Mirrors Bench's
  * session config exactly, so the breakdown explains the benched number.
  * Usage: Test/runMain graft.ProfileQuery q108_pagerank [q144_ppr ...] */
object ProfileQuery {
  private case class StageRec(id: Int, name: String, tasks: Int,
                              wallMs: Long, runMs: Long, gcMs: Long,
                              shufReadMB: Double, shufWriteMB: Double,
                              inputMB: Double)
  private case class JobRec(id: Int, desc: String, wallMs: Long,
                            startMs: Long, endMs: Long,
                            stages: Seq[StageRec])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withGraftConf(Tables.withBenchShuffle(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"), cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer[JobRec]()
    val jobStart = mutable.Map[Int, (Long, String, Seq[Int])]()
    val stages = mutable.Map[Int, StageRec]()
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) jobStart(js.jobId) = (js.time,
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(""), js.stageIds)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          stages(si.stageId) = StageRec(si.stageId, si.name, si.numTasks,
            (for {c <- si.completionTime; s <- si.submissionTime}
              yield c - s).getOrElse(0L),
            tm.executorRunTime, tm.jvmGCTime,
            tm.shuffleReadMetrics.totalBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            tm.inputMetrics.bytesRead / 1e6)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (collecting) jobStart.remove(je.jobId).foreach {
          case (t0, desc, sids) =>
            jobs += JobRec(je.jobId, desc, je.time - t0, t0, je.time,
              sids.flatMap(stages.get))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // Catalyst phase accounting: QueryPlanningTracker phases per action
    val phaseTotals = mutable.Map[String, Long]().withDefaultValue(0L)
    var actions = 0
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = if (collecting) {
          actions += 1
          qe.tracker.phases.foreach { case (p, s) =>
            phaseTotals(p) += s.durationMs
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      })

    val names = args.toSeq
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { name =>
      // warm pass (JIT + codegen), not collected
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

      jobs.clear(); stages.clear(); phaseTotals.clear(); actions = 0
      collecting = true
      // Poor-man's driver sampler: every 20 ms grab the query thread's
      // stack; bucket by the deepest "interesting" frame. Answers what
      // the driver does in the job-gap without a JVM attach.
      val samples = mutable.Map[String, Int]().withDefaultValue(0)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        import scala.jdk.CollectionConverters._
        while (sampling) {
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                !th.getName.contains("Profile-sampler") &&
                !th.getName.startsWith("Executor task launch")) {
              val key = st.iterator
                .find(f => !f.getClassName.startsWith("java.") &&
                  !f.getClassName.startsWith("scala.") &&
                  !f.getClassName.startsWith("jdk.") &&
                  !f.getClassName.startsWith("sun."))
                .map(f =>
                  s"${f.getClassName.split('.').last}.${f.getMethodName}")
                .getOrElse("jvm/native")
              if (key != "jvm/native")
                samples.synchronized { samples(key) += 1 }
            }
          }
          Thread.sleep(20)
        }
      }, "Profile-sampler")
      sampler.setDaemon(true); sampler.start()
      // one full snapshot early in the run: what is every thread doing
      // (incl. WAITING ones) inside the first dead zone
      val snapAtMs = sys.env.getOrElse("PROFILE_SNAP_MS", "0").toLong
      if (snapAtMs > 0) {
        val snap = new Thread(() => {
          Thread.sleep(snapAtMs)
          import scala.jdk.CollectionConverters._
          val sb = new StringBuilder
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            sb.append(s"--- ${th.getName} [${th.getState}]\n")
            st.take(25).foreach(f => sb.append(s"    $f\n"))
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"/tmp/snap_$name.txt"),
            sb.toString.getBytes)
        })
        snap.setDaemon(true); snap.start()
      }
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"ERR $e"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false; sampler.join(200)
      // let listener events drain
      org.apache.spark.graft.ObsBus.drain(spark.sparkContext)
      collecting = false
      println(f"%n===== $name  wall=$wall%.2f s  rows=$n  jobs=${jobs.size}")
      val jobWall = jobs.map(_.wallMs).sum
      println(f"  sum(job wall)=${jobWall / 1e3}%.2f s   " +
        f"gap(driver/plan)=${wall - jobWall / 1e3}%.2f s")
      println(s"  sql-actions=$actions  catalyst phases (ms): " +
        phaseTotals.toSeq.sortBy(-_._2)
          .map { case (p, ms) => s"$p=$ms" }.mkString(" "))
      if (jobs.nonEmpty) {
        val base = jobs.map(_.startMs).min
        println("  timeline (job start-end, s since first job):")
        jobs.sortBy(_.startMs).foreach { j =>
          println(f"    job ${j.id}%3d  ${(j.startMs - base) / 1e3}%7.2f -> " +
            f"${(j.endMs - base) / 1e3}%7.2f  ${j.desc.take(50)}")
        }
      }
      val samp = samples.synchronized(samples.toSeq)
      val nSamp = samp.map(_._2).sum.max(1)
      println(s"  driver-thread samples (20ms each, $nSamp total):")
      samp.sortBy(-_._2).take(12).foreach { case (k, c) =>
        println(f"    ${c * 100.0 / nSamp}%5.1f%%  $k")
      }
      jobs.sortBy(-_.wallMs).take(18).foreach { j =>
        val d = if (j.desc.length > 70) j.desc.take(70) else j.desc
        println(f"  job ${j.id}%3d ${j.wallMs / 1e3}%7.2f s  $d")
        j.stages.sortBy(-_.wallMs).take(4).foreach { s =>
          println(f"    stage ${s.id}%4d ${s.wallMs / 1e3}%7.2f s " +
            f"tasks=${s.tasks}%4d run=${s.runMs / 1e3}%7.2f gc=${s.gcMs / 1e3}%5.2f " +
            f"sr=${s.shufReadMB}%8.1fMB sw=${s.shufWriteMB}%8.1fMB " +
            f"in=${s.inputMB}%8.1fMB  ${s.name.take(60)}")
        }
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
