package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Perf investigation main (round 18, not part of the driver contract):
  * times named SparkEntry queries with the Bench warm/median protocol
  * and, per query, reports the job/stage/task anatomy a UI would show —
  * job count, stage count, task count, summed task time, shuffle
  * read/write bytes and input bytes — so the wall time decomposes into
  * scheduling overhead vs compute vs shuffle (guide §1/§7 without a UI).
  *
  * Usage: runMain graft.PerfProbe [--explain outDir] q32_join_multiway ...
  * With --explain, also writes <outDir>/<name>.txt with the formatted
  * physical plan (the plans/r18 artifact).
  */
object PerfProbe {

  private final class Metrics extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var inputB = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
      tasks += s.stageInfo.numTasks
      taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
      shuffleReadB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      shuffleWriteB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      inputB += s.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
      shuffleReadB = 0L; shuffleWriteB = 0L; inputB = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (explainDir, names0) = args.toSeq match {
      case "--explain" +: dir +: rest => (Some(dir), rest)
      case rest => (None, rest)
    }
    // --all: triage sweep over every declared query (1 warm + 1 timed,
    // scratch teardown + cache clear per query like Verify) to rank
    // where wall time lives across the whole contract surface
    val sweep = names0.headOption.contains("--all")
    val names = if (sweep) SparkEntry.queries.keys.toSeq.sorted
      else if (names0.nonEmpty) names0
      else Seq(
        "q30_agg_pricing", "q32_join_multiway", "q33_window_rank", "q34_topk",
        "q40_window_tumbling", "q41_asof_join", "q50_dedup_exact",
        "q57_minhash_pairs", "q58_embedding_near_dup", "q59_ann_topk",
        "q159_excise_spans")
    val timedRuns = if (sweep) 1 else 3
    val warmRuns = if (sweep) 1 else 2

    val m = new Metrics
    spark.sparkContext.addSparkListener(m)

    explainDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    names.foreach { name =>
      explainDir.foreach { d =>
        val txt = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      // listenerBus is private[spark]; bytecode-public, so reflection
      // reaches it (the SparkSpec drainListenerBus trick)
      def drainBus(): Unit = {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods.find(mm =>
          mm.getName == "waitUntilEmpty" && mm.getParameterCount == 0)
          .foreach(mm => mm.invoke(bus))
      }
      spark.sparkContext.setJobDescription(s"perfprobe: $name")
      val mark = graft.util.Scratch.marker()
      (1 to warmRuns).foreach(_ =>
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Exception =>
          System.err.println(s"[perfprobe] $name warm failed: ${e.getMessage}") })
      // measured runs: report the median-wall run's wall AND metrics
      // (counters reset per run; the tuple travels with its run)
      val runs = (1 to timedRuns).flatMap { i =>
        // drop listener queue lag before resetting counters
        drainBus()
        m.reset()
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Exception =>
            System.err.println(s"[perfprobe] $name failed: ${e.getMessage}"); false }
        val t = (System.nanoTime() - t0) / 1e9
        drainBus()
        if (ok)
          Some((t, m.jobs, m.stages, m.tasks, m.taskTimeMs, m.shuffleReadB, m.shuffleWriteB, m.inputB))
        else None
      }
      if (runs.isEmpty) {
        spark.sparkContext.setJobDescription(null)
        if (sweep) { graft.util.Scratch.releaseSince(mark); spark.catalog.clearCache() }
      } else {
      val med = runs.sortBy(_._1).apply(runs.length / 2)
      println(f"PERFPROBE $name%-28s wall=${med._1}%.3f jobs=${med._2} stages=${med._3} " +
        f"tasks=${med._4} taskTime=${med._5 / 1000.0}%.2fs shufR=${med._6 / 1048576.0}%.1fMB " +
        f"shufW=${med._7 / 1048576.0}%.1fMB input=${med._8 / 1048576.0}%.1fMB " +
        f"walls=${runs.map(r => f"${r._1}%.3f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
      if (sweep) { graft.util.Scratch.releaseSince(mark); spark.catalog.clearCache() }
      }
    }
    spark.stop()
  }
}
