package graft

import org.apache.spark.sql.SparkSession

/** In-process steady-state probe for declared queries (the round-5 q57
  * methodology from BENCH_NOTES.md, generalized): run each named query
  * `reps` times consecutively in ONE JVM — same session, same codegen
  * cache, fresh execution per run — and print every wall time plus the
  * box's loadavg, so within-run spread separates code cost from box
  * load. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.QueryProbe q58_embedding_near_dup 5
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("q58_embedding_near_dup") else args.toSeq.filterNot(_.forall(_.isDigit))
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load() = try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0)
    catch { case _: Exception => "?" }

    names.foreach { name =>
      // warm: codegen + shuffle machinery (untimed, sf0.01 shapes)
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count()
      catch { case _: Exception => () }
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name run$i $t%.3f s load=${load()}")
        t
      }
      val spread = times.max / math.max(times.min, 1e-9)
      println(f"PROBE $name min=${times.min}%.3f median=${times.sorted.apply(reps / 2)}%.3f " +
        f"max=${times.max}%.3f spread=${spread}%.2fx")
    }
    spark.stop()
  }
}
