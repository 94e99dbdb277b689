package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing main for perf investigation (not part of the driver
  * contract): times named SparkEntry queries with the Bench warm/median
  * protocol at SPARK_GRAFT_SF_DIR. Usage: runMain graft.QuickTime q58_embedding_near_dup ...
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q58_embedding_near_dup", "q59_ann_topk")
    names.foreach {
      case "dense10x" =>
        import org.apache.spark.sql.functions._
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val emb10 = (0 until 10).map(c =>
          emb.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"), col("embedding")))
          .reduce(_ unionByName _).repartition(64).cache()
        emb10.count()
        def run() = graft.analytics.Dedup
          .embeddingCosinePairs(emb10, "vec_id", "embedding", 0.45).count()
        run()
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        println(f"QUICKTIME dense10x runs=${runs.map(r => f"$r%.3f").mkString(",")} median=${runs.sorted.apply(1)}%.3f")
        emb10.unpersist()
      case name =>
        (1 to 2).foreach(_ => SparkEntry.queries(name)(spark, sfDir).count())
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"QUICKTIME $name runs=${runs.map(r => f"$r%.3f").mkString(",")} median=${runs.sorted.apply(1)}%.3f")
    }
    spark.stop()
  }
}
