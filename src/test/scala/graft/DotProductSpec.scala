package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The native DotProduct expression: bit-parity with the HOF
  * formulation, null handling, codegen path, SQL registration.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, 0.6)),
    (3L, Array.fill(64)(0.125), Array.fill(64)(8.0)),
    (4L, Array.empty[Double], Array.empty[Double])
  ).toDF("id", "a", "b")

  it("matches the higher-order-function formulation bit for bit") {
    val r = vecs.select(col("id"),
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(2)),
        s"mismatch on id=${row.getLong(0)}")
    }
    assert(r.find(_.getLong(0) == 1L).get.getDouble(1) == 32.0)
    assert(r.find(_.getLong(0) == 4L).get.getDouble(1) == 0.0)
  }

  it("accepts float arrays via the cast and null inputs yield null") {
    val f = Seq((1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("id", "a", "b")
    val r = f.select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    assert(r.find(_.getLong(0) == 1L).get.getDouble(1) == 11.0)
    assert(r.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  it("runs inside whole-stage codegen (no fallback)") {
    // repartition defeats the LocalRelation constant-fold so a real
    // projection stage plans
    val df = vecs.repartition(2).select(VectorFunctions.dot(col("a"), col("b")))
    df.collect() // AQE finalizes the physical plan on execution
    val plan = df.queryExecution.executedPlan.toString
    // the *(n) prefix marks a WholeStageCodegen span; a codegen
    // fallback would print a bare "Project"
    assert(plan.contains("*(1) Project [graft_dot"), s"no codegen span in:\n$plan")
  }

  it("registers as SQL function graft_dot (same builder GraftExtensions injects)") {
    graft.functions.GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("dot_vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_dot(a, b) AS d FROM dot_vecs ORDER BY id")
      .select("d").as[Double].collect().toSeq
    val viaApi = vecs.orderBy("id")
      .select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect().toSeq
    assert(viaSql == viaApi)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
  }
}
