package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.{GraftExtensions, L2Distance, NativeFunctions}

/** Native L2Distance expression: bit-parity with the higher-order
  * formulation, null semantics, codegen, and SQL registration. */
class L2DistanceSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = (0L until 50L).map { i =>
    (i, (0 until 16).map(j => ((i * 31 + j * 7) % 13).toFloat / 3f),
      (0 until 16).map(j => ((i * 17 + j * 11) % 9).toFloat / 2f))
  }.toDF("id", "a", "b")

  test("bit-identical to the higher-order l2 formulation") {
    val rows = vecs.select(
      NativeFunctions.l2Native(col("a"), col("b")).as("native"),
      VectorFunctions.l2(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n)
        === java.lang.Double.doubleToLongBits(h))
    }
  }

  test("null semantics match zip_with padding: mismatch/null-element → NULL") {
    val df = Seq(
      (1L, Seq(1f, 2f), Seq(1f, 2f, 3f)),          // length mismatch
      (2L, Seq(1f, 2f), null.asInstanceOf[Seq[Float]]), // null side
      (3L, Seq(1f, 2f), Seq(1f, 2f)))              // clean
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
      NativeFunctions.l2Native(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) === 0.0)
  }

  test("interpreted eval agrees with codegen eval") {
    // force the interpreted path via a local relation + collect on a
    // non-codegen context: eval() directly
    val e = L2Distance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) === 5.0)
  }

  test("SQL access via the extension's injected function") {
    // mirror what GraftExtensions.apply injects, on the shared session
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("l2_native"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_native"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Distance(children.head, children(1)))
    val r = spark.sql(
      "SELECT l2_native(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS d")
      .as[Double].head()
    assert(r === 5.0)
    assert(new GraftExtensions() != null) // class loads (builder-side hook)
  }

  test("vector_sum aggregate via SQL registration") {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vector_sum"),
      new ExpressionInfo(classOf[graft.plans.VectorSum].getName, "vector_sum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.plans.VectorSum(children.head))
    Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(10.0, 20.0)))
      .toDF("g", "v").createOrReplaceTempView("vs_in")
    val out = spark.sql(
      "SELECT g, vector_sum(v) AS s FROM vs_in GROUP BY g ORDER BY g")
      .as[(Int, Seq[Double])].collect()
    assert(out === Array((0, Seq(4.0, 6.0)), (1, Seq(10.0, 20.0))))
  }

  test("knnExact over the native expression matches the DuckDB-style oracle") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = graft.operators.Knn.vectorAt(emb, col("vec_id"), 0L,
      col("embedding"))
    val viaNative = graft.operators.Knn
      .knnExact(emb, col("embedding"), q, k = 10)
      .select("vec_id").as[Long].collect()
    val viaHof = emb
      .withColumn("dist", round(VectorFunctions.l2(col("embedding"),
        typedlit(q)), 6))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      .select("vec_id").as[Long].collect()
    assert(viaNative === viaHof)
  }
}
