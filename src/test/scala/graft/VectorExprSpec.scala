package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Unit coverage for the codegen'd vector expressions: value correctness,
  * bit-identity with the composable Spark form (the property the DuckDB
  * oracle gate relies on), float/double input handling, and null safety.
  */
class VectorExprSpec extends AnyFunSuite {
  import TestSpark._

  private def composableCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), _ + _)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  test("dot and cosine compute known values") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("a")).as("self")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("fused cosine is bit-identical to the composable form on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings").limit(50)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val l = v.alias("l"); val r = v.alias("r")
    val both = l.join(r, col("l.vec_id") < col("r.vec_id"))
      .select(
        Similarity.cosine(col("l.v"), col("r.v")).as("fused"),
        composableCosine(col("l.v"), col("r.v")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1),
        s"fused ${row.getDouble(0)} != composed ${row.getDouble(1)}")
    }
  }

  test("float arrays widen per element — same result as pre-cast doubles") {
    val e = Tables.load(spark, sf, "embeddings").limit(20)
    val rows = e.select(
      Similarity.cosine(col("embedding"), col("embedding")).as("raw"),
      Similarity.cosine(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("cast"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(Similarity.cosine(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL text path reaches the registered function") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("select graft_cosine(a, b) as c, graft_dot(a, a) as d from vecs").head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }
}
