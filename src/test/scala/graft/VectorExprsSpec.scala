package graft

import org.apache.spark.sql.functions._
import graft.llm.Ann

/** Native CosineSim / DotProduct vs the HOF formulation they replaced:
  * BIT-identical doubles (the DuckDB oracle hashes depend on it), the
  * null/length/zero conventions, and lambda-embedded use. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofCosine(a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column) = {
    val na = sqrt(hofDot(a, a)); val nb = sqrt(hofDot(b, b))
    val d = na * nb
    when(d === 0, 0.0).otherwise(hofDot(a, b) / d)
  }

  test("native cosine/dot are BIT-identical to the HOF fold on random " +
    "float vectors (including against a double literal)") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 500L).map(i =>
      (i, Seq.fill(64)((rnd.nextGaussian() * 3).toFloat)))
    val df = rows.toDF("id", "v")
    val q = array(Seq.fill(64)(rnd.nextGaussian()).map(lit): _*)
    val pairs = df.as("a").join(df.as("b"),
      col("a.id") + 1 === col("b.id"))
    val mism = pairs.select(
        Ann.cosine(col("a.v"), col("b.v")).as("nc"),
        hofCosine(col("a.v"), col("b.v")).as("hc"),
        Ann.dot(col("a.v"), col("b.v")).as("nd"),
        hofDot(col("a.v"), col("b.v")).as("hd"))
      .filter(col("nc") =!= col("hc") || col("nd") =!= col("hd"))
      .count()
    assert(mism == 0L)
    val mismQ = df.select(
        Ann.cosine(col("v"), q).as("nc"), hofCosine(col("v"), q).as("hc"))
      .filter(col("nc") =!= col("hc")).count()
    assert(mismQ == 0L)
  }

  test("conventions: zero vector -> 0.0, empty dot -> 0.0, length " +
    "mismatch and null element -> null, null array -> null") {
    val df = Seq(
      (1L, Seq(0f, 0f), Seq(1f, 2f)),
      (2L, Seq(1f, 2f), Seq(1f, 2f))
    ).toDF("id", "a", "b")
    val z = df.filter($"id" === 1L)
      .select(Ann.cosine($"a", $"b")).as[Double].head()
    assert(z == 0.0)
    assert(df.filter($"id" === 2L)
      .select(Ann.dot(array().cast("array<float>"),
        array().cast("array<float>"))).as[Double].head() == 0.0)
    // length mismatch
    val lm = df.filter($"id" === 2L)
      .select(Ann.dot($"a", array(lit(1f)))).as[Option[Double]].head()
    assert(lm.isEmpty)
    // null element
    val ne = df.filter($"id" === 2L)
      .select(Ann.cosine($"a", array(lit(1f), lit(null).cast("float"))))
    assert(ne.as[Option[Double]].head().isEmpty)
    // null array
    val na = df.filter($"id" === 2L)
      .select(Ann.dot($"a", lit(null).cast("array<float>")))
    assert(na.as[Option[Double]].head().isEmpty)
  }

  test("native dot inside a centroid-list transform lambda matches the " +
    "driver-side arithmetic (the ivfAssign shape)") {
    val rnd = new scala.util.Random(5)
    val cents = Seq.tabulate(4)(_ => Seq.fill(8)(rnd.nextGaussian()))
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(8)((rnd.nextGaussian()).toFloat)))
    val df = vecs.toDF("id", "v")
    val centsCol = array(cents.map(c => array(c.map(lit): _*)): _*)
    val got = df.select($"id",
        transform(centsCol, c => Ann.dot($"v", c)).as("sims"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (i, v) =>
      val expect = cents.map(c =>
        c.zip(v).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y.toDouble })
      assert(got(i) == expect, s"id=$i")
    }
  }

  test("mistyped children fail at ANALYSIS time (checkInputDataTypes), " +
    "not mid-execution from eval/codegen") {
    val strings = Seq((1L, Seq("a", "b"))).toDF("id", "v")
    val eCos = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(Ann.cosine($"v", $"v")).collect()
    }
    assert(eCos.getMessage.contains("cosine_sim"), eCos.getMessage)
    val eDot = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(Ann.dot($"v", $"v")).collect()
    }
    assert(eDot.getMessage.contains("dot_product"), eDot.getMessage)
    // a non-array child fails the same way
    val scalars = Seq((1L, 2.0)).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      scalars.select(Ann.cosine($"v", $"v")).collect()
    }: Unit
  }
}
