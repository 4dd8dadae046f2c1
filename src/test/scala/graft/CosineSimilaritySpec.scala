package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Native fused cosine_sim vs the composable fold: bit-identical results,
  * NULL semantics, codegen path. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native == fold bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 50L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("fold"),
      Similarity.cosineNative(col("a"), col("b")).as("native"))
      .as[(Double, Double)].collect()
    out.foreach { case (f, n) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(n))
    }
  }

  test("SQL surface resolves via extensions") {
    val one = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("NULL on length mismatch, zero norm, or NULL input") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),  // length mismatch
      (Seq(0.0, 0.0), Seq(1.0, 2.0))         // zero norm
    ).toDF("a", "b")
    val out = df.select(Similarity.cosineNative(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    val nul = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()
    assert(nul(0).isNullAt(0))
  }
}
