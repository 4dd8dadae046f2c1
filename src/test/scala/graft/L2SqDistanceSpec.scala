package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native fused l2_sq vs the composable sequential fold it replaced in
  * Clustering/Similarity: bit-identical results (the e4b/e17 oracles
  * hash-pin the fold's order against DuckDB's list_reduce, so the swap
  * must be invisible at the bit level), matching NULL/empty semantics,
  * and resolution through the SQL surface. */
class L2SqDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  test("native == fold bit-for-bit on random float vectors (codegen and interpreted)") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 60L).map(i =>
      (i, Seq.fill(48)(rnd.nextFloat() * 2 - 1), Seq.fill(48)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "af", "bf")
      .select(col("id"),
        transform(col("af"), x => x.cast("double")).as("a"),
        transform(col("bf"), x => x.cast("double")).as("b"))
    val out = df.select(
      fold(col("a"), col("b")).as("fold"),
      call_function("l2_sq", col("a"), col("b")).as("native"))
      .as[(Double, Double)].collect()
    assert(out.length == 60)
    out.foreach { case (f, n) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(n),
        s"fold=$f native=$n differ in bits")
    }
    // interpreted path (eval, not codegen): force via a filter on a
    // non-deterministic-free branch is fiddly — instead call the
    // expression's eval directly through a one-row local relation
    val single = spark.sql(
      "SELECT l2_sq(array(1.5d, -2.0d), array(0.5d, 2.0d)) AS d").as[Double].head()
    assert(single == 1.0 + 16.0)
  }

  test("semantics mirror the fold: unequal lengths NULL, empty arrays 0.0") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0)),          // unequal -> NULL (both forms)
      (2L, Seq.empty[Double], Seq.empty[Double]) // empty -> 0.0 (the fold's seed)
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      fold(col("a"), col("b")).as("fold"),
      call_function("l2_sq", col("a"), col("b")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"id=${r.getLong(0)}: null-ness diverged (fold=${r.get(1)}, native=${r.get(2)})")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(2))
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(2) == 0.0)
  }

  test("null ELEMENTS poison the result to NULL, matching the fold (r15 ADVICE)") {
    // ArrayData.getDouble on a null slot silently reads 0.0 — before the
    // fix, l2_sq returned a wrong non-null distance here while the fold
    // it claims to mirror propagated NULL. Cover both the codegen'd
    // column path and cosine_sim (same latent bug class).
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 2.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      fold(col("a"), col("b")).as("fold"),
      call_function("l2_sq", col("a"), col("b")).as("l2"),
      call_function("cosine_sim", col("a"), col("b")).as("cos"))
      .collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"id=${r.getLong(0)}: l2_sq null-ness diverged from fold")
    }
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3), "null slot on left must poison")
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3), "null slot on right must poison")
    assert(rows(2).getDouble(2) == 8.0 && !rows(2).isNullAt(3),
      "clean row must still compute")
  }

  test("float arrays coerce up through the SQL registration") {
    val d = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(call_function("l2_sq", col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(d == 8.0)
  }
}
