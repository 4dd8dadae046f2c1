package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted join / two-phase agg equal their unsalted forms on skewed data. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key — the allUsers shape.
  private lazy val big = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"role${i % 7}" else "allUsers", i.toLong, i * 1.5)
  }.toDF("member", "row_id", "amount")

  private lazy val small = Seq(
    ("allUsers", "grant-a"), ("role0", "grant-b"), ("role3", "grant-c"))
    .toDF("member", "grant")

  test("saltedJoin == plain join (inner), hot key spread over salts") {
    val plain = big.join(small, Seq("member")).orderBy("row_id", "grant")
    val salted = Skew.saltedJoin(big, small, "member", factor = 8).orderBy("row_id", "grant")
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("saltedJoin left join keeps unmatched rows exactly once") {
    val plain = big.join(small, Seq("member"), "left").count()
    val salted = Skew.saltedJoin(big, small, "member", 8, "left").count()
    assert(salted == plain)
  }

  test("saltedSum == plain groupBy sum/count") {
    val plain = big.groupBy("member")
      .agg(sum("amount").as("sum_amount"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val salted = Skew.saltedSum(big, "member", "amount", 8)
      .as[(String, Double, Long)].collect()
    salted.foreach { case (k, s, c) =>
      val (ps, pc) = plain(k)
      assert(math.abs(s - ps) < 1e-6 && c == pc)
    }
    assert(salted.length == plain.size)
  }
}
