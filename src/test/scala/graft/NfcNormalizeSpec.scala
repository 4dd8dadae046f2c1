package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native nfc_normalize: composition semantics, NULL handling, fast path,
  * and the codegen SQL surface. All non-ASCII is spelled with \\u escapes
  * so no editor/tool can silently re-normalize the fixtures. */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val decomposed = "cafe\u0301 A\u030angstro\u0308m"
  private val composed = "caf\u00e9 \u00c5ngstr\u00f6m"

  test("composes combining sequences to precomposed forms") {
    val out = Seq(Tuple1(decomposed)).toDF("s")
      .select(call_function("nfc_normalize", col("s"))).as[String].head()
    assert(out == composed)
    assert(out.length == decomposed.length - 3)
  }

  test("already-NFC text passes through unchanged (fast path), NULL stays NULL") {
    val rows = Seq(Some("plain ascii"), Some(composed), None).toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .as[Option[String]].collect().toSeq
    assert(rows == Seq(Some("plain ascii"), Some(composed), None))
  }

  test("matches java.text.Normalizer on random mixed strings") {
    val rnd = new scala.util.Random(3)
    val marks = Seq("\u0301", "\u0300", "\u0308", "\u030a", "")
    val strs = (1 to 80).map { _ =>
      (1 to 10).map(_ =>
        "abcdeou".charAt(rnd.nextInt(7)).toString + marks(rnd.nextInt(marks.size))
      ).mkString
    }
    val got = strs.toDF("s")
      .select(col("s"), call_function("nfc_normalize", col("s")).as("n"))
      .as[(String, String)].collect()
    got.foreach { case (s, n) =>
      assert(n == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  test("SQL surface resolves via extensions") {
    val out = spark.sql("SELECT nfc_normalize('cafe\u0301') AS n").as[String].head()
    assert(out == "caf\u00e9")
  }

  test("non-string argument fails analysis loudly") {
    val ex = intercept[Exception] {
      Seq(Tuple1(1L)).toDF("x")
        .select(call_function("nfc_normalize", col("x"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("nfc_normalize"))
  }
}
