package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonLite

/** The connector's hand-rolled strict JSON parser: shape mapping, escape
  * decoding, and loud failure on anything malformed. */
class JsonLiteSpec extends AnyFunSuite {

  test("shape mapping: objects, arrays, strings, numbers, booleans, null") {
    val v = JsonLite.parse(
      """{"a":[1,2.5,-3,"x",true,false,null],"b":{"c":{"d":[]}},"e":1e3}""")
    val m = v.asInstanceOf[Map[String, Any]]
    assert(m("a") == Vector(1L, 2.5, -3L, "x", true, false, null))
    assert(m("b") == Map("c" -> Map("d" -> Vector())))
    assert(m("e") == 1000.0) // exponent form is a double even when integral
  }

  test("numbers: integral → Long, fractional/exponent → Double, huge → Double") {
    assert(JsonLite.parse("9999999999") == 9999999999L)
    assert(JsonLite.parse("-7") == -7L)
    assert(JsonLite.parse("0.125") == 0.125)
    assert(JsonLite.parse("2E2") == 200.0)
    // past Long range: falls to Double instead of crashing
    assert(JsonLite.parse("123456789012345678901234567890") == 1.2345678901234568e29)
  }

  test("string escapes decode: quote, backslash, control chars, \\u") {
    assert(JsonLite.parse("""["a\"b","c\\d","e\/f","g\nh\ti","éA"]""") ==
      Vector("a\"b", "c\\d", "e/f", "g\nh\ti", "éA"))
    // \uXXXX (split so scalac's own \u pre-scan ignores the source text)
    assert(JsonLite.parse("\"\\" + "u00e9\"") == "é")
  }

  test("whitespace everywhere legal; empty containers") {
    assert(JsonLite.parse(" { \"a\" : [ ] , \"b\" : { } } ") ==
      Map("a" -> Vector(), "b" -> Map()))
  }

  test("malformed input throws IOException, never returns partial data") {
    val bad = Seq(
      """{"a":1""",          // unterminated object
      """[1,2""",            // unterminated array
      """{"a" 1}""",         // missing colon
      """{"a":1,}""",        // trailing comma
      """[1,,2]""",          // double comma
      """{"a":1}garbage""",  // trailing content
      """ "unterminated """, // unterminated string
      """{"a":tru}""",       // bad literal
      """{"a":"\q"}""",      // bad escape
      """{"a":"\""" + """u12g4"}""", // bad unicode escape (split so scalac's own \u pre-scan ignores it)
      // signed "hex": Integer.parseInt would accept these and decode a
      // character the document never contained (r14 review finding)
      """{"a":"\""" + """u+bc1"}""",
      """{"a":"\""" + """u-bc1"}""",
      """{1:2}""",           // non-string key
      "")                    // empty input
    bad.foreach { b =>
      intercept[java.io.IOException](JsonLite.parse(b))
    }
  }

  test("malformed exponent fails as IOException, not NumberFormatException") {
    // the scanner accepts a dangling 'e'; the parse step must still fail
    // inside the transport's IOException classification
    Seq("1e", "[3.e]", """{"a":2E+}""").foreach { b =>
      intercept[java.io.IOException](JsonLite.parse(b))
    }
  }

  test("bare decimal point is rejected (JSON requires a digit after '.')") {
    // Java's parseDouble accepts "1." and "1.e5"; JSON forbids both —
    // the parser must reject them itself, not inherit Java's leniency
    Seq("1.", "[1.]", """{"a":1.e5}""", "-2.").foreach { b =>
      intercept[java.io.IOException](JsonLite.parse(b))
    }
    // the guard must not over-reject legal fractions
    assert(JsonLite.parse("1.5") == 1.5d)
    assert(JsonLite.parse("-0.25e1") == -2.5d)
  }

  test("hostile nesting fails as IOException, not StackOverflowError") {
    val deep = "[" * 100000 // a server streaming brackets must not kill the task
    intercept[java.io.IOException](JsonLite.parse(deep))
    // legitimate nesting well inside the ceiling still parses
    val ok = ("[" * 100) + "1" + ("]" * 100)
    assert(JsonLite.parse(ok) != null)
  }
}
