package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonLite

/** Differential fuzz of [[JsonLite]] against Jackson (the reference JSON
  * implementation already on Spark's classpath — TEST-ONLY usage; the
  * connector stays JDK-only):
  *
  *   1. VALID documents: random value trees rendered by Jackson (so the
  *      text is RFC-compliant by construction) must parse to the exact
  *      same structure — strings, nesting, and the Long/Double number
  *      split all preserved. Doubles compare bit-exactly: Jackson renders
  *      shortest-round-trip text and JsonLite parses via parseDouble,
  *      which inverts it.
  *   2. CORRUPTED documents: random mutations (truncate, splice, flip)
  *      of valid text must either still parse or throw the transport's
  *      IOException — never a StackOverflowError, NumberFormatException,
  *      StringIndexOutOfBounds, or hang. This is the failure-mode
  *      contract the retry classifier depends on.
  */
class JsonLiteDifferentialSpec extends AnyFunSuite {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  private val mapper = new ObjectMapper()

  private def randomString(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(12)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(8) match {
        case 0 => sb += '"'
        case 1 => sb += '\\'
        case 2 => sb += '\n'
        case 3 => sb += '\t'
        case 4 => sb += (0xA0 + rnd.nextInt(0x500)).toChar // non-ASCII BMP
        case 5 => sb += (1 + rnd.nextInt(0x1F)).toChar     // control chars
        case _ => sb += ('a' + rnd.nextInt(26)).toChar
      }
    }
    sb.toString
  }

  /** Build a random Jackson tree, depth-bounded. */
  private def randomNode(rnd: scala.util.Random, depth: Int): JsonNode = {
    val f = mapper.getNodeFactory
    val leafOnly = depth <= 0
    rnd.nextInt(if (leafOnly) 5 else 7) match {
      case 0 => f.nullNode()
      case 1 => f.booleanNode(rnd.nextBoolean())
      case 2 => f.numberNode(rnd.nextLong() >> rnd.nextInt(40))
      case 3 =>
        // finite doubles only (JSON has no NaN/Inf); bias to exponents
        val d = rnd.nextInt(3) match {
          case 0 => rnd.nextDouble() * 1e12
          case 1 => -rnd.nextDouble() / 1e9
          case _ => rnd.nextInt(1000) + 0.5
        }
        f.numberNode(d)
      case 4 => f.textNode(randomString(rnd))
      case 5 =>
        val a: ArrayNode = f.arrayNode()
        (0 until rnd.nextInt(5)).foreach(_ => a.add(randomNode(rnd, depth - 1)))
        a
      case _ =>
        val o: ObjectNode = f.objectNode()
        (0 until rnd.nextInt(5)).foreach(_ =>
          o.set[JsonNode](randomString(rnd) + rnd.nextInt(100), randomNode(rnd, depth - 1)))
        o
    }
  }

  /** Jackson tree → the shape JsonLite promises (Map/Vector/String/Long/
    * Double/Boolean/null). */
  private def expected(n: JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n.isNull) null
    else if (n.isBoolean) java.lang.Boolean.valueOf(n.booleanValue())
    else if (n.isIntegralNumber) java.lang.Long.valueOf(n.longValue())
    else if (n.isFloatingPointNumber) java.lang.Double.valueOf(n.doubleValue())
    else if (n.isTextual) n.textValue()
    else if (n.isArray) n.elements().asScala.map(expected).toVector
    else if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> expected(e.getValue)).toMap
    else fail(s"unexpected node type: $n")
  }

  test("differential: 500 random Jackson-rendered documents parse to identical trees") {
    val rnd = new scala.util.Random(2026)
    (1 to 500).foreach { i =>
      val tree = randomNode(rnd, depth = 4)
      val text = mapper.writeValueAsString(tree)
      val got = JsonLite.parse(text)
      val exp = expected(tree)
      assert(got == exp, s"doc $i: JsonLite disagreed with Jackson on: $text")
    }
  }

  test("fuzz: mutated documents throw only the transport's IOException") {
    val rnd = new scala.util.Random(4047)
    var parsedOk = 0
    var rejected = 0
    (1 to 800).foreach { i =>
      val text = mapper.writeValueAsString(randomNode(rnd, depth = 3))
      val mutated = rnd.nextInt(3) match {
        case 0 if text.nonEmpty => // truncate
          text.take(rnd.nextInt(text.length))
        case 1 if text.nonEmpty => // flip one char to random printable/structural
          val at = rnd.nextInt(text.length)
          val repl = "{}[]\",:\\e+-.0x".charAt(rnd.nextInt(14))
          text.updated(at, repl)
        case _ => // splice a random fragment into the middle
          val at = rnd.nextInt(text.length + 1)
          text.take(at) + randomString(rnd) + text.drop(at)
      }
      try { JsonLite.parse(mutated); parsedOk += 1 }
      catch {
        case _: java.io.IOException => rejected += 1
        case t: Throwable => fail(
          s"doc $i: mutation leaked a ${t.getClass.getSimpleName} " +
            s"(${t.getMessage}) past the IOException contract: $mutated")
      }
    }
    // sanity: the mutator actually produced plenty of malformed docs (and
    // some mutations legitimately stay valid, e.g. flips inside strings)
    assert(rejected > 200, s"only $rejected/800 mutations were rejected — fuzzer too tame?")
    assert(parsedOk + rejected == 800)
  }
}
