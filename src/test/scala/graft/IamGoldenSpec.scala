package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph

/** Golden test on the reference's own domain: the annotated indirect-access
  * walk of README.md:20-33 (user —in→ nested groups —in→ role —in→
  * project), plus the cases the reference handles specially or not at all:
  *   - an external group that cannot be expanded (main.go:291-296 →
  *     isExternal flag),
  *   - an allUsers grant modeled as a group vertex (main.go:463-483),
  *   - a group-membership CYCLE — which the reference's recursive
  *     getGroupMembers (main.go:347, no visited-set) never terminates on.
  */
class IamGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vertices = Seq(
    (1L, "user", "user1@domain.com", Map.empty[String, String]),
    (2L, "group", "subgroup1@domain.com", Map("isExternal" -> "false")),
    (3L, "group", "group_of_groups_1@domain.com", Map("isExternal" -> "false")),
    (4L, "role", "roles/appengine.codeViewer", Map.empty[String, String]),
    (5L, "project", "gcp-project-200601", Map.empty[String, String]),
    (6L, "group", "external@partner.com", Map("isExternal" -> "true")),
    (7L, "group", "allUsers", Map.empty[String, String]),
    (8L, "user", "user2@domain.com", Map.empty[String, String]),
    (9L, "group", "cycle_a@domain.com", Map.empty[String, String]),
    (10L, "group", "cycle_b@domain.com", Map.empty[String, String]))
    .toDF("id", "label", "key", "props")

  private val edges = Seq(
    (1L, 2L),   // user1 in subgroup1            (README step 1)
    (2L, 3L),   // subgroup1 in group_of_groups1 (README step 2)
    (3L, 4L),   // group_of_groups1 granted role (README step 3)
    (4L, 5L),   // role bound on project         (README step 4)
    (6L, 3L),   // external group nested inside  (main.go:291-296)
    (7L, 4L),   // allUsers granted the role     (main.go:463-483)
    (8L, 9L),   // user2 in cycle_a
    (9L, 10L),  // cycle_a in cycle_b
    (10L, 9L),  // cycle_b in cycle_a  <- the reference loops forever here
    (10L, 4L))  // cycle escapes into the role
    .map { case (s, d) => (s, d, "in", 1) }.toDF("src", "dst", "label", "weight")

  private def g = PropertyGraph(vertices, edges)

  test("flagship: every principal with (possibly indirect) access to the project") {
    val closure = g.reachFix(g.V, dedupStart = false)
    val project = g.lookup("project", "gcp-project-200601").select(col("id").as("node"))
    val principals = closure.join(project, "node")
      .join(g.V.select(col("id").as("origin"), col("label"), col("key")), "origin")
      .filter(col("label").isin("user", "group"))
      .select("key").as[String].collect().toSet
    assert(principals == Set(
      "user1@domain.com", "subgroup1@domain.com", "group_of_groups_1@domain.com",
      "external@partner.com", "allUsers",
      "user2@domain.com", "cycle_a@domain.com", "cycle_b@domain.com"))
  }

  test("user1's full reachability matches the README walk") {
    val r = g.reachFix(Seq(1L).toDF("id")).select("node").as[Long].collect().toSet
    assert(r == Set(2L, 3L, 4L, 5L))
  }

  test("cycle members still terminate and both reach the project") {
    val r = g.reachFix(Seq(9L).toDF("id")).select("node").as[Long].collect().toSet
    assert(r == Set(9L, 10L, 4L, 5L)) // includes itself via the cycle
  }

  test("external groups are flagged, not expanded away") {
    val ext = g.V.filter(col("props").getItem("isExternal") === "true")
      .select("key").as[String].collect().toSeq
    assert(ext == Seq("external@partner.com"))
  }

  test("k-bounded walk: exactly the README's 4 hops from user to project") {
    val hops = g.reach(Seq(1L).toDF("id"), 4)
      .filter(col("node") === 5L).select("hop").as[Int].collect().toSeq
    assert(hops == Seq(4))
  }

  test("the README walk runs as Gremlin TEXT: user -> ... -> project in 4 out()s") {
    val reached = gremlin.GremlinLite.run(g,
      "g.V().hasLabel('user').has('key','user1@domain.com')" +
        ".repeat(out('in')).times(4).values('key')")
      .as[String].collect().toSeq
    assert(reached == Seq("gcp-project-200601"))
  }
}
