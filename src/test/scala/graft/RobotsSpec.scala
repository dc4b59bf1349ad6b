package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

/** robots.txt parser + policy evaluation: group selection, UA-run
  * grammar, pattern translation, longest-match/tie semantics, and
  * the missing-policy default. */
class RobotsSpec extends SparkSpec {

  private val txt =
    """# fixture
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /shared
      |
      |User-agent: *
      |Disallow: /all
      |Allow: /all/ok
      |Crawl-delay: 10
      |Disallow:
      |
      |User-agent: beta
      |Allow: /extra
      |""".stripMargin

  test("group selection: exact token beats *, multi-UA runs share rules, all exact groups combine") {
    // alpha and beta share the first group (consecutive UA lines)
    assert(Robots.parse(txt, "alpha").map(_.pattern) == Seq("/shared"))
    // beta ALSO owns the trailing group → rules combine
    assert(Robots.parse(txt, "BETA").map(_.pattern) == Seq("/shared", "/extra"))
    // unknown agent falls to the * group; empty Disallow ignored;
    // crawl-delay ignored
    assert(Robots.parse(txt, "gamma").map(r => (r.pattern, r.allow)) ==
      Seq(("/all", false), ("/all/ok", true)))
    // no groups at all → no rules
    assert(Robots.parse("# only comments\n\n", "x").isEmpty)
    assert(Robots.parse(null, "x").isEmpty)
  }

  test("pattern translation: quoting, wildcards, end anchor") {
    def find(p: String, path: String): Boolean =
      java.util.regex.Pattern.compile(Robots.toRegex(p)).matcher(path).find()
    assert(find("/foo", "/foo/bar"))
    assert(!find("/foo", "/xfoo"))
    assert(find("/a*/b", "/a123/b456"))
    assert(!find("/a*/b", "/a123/c"))
    assert(find("/end$", "/end"))
    assert(!find("/end$", "/end/more"))
    // regex metachars in paths are LITERAL per the RFC
    assert(find("/p.php", "/p.php"))
    assert(!find("/p.php", "/pxphp"))
    assert(Robots.patternLen("/tmp*") == 5)
    assert(Robots.patternLen("/é") == 3) // octets, not chars
  }

  test("decision algebra: longest match wins, allow wins exact ties, no rule allows") {
    import spark.implicits._
    val robots = Seq(
      ("h.example",
        """User-agent: *
          |Disallow: /p
          |Allow: /p/q
          |Disallow: /p/q
          |Allow: /z
          |Disallow: /z
          |""".stripMargin),
      ("empty.example", "# nothing")).toDF("host", "robots_txt")
    val urls = Seq(
      ("h.example", "/p/x"),       // only /p (len 2, dis) → denied
      ("h.example", "/p/q/x"),     // /p/q allow + /p/q dis TIE → allow wins
      ("h.example", "/z/a"),       // /z allow + /z dis tie → allowed
      ("h.example", "/other"),     // no rule → allowed
      ("empty.example", "/p/x"),   // group with no rules → allowed
      ("nofile.example", "/p/x"))  // host absent from robots table
      .toDF("host", "path")
    val out = Robots.robotsFilter(urls, robots, "anybot")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getBoolean(2))).toMap
    assert(!out(("h.example", "/p/x")))
    assert(out(("h.example", "/p/q/x")))
    assert(out(("h.example", "/z/a")))
    assert(out(("h.example", "/other")))
    assert(out(("empty.example", "/p/x")))
    assert(out(("nofile.example", "/p/x")))
  }

  test("policy join broadcasts the rules side; no cartesian") {
    import spark.implicits._
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "robots_txt")
    val urls = spark.range(100).select(
      concat(lit("h"), $"id" % 3, lit(".example")).as("host"),
      concat(lit("/p/"), $"id").as("path"))
    val plan = Robots.robotsFilter(urls, robots, "bot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
