package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("normalizeUrl applies every documented rule") {
    assert(norm("  HTTPS://WWW.Example.COM:443/a//b/?b=2&a=1#frag  ") ==
      Seq("https://example.com/a/b?a=1&b=2"))
    // default port stripped only for the matching scheme
    assert(norm("http://x.com:80/p") == Seq("http://x.com/p"))
    assert(norm("http://x.com:443/p") == Seq("http://x.com:443/p"))
    assert(norm("https://x.com:8080/p") == Seq("https://x.com:8080/p"))
    // root path normalizes to empty; bare host unchanged
    assert(norm("https://x.com/") == Seq("https://x.com"))
    assert(norm("https://x.com") == Seq("https://x.com"))
    // tracking params dropped, empties dropped, rest sorted
    assert(norm("http://x.com/p?utm_source=a&utm_campaign=b&z=1&&a=2&fbclid=q&gclid=r&ref=s") ==
      Seq("http://x.com/p?a=2&z=1"))
    // all params tracking → no query part at all
    assert(norm("http://x.com/p?utm_source=a") == Seq("http://x.com/p"))
    // value-less tracking param also dropped
    assert(norm("http://x.com/p?ref&a=1") == Seq("http://x.com/p?a=1"))
    // a non-tracking param NAMED like a prefix survives
    assert(norm("http://x.com/p?utmost=1") == Seq("http://x.com/p?utmost=1"))
    assert(norm("http://x.com/p?refx=1") == Seq("http://x.com/p?refx=1"))
  }

  test("unparseable input normalizes to null, not a junk key") {
    val got = Seq("not a url", "relative/path?a=1", "://nohost", "http://",
        "mailto:user@x.com")
      .toDF("u").select(UrlOps.normalizeUrl(col("u"))).collect()
    assert(got.forall(_.isNullAt(0)), got.mkString(","))
  }

  test("host extraction strips www and port, lowercases") {
    val got = Seq("HTTPS://WWW.Example.COM:8443/x", "http://plain.org",
        "https://www.www-like.net/a")
      .toDF("u").select(UrlOps.host(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("example.com", "plain.org", "www-like.net"))
  }

  test("normalization is idempotent") {
    val messy = Seq(
      "HTTP://WWW.A.COM:80//x//y/?z=1&utm_source=s#f",
      "https://B.org:443/p?b=2&a=1",
      "HtTp://c.net:9090///deep//path///?ref=r&k=v")
    val once = norm(messy: _*)
    assert(norm(once: _*) == once)
  }

  test("normalization is idempotent on 300 seeded random URLs") {
    val rnd = new scala.util.Random(7)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = (0 until 300).map { _ =>
      val scheme = pick(Seq("http", "HTTP", "https", "HtTpS"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = pick(Seq("a.com", "Sub.B.org", "x-y.net"))
      val port = pick(Seq("", ":80", ":443", ":8080", ":9"))
      val segs = (0 until rnd.nextInt(4)).map(_ =>
        "/" * (1 + rnd.nextInt(3)) + pick(Seq("p", "Q", "r5")))
      val slash = pick(Seq("", "/", "//"))
      val params = (0 until rnd.nextInt(5)).map(_ =>
        pick(Seq("a=1", "z=9", "utm_source=x", "gclid=g", "ref", "b=2", "")))
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#sec/2?x=1"))
      s"$scheme://$www$host$port${segs.mkString}$slash$query$frag"
    }
    val once = norm(urls: _*)
    val twice = norm(once: _*)
    once.zip(twice).zip(urls).foreach { case ((o, t), u) =>
      assert(o == t, s"not idempotent for $u: '$o' -> '$t'")
    }
    // sanity: no fragment, no tracking param, no double slash in
    // any normalized path, no uppercase scheme/host
    once.foreach { o =>
      assert(!o.contains("#") && !o.contains("utm_") &&
        !o.contains("gclid") && !o.matches(".*://.*//.*"), o)
      assert(o.takeWhile(_ != '/') == o.takeWhile(_ != '/').toLowerCase, o)
    }
  }
}
