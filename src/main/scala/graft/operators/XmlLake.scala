package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML-dialect web-corpus ingestion: sitemaps (sitemaps.org protocol
  * — the crawl-frontier companion to [[Robots]]) and syndication
  * feeds (RSS 2.0 + Atom / RFC 4287 — how a crawler discovers fresh
  * documents). Both ride one STRICT XML 1.0 subset parser written
  * against the W3C grammar — well-formedness is verified, never
  * guessed:
  *
  *  - bytes→text: optional UTF-8 BOM stripped, strict RFC 3629 UTF-8
  *    (malformed rejects), control characters other than TAB/LF/CR
  *    reject (the XML 1.0 Char production);
  *  - optional XML declaration (version 1.0, optional UTF-8 encoding
  *    pseudo-attr); comments (`--` inside rejects, per the spec),
  *    CDATA sections, and the five predefined + numeric character
  *    references; attribute lists with single- or double-quoted
  *    values and NO duplicate names; end tags must match, text may
  *    not contain a raw `&`, `<`, or the sequence `]]>`;
  *  - DOCTYPE declarations and processing instructions REJECT — the
  *    XXE / entity-expansion attack surface simply does not parse
  *    (the codec-family strictness posture doubling as a security
  *    posture);
  *
  * Dialect walks on top of the tree:
  *
  *  - sitemaps.org: `urlset`/`sitemapindex` dispatch with the
  *    protocol's namespace REQUIRED; per-`url` `loc` (http/https,
  *    ≤2048 chars) exactly once; `lastmod` as W3C datetime (date-only
  *    or full UTC datetime profile), `changefreq` from the seven-word
  *    enum, `priority` in [0.0, 1.0] with ≤3 decimals (emitted as
  *    exact integer ppm); the 50 000-entry protocol cap enforced;
  *  - RSS 2.0: `rss version="2.0"` → single `channel` with required
  *    title/link/description, items with each child at most once and
  *    `pubDate` in the strict RFC 5322 profile (day-of-week VERIFIED
  *    against the civil date — [[MimeLake.rfc5322Epoch]]);
  *  - Atom: `feed` in the RFC 4287 namespace, entries with required
  *    title/id/updated, `link` as an EMPTY element carrying `href`
  *    (attribute-path coverage), `updated` in the RFC 3339 UTC
  *    profile.
  *
  * One blob = one task-local walk (embarrassingly parallel over the
  * media table; the codec-family plan shape — no shuffle beyond the
  * presentation sort, gated in PlanAuditSpec).
  */
object XmlLake {

  // ------------------------------------------------------------------
  // strict XML 1.0 subset parser

  private[graft] sealed trait XNode
  private[graft] final case class XText(s: String) extends XNode
  private[graft] final case class XElem(
      name: String, attrs: Vector[(String, String)], kids: Vector[XNode])
    extends XNode {
    def attr(n: String): Option[String] = attrs.find(_._1 == n).map(_._2)
    def elems: Vector[XElem] = kids.collect { case e: XElem => e }
    /** Leaf content: all-text children merged; None if any child
      * element is present. */
    def leafText: Option[String] =
      if (elems.nonEmpty) None
      else Some(kids.collect { case XText(t) => t }.mkString)
    /** Container law: any text between child elements must be
      * whitespace (pretty-printing), never data. */
    def wsOnlyText: Boolean = kids.collect { case XText(t) => t }
      .forall(_.forall(c => c == ' ' || c == '\n' || c == '\t' || c == '\r'))
  }

  private object Fail extends scala.util.control.ControlThrowable

  private val XmlDecl =
    """^<\?xml\s+version=["']1\.0["'](\s+encoding=["'][Uu][Tt][Ff]-8["'])?\s*\?>""".r

  /** Parse one document; None on any well-formedness violation. */
  private[graft] def parseXml(raw: Array[Byte]): Option[XElem] = {
    if (raw == null || raw.length == 0) return None
    val off =
      if (raw.length >= 3 && (raw(0) & 0xff) == 0xef &&
        (raw(1) & 0xff) == 0xbb && (raw(2) & 0xff) == 0xbf) 3
      else 0
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw, off, raw.length - off)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    // XML 1.0 Char production (BMP profile): no controls but TAB/LF/CR
    var ci = 0
    while (ci < s.length) {
      val c = s.charAt(ci)
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') return None
      ci += 1
    }

    var p = 0
    def fail(): Nothing = throw Fail
    def eof: Boolean = p >= s.length
    def cur: Char = { if (eof) fail(); s.charAt(p) }
    def ws(c: Char): Boolean = c == ' ' || c == '\n' || c == '\t' || c == '\r'
    def skipWs(): Unit = while (!eof && ws(s.charAt(p))) p += 1
    def expect(lit: String): Unit = {
      if (!s.startsWith(lit, p)) fail(); p += lit.length
    }
    def nameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
    def nameChar(c: Char): Boolean =
      nameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '.' || c == ':'
    def name(): String = {
      if (!nameStart(cur)) fail()
      val a = p
      p += 1
      while (!eof && nameChar(s.charAt(p))) p += 1
      s.substring(a, p)
    }
    def charRef(): Char = { // cursor ON '&'; returns the decoded char
      p += 1
      val semi = s.indexOf(';', p)
      if (semi < 0 || semi - p > 8 || semi == p) fail()
      val body = s.substring(p, semi)
      p = semi + 1
      body match {
        case "amp" => '&'
        case "lt" => '<'
        case "gt" => '>'
        case "quot" => '"'
        case "apos" => '\''
        case _ =>
          if (body.length < 2 || body.charAt(0) != '#') fail()
          val cp =
            try {
              if (body.charAt(1) == 'x') Integer.parseInt(body.substring(2), 16)
              else Integer.parseInt(body.substring(1), 10)
            } catch { case _: NumberFormatException => fail() }
          if (cp <= 0 || cp > 0xFFFF || (cp >= 0xD800 && cp <= 0xDFFF) ||
            (cp < 0x20 && cp != 0x9 && cp != 0xA && cp != 0xD)) fail()
          cp.toChar // BMP profile: astral refs would need surrogate pairs
      }
    }
    def comment(): Unit = { // cursor past "<!--"
      val close = s.indexOf("-->", p)
      if (close < 0) fail()
      if (s.substring(p, close).contains("--")) fail() // spec: no -- inside
      p = close + 3
    }
    def skipMisc(): Unit = {
      var more = true
      while (more) {
        skipWs()
        if (s.startsWith("<!--", p)) { p += 4; comment() } else more = false
      }
    }
    def attrValue(): String = {
      val q = cur
      if (q != '"' && q != '\'') fail()
      p += 1
      val sb = new StringBuilder
      while (cur != q) {
        val c = cur
        if (c == '<') fail()
        else if (c == '&') sb.append(charRef())
        else { sb.append(c); p += 1 }
      }
      p += 1
      sb.toString
    }
    def element(): XElem = { // cursor past '<', at the name
      val tag = name()
      val attrs = Vector.newBuilder[(String, String)]
      val seen = scala.collection.mutable.HashSet.empty[String]
      var open = true
      var empty = false
      while (open) {
        val before = p
        skipWs()
        cur match {
          case '>' => p += 1; open = false
          case '/' => expect("/>"); open = false; empty = true
          case _ =>
            if (before == p) fail() // attrs need separating whitespace
            val an = name()
            if (!seen.add(an)) fail() // duplicate attribute
            expect("=")
            attrs += ((an, attrValue()))
        }
      }
      val kids = Vector.newBuilder[XNode]
      if (!empty) {
        var closed = false
        val text = new StringBuilder
        def flush(): Unit =
          if (text.nonEmpty) { kids += XText(text.toString); text.clear() }
        while (!closed) {
          val c = cur
          if (c == '<') {
            if (s.startsWith("</", p)) {
              flush(); p += 2
              if (name() != tag) fail()
              skipWs(); expect(">")
              closed = true
            } else if (s.startsWith("<!--", p)) { flush(); p += 4; comment() }
            else if (s.startsWith("<![CDATA[", p)) {
              p += 9
              val close = s.indexOf("]]>", p)
              if (close < 0) fail()
              text.append(s.substring(p, close))
              p = close + 3
            } else if (s.startsWith("<!", p) || s.startsWith("<?", p)) fail()
            else { flush(); p += 1; kids += element() }
          } else if (c == '&') text.append(charRef())
          else if (c == ']' && s.startsWith("]]>", p)) fail() // CharData law
          else { text.append(c); p += 1 }
        }
        flush()
      }
      XElem(tag, attrs.result(), kids.result())
    }

    try {
      XmlDecl.findPrefixOf(s) match {
        case Some(m) => p = m.length
        case None => if (s.startsWith("<?", p)) fail() // other PIs reject
      }
      skipMisc()
      if (s.startsWith("<!", p)) fail() // DOCTYPE: the XXE surface
      expect("<")
      val root = element()
      skipMisc()
      if (!eof) fail()
      Some(root)
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // sitemaps.org walk

  private val SitemapNs = "http://www.sitemaps.org/schemas/sitemap/0.9"
  private val Changefreqs = Vector("always", "hourly", "daily", "weekly",
    "monthly", "yearly", "never")

  private val DateOnly = """^(\d{4})-(\d{2})-(\d{2})$""".r
  private val DateTimeZ =
    """^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$""".r

  /** W3C datetime, strict profile: date-only (midnight UTC) or full
    * UTC datetime. Epoch seconds; None on any other shape. */
  private[graft] def w3cEpoch(t: String): Option[Long] = {
    def day(y: String, m: String, d: String): Option[Long] =
      try Some(java.time.LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay)
      catch { case _: java.time.DateTimeException => None }
    t match {
      case DateOnly(y, m, d) => day(y, m, d).map(_ * 86400L)
      case DateTimeZ(y, m, d, h, mi, se) =>
        if (h.toInt > 23 || mi.toInt > 59 || se.toInt > 59) None
        else day(y, m, d).map(_ * 86400L + h.toInt * 3600L +
          mi.toInt * 60L + se.toInt)
      case _ => None
    }
  }

  /** `0[.ddd] | 1[.000]` → exact ppm; the protocol's [0.0, 1.0]. */
  private[graft] def priorityPpm(t: String): Option[Long] = {
    val re = """^([01])(?:\.(\d{1,3}))?$""".r
    t match {
      case re(whole, frac) =>
        val f = Option(frac).getOrElse("")
        val ppm = whole.toLong * 1000000L +
          f.padTo(3, '0').toLong * 1000L
        if (ppm > 1000000L) None else Some(ppm)
      case _ => None
    }
  }

  private def locOk(u: String): Boolean =
    (u.startsWith("http://") || u.startsWith("https://")) &&
      u.length <= 2048 && !u.exists(c => c == ' ' || c < 0x21)

  private[graft] final case class SiteUrl(
      seq: Int, loc: String, lastmod: Option[Long],
      changefreq: Option[String], priority: Option[Long])

  /** Walk one sitemap document; kind is "urlset" or "index". */
  private[graft] def parseSitemap(raw: Array[Byte]): Option[(String, Seq[SiteUrl])] = {
    val root = parseXml(raw).getOrElse(return None)
    val kind = root.name match {
      case "urlset" => "urlset"
      case "sitemapindex" => "index"
      case _ => return None
    }
    if (!root.attr("xmlns").contains(SitemapNs)) return None
    if (!root.wsOnlyText) return None
    val childTag = if (kind == "urlset") "url" else "sitemap"
    val entries = root.elems
    if (entries.exists(_.name != childTag) || entries.size > 50000)
      return None
    val out = entries.zipWithIndex.map { case (e, i) =>
      if (e.attrs.nonEmpty || !e.wsOnlyText) return None
      val kidsByName = e.elems.groupBy(_.name)
      val allowed =
        if (kind == "urlset") Set("loc", "lastmod", "changefreq", "priority")
        else Set("loc", "lastmod")
      if (!kidsByName.keySet.subsetOf(allowed)) return None
      if (kidsByName.values.exists(_.size > 1)) return None
      def leaf(n: String): Option[String] = kidsByName.get(n).map { es =>
        val e0 = es.head
        if (e0.attrs.nonEmpty) return None
        e0.leafText.getOrElse(return None)
      }
      val loc = leaf("loc").getOrElse(return None)
      if (!locOk(loc)) return None
      val lastmod = leaf("lastmod").map(w3cEpoch(_).getOrElse(return None))
      val cf = leaf("changefreq").map { v =>
        if (!Changefreqs.contains(v)) return None else v
      }
      val pr = leaf("priority").map(priorityPpm(_).getOrElse(return None))
      SiteUrl(i, loc, lastmod, cf, pr)
    }
    Some((kind, out))
  }

  /** Explode a sitemap-media table into per-URL rows. */
  def extractSitemap(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("kind", StringType, true),
      StructField("loc", StringType, true),
      StructField("lastmod_epoch_s", LongType, true),
      StructField("changefreq", StringType, true),
      StructField("priority_ppm", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseSitemap(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((kind, urls)) => urls.map { u =>
            Row(r.getLong(0), u.seq, kind, u.loc,
              u.lastmod.map(Long.box).orNull, u.changefreq.orNull,
              u.priority.map(Long.box).orNull, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // feed walk (RSS 2.0 + Atom)

  private val AtomNs = "http://www.w3.org/2005/Atom"
  private val Rfc3339Z =
    """^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$""".r

  private def rfc3339Epoch(t: String): Option[Long] = t match {
    case Rfc3339Z(_, _, _, _, _, _) => w3cEpoch(t)
    case _ => None
  }

  private[graft] final case class FeedItem(
      item: Int, title: String, link: String, dateEpoch: Long, body: String)

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  private def parseRss(root: XElem): Option[Seq[FeedItem]] = {
    if (!root.attr("version").contains("2.0")) return None
    if (!root.wsOnlyText) return None
    val channel = single(root, "channel").getOrElse(return None)
    if (root.elems.size != 1 || !channel.wsOnlyText) return None
    val allowedChan = Set("title", "link", "description", "item")
    if (!channel.elems.map(_.name).toSet.subsetOf(allowedChan)) return None
    // required channel metadata, each exactly once, text-only
    for (req <- Seq("title", "link", "description"))
      single(channel, req).flatMap(_.leafText).getOrElse(return None)
    val items = channel.elems.filter(_.name == "item")
    val out = items.zipWithIndex.map { case (it, i) =>
      if (!it.wsOnlyText || it.attrs.nonEmpty) return None
      val allowed = Set("title", "link", "description", "pubDate", "guid")
      if (!it.elems.map(_.name).toSet.subsetOf(allowed)) return None
      if (it.elems.groupBy(_.name).values.exists(_.size > 1)) return None
      def leaf(n: String): Option[String] =
        single(it, n).map(_.leafText.getOrElse(return None))
      val title = leaf("title").getOrElse(return None)
      val link = leaf("link").getOrElse(return None)
      val date = leaf("pubDate")
        .map(MimeLake.rfc5322Epoch(_).getOrElse(return None))
        .getOrElse(return None)
      val body = leaf("description").getOrElse(return None)
      FeedItem(i, title, link, date, body)
    }
    Some(out)
  }

  private def parseAtom(root: XElem): Option[Seq[FeedItem]] = {
    if (!root.attr("xmlns").contains(AtomNs)) return None
    if (!root.wsOnlyText) return None
    val allowedFeed = Set("title", "id", "updated", "entry")
    if (!root.elems.map(_.name).toSet.subsetOf(allowedFeed)) return None
    for (req <- Seq("title", "id"))
      single(root, req).flatMap(_.leafText).getOrElse(return None)
    single(root, "updated").flatMap(_.leafText)
      .flatMap(rfc3339Epoch).getOrElse(return None)
    val out = root.elems.filter(_.name == "entry").zipWithIndex.map {
      case (en, i) =>
        if (!en.wsOnlyText || en.attrs.nonEmpty) return None
        val allowed = Set("title", "id", "updated", "link", "summary")
        if (!en.elems.map(_.name).toSet.subsetOf(allowed)) return None
        if (en.elems.groupBy(_.name).values.exists(_.size > 1)) return None
        val title = single(en, "title")
          .map(_.leafText.getOrElse(return None)).getOrElse(return None)
        single(en, "id").flatMap(_.leafText).getOrElse(return None)
        val date = single(en, "updated")
          .map(_.leafText.getOrElse(return None))
          .flatMap(rfc3339Epoch).getOrElse(return None)
        // RFC 4287 link: an EMPTY element carrying href
        val link = single(en, "link").map { l =>
          if (l.kids.nonEmpty) return None
          l.attr("href").getOrElse(return None)
        }.getOrElse(return None)
        val body = single(en, "summary")
          .map(_.leafText.getOrElse(return None)).getOrElse("")
        FeedItem(i, title, link, date, body)
    }
    Some(out)
  }

  /** Walk one feed document; kind dispatched on the root element. */
  private[graft] def parseFeed(raw: Array[Byte]): Option[(String, Seq[FeedItem])] = {
    val root = parseXml(raw).getOrElse(return None)
    root.name match {
      case "rss" => parseRss(root).map(("rss", _))
      case "feed" => parseAtom(root).map(("atom", _))
      case _ => None
    }
  }

  /** Explode a feed-media table into per-item rows with text stats
    * from the decoded description/summary. */
  def extractFeed(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("item", IntegerType, true),
      StructField("kind", StringType, true),
      StructField("title", StringType, true),
      StructField("link", StringType, true),
      StructField("date_epoch", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseFeed(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((kind, items)) => items.map { it =>
            val (nWords, digitSum) =
              Warc.payloadStats(it.body.getBytes("UTF-8"))
            Row(r.getLong(0), it.item, kind, it.title, it.link,
              it.dateEpoch, nWords, digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // encoders + fixtures (test side)

  private[graft] def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture: every fifth document a sitemap INDEX, the rest urlsets;
    * lastmod cycles date-only / full-datetime / absent, changefreq on
    * every third entry, priority (urlset only) sweeping the ppm
    * grammar incl. the 1.0 boundary. */
  def sitemapFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val index = i % 5 == 4
      val nu = 4 + i % 5
      val entries = (0 until nu).map { k =>
        val loc =
          if (index) s"https://ex$i.org/sitemap-$k.xml"
          else s"https://ex$i.org/p/${(i * 13 + k * 7) % 97}/page-$k"
        val lastmod = (i + k) % 4 match {
          case 0 | 2 =>
            f"<lastmod>2024-${1 + (i + k) % 12}%02d-${1 + (i * 3 + k) % 28}%02d</lastmod>"
          case 1 =>
            f"<lastmod>2024-${1 + (i + k) % 12}%02d-${1 + (i * 3 + k) % 28}%02dT${(i + k) % 24}%02d:${(i * 5 + k) % 60}%02d:${k * 11 % 60}%02dZ</lastmod>"
          case _ => ""
        }
        val cf =
          if (!index && k % 3 == 1)
            s"<changefreq>${Changefreqs((i + k) % 7)}</changefreq>"
          else ""
        val pr =
          if (!index && k % 3 == 2)
            s"<priority>${if ((i + k) % 9 == 0) "1.0" else "0." + (i + k) % 10}</priority>"
          else ""
        val tag = if (index) "sitemap" else "url"
        s"  <$tag>\n    <loc>$loc</loc>\n$lastmod$cf$pr  </$tag>\n"
      }.mkString
      val rootTag = if (index) "sitemapindex" else "urlset"
      val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        s"""<$rootTag xmlns="$SitemapNs">\n$entries</$rootTag>\n"""
      Row(i.toLong, xml.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Fixture: every second document Atom (href-attribute links, RFC
    * 3339 dates), the rest RSS 2.0 (RFC 5322 pubDates rendered by the
    * JDK's OWN RFC_1123 formatter over three non-UTC offsets); titles
    * plant `&` so entity decode is hash-gated; every third body rides
    * a CDATA section; token/digit laws mirror the tar/eml fixtures. */
  def feedFixture(spark: SparkSession, n: Int): DataFrame = {
    val offsets = Seq(java.time.ZoneOffset.ofHours(1),
      java.time.ZoneOffset.ofHoursMinutes(5, 30),
      java.time.ZoneOffset.ofHours(-8))
    val rows = (0 until n).map { i =>
      val atom = i % 2 == 1
      val ni = 3 + i % 4
      val items = (0 until ni).map { k =>
        val epoch = 1704067200L + i * 86400L + k * 3600L + (i * 7 + k * 13) % 60
        val nt = 8 + (i + k) % 5
        val toksRaw = (0 until nt)
          .map(j => s"t${(i * 7 + k * 3 + j) % 10}").mkString(" ")
        val body =
          if ((i + k) % 3 == 0) s"<![CDATA[$toksRaw]]>" else esc(toksRaw)
        val title = esc(s"Item $i & $k")
        if (atom) {
          val upd = java.time.Instant.ofEpochSecond(epoch).toString
          s"  <entry>\n    <title>$title</title>\n" +
            s"    <id>urn:graft:$i:$k</id>\n" +
            s"    <updated>$upd</updated>\n" +
            s"""    <link href="https://feed$i.example.org/item/$k"/>\n""" +
            s"    <summary>$body</summary>\n  </entry>\n"
        } else {
          val pd = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
            .format(java.time.Instant.ofEpochSecond(epoch)
              .atOffset(offsets((i + k) % 3)))
          s"  <item>\n    <title>$title</title>\n" +
            s"    <link>https://feed$i.example.org/item/$k</link>\n" +
            s"    <description>$body</description>\n" +
            s"    <pubDate>$pd</pubDate>\n  </item>\n"
        }
      }.mkString
      val xml =
        if (atom)
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            s"""<feed xmlns="$AtomNs">\n  <title>Feed $i</title>\n""" +
            s"  <id>urn:graft:$i</id>\n" +
            s"  <updated>${java.time.Instant.ofEpochSecond(1704067200L + i * 86400L).toString}</updated>\n" +
            items + "</feed>\n"
        else
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<rss version=\"2.0\">\n<channel>\n" +
            s"  <title>Feed $i</title>\n" +
            s"  <link>https://feed$i.example.org/</link>\n" +
            s"  <description>chan $i</description>\n" +
            items + "</channel>\n</rss>\n"
      Row(i.toLong, xml.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
