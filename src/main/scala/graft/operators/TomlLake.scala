package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TOML configuration extraction (the TOML v1.0.0 specification —
  * the config-file layer of code corpora: Cargo.toml, pyproject.toml
  * and friends). A real line-oriented parser with the spec's own
  * lexical laws rather than a split-on-`=` approximation.
  *
  * Closed subset (strict — reject, never guess):
  *  - structure: comments (`#` to EOL, also after values), blank
  *    lines, `[table]` headers with DOTTED names of bare segments
  *    (`[tool.fmt]` — ≤8 segments, ≤256 chars, whitespace around
  *    dots per the spec), `[[name]]` ARRAY-OF-TABLES headers (each
  *    occurrence appends an element; its keys land under
  *    `name.<idx>`), and `key = value` pairs; bare keys
  *    `[A-Za-z0-9_-]+` only (dotted/quoted KEYS stay out of
  *    subset); tables unique by full path, keys unique per table,
  *    and the TOML kind-conflict laws reject: a table path that
  *    names an existing key or array-of-tables (and vice versa),
  *    and any header under an array-of-tables prefix (per-element
  *    subtables are out of subset);
  *  - integers: optional sign, NO LEADING ZEROS (the TOML law),
  *    ≤ 18 digits; underscores out of subset;
  *  - strings: basic `"…"` with escapes `\" \\ \n \t \r \uXXXX`
  *    (raw control chars reject) and literal `'…'` (no escapes at
  *    all — a backslash is data); multi-line strings out of subset;
  *  - booleans `true`/`false` exactly;
  *  - floats: strict `±D+.DD` with 1-2 decimals, projected as an
  *    EXACT ×100 integer (no doubles cross the engine boundary —
  *    the repo convention); exponents/inf/nan out of subset;
  *  - arrays: single-line, HOMOGENEOUS — integer elements (censused
  *    as count + exact element sum, kind `arr`) or string elements
  *    (kind `sarr`, both quote styles, censused as count + the
  *    elements joined on U+001F, which no escape can forge since
  *    `\\u` rejects code points < 0x20); the empty `[]` is the
  *    untyped `arr` census; mixed element kinds reject;
  *  - anything after a value except whitespace/comment rejects;
  *  - whole-input bounds (the family-standard budget shared with
  *    parseYaml/parseDocker): raw ≤ 1 MiB, ≤ 8192 lines, ≤ 2048
  *    emitted keys — per-item caps times N need the product bound.
  *
  * Emits one row per key in APPEARANCE order. One blob = one
  * task-local walk (codec-family plan shape). */
object TomlLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class TomlEntry(
      tbl: String, key: String, kind: String, lval: Option[Long],
      sval: Option[String], fx100: Option[Long], arrN: Option[Int])

  /** String-array join separator (U+001F, unforgeable in-subset). */
  private[graft] val SarrSep: String = 0x1f.toChar.toString

  private def isBareKeyChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '-'

  private final class LCur(val s: String) {
    var p = 0
    def ws(): Unit = { while (p < s.length && (s(p) == ' ' || s(p) == '\t')) p += 1 }
    def eol: Boolean = p >= s.length || s(p) == '#'
    def peek: Char = { if (p >= s.length) throw Fail; s(p) }
    /** After a value: only whitespace then EOL/comment is legal. */
    def finish(): Unit = { ws(); if (!eol) throw Fail }
  }

  private def bareKey(c: LCur): String = {
    val st = c.p
    while (c.p < c.s.length && isBareKeyChar(c.s(c.p))) c.p += 1
    if (c.p == st || c.p - st > 64) throw Fail
    c.s.substring(st, c.p)
  }

  private def parseInt(c: LCur): Long = {
    val st = c.p
    if (c.peek == '+' || c.peek == '-') c.p += 1
    val ds = c.p
    while (c.p < c.s.length && c.s(c.p).isDigit) c.p += 1
    val n = c.p - ds
    if (n < 1 || n > 18) throw Fail
    if (n > 1 && c.s(ds) == '0') throw Fail // leading zero law
    java.lang.Long.parseLong(c.s.substring(st, c.p))
  }

  private def parseBasicStr(c: LCur): String = {
    c.p += 1
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (c.p >= c.s.length) throw Fail
      val ch = c.s(c.p); c.p += 1
      ch match {
        case '"' => done = true
        case '\\' =>
          if (c.p >= c.s.length) throw Fail
          val e = c.s(c.p); c.p += 1
          e match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'u' =>
              if (c.p + 4 > c.s.length) throw Fail
              val h = c.s.substring(c.p, c.p + 4)
              if (!h.forall(x => x.isDigit || ('a' <= x && x <= 'f') ||
                ('A' <= x && x <= 'F'))) throw Fail
              val cp = Integer.parseInt(h, 16)
              // surrogate code points are not Unicode scalar values —
              // a lone \uD800..\uDFFF would make an ill-formed string
              // (the strict-UTF-8 posture of the byte-level decode)
              if (cp < 0x20 || (cp >= 0xD800 && cp <= 0xDFFF)) throw Fail
              sb += cp.toChar
              c.p += 4
            case _ => throw Fail
          }
        case x if x < 0x20 => throw Fail
        case x => sb += x
      }
    }
    sb.toString
  }

  private def parseLiteralStr(c: LCur): String = {
    c.p += 1
    val st = c.p
    while (c.p < c.s.length && c.s(c.p) != '\'') {
      if (c.s(c.p) < 0x20) throw Fail
      c.p += 1
    }
    if (c.p >= c.s.length) throw Fail
    val v = c.s.substring(st, c.p)
    c.p += 1
    v
  }

  private def parseValue(c: LCur): TomlEntry = {
    c.ws()
    c.peek match {
      case '"' =>
        TomlEntry("", "", "str", None, Some(parseBasicStr(c)), None, None)
      case '\'' =>
        TomlEntry("", "", "str", None, Some(parseLiteralStr(c)), None, None)
      case 't' =>
        if (!c.s.startsWith("true", c.p)) throw Fail
        c.p += 4
        TomlEntry("", "", "bool", Some(1L), None, None, None)
      case 'f' =>
        if (!c.s.startsWith("false", c.p)) throw Fail
        c.p += 5
        TomlEntry("", "", "bool", Some(0L), None, None, None)
      case '[' => // single-line HOMOGENEOUS array: ints or strings
        c.p += 1
        c.ws()
        if (c.peek == ']') { // empty: the untyped census
          c.p += 1
          TomlEntry("", "", "arr", Some(0L), None, None, Some(0))
        } else if (c.peek == '"' || c.peek == '\'') { // string array
          val vals = scala.collection.mutable.ArrayBuffer.empty[String]
          var more = true
          while (more) {
            c.ws()
            val ch = c.peek
            // homogeneity: a non-string element after a string rejects
            val v =
              if (ch == '"') parseBasicStr(c)
              else if (ch == '\'') parseLiteralStr(c)
              else throw Fail
            vals += v
            c.ws()
            if (c.peek == ',') c.p += 1
            else { if (c.peek != ']') throw Fail; c.p += 1; more = false }
          }
          if (vals.length > 256) throw Fail
          // joined on U+001F — unforgeable: the raw text layer rejects
          // control bytes and the \u escape rejects code points < 0x20
          val joined = vals.mkString(SarrSep)
          if (joined.length > 4096) throw Fail
          TomlEntry("", "", "sarr", None, Some(joined), None,
            Some(vals.length))
        } else {
          val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
          var more = true
          while (more) {
            c.ws()
            vals += parseInt(c)
            c.ws()
            if (c.peek == ',') c.p += 1
            else { if (c.peek != ']') throw Fail; c.p += 1; more = false }
          }
          if (vals.length > 256) throw Fail
          // 256 elements × ±(10^18-1) can wrap Long silently — reject
          // on overflow instead of a wrapped census flagged valid
          val sum =
            try vals.foldLeft(0L)(Math.addExact)
            catch { case _: ArithmeticException => throw Fail }
          TomlEntry("", "", "arr", Some(sum), None, None,
            Some(vals.length))
        }
      case ch if ch == '+' || ch == '-' || ch.isDigit =>
        val neg = ch == '-'
        val v = parseInt(c)
        if (c.p < c.s.length && c.s(c.p) == '.') { // strict float
          c.p += 1
          val ds = c.p
          while (c.p < c.s.length && c.s(c.p).isDigit) c.p += 1
          val nd = c.p - ds
          if (nd < 1 || nd > 2) throw Fail // ≤2 decimals: exact ×100
          val frac = java.lang.Integer.parseInt(c.s.substring(ds, c.p))
          val cents = (frac * (if (nd == 1) 10 else 1)).toLong
          // `neg` carries the "-0.xx" case parseInt cannot represent.
          // parseInt admits up to 18 digits, so v*100 can exceed Long —
          // reject-never-guess: overflow is a Fail, not a wrapped value.
          val x100 =
            try {
              val scaled = Math.multiplyExact(v, 100L)
              if (v < 0 || (v == 0 && neg)) Math.subtractExact(scaled, cents)
              else Math.addExact(scaled, cents)
            } catch { case _: ArithmeticException => throw Fail }
          TomlEntry("", "", "float", None, None, Some(x100), None)
        } else TomlEntry("", "", "int", Some(v), None, None, None)
      case _ => throw Fail // dates, exponents, nested arrays: out
    }
  }

  /** Walk one document; None on any spec or subset violation. */
  private[graft] def parseToml(raw: Array[Byte]): Option[Seq[TomlEntry]] = {
    // family-standard whole-input guards (the parseYaml/parseDocker
    // bounds): a multi-MB blob or an unbounded row fan-out per blob
    // is a resource hazard, not a census — reject, never decode
    if (raw == null || raw.length > (1 << 20)) return None
    try {
      // strict ASCII/UTF-8 text: decode, allow \n and \t only
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val text =
        try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
        catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
      if (text.exists(ch => ch < 0x20 && ch != '\n' && ch != '\t')) throw Fail
      val allLines = text.split("\n", -1)
      if (allLines.length > 8192) throw Fail
      val out = scala.collection.mutable.ArrayBuffer.empty[TomlEntry]
      var tbl = ""
      val tables = scala.collection.mutable.HashSet.empty[String]
      val aotCounts = scala.collection.mutable.HashMap.empty[String, Int]
      val keyPaths = scala.collection.mutable.HashSet.empty[String]
      // a dotted header name: bare segments, whitespace around dots
      // legal per the spec; bounded like the YAML path law
      def dottedName(c: LCur): String = {
        val sb = new StringBuilder(bareKey(c))
        var more = true
        while (more) {
          c.ws()
          if (c.p < c.s.length && c.s(c.p) == '.') {
            c.p += 1
            c.ws()
            sb += '.'
            sb ++= bareKey(c)
          } else more = false
        }
        val name = sb.toString
        if (name.length > 256 || name.count(_ == '.') >= 8) throw Fail
        name
      }
      def properPrefixes(name: String): Iterator[String] = {
        val parts = name.split('.')
        (1 until parts.length).iterator.map(k => parts.take(k).mkString("."))
      }
      // TOML kind-conflict laws: a header may not name (or sit under)
      // something already used as a different kind
      def checkHeader(name: String): Unit = {
        if (keyPaths.contains(name)) throw Fail // names a key
        properPrefixes(name).foreach { p =>
          // any prefix that is an array-of-tables puts this header
          // inside an ELEMENT — per-element subtables are out
          if (aotCounts.contains(p)) throw Fail
          if (keyPaths.contains(p)) throw Fail // under a scalar key
        }
      }
      allLines.foreach { line =>
        val c = new LCur(line)
        c.ws()
        if (!c.eol) {
          if (c.peek == '[') {
            c.p += 1
            if (c.p < c.s.length && c.s(c.p) == '[') { // [[array-of-tables]]
              c.p += 1
              c.ws()
              val name = dottedName(c)
              c.ws()
              if (c.peek != ']') throw Fail
              c.p += 1
              if (c.p >= c.s.length || c.s(c.p) != ']') throw Fail
              c.p += 1
              c.finish()
              if (tables.contains(name)) throw Fail // was a [table]
              checkHeader(name)
              val idx = aotCounts.getOrElse(name, 0)
              aotCounts(name) = idx + 1
              tbl = name + "." + idx
              if (tbl.length > 256) throw Fail
            } else {
              c.ws()
              val name = dottedName(c)
              c.ws()
              if (c.peek != ']') throw Fail
              c.p += 1
              c.finish()
              if (!tables.add(name)) throw Fail // duplicate table
              if (aotCounts.contains(name)) throw Fail // was an AoT
              checkHeader(name)
              tbl = name
            }
          } else {
            val key = bareKey(c)
            c.ws()
            if (c.peek != '=') throw Fail
            c.p += 1
            val e = parseValue(c)
            c.finish()
            val path = if (tbl.isEmpty) key else tbl + "." + key
            if (!keyPaths.add(path)) throw Fail // duplicate key
            // a key may not name an existing table / array-of-tables
            if (tables.contains(path) || aotCounts.contains(path))
              throw Fail
            if (out.length >= 2048) throw Fail // bounded row fan-out
            out += e.copy(tbl = tbl, key = key)
          }
        }
      }
      if (out.isEmpty) throw Fail
      Some(out.toSeq)
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // TOML front matter (the Hugo `+++` convention — the static-site
  // sibling of YamlLake's `---` fences)

  private[graft] sealed trait FmResult
  private[graft] case object NoFm extends FmResult
  private[graft] case object BadFm extends FmResult
  private[graft] final case class Fm(toml: Array[Byte]) extends FmResult

  /** Split a leading `+++` … `+++` TOML front-matter fence off a
    * text document. A column-0 `+++` line is unambiguous in this
    * subset: multi-line strings are out, so no TOML value line can
    * consist of the bare fence. NoFm when the first line is not the
    * opener; BadFm when the opener never closes or the text is not
    * strict UTF-8. */
  private[graft] def frontMatterToml(raw: Array[Byte]): FmResult = {
    if (raw == null) return BadFm
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val text =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        return BadFm }
    val lines = text.split("\n", -1)
    if (lines.isEmpty || lines.head != "+++") return NoFm
    val close = lines.indexOf("+++", 1)
    if (close < 0) return BadFm
    // newline-TERMINATED (the front-matter lesson): the slice must
    // reach parseToml exactly as it sat between the fences
    Fm(lines.slice(1, close).map(_ + "\n").mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** TOML front-matter composition over a TEXT corpus: documents
    * without the fence get one `has_fm = false` row; fenced
    * documents route their TOML through [[parseToml]]. */
  def extractFrontMatterToml(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("tbl", StringType, true),
      StructField("key", StringType, true),
      StructField("kind", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("fx100", LongType, true),
      StructField("arr_n", IntegerType, true),
      StructField("has_fm", BooleanType, false),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(frontMatterToml(r.getAs[Array[Byte]](1)))
          .getOrElse(BadFm) match {
          case NoFm =>
            Seq(Row(id, 0, null, null, null, null, null, null, null,
              false, true))
          case BadFm =>
            Seq(Row(id, 0, null, null, null, null, null, null, null,
              true, false))
          case Fm(t) =>
            scala.util.Try(parseToml(t)).toOption.flatten match {
              case Some(es) => es.zipWithIndex.map { case (e, i) =>
                Row(id, i, e.tbl, e.key, e.kind,
                  e.lval.map(Long.box).orNull, e.sval.orNull,
                  e.fx100.map(Long.box).orNull,
                  e.arrN.map(Int.box).orNull, true, true)
              }
              case None =>
                Seq(Row(id, 0, null, null, null, null, null, null,
                  null, true, false))
            }
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Hugo-shaped fixture (q247). Law (replayed closed-form by the
    * oracle): doc i is a text document whose `+++` front matter
    * (absent when i%5==4) carries title "Post é(i%7)", weight
    * 10+i%20, draft (i%3==0), tags = a string array of 1+i%2
    * elements t((i+j)%4) alternating quote styles, then a [params]
    * table with author 'a(i%6)' and score (1+i%4).((9i)%100, two
    * digits) on the exact x100 axis. */
  def hugoFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, hugoDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def hugoDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    if (i % 5 != 4) {
      sb.append("+++\n")
      sb.append("title = \"Post \\u00E9" + i % 7 + "\"\n")
      sb.append("weight = " + (10 + i % 20) + "\n")
      sb.append("draft = " + (i % 3 == 0) + "\n")
      val tags = (0 until 1 + i % 2).map { j =>
        val v = "t" + (i + j) % 4
        if (j % 2 == 0) "\"" + v + "\"" else "'" + v + "'"
      }
      sb.append("tags = [" + tags.mkString(", ") + "]\n")
      sb.append("\n[params]\n")
      sb.append("author = 'a" + i % 6 + "'\n")
      sb.append(f"score = ${1 + i % 4}.${(9 * i) % 100}%02d\n")
      sb.append("+++\n")
    }
    sb.append("# Post body " + i + "\n")
    sb.toString.getBytes("UTF-8")
  }

  /** One row per key in appearance order; invalid → one flagged row. */
  def extractToml(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("tbl", StringType, true),
      StructField("key", StringType, true),
      StructField("kind", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("fx100", LongType, true),
      StructField("arr_n", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseToml(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(es) =>
            es.zipWithIndex.map { case (e, i) =>
              Row(id, i, e.tbl, e.key, e.kind,
                e.lval.map(Long.box).orNull, e.sval.orNull,
                e.fx100.map(Long.box).orNull,
                e.arrN.map(Int.box).orNull, true)
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  /** Pyproject-shaped fixture (q246). Law (replayed closed-form by
    * the oracle): doc i carries title "pkg é(i%7)" at root, a
    * [project] table with name 'p(i%5)' (literal string), version
    * "(i%3).(i%10)" (QUOTED — version strings are strings, never
    * floats), deps = a string array of i%3 elements lib((i+j)%6)
    * alternating quote styles (empty `[]` on i%3==0 — the untyped
    * arr census), a DOTTED [tool.fmt] table with line 80+i%40 and
    * strict (i%2==0), and 1+i%2 [[bin]] array-of-tables elements
    * with name "b((i+t)%5)" and order (3i+7t)%50. */
  def pyprojectFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, pyprojectDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def pyprojectDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# pyproject fixture " + i + "\n")
    sb.append("title = \"pkg \\u00E9" + i % 7 + "\"\n\n")
    sb.append("[project]\n")
    sb.append("name = 'p" + i % 5 + "'\n")
    sb.append("version = \"" + i % 3 + "." + i % 10 + "\"\n")
    val deps = (0 until i % 3).map { j =>
      val v = "lib" + (i + j) % 6
      if (j % 2 == 0) "\"" + v + "\"" else "'" + v + "'"
    }
    sb.append("deps = [" + deps.mkString(", ") + "]\n\n")
    sb.append("[tool.fmt] # dotted header\n")
    sb.append("line = " + (80 + i % 40) + "\n")
    sb.append("strict = " + (i % 2 == 0) + "\n")
    (0 until 1 + i % 2).foreach { t =>
      sb.append("\n[[bin]]\n")
      sb.append("name = \"b" + (i + t) % 5 + "\"\n")
      sb.append("order = " + (3 * i + 7 * t) % 50 + "\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** Fixture law (replayed closed-form by the oracle): doc i has root
    * keys title (basic string with a \\u00E9 escape), port
    * (8000+i), debug ((i%2==0)), ratio (float ((i·13)%90+1).(i·7)%100
    * → exact ×100), delta (signed int ±(i·3)%1000, sign on i%2), then
    * 1+i%2 `[srvT]` tables with host (LITERAL string, backslash kept
    * as data), workers (1+(i+t)%8) and weights (an (i+t)%4-element
    * integer array, elements (i·5+t+j)%100). Comments and blank
    * lines interspersed. */
  def tomlFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val sb = new StringBuilder
      sb.append("# graft fixture " + i + "\n\n")
      sb.append("title = \"cfg \\u00E9" + i % 7 + "\" # inline comment\n")
      sb.append("port = " + (8000 + i) + "\n")
      sb.append("debug = " + (i % 2 == 0) + "\n")
      sb.append("ratio = " + ((i * 13) % 90 + 1) + "." +
        f"${(i * 7) % 100}%02d" + "\n")
      val delta = (if (i % 2 == 0) 1 else -1) * ((i * 3) % 1000)
      sb.append("delta = " + delta + "\n")
      (0 until 1 + i % 2).foreach { t =>
        sb.append("\n[srv" + t + "] # table\n")
        sb.append("host = 'h" + (i + t) + "\\example'\n")
        sb.append("workers = " + (1 + (i + t) % 8) + "\n")
        val arr = (0 until (i + t) % 4).map(j => (i * 5 + t + j) % 100)
        sb.append("weights = [" + arr.mkString(", ") + "]\n")
      }
      Row(i.toLong, sb.toString.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
