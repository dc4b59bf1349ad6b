package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL dump extraction (the mysqldump interchange shape — how
  * relational datasets arrive in a corpus). The parse hazards are
  * real ones: statement boundaries must be found QUOTE-AWARELY (a
  * `;` inside a string literal is data, not a terminator — the
  * fixture plants them), and the INSERT column list must agree with
  * the CREATE TABLE column list (the cross-statement law a
  * hand-edited dump breaks). Strict subset:
  *
  *  - `--` comments and blank lines skipped; statements end at an
  *    UNQUOTED `;`; the statement set is closed: optional
  *    `DROP TABLE IF EXISTS`, exactly one `CREATE TABLE`, then
  *    `INSERT INTO` statements for THAT table only;
  *  - CREATE TABLE: backticked column names (censused, duplicate-
  *    free), types opaque but nonempty;
  *  - INSERT INTO: explicit backticked column list that must EQUAL
  *    the CREATE's, `VALUES` tuples of matching arity; values are
  *    NULL, integers, ≤2-decimal numerics (projected ×100 exact —
  *    the cents convention), or single-quoted strings with the `''`,
  *    `\'`, `\\`, `\n` escapes; anything else rejects.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object SqlDumpLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] sealed trait SqlVal
  private[graft] case object SqlNull extends SqlVal
  private[graft] final case class SqlInt(v: Long) extends SqlVal
  private[graft] final case class SqlDec(x100: Long) extends SqlVal
  private[graft] final case class SqlStr(s: String) extends SqlVal

  private[graft] final case class SqlRow(
      stmt: Int, tup: Int, values: Vector[SqlVal])

  /** Split on unquoted `;`, honoring string escapes. */
  private def statements(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var p = 0
    var inStr = false
    while (p < s.length) {
      val c = s.charAt(p)
      if (inStr) {
        sb.append(c)
        if (c == '\\') {
          if (p + 1 >= s.length) throw Fail
          sb.append(s.charAt(p + 1))
          p += 2
        } else {
          if (c == '\'') {
            // '' stays inside the string; a lone ' closes it
            if (p + 1 < s.length && s.charAt(p + 1) == '\'') {
              sb.append('\'')
              p += 2
            } else { inStr = false; p += 1 }
          } else p += 1
        }
      } else c match {
        case '\'' => inStr = true; sb.append(c); p += 1
        case ';' => out += sb.toString; sb.clear(); p += 1
        case '-' if s.startsWith("--", p) && sb.forall(_.isWhitespace) =>
          while (p < s.length && s.charAt(p) != '\n') p += 1
        case _ => sb.append(c); p += 1
      }
    }
    if (inStr) throw Fail // unterminated string
    if (sb.toString.exists(!_.isWhitespace)) throw Fail // junk after last ;
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val IdentRe = """`([A-Za-z_][A-Za-z0-9_]*)`""".r

  private def backtickList(s: String): Vector[String] = {
    val parts = s.split(",", -1).map(_.trim)
    parts.map {
      case IdentRe(n) => n
      case _ => throw Fail
    }.toVector
  }

  /** One VALUES tuple body (between parens) → typed values. */
  private def tupleValues(s: String): Vector[SqlVal] = {
    val out = Vector.newBuilder[SqlVal]
    var p = 0
    def skipWs(): Unit = while (p < s.length && s.charAt(p) == ' ') p += 1
    var more = s.nonEmpty
    if (!more) throw Fail
    while (more) {
      skipWs()
      if (p >= s.length) throw Fail
      val c = s.charAt(p)
      if (c == '\'') {
        p += 1
        val sb = new StringBuilder
        var open = true
        while (open) {
          if (p >= s.length) throw Fail
          val x = s.charAt(p)
          if (x == '\\') {
            if (p + 1 >= s.length) throw Fail
            s.charAt(p + 1) match {
              case '\'' => sb.append('\'')
              case '\\' => sb.append('\\')
              case 'n' => sb.append('\n')
              case _ => throw Fail
            }
            p += 2
          } else if (x == '\'') {
            if (p + 1 < s.length && s.charAt(p + 1) == '\'') {
              sb.append('\''); p += 2
            } else { open = false; p += 1 }
          } else { sb.append(x); p += 1 }
        }
        out += SqlStr(sb.toString)
      } else if (s.startsWith("NULL", p)) { p += 4; out += SqlNull }
      else {
        val a = p
        if (c == '-') p += 1
        while (p < s.length && (s.charAt(p).isDigit || s.charAt(p) == '.'))
          p += 1
        val tok = s.substring(a, p)
        if (tok.isEmpty || tok == "-") throw Fail
        val neg = tok.startsWith("-")
        val body = if (neg) tok.substring(1) else tok
        val dot = body.indexOf('.')
        if (dot < 0) {
          if (!body.forall(_.isDigit) || body.isEmpty || body.length > 18)
            throw Fail
          out += SqlInt(if (neg) -body.toLong else body.toLong)
        } else {
          val whole = body.substring(0, dot)
          val frac = body.substring(dot + 1)
          if (whole.isEmpty || frac.isEmpty || frac.length > 2 ||
              !whole.forall(_.isDigit) || !frac.forall(_.isDigit) ||
              body.indexOf('.', dot + 1) >= 0) throw Fail
          val x = whole.toLong * 100 + frac.padTo(2, '0').toLong
          out += SqlDec(if (neg) -x else x)
        }
      }
      skipWs()
      if (p >= s.length) more = false
      else if (s.charAt(p) == ',') { p += 1; more = true }
      else throw Fail
    }
    out.result()
  }

  private val CreateRe =
    """(?s)^CREATE TABLE `([A-Za-z_][A-Za-z0-9_]*)` \((.*)\)$""".r
  private val DropRe =
    """^DROP TABLE IF EXISTS `([A-Za-z_][A-Za-z0-9_]*)`$""".r
  private val InsertRe =
    """(?s)^INSERT INTO `([A-Za-z_][A-Za-z0-9_]*)` \(([^)]*)\) VALUES (.*)$""".r

  /** Walk one dump; None on any violation. Returns (table, columns,
    * rows). */
  private[graft] def parseDump(raw: Array[Byte])
    : Option[(String, Vector[String], Seq[SqlRow])] = {
    if (raw == null || raw.length == 0) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    try {
      val stmts = statements(s)
      if (stmts.isEmpty) throw Fail
      var at = 0
      // optional DROP
      stmts(at) match {
        case DropRe(_) => at += 1
        case _ => ()
      }
      // top-level comma split: `decimal(10,2)` must not split
      def splitTop(body: String): Vector[String] = {
        val parts = Vector.newBuilder[String]
        val sb = new StringBuilder
        var depth = 0
        body.foreach { c =>
          if (c == '(') { depth += 1; sb.append(c) }
          else if (c == ')') {
            depth -= 1
            if (depth < 0) throw Fail
            sb.append(c)
          } else if (c == ',' && depth == 0) {
            parts += sb.toString; sb.clear()
          } else sb.append(c)
        }
        if (depth != 0) throw Fail
        parts += sb.toString
        parts.result()
      }
      val (table, cols) = stmts.lift(at).getOrElse(throw Fail) match {
        case CreateRe(t, body) =>
          val cols = splitTop(body).map(_.trim).map { cd =>
            cd match {
              case cd2 if cd2.startsWith("`") =>
                val close = cd2.indexOf('`', 1)
                if (close < 2) throw Fail
                val name = cd2.substring(1, close)
                if (cd2.substring(close + 1).trim.isEmpty) throw Fail // type
                name
              case _ => throw Fail
            }
          }
          if (cols.distinct.size != cols.size) throw Fail
          (t, cols)
        case _ => throw Fail
      }
      at += 1
      if (at >= stmts.length) throw Fail // a dump without rows
      val rows = Vector.newBuilder[SqlRow]
      var stmtIdx = 0
      while (at < stmts.length) {
        stmts(at) match {
          case InsertRe(t, colList, values) =>
            if (t != table) throw Fail
            if (backtickList(colList) != cols) throw Fail // cross-stmt law
            // split tuples: (…),(…) with quote-aware scan
            var p = 0
            var tup = 0
            val v = values.trim
            while (p < v.length) {
              if (v.charAt(p) != '(') throw Fail
              var q = p + 1
              var depth = 1
              var inStr = false
              while (depth > 0) {
                if (q >= v.length) throw Fail
                val c = v.charAt(q)
                if (inStr) {
                  if (c == '\\') q += 1
                  else if (c == '\'') inStr = false
                } else {
                  if (c == '\'') inStr = true
                  else if (c == '(') depth += 1
                  else if (c == ')') depth -= 1
                }
                q += 1
              }
              val vals = tupleValues(v.substring(p + 1, q - 1))
              if (vals.size != cols.size) throw Fail // arity law
              rows += SqlRow(stmtIdx, tup, vals)
              tup += 1
              p = q
              if (p < v.length) {
                if (v.charAt(p) != ',') throw Fail
                p += 1
              }
            }
            if (tup == 0) throw Fail
            stmtIdx += 1
          case _ => throw Fail // closed statement set
        }
        at += 1
      }
      if (stmtIdx == 0) throw Fail
      Some((table, cols, rows.result()))
    } catch { case Fail => None }
  }

  /** Explode a dump-media table into per-tuple rows (the fixture's
    * 3-column shape: int id, string name, 2-decimal price). */
  def extractSqlDump(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tbl", StringType, true),
      StructField("stmt", IntegerType, true),
      StructField("tup", IntegerType, true),
      StructField("row_id", LongType, true),
      StructField("name", StringType, true),
      StructField("price_x100", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseDump(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((tbl, cols, rs))
              if cols == Vector("id", "name", "price") =>
            rs.map { sr =>
              val rowId = sr.values(0) match {
                case SqlInt(v) => Long.box(v); case _ => null
              }
              val name = sr.values(1) match {
                case SqlStr(v) => v; case SqlNull => null; case _ => null
              }
              val price = sr.values(2) match {
                case SqlDec(v) => Long.box(v); case SqlInt(v) => Long.box(v * 100)
                case _ => null
              }
              Row(id, tbl, sr.stmt, sr.tup, rowId, name, price, true)
            }
          case _ =>
            Seq(Row(id, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: dump i declares table t{i%5}(id, name, price) with a
    * leading DROP and comments; 2 + i%2 INSERT statements of
    * 2 + (i+s)%3 tuples; every third name carries a doubled-quote
    * escape, every fourth a planted `;` (the quote-aware splitter
    * law); price is NULL when (i+s+t)%5==4. */
  def sqlDumpFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val tbl = s"t${i % 5}"
      val sb = new StringBuilder
      sb.append("-- graft dump fixture\n")
      sb.append(s"DROP TABLE IF EXISTS `$tbl`;\n\n")
      sb.append(s"CREATE TABLE `$tbl` (\n  `id` bigint NOT NULL,\n" +
        "  `name` varchar(80),\n  `price` decimal(10,2)\n);\n")
      val ns = 2 + i % 2
      (0 until ns).foreach { st =>
        val nt = 2 + (i + st) % 3
        val tuples = (0 until nt).map { t =>
          def d(j: Int) = (i * 7 + st * 3 + t * 5 + j) % 10
          val rowId = i * 100 + st * 10 + t
          val name =
            if (t % 4 == 3) s"'a;b${d(0)}'" // unquoted-; splitter law
            else if (t % 3 == 2) s"'it''s${d(0)}'"
            else s"'n${d(0)}x${d(1)}'"
          val price =
            if ((i + st + t) % 5 == 4) "NULL"
            else {
              val x = i * 31 + st * 7 + t * 3
              s"${x / 100}.${f"${x % 100}%02d"}"
            }
          s"($rowId,$name,$price)"
        }.mkString(",")
        sb.append("-- statement ").append(st).append('\n')
        sb.append(s"INSERT INTO `$tbl` (`id`, `name`, `price`) " +
          s"VALUES $tuples;\n")
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
