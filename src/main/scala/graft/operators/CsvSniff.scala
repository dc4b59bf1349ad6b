package graft.operators

/** CSV dialect sniffing — scraped tabular data arrives with unknown
  * delimiter / quote / header conventions, and the ingestion layer
  * must DETECT the dialect before any reader can be pointed at the
  * shard. The sniffer here is deterministic and fully specified (so
  * the oracle can replay it), not a statistical guesser:
  *
  *  - candidate dialects: delimiter in {`,` `;` TAB `|`} x quote in
  *    {`"` `'`}, parsed over the first 64 RECORDS with a real
  *    quote-aware state machine (doubled quotes escape, delimiters
  *    inside quotes are data, and — RFC 4180 sec 2.6 — LF/CRLF inside
  *    quotes is field CONTENT, so record splitting shares the same
  *    state machine rather than an up-front split on `\n`);
  *  - a candidate is ADMISSIBLE iff every record parses to the SAME
  *    field count >= 2 with no unterminated quote; among admissible
  *    candidates the sniffer picks the FEWEST fields (a wrong quote
  *    splits quoted delimiters apart and can only inflate the
  *    count), then the MOST records (the dual law: a wrong quote
  *    spanning newlines can only merge records), then the fixed
  *    candidate order — so a file with no quoted fields
  *    deterministically reports the `"` default;
  *  - header detection: the first row is a header iff none of its
  *    fields is numeric AND some other row has a numeric field
  *    (numeric = `-?digits(.digits)?` exactly, on the unquoted
  *    value);
  *  - column census: a column is numeric iff EVERY data row's value
  *    is numeric;
  *  - no admissible dialect, or fewer than two lines, censuses the
  *    shard invalid — reject, never guess.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object CsvSniff {

  private val Delims = Array(',', ';', '\t', '|')
  private val Quotes = Array('"', '\'')
  private val MaxLines = 64

  private[graft] final case class Dialect(
      delim: Char, quote: Char, nFields: Int)

  private[graft] final case class CsvFacts(
      nLines: Int, dialect: Dialect, hasHeader: Boolean, nNumeric: Int)

  /** Quote-aware field split of ONE record — a thin wrapper over
    * [[parseCsv]] so there is exactly ONE quoting state machine to
    * keep correct; None on an unterminated quote. */
  private[graft] def splitFields(line: String, delim: Char,
      quote: Char): Option[Array[String]] =
    parseCsv(line, delim, quote).map { rs =>
      if (rs.isEmpty) Array("") else rs(0)
    }

  private val NumericRe = "-?[0-9]+(\\.[0-9]+)?".r

  private[graft] def isNumeric(s: String): Boolean =
    NumericRe.matches(s)

  /** Quote-aware RECORD parse of the whole shard (RFC 4180 sec 2.6:
    * a quoted field may contain line breaks, so record splitting and
    * field splitting must share ONE quote state machine — an up-front
    * split on `\n` breaks every Excel/Sheets export with embedded
    * newlines). LF or CRLF ends a record outside quotes and is field
    * content inside them; quoting rules are [[splitFields]]'s
    * exactly. Stops cleanly after `maxRecords` full records (the
    * sniff sample — quote state at the cut is not judged); a quote
    * left open at end of text is None. */
  private[graft] def parseCsv(text: String, delim: Char, quote: Char,
      maxRecords: Int = Int.MaxValue): Option[Array[Array[String]]] = {
    val recs = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inQ = false
    var atRecordStart = true
    var i = 0
    val n = text.length
    def endRecord(): Unit = {
      fields += cur.toString
      cur.setLength(0)
      recs += fields.toArray
      fields.clear()
      atRecordStart = true
    }
    while (i < n && recs.length < maxRecords) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == quote) {
          if (i + 1 < n && text.charAt(i + 1) == quote) {
            cur.append(quote) // doubled quote escapes
            i += 1
          } else inQ = false
        } else cur.append(c)
      } else if (c == '\n') endRecord()
      else if (c == '\r' && (i + 1 >= n || text.charAt(i + 1) == '\n')) {
        // CRLF record break; a bare CR at end of text closes the
        // final record too (the pre-r17 per-line \r-strip law)
        endRecord()
        if (i + 1 < n) i += 1
      } else {
        atRecordStart = false
        if (c == quote && cur.length() == 0) inQ = true
        else if (c == delim) {
          fields += cur.toString
          cur.setLength(0)
        } else cur.append(c)
      }
      i += 1
    }
    if (recs.length >= maxRecords) Some(recs.toArray) // sample cut
    else if (inQ) None // unterminated quote at end of text
    else {
      // a final record not closed by a newline; text ending in \n
      // contributes no empty last record
      if (!atRecordStart) endRecord()
      Some(recs.toArray)
    }
  }

  /** Sniff one text shard; None when no admissible dialect exists. */
  private[graft] def sniff(text: String): Option[CsvFacts] = {
    if (text == null) return None
    var best: Dialect = null
    var bestSample: Array[Array[String]] = null
    for (d <- Delims; q <- Quotes) {
      parseCsv(text, d, q, MaxLines) match {
        case Some(rs) if rs.length >= 2 =>
          val ns = rs.map(_.length)
          // fewest fields (a wrong quote splits quoted delimiters and
          // can only inflate the count); between equals, MOST records
          // (the dual law: a wrong quote spanning newlines can only
          // MERGE records — e.g. lines led by inch marks); then the
          // fixed candidate order
          if (ns.distinct.length == 1 && ns.head >= 2 &&
              (best == null || ns.head < best.nFields ||
                (ns.head == best.nFields &&
                  rs.length > bestSample.length))) {
            best = Dialect(d, q, ns.head)
            bestSample = rs
          }
        case _ =>
      }
    }
    if (best == null) return None
    // the record count is dialect-dependent now (embedded newlines
    // are content): a quote left open past the sample rejects here
    val nRecords = parseCsv(text, best.delim, best.quote) match {
      case Some(all) => all.length
      case None => return None
    }
    val rows = bestSample
    val firstNumeric = rows.head.exists(isNumeric)
    val restNumeric = rows.tail.exists(_.exists(isNumeric))
    val hasHeader = !firstNumeric && restNumeric
    val data = if (hasHeader) rows.tail else rows
    val nNumeric = (0 until best.nFields).count(j =>
      data.nonEmpty && data.forall(r => isNumeric(r(j))))
    Some(CsvFacts(nRecords, best, hasHeader, nNumeric))
  }

  // ==================================================================
  // DataFrame surface + fixture (q230)

  def sniffCsv(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("n_lines", IntegerType, true),
      StructField("delim", StringType, true),
      StructField("quote", StringType, true),
      StructField("n_fields", IntegerType, true),
      StructField("has_header", BooleanType, true),
      StructField("n_numeric", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(textCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        scala.util.Try(sniff(text)).toOption.flatten match {
          case Some(f) =>
            Row(id, f.nLines, f.dialect.delim.toString,
              f.dialect.quote.toString, f.dialect.nFields, f.hasHeader,
              f.nNumeric, true)
          case None =>
            Row(id, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ==================================================================
  // dialect-applied extraction (q233): sniff, then parse the WHOLE
  // shard with the detected dialect into typed per-column stats on
  // one schema — the composition step a real tabular-ingest pipeline
  // runs after detection. Typing is CLOSED and exact:
  //  - `long`: every data value matches -?digits (≤18 digits) —
  //    stats are exact BIGINT min/max/sum (overflow rejects the
  //    shard, never wraps);
  //  - `dec2`: every value numeric with ≤2 decimals (mixed with
  //    plain integers) — stats on the EXACT ×100 integers (the
  //    repo's no-doubles-across-the-boundary convention);
  //  - `string` otherwise — stats on field LENGTHS;
  //  - any line that fails the detected dialect (field-count drift
  //    past the sniff sample, unterminated quote) invalidates the
  //    whole shard: reject, never guess.

  private[graft] final case class CsvCol(
      name: Option[String], kind: String, lmin: Long, lmax: Long,
      lsum: Long)

  private val LongRe = "-?[0-9]{1,18}".r
  private val Dec2Re = "(-?)([0-9]{1,16})(?:\\.([0-9]{1,2}))?".r

  private def dec2Scaled(s: String): Long = {
    val m = Dec2Re.pattern.matcher(s)
    require(m.matches())
    val neg = m.group(1) == "-"
    val ip = java.lang.Long.parseLong(m.group(2)) * 100
    val fr = m.group(3) match {
      case null => 0L
      case f => java.lang.Integer.parseInt(f) * (if (f.length == 1) 10 else 1)
    }
    if (neg) -ip - fr else ip + fr
  }

  private[graft] final case class CsvTable(cols: Seq[CsvCol], nData: Int)

  /** Sniff + full-shard typed extraction; None on any violation. */
  private[graft] def extract(text: String): Option[CsvTable] = {
    val facts = sniff(text) match {
      case Some(f) => f
      case None => return None
    }
    val d = facts.dialect
    val rows = parseCsv(text, d.delim, d.quote) match {
      case Some(rs) => rs
      case None => return None
    }
    if (rows.length > (1 << 20)) return None
    // drift past the sniff sample: reject, never guess
    if (rows.exists(_.length != d.nFields)) return None
    val header: Option[Array[String]] =
      if (facts.hasHeader) Some(rows(0)) else None
    val data = if (facts.hasHeader) rows.drop(1) else rows
    if (data.isEmpty) return None
    try {
      Some(CsvTable((0 until d.nFields).map { j =>
        val name = header.map(_(j))
        val vals = data.map(_(j))
        if (vals.forall(LongRe.matches(_))) {
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var sum = 0L
          vals.foreach { v =>
            val x = java.lang.Long.parseLong(v)
            mn = math.min(mn, x); mx = math.max(mx, x)
            sum = Math.addExact(sum, x)
          }
          CsvCol(name, "long", mn, mx, sum)
        } else if (vals.forall(Dec2Re.matches(_))) {
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var sum = 0L
          vals.foreach { v =>
            val x = dec2Scaled(v)
            mn = math.min(mn, x); mx = math.max(mx, x)
            sum = Math.addExact(sum, x)
          }
          CsvCol(name, "dec2", mn, mx, sum)
        } else {
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var sum = 0L
          vals.foreach { v =>
            val n = v.length.toLong
            mn = math.min(mn, n); mx = math.max(mx, n)
            sum = Math.addExact(sum, n)
          }
          CsvCol(name, "string", mn, mx, sum)
        }
      }, data.length))
    } catch { case _: ArithmeticException => None } // exact or nothing
  }

  /** One row per detected column: header name, closed typed kind,
    * exact stats; an undetectable or drifting shard flags one row. */
  def extractCsv(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("col", IntegerType, false),
      StructField("name", StringType, true),
      StructField("kind", StringType, true),
      StructField("lmin", LongType, true),
      StructField("lmax", LongType, true),
      StructField("lsum", LongType, true),
      StructField("n_rows", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(textCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        scala.util.Try(extract(text)).toOption.flatten match {
          case Some(t) =>
            t.cols.zipWithIndex.map { case (c, j) =>
              Row(id, j, c.name.orNull, c.kind, c.lmin, c.lmax, c.lsum,
                t.nData, true)
            }
          case None =>
            Seq(Row(id, 0, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Typed-extraction fixture (q233): the q230 wire laws (delimiter
    * i%4, quote i%2, header iff i%3 != 0, 2+i%3 columns, 4+i%4 data
    * rows, trailing newline on i%5=0) with column j's KIND cycling by
    * (i+j)%3 — 0: long (value i·10+r+j), 1: a QUOTED string carrying
    * the live delimiter AND an embedded newline (`a<d>b\nc<r>` — the
    * class both naive field splitters AND naive record splitters
    * break on, RFC 4180 sec 2.6), 2: dec2 (value
    * (r+j).((i+j)%100 zero-padded) → exact ×100). */
  def csvTypedFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map(i => Row(i.toLong, csvTypedDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("text", StringType, true))))
  }

  /** One typed-fixture shard (shared with the ScaleProof generator). */
  private[graft] def csvTypedDoc(i: Int): String = {
    {
      val d = Delims(i % 4)
      val q = Quotes(i % 2)
      val nf = 2 + i % 3
      val nRows = 4 + i % 4
      val header =
        if (i % 3 != 0)
          Seq((0 until nf).map(j => s"h$j").mkString(d.toString))
        else Nil
      val data = (0 until nRows).map { r =>
        (0 until nf).map { j =>
          (i + j) % 3 match {
            case 0 => (i * 10 + r + j).toString
            case 1 => s"${q}a${d}b\nc$r$q"
            case _ => s"${r + j}." + f"${(i + j) % 100}%02d"
          }
        }.mkString(d.toString)
      }
      (header ++ data).mkString("\n") +
        (if (i % 5 == 0) "\n" else "")
    }
  }

  /** Fixture laws (shard i): delimiter by i%4, quote by i%2, header
    * iff i%3 != 0, 2+i%3 columns over 4+i%4 data rows; column j is
    * numeric iff (i+j)%2=0 (value i*10+r+j), else a QUOTED string
    * containing the live delimiter (`a<d>b<r>`) — the case naive
    * splitters break on; trailing newline on i%5=0. */
  def csvFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val d = Delims(i % 4)
      val q = Quotes(i % 2)
      val nf = 2 + i % 3
      val nRows = 4 + i % 4
      val header =
        if (i % 3 != 0) Seq((0 until nf).map(j => s"h$j").mkString(d.toString))
        else Nil
      val data = (0 until nRows).map { r =>
        (0 until nf).map { j =>
          if ((i + j) % 2 == 0) (i * 10 + r + j).toString
          else s"${q}a${d}b$r$q"
        }.mkString(d.toString)
      }
      val text = (header ++ data).mkString("\n") +
        (if (i % 5 == 0) "\n" else "")
      Row(i.toLong, text)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("text", StringType, true))))
  }
}
