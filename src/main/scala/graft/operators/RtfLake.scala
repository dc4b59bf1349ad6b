package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RTF text extraction (the Microsoft RTF 1.x specification — the
  * legacy-document long tail of enterprise corpora). A real tokenizer
  * over the three RTF constructs — groups, control words/symbols,
  * text runs — with the two laws naive strippers get wrong:
  *
  *  - DESTINATION GROUPS: `{\fonttbl …}`, `{\colortbl …}`,
  *    `{\stylesheet …}`, `{\info …}` and any `{\*\…}` optional
  *    destination contribute NO text and are skipped whole (nested
  *    braces included);
  *  - the `\uN` UNICODE ESCAPE with the `\ucN` skip convention: after
  *    emitting code point N, the next `uc` fallback characters (text
  *    or `\'hh` escapes, default uc=1, value saved/restored per
  *    group) are consumed silently — double-emission here is the
  *    classic RTF interop bug, hash-gated by the fixture.
  *
  * Closed subset (strict — reject, never guess):
  *  - `{\rtf1\ansi` header; balanced braces (depth ≤ 32), one root
  *    group covering the whole blob; no bytes outside it;
  *  - control words `[a-z]+` (≤ 24 chars) with optional signed
  *    numeric args (≤ 6 digits); the known formatting set is skipped
  *    (par/line/tab/b/i/ul/plain/pard/fs/f/cf/qc/ql/sa/sb/fi/li/lang
  *    /up/dn/super/sub/nosupersub), unknown words without the `\*`
  *    escape reject — the spec's own rule is that readers may only
  *    ignore unknown destinations behind `\*`;
  *  - control symbols `\~`(nbsp→space) `\-`(soft hyphen→nothing)
  *    `\_`(nb hyphen→'-') `\{ \} \\` literals; `\'hh` Latin-1;
  *    `\uN` with N in [32, 65535]; text bytes 0x20-0x7E plus CR/LF
  *    (ignored per spec — line breaks come from `\par`/`\line`).
  *
  * Emits per-file text (hash-gated), paragraph/group/unicode
  * censuses. One blob = one task-local walk. */
object RtfLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class Rtf(
      text: String, nPars: Int, nGroups: Int, nUnicode: Int)

  private val SkipWords = Set(
    "par", "line", "tab", "b", "i", "ul", "ulnone", "plain", "pard",
    "fs", "f", "cf", "qc", "ql", "qr", "sa", "sb", "fi", "li", "lang",
    "up", "dn", "super", "sub", "nosupersub", "rtf", "ansi", "ansicpg",
    "deff", "uc", "u")
  private val Destinations = Set("fonttbl", "colortbl", "stylesheet", "info")

  /** Walk one document; None on any spec or subset violation. */
  private[graft] def parseRtf(raw: Array[Byte]): Option[Rtf] = {
    if (raw == null || raw.length < 7) return None
    try {
      val sb = new StringBuilder
      var nPars = 0
      var nGroups = 0
      var nUnicode = 0
      var p = 0
      def u8(): Int = {
        if (p >= raw.length) throw Fail
        val v = raw(p) & 0xff; p += 1; v
      }
      def peek(): Int = if (p < raw.length) raw(p) & 0xff else -1

      // ucStack(depth) = current \uc value, saved/restored per group
      var depth = 0
      val ucStack = scala.collection.mutable.ArrayBuffer(1)
      var pendingSkip = 0 // \uN fallback chars still to swallow

      def controlWord(): (String, Option[Int]) = {
        val st = p
        while (peek() >= 'a' && peek() <= 'z') p += 1
        if (p == st || p - st > 24) throw Fail
        val word = new String(raw, st, p - st, "US-ASCII")
        var arg: Option[Int] = None
        val neg = peek() == '-'
        if (neg) p += 1
        val ds = p
        while (peek() >= '0' && peek() <= '9') p += 1
        if (p - ds > 6) throw Fail
        if (p > ds) {
          val v = new String(raw, ds, p - ds, "US-ASCII").toInt
          arg = Some(if (neg) -v else v)
        } else if (neg) throw Fail // bare minus
        if (peek() == ' ') p += 1 // the optional delimiter
        (word, arg)
      }

      def emit(c: Char): Unit =
        if (pendingSkip > 0) pendingSkip -= 1 else sb.append(c)

      /** Skip a whole group (destination): braces balanced, no text
        * emitted; contents only shallowly validated (byte-bounded). */
      def skipGroup(): Unit = {
        var d = 1
        while (d > 0) {
          u8() match {
            case '{' => d += 1; if (d > 32) throw Fail
            case '}' => d -= 1
            case '\\' => if (u8() == '\'') { u8(); u8() } // hex escape
            case _ => ()
          }
        }
      }

      if (u8() != '{') return None
      depth = 1
      nGroups = 1
      // header: \rtf1\ansi
      val (hw, ha) = { if (u8() != '\\') throw Fail; controlWord() }
      if (hw != "rtf" || !ha.contains(1)) return None
      val (aw, _) = { if (u8() != '\\') throw Fail; controlWord() }
      if (aw != "ansi") throw Fail

      while (depth > 0) {
        u8() match {
          case '{' =>
            depth += 1
            if (depth > 32) throw Fail
            nGroups += 1
            ucStack += ucStack.last
            // destination group?
            if (peek() == '\\') {
              val save = p
              p += 1
              if (peek() == '*') { // \* optional destination: skip whole
                p += 1
                skipGroup()
                depth -= 1
                ucStack.remove(ucStack.length - 1)
              } else {
                val (w, _) = controlWord()
                if (Destinations(w)) {
                  skipGroup()
                  depth -= 1
                  ucStack.remove(ucStack.length - 1)
                } else if (SkipWords(w)) {
                  p = save // reprocess below as a normal control word
                } else throw Fail // unknown word, not behind \*
              }
            }
          case '}' =>
            depth -= 1
            ucStack.remove(ucStack.length - 1)
            if (depth == 0 && p != raw.length) throw Fail // trailing bytes
          case '\\' =>
            val c = peek()
            if (c >= 'a' && c <= 'z') {
              val (w, arg) = controlWord()
              w match {
                case "par" | "line" => nPars += (if (w == "par") 1 else 0)
                  emit('\n')
                case "tab" => emit('\t')
                case "uc" =>
                  val v = arg.getOrElse(throw Fail)
                  if (v < 0 || v > 4) throw Fail
                  ucStack(ucStack.length - 1) = v
                case "u" =>
                  val v = arg.getOrElse(throw Fail)
                  if (v < 32 || v > 65535) throw Fail
                  // lone UTF-16 surrogates are not scalar values — an
                  // ill-formed emitted string would mangle at the
                  // UTF8String boundary (strict-UTF-8 posture)
                  if (v >= 0xD800 && v <= 0xDFFF) throw Fail
                  if (pendingSkip > 0) pendingSkip -= 1
                  else sb.append(v.toChar)
                  nUnicode += 1
                  pendingSkip += ucStack.last
                case _ if SkipWords(w) => () // formatting: no text
                case _ => throw Fail // unknown control word
              }
            } else {
              p += 1
              c match {
                case '\'' =>
                  val h1 = u8(); val h2 = u8()
                  def hex(x: Int): Int =
                    if (x >= '0' && x <= '9') x - '0'
                    else if (x >= 'a' && x <= 'f') x - 'a' + 10
                    else throw Fail
                  val v = hex(h1) * 16 + hex(h2)
                  if (v < 32 && v != 9) throw Fail // C0 in data
                  emit(v.toChar) // \ansi ⇒ Latin-1: byte == code point
                case '~' => emit(' ')
                case '-' => () // soft hyphen: render nothing
                case '_' => emit('-')
                case '{' => emit('{')
                case '}' => emit('}')
                case '\\' => emit('\\')
                case _ => throw Fail
              }
            }
          case 0x0d | 0x0a => () // raw CR/LF are ignored per spec
          case c if c >= 0x20 && c <= 0x7e => emit(c.toChar)
          case _ => throw Fail // raw control / 8-bit bytes: out of subset
        }
      }
      Some(Rtf(sb.toString, nPars, nGroups, nUnicode))
    } catch { case Fail => None }
  }

  /** One row per document; an invalid file yields one flagged row. */
  def extractRtf(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("text", StringType, true),
      StructField("n_pars", IntegerType, true),
      StructField("n_groups", IntegerType, true),
      StructField("n_unicode", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseRtf(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) => Row(id, d.text, d.nPars, d.nGroups, d.nUnicode, true)
          case None => Row(id, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  /** Fixture law (replayed closed-form by the oracle): document i has
    * 2+i%3 paragraphs. Paragraph k's rendered text is
    * `Seg {(i+k)%10} é{(i*3+k)%10} U+00E9 via \'e9; then " u" +
    * a \u233 escape with ONE swallowed fallback 'e' (uc=1) when
    * (i+k)%2==0, else with uc=0 (no fallback at all); then
    * " tail{(i+7k)%10}"` — the text column hash-gates escape decode,
    * the uc-skip law, destination skipping (a fonttbl and a \*
    * group are planted) and brace-literal escapes `\{x\}`. */
  def rtfFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val np = 2 + i % 3
      val body = new StringBuilder
      body.append("{\\rtf1\\ansi\\deff0")
      body.append("{\\fonttbl{\\f0 Times New Roman;}}")
      body.append("{\\*\\generator graft " + (i % 5) + ";}")
      (0 until np).foreach { k =>
        body.append("{\\b Seg}")
        body.append(" " + (i + k) % 10)
        body.append(" \\'e9" + (i * 3 + k) % 10)
        if ((i + k) % 2 == 0) body.append(" u\\uc1\\u233 e")
        else body.append(" u\\uc0\\u233 ")
        body.append(" \\{x\\}")
        body.append(" tail" + (i * 7 + k) % 10)
        body.append("\\par")
      }
      body.append("}")
      Row(i.toLong, body.toString.getBytes("ISO-8859-1"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
