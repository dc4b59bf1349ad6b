package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dockerfile census (the Dockerfile reference grammar — the build
  * layer of code corpora; base-image / stage / port facts are what
  * licensing, security and provenance audits group on). A real
  * line-oriented parser with the builder's own structural laws,
  * never a split-on-space approximation.
  *
  * Closed subset (strict — reject, never guess):
  *  - physical lines joined into LOGICAL lines by a trailing ` \`
  *    continuation (segments trimmed, joined with one space); a
  *    dangling continuation at EOF and a comment line INSIDE a
  *    continuation both reject (the latter is builder-accepted but
  *    silently order-sensitive — out of subset);
  *  - comments (`#` first non-space char) and blank lines skip;
  *  - instructions are UPPERCASE members of the reference set (FROM
  *    RUN CMD LABEL EXPOSE ENV ADD COPY ENTRYPOINT VOLUME USER
  *    WORKDIR ARG ONBUILD STOPSIGNAL HEALTHCHECK SHELL MAINTAINER);
  *    lowercase or unknown names reject; args must be non-empty;
  *  - ordering: only ARG may precede the first FROM (the builder's
  *    own law); everything else before a FROM rejects;
  *  - FROM `image[:tag] [AS name]` — image `[a-z0-9._/-]+`
  *    (registry grammar is lowercase), tag `[A-Za-z0-9._-]+`, stage
  *    name `[a-z0-9_-]+` unique per file; digest pins (`@`) and
  *    `--platform` are out of subset;
  *  - EXPOSE: space-separated ports, each 1-65535 with an optional
  *    `/tcp` or `/udp` suffix — censused as count + port sum;
  *  - ENV / LABEL / ARG pairs `KEY=value`: key
  *    `[A-Za-z_][A-Za-z0-9_.-]*`, value bare (no spaces) or
  *    double-quoted without inner quotes/escapes; ARG also admits a
  *    bare KEY (no default); censused as the pair count;
  *  - CMD / ENTRYPOINT / RUN in EXEC form (`["a", "b"]` — the form
  *    real Dockerfiles overwhelmingly use) parse as a strict JSON
  *    string array: double-quoted elements with the `\"` escape
  *    ONLY, an optional single space after each comma, ≥1 element,
  *    nothing after the closing bracket; an args string opening with
  *    `[` MUST parse (reject, never fall back to shell form — the
  *    builder's silent fallback is a guess). SHELL is exec-form-only
  *    per the reference, so a shell-form SHELL rejects. The census
  *    records the argv count; shell forms stay verbatim (argv null);
  *  - COPY `--from=<stage|index>` resolves to a STAGE-GRAPH edge:
  *    a numeric ref (no leading zeros) addresses an earlier stage by
  *    index, a name ref resolves through the `AS` table; unknown
  *    names, forward/self references, and any other leading `--`
  *    flag (`--chown`, `--link`: out of subset) reject. At least a
  *    source and a destination must follow the flag. The census
  *    records the resolved source stage — the (stage, from_stage)
  *    pairs ARE the build graph a provenance audit queries;
  *  - every other instruction carries its joined args verbatim (a
  *    census, not an execution semantics — RUN shell syntax is
  *    opaque by design).
  *
  * Emits one row per logical instruction in appearance order with
  * the 0-based stage index (-1 for pre-FROM ARGs). One blob = one
  * task-local walk (codec-family plan shape). */
object DockerLake {

  private object Fail extends scala.util.control.ControlThrowable

  private val Instrs: Set[String] = Set(
    "FROM", "RUN", "CMD", "LABEL", "EXPOSE", "ENV", "ADD", "COPY",
    "ENTRYPOINT", "VOLUME", "USER", "WORKDIR", "ARG", "ONBUILD",
    "STOPSIGNAL", "HEALTHCHECK", "SHELL", "MAINTAINER")

  private[graft] final case class DockerRow(
      stage: Int, instr: String, image: Option[String],
      tag: Option[String], stageName: Option[String],
      nParts: Option[Int], lsum: Option[Long], args: String,
      argvN: Option[Int] = None, fromStage: Option[Int] = None)

  private def isImageChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '.' || c == '_' || c == '/' || c == '-'

  private def isTagChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'

  private def isStageNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '_' || c == '-'

  /** FROM args: image[:tag] [AS name]; `stage` is this FROM's own
    * 0-based index, recorded against the AS name for `--from`
    * resolution. */
  private def parseFrom(args: String, stage: Int,
      stageNames: scala.collection.mutable.HashMap[String, Int]): DockerRow = {
    val toks = args.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty || toks.length == 2 || toks.length > 3) throw Fail
    val ref = toks(0)
    if (ref.contains('@')) throw Fail // digest pins out of subset
    if (ref.startsWith("--")) throw Fail // --platform out of subset
    val colon = ref.indexOf(':')
    val (img, tag) =
      if (colon < 0) (ref, None)
      else (ref.substring(0, colon), Some(ref.substring(colon + 1)))
    if (img.isEmpty || img.length > 256 || !img.forall(isImageChar))
      throw Fail
    tag.foreach { t =>
      if (t.isEmpty || t.length > 128 || !t.forall(isTagChar)) throw Fail
    }
    val name = if (toks.length == 3) {
      if (toks(1) != "AS") throw Fail
      val n = toks(2)
      if (n.isEmpty || n.length > 64 || !n.forall(isStageNameChar))
        throw Fail
      if (stageNames.contains(n)) throw Fail // stage names unique
      stageNames(n) = stage
      Some(n)
    } else None
    DockerRow(stage, "FROM", Some(img), tag, name, None, None, args)
  }

  /** JSON-array exec form (CMD/ENTRYPOINT/RUN/SHELL): string
    * elements only, the `\"` escape only, an optional single space
    * after each comma, ≥1 element, nothing after `]`. Returns the
    * argv count. */
  private def parseExecArray(s: String): Int = {
    var p = 1 // caller guaranteed s(0) == '['
    var n = 0
    var more = true
    while (more) {
      if (p >= s.length || s(p) != '"') throw Fail
      p += 1
      val vs = p
      var done = false
      while (!done) {
        if (p >= s.length) throw Fail
        val ch = s(p)
        if (ch == '"') done = true
        else if (ch == '\\') {
          // the subset's ONLY escape; `\\`, `\n`, … reject
          if (p + 1 >= s.length || s(p + 1) != '"') throw Fail
          p += 2
        } else if (ch < 0x20) throw Fail // tabs are not JSON string chars
        else p += 1
      }
      if (p - vs > 1024) throw Fail
      p += 1 // the closing quote
      n += 1
      if (n > 64) throw Fail
      if (p >= s.length) throw Fail
      s(p) match {
        case ',' =>
          p += 1
          if (p < s.length && s(p) == ' ') p += 1
        case ']' =>
          p += 1
          more = false
        case _ => throw Fail
      }
    }
    if (p != s.length) throw Fail // trailing garbage after the array
    n
  }

  /** COPY: resolve an optional `--from=<stage|index>` into a
    * stage-graph edge; any OTHER leading `--` flag is out of subset.
    * `stage` is the consuming stage (the edge's sink). */
  private def parseCopy(args: String, stage: Int,
      stageNames: scala.collection.mutable.HashMap[String, Int]): DockerRow = {
    if (!args.startsWith("--"))
      return DockerRow(stage, "COPY", None, None, None, None, None, args)
    if (!args.startsWith("--from=")) throw Fail
    val sp = args.indexOf(' ')
    if (sp < 0) throw Fail
    val ref = args.substring(7, sp)
    if (ref.isEmpty || ref.length > 64) throw Fail
    // at least a source and a destination must follow the flag
    if (args.substring(sp + 1).split(" ").count(_.nonEmpty) < 2) throw Fail
    val idx =
      if (ref.forall(_.isDigit)) {
        if (ref.length > 1 && ref(0) == '0') throw Fail
        if (ref.length > 4) throw Fail
        ref.toInt
      } else {
        if (!ref.forall(isStageNameChar)) throw Fail
        stageNames.getOrElse(ref, throw Fail)
      }
    if (idx >= stage) throw Fail // forward/self reference
    DockerRow(stage, "COPY", None, None, None, None, None, args,
      fromStage = Some(idx))
  }

  /** EXPOSE: ports with optional /tcp | /udp, censused count + sum. */
  private def parseExpose(args: String): DockerRow = {
    val toks = args.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty || toks.length > 64) throw Fail
    var sum = 0L
    toks.foreach { t =>
      val slash = t.indexOf('/')
      val (p, proto) =
        if (slash < 0) (t, "tcp")
        else (t.substring(0, slash), t.substring(slash + 1))
      if (proto != "tcp" && proto != "udp") throw Fail
      if (p.isEmpty || p.length > 5 || !p.forall(_.isDigit)) throw Fail
      if (p.length > 1 && p(0) == '0') throw Fail
      val v = p.toInt
      if (v < 1 || v > 65535) throw Fail
      sum += v
    }
    DockerRow(0, "EXPOSE", None, None, None, Some(toks.length),
      Some(sum), args)
  }

  private def isKeyStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'

  private def isKeyChar(c: Char): Boolean =
    isKeyStart(c) || (c >= '0' && c <= '9') || c == '.' || c == '-'

  /** ENV/LABEL/ARG pairs: KEY=value with bare or double-quoted
    * values; ARG also admits a bare KEY. Returns the pair count. */
  private def parsePairs(args: String, bareKeyOk: Boolean): Int = {
    var p = 0
    val s = args
    var n = 0
    while (p < s.length) {
      while (p < s.length && s(p) == ' ') p += 1
      if (p < s.length) {
        val ks = p
        if (!isKeyStart(s(p))) throw Fail
        while (p < s.length && isKeyChar(s(p))) p += 1
        if (p == ks || p - ks > 128) throw Fail
        if (p >= s.length || s(p) == ' ') {
          if (!bareKeyOk) throw Fail // ENV/LABEL need the '='
        } else {
          if (s(p) != '=') throw Fail
          p += 1
          if (p < s.length && s(p) == '"') { // quoted value
            p += 1
            val vs = p
            while (p < s.length && s(p) != '"') p += 1
            if (p >= s.length || p - vs > 1024) throw Fail
            p += 1
            if (p < s.length && s(p) != ' ') throw Fail
          } else { // bare value: to the next space
            val vs = p
            while (p < s.length && s(p) != ' ') {
              if (s(p) == '"') throw Fail
              p += 1
            }
            if (p == vs || p - vs > 1024) throw Fail
          }
        }
        n += 1
        if (n > 64) throw Fail
      }
    }
    if (n == 0) throw Fail
    n
  }

  /** Walk one Dockerfile; None on any structural or subset
    * violation. */
  private[graft] def parseDocker(
      raw: Array[Byte]): Option[Seq[DockerRow]] = {
    if (raw == null || raw.length > (1 << 20)) return None
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val text =
        try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
        catch {
          case _: java.nio.charset.CharacterCodingException => throw Fail
        }
      if (text.exists(ch => ch < 0x20 && ch != '\n' && ch != '\t'))
        throw Fail
      val lines0 = text.split("\n", -1)
      val lines =
        if (lines0.nonEmpty && lines0.last.isEmpty) lines0.dropRight(1)
        else lines0
      if (lines.length > 8192) throw Fail
      // physical → logical: trailing ` \` joins; comments only
      // BETWEEN logical lines
      val logical = scala.collection.mutable.ArrayBuffer.empty[String]
      var cont: StringBuilder = null
      lines.foreach { raw0 =>
        val t = raw0.trim
        if (cont == null && (t.isEmpty || t.startsWith("#"))) ()
        else {
          if (cont != null && t.startsWith("#"))
            throw Fail // comment inside a continuation: out of subset
          val continues = t.endsWith("\\")
          val body = if (continues) t.dropRight(1).trim else t
          if (cont == null) cont = new StringBuilder(body)
          else { cont += ' '; cont ++= body }
          if (!continues) {
            logical += cont.toString
            cont = null
          }
        }
      }
      if (cont != null) throw Fail // dangling continuation at EOF
      if (logical.isEmpty) throw Fail
      val out = scala.collection.mutable.ArrayBuffer.empty[DockerRow]
      val stageNames = scala.collection.mutable.HashMap.empty[String, Int]
      var stage = -1
      logical.foreach { ln =>
        if (out.length >= 2048) throw Fail
        val sp = ln.indexOf(' ')
        if (sp <= 0) throw Fail
        val instr = ln.substring(0, sp)
        if (!Instrs.contains(instr)) throw Fail
        val args = ln.substring(sp + 1).trim
        if (args.isEmpty || args.length > 4096) throw Fail
        instr match {
          case "FROM" =>
            stage += 1
            out += parseFrom(args, stage, stageNames)
          case "ARG" =>
            // the ONLY instruction legal before the first FROM
            out += DockerRow(stage, "ARG", None, None, None,
              Some(parsePairs(args, bareKeyOk = true)), None, args)
          case _ =>
            if (stage < 0) throw Fail // nothing else precedes FROM
            instr match {
              case "EXPOSE" =>
                out += parseExpose(args).copy(stage = stage)
              case "ENV" | "LABEL" =>
                out += DockerRow(stage, instr, None, None, None,
                  Some(parsePairs(args, bareKeyOk = false)), None, args)
              case "COPY" =>
                out += parseCopy(args, stage, stageNames)
              case "CMD" | "ENTRYPOINT" | "RUN" =>
                // opening `[` commits to exec form — no silent
                // shell-form fallback
                val argvN =
                  if (args(0) == '[') Some(parseExecArray(args)) else None
                out += DockerRow(stage, instr, None, None, None,
                  None, None, args, argvN = argvN)
              case "SHELL" =>
                if (args(0) != '[') throw Fail // exec-form-only
                out += DockerRow(stage, "SHELL", None, None, None,
                  None, None, args, argvN = Some(parseExecArray(args)))
              case _ =>
                out += DockerRow(stage, instr, None, None, None,
                  None, None, args)
            }
        }
      }
      if (!out.exists(_.instr == "FROM")) throw Fail
      Some(out.toSeq)
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // DataFrame surface

  private val outSchema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("seq", IntegerType, true),
    StructField("stage", IntegerType, true),
    StructField("instr", StringType, true),
    StructField("image", StringType, true),
    StructField("tag", StringType, true),
    StructField("stage_name", StringType, true),
    StructField("n_parts", IntegerType, true),
    StructField("lsum", LongType, true),
    StructField("argv_n", IntegerType, true),
    StructField("from_stage", IntegerType, true),
    StructField("args", StringType, true),
    StructField("valid", BooleanType, false)))

  /** One row per logical instruction in appearance order; invalid →
    * one flagged row. */
  def extractDocker(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseDocker(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(es) => es.zipWithIndex.map { case (e, i) =>
            Row(id, i, e.stage, e.instr, e.image.orNull, e.tag.orNull,
              e.stageName.orNull, e.nParts.map(Int.box).orNull,
              e.lsum.map(Long.box).orNull, e.argvN.map(Int.box).orNull,
              e.fromStage.map(Int.box).orNull, e.args, true)
          }
          case None =>
            Seq(Row(id, 0, null, null, null, null, null, null, null,
              null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  /** Fixture law (q248, replayed closed-form by the oracle): doc i
    * opens with ARG BASE=u(i%3) when i%4==0 (the pre-FROM position),
    * then FROM img(i%5):v(i%3) AS build, a two-segment RUN
    * continuation "apk add pkg(i%7)" / "&& echo done(i%4)", ENV with
    * two pairs K(i%3)=v(i%5) and MODE="m (i%2)" (quoted value with a
    * space), EXPOSE 8000+i%10 and (9000+i%7)/tcp, a SECOND stage on
    * even i (FROM img((i+1)%5), then COPY --from=build /a /b(i%3)),
    * and CMD ["run", "r(i%6)"]. */
  def dockerFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, dockerDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def dockerDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# docker fixture " + i + "\n")
    if (i % 4 == 0) sb.append("ARG BASE=u" + i % 3 + "\n")
    sb.append("FROM img" + i % 5 + ":v" + i % 3 + " AS build\n")
    sb.append("RUN apk add pkg" + i % 7 + " \\\n")
    sb.append("    && echo done" + i % 4 + "\n")
    sb.append("ENV K" + i % 3 + "=v" + i % 5 +
      " MODE=\"m " + i % 2 + "\"\n")
    sb.append("EXPOSE " + (8000 + i % 10) + " " +
      (9000 + i % 7) + "/tcp\n")
    if (i % 2 == 0) {
      sb.append("\nFROM img" + (i + 1) % 5 + "\n")
      sb.append("COPY --from=build /a /b" + i % 3 + "\n")
    }
    sb.append("CMD [\"run\", \"r" + i % 6 + "\"]\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Stage-graph fixture (q249, replayed closed-form by the oracle):
    * doc i is a THREE-stage build — `FROM base(i%4):v(i%3) AS s0`,
    * a RUN in exec form `["sh", "-c", "echo r(i%5)"]` on even i and
    * shell form `echo r(i%5)` on odd, `SHELL ["shl(i%3)", "-c"]`
    * when i%4==0, then `FROM mid(i%5) AS s1` with
    * `COPY --from=s0 /a /m(i%3)` (a NAME edge 1→0) and
    * `ENTRYPOINT ["run", "e(i%6)"]` (plus a third element
    * `"say \"hi\""` exercising the escape when i%5==2), then an
    * anonymous `FROM out(i%3)` with `COPY --from=1 /b /c` (a NUMERIC
    * edge 2→1), `COPY --from=s0 /d /e(i%2)` (a name edge 2→0
    * skipping a stage) and `CMD ["go", "c(i%7)"]`. */
  def dockerGraphFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, dockerGraphDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def dockerGraphDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# graph fixture " + i + "\n")
    sb.append("FROM base" + i % 4 + ":v" + i % 3 + " AS s0\n")
    if (i % 2 == 0)
      sb.append("RUN [\"sh\", \"-c\", \"echo r" + i % 5 + "\"]\n")
    else sb.append("RUN echo r" + i % 5 + "\n")
    if (i % 4 == 0) sb.append("SHELL [\"shl" + i % 3 + "\", \"-c\"]\n")
    sb.append("FROM mid" + i % 5 + " AS s1\n")
    sb.append("COPY --from=s0 /a /m" + i % 3 + "\n")
    val third = if (i % 5 == 2) ", \"say \\\"hi\\\"\"" else ""
    sb.append("ENTRYPOINT [\"run\", \"e" + i % 6 + "\"" + third + "]\n")
    sb.append("FROM out" + i % 3 + "\n")
    sb.append("COPY --from=1 /b /c\n")
    sb.append("COPY --from=s0 /d /e" + i % 2 + "\n")
    sb.append("CMD [\"go\", \"c" + i % 7 + "\"]\n")
    sb.toString.getBytes("UTF-8")
  }
}
