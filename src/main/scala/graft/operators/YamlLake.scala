package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** YAML configuration extraction (YAML 1.2 core schema, strict
  * subset) — the metadata layer of hub corpora: model cards, dataset
  * cards, CI configs, static-site front matter. A real indentation
  * parser with the spec's own lexical laws, never a split-on-`:`
  * approximation.
  *
  * Closed subset (strict — reject, never guess):
  *  - structure: one document; an optional leading `---` start
  *    marker; block mappings (`key: value` / `key:` + nested block)
  *    and block sequences (`- value`), nested by indentation (spaces
  *    only — the YAML tab law; sequences may sit at the parent key's
  *    own indent OR deeper, both real-world emitter styles); sequence
  *    items may themselves be block MAPPINGS (`- key: value`, the hub
  *    model-card `model-index`/`results` and dataset-card `configs`
  *    shape): the first key rides the dash line at column dash+2
  *    exactly, continuation keys sit at that same column, and item
  *    values follow the full mapping-value grammar (so the structure
  *    composes recursively under the same indentation laws); comments
  *    (`#` to EOL, which the spec requires be preceded by whitespace
  *    when trailing a value); the root must be a mapping;
  *  - keys: bare `[A-Za-z0-9_-]+` (≤64 chars), unique per mapping
  *    (the YAML key-uniqueness law); complex/quoted keys out;
  *  - scalars: double-quoted with escapes `\" \\ \n \t \r \uXXXX`
  *    (raw controls and surrogate code points reject), single-quoted
  *    with the `''` escape, and plain scalars resolved by a CLOSED
  *    core-schema subset — `true`/`false` exactly, `null`/`~`,
  *    integers (optional sign, ≤18 digits, no leading zeros), floats
  *    `±D+.DD` (1-2 decimals, projected as an EXACT ×100 integer —
  *    no doubles cross the engine boundary), strict `YYYY-MM-DD`
  *    dates (→ epoch seconds). Anything else number-like (`1.2.3`,
  *    `0x1F`, `1e5`, `007`) and every OTHER resolution-ambiguous
  *    word (`yes`/`On`/`None`/`nan`/`True`…) rejects rather than
  *    silently resolving — the 1.1-vs-1.2 "Norway problem" is a
  *    reject, not a guess;
  *  - block scalars (YAML 1.2 sec 8.1) as MAPPING values and as
  *    DIRECT sequence items (`- |`, the prompt-list shape — the dash
  *    column is the owning indent): literal
  *    (`|`) and folded (`>`) with the chomping indicators (`-` strip,
  *    `+` keep, none clip) and the explicit indentation indicator
  *    (1-9, relative to the owning node's indent), in either order;
  *    content
  *    ends at the first less-indented non-empty line or EOF. Strict
  *    sub-laws (reject, never guess): trailing spaces on a content
  *    line, an all-space line longer than the block indent, a leading
  *    empty line more indented than the auto-detected indent, and —
  *    folded only — more-indented content lines (whose breaks the
  *    spec does NOT fold) all reject;
  *  - flow: ONE level of flow sequences `[a, 1, "b"]` and ONE level
  *    of flow mappings `{k: 1, m: "x"}` as mapping values (scalar
  *    elements/values only, bare unique keys, the same ": " pair
  *    indicator); nested flow, tags, directives, flow collections as
  *    DIRECT sequence items, and multi-document streams in THIS
  *    single-document surface (bounded streams go through
  *    [[parseYamlDocs]]) are out of subset;
  *  - anchors & aliases (the docker-compose / GitLab-CI reuse
  *    idiom), bounded and acyclic: `key: &name <scalar>` anchors a
  *    plain/quoted scalar, `key: &name` + nested block anchors the
  *    MAPPING or SEQUENCE that follows; `key: *name` (and `- *name`
  *    as a sequence item) replays the anchored node re-rooted at the
  *    target path; `<<: *name` inside a block mapping merges an
  *    anchored MAPPING's keys with LOCAL-KEY PRECEDENCE — merged
  *    entries emit when the mapping closes, in the anchor's order,
  *    skipping every top-level key the mapping defines itself
  *    (before or after the merge line, per the merge-key spec).
  *    Aliases expand at parse time, so an anchored node captures its
  *    own expanded form. Strict sub-laws (reject, never guess):
  *    undefined aliases, an alias to an anchor whose subtree is
  *    still open (the cycle case), duplicate anchor names, more than
  *    one merge key per mapping, merging a scalar/sequence anchor,
  *    anchors on flow/block-scalar values, anchored nodes over 256
  *    entries, and a whole-document alias-expansion budget of 1024
  *    emitted entries (the whole-chain-budget law: per-item caps
  *    times N need the product bound).
  *
  * Emits one row per leaf in APPEARANCE order; every sequence also
  * emits a container row carrying its element count. One blob = one
  * task-local walk (codec-family plan shape). */
object YamlLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class YamlEntry(
      path: String, kind: String, lval: Option[Long],
      sval: Option[String], fx100: Option[Long], arrN: Option[Int])

  // resolution-ambiguous plain words: YAML 1.1 bools / 1.2 variants /
  // non-finite floats — resolving any of them would be a guess
  private val Ambiguous: Set[String] = Set(
    "true", "false", "null", "yes", "no", "on", "off", "none",
    "nan", "inf", "infinity")

  private def isBareKeyChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '-'

  private final class LCur(val s: String) {
    var p = 0
    def ws(): Unit = { while (p < s.length && s(p) == ' ') p += 1 }
    /** EOL or a trailing comment — which the spec only admits after
      * whitespace (`a#b` is scalar content, `a #b` is a comment). */
    def eol: Boolean = p >= s.length ||
      (s(p) == '#' && (p == 0 || s(p - 1) == ' '))
    def peek: Char = { if (p >= s.length) throw Fail; s(p) }
    def finish(): Unit = { ws(); if (!eol) throw Fail }
  }

  private def bareKey(c: LCur): String = {
    val st = c.p
    while (c.p < c.s.length && isBareKeyChar(c.s(c.p))) c.p += 1
    if (c.p == st || c.p - st > 64) throw Fail
    c.s.substring(st, c.p)
  }

  private def quotedDouble(c: LCur): String = {
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
              // surrogate code points are not Unicode scalar values
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

  private def quotedSingle(c: LCur): String = {
    c.p += 1
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (c.p >= c.s.length) throw Fail // unterminated
      val ch = c.s(c.p); c.p += 1
      if (ch == '\'') {
        if (c.p < c.s.length && c.s(c.p) == '\'') { sb += '\''; c.p += 1 }
        else done = true
      } else if (ch < 0x20) throw Fail
      else sb += ch
    }
    sb.toString
  }

  /** Resolve one PLAIN token under the closed core-schema subset. */
  private def resolvePlain(tok: String): YamlEntry = {
    if (tok.isEmpty) throw Fail
    if (tok == "true") return YamlEntry("", "bool", Some(1L), None, None, None)
    if (tok == "false") return YamlEntry("", "bool", Some(0L), None, None, None)
    if (tok == "null" || tok == "~")
      return YamlEntry("", "null", None, None, None, None)
    // every other resolution-ambiguous word rejects, case-insensitively
    if (Ambiguous.contains(tok.toLowerCase(java.util.Locale.ROOT))) throw Fail
    val c0 = tok.head
    if (c0.isDigit || c0 == '+' || c0 == '-') {
      // number-like: must be EXACTLY one of the three accepted shapes
      val sgn = if (c0 == '+' || c0 == '-') 1 else 0
      val body = tok.substring(sgn)
      val dot = body.indexOf('.')
      if (dot < 0 && sgn == 0 && body.length == 10 && body(4) == '-' &&
          body(7) == '-') {
        // strict date YYYY-MM-DD → epoch seconds
        val (y, m, d) = (body.substring(0, 4), body.substring(5, 7),
          body.substring(8, 10))
        if (!(y + m + d).forall(_.isDigit)) throw Fail
        val epoch =
          try java.time.LocalDate.of(y.toInt, m.toInt, d.toInt)
            .toEpochDay * 86400L
          catch { case _: java.time.DateTimeException => throw Fail }
        return YamlEntry("", "date", Some(epoch), None, None, None)
      }
      val ip = if (dot < 0) body else body.substring(0, dot)
      if (ip.isEmpty || ip.length > 18 || !ip.forall(_.isDigit)) throw Fail
      if (ip.length > 1 && ip(0) == '0') throw Fail // leading-zero law
      val neg = c0 == '-'
      val iv = java.lang.Long.parseLong(ip) * (if (neg) -1 else 1)
      if (dot < 0) return YamlEntry("", "int", Some(iv), None, None, None)
      val fp = body.substring(dot + 1)
      if (fp.length < 1 || fp.length > 2 || !fp.forall(_.isDigit)) throw Fail
      val cents = Integer.parseInt(fp) * (if (fp.length == 1) 10 else 1)
      // `neg` carries the "-0.xx" case the signed int cannot
      // represent. An 18-digit integer part × 100 exceeds Long —
      // reject-never-guess: overflow is a Fail, not a wrapped value
      // (the TomlLake r14-ADVICE lesson, repeated here before the
      // advisor had to)
      val x100 =
        try {
          val scaled = Math.multiplyExact(iv, 100L)
          if (neg) Math.subtractExact(scaled, cents.toLong)
          else Math.addExact(scaled, cents.toLong)
        } catch { case _: ArithmeticException => throw Fail }
      return YamlEntry("", "float", None, None, Some(x100), None)
    }
    // plain string: the first char must not be a YAML indicator
    if ("?:,[]{}#&*!|>'\"%@`-".indexOf(c0) >= 0) throw Fail
    if (tok.contains(": ") || tok.endsWith(":")) throw Fail
    YamlEntry("", "str", None, Some(tok), None, None)
  }

  /** Scan one plain token in block context: to EOL or ` #` comment. */
  private def scanPlain(c: LCur): String = {
    val st = c.p
    var stop = -1
    var q = c.p
    while (stop < 0 && q < c.s.length) {
      if (c.s(q) == '#' && q > st && c.s(q - 1) == ' ') stop = q
      else q += 1
    }
    val end = if (stop < 0) c.s.length else stop
    c.p = end
    val tok = c.s.substring(st, end)
    val t = tok.replaceAll("\\s+$", "")
    if (t.isEmpty) throw Fail
    t
  }

  /** Scan one plain token in flow context: stops at `,` and the
    * collection's closing indicator; YAML 1.2 makes EVERY
    * c-flow-indicator (`,` `[` `]` `{` `}`) an indicator in flow
    * context, so a plain token containing any of the others rejects
    * rather than silently carrying what a real parser errors on. */
  private def scanPlainFlow(c: LCur, close: Char): String = {
    val st = c.p
    while (c.p < c.s.length && c.s(c.p) != ',' && c.s(c.p) != close &&
      c.s(c.p) != '#') c.p += 1
    if (c.p >= c.s.length) throw Fail // flow must close on the line
    if (c.s(c.p) == '#') throw Fail
    val t = c.s.substring(st, c.p).trim
    if (t.isEmpty) throw Fail
    if (t.exists(ch => ch == '[' || ch == ']' || ch == '{' || ch == '}'))
      throw Fail
    t
  }

  /** Parse one SCALAR at the cursor (no flow collections here);
    * `flow` carries the enclosing collection's closer, 0 = block. */
  private def scalar(c: LCur, flow: Char): YamlEntry = {
    c.ws()
    c.peek match {
      case '"' =>
        val v = quotedDouble(c)
        YamlEntry("", "str", None, Some(v), None, None)
      case '\'' =>
        val v = quotedSingle(c)
        YamlEntry("", "str", None, Some(v), None, None)
      case '{' | '[' | '&' | '*' | '!' | '|' | '>' | '%' | '@' | '`' =>
        throw Fail // nested flow, tags, block scalars, directives,
      // reserved indicators — and anchors/aliases at any position
      // the dedicated keyLine/seqItem branches do not handle (flow
      // elements, a value after an anchor): out of subset
      case _ =>
        resolvePlain(if (flow != 0) scanPlainFlow(c, flow)
        else scanPlain(c))
    }
  }

  /** One open block scalar (YAML 1.2 sec 8.1): accumulates logical
    * content lines until a less-indented non-empty line (or EOF)
    * closes it. `indent` is -1 until auto-detection resolves it from
    * the first non-empty content line. */
  private final class BlkSt(val keyIndent: Int, val path: String,
      val folded: Boolean, val chomp: Int) { // 0 clip, 1 strip, 2 keep
    var indent: Int = -1
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var pendingEmpties = 0 // leading empty lines before resolution
    var maxLead = 0 // longest leading empty line (spec: must not
    // exceed the detected indentation)
  }

  /** A captured anchor: the node's class plus its entries with
    * RELATIVE paths ("" is the node itself — a scalar's one entry or
    * a sequence's container row). */
  private final case class AnchorNode(kind: String,
      entries: Vector[YamlEntry])

  private sealed trait Scope {
    def indent: Int
    def path: String
    def anchor: Option[String]
    def anchorStart: Int
  }
  private final case class MapScope(indent: Int, path: String,
      seen: scala.collection.mutable.HashSet[String],
      anchor: Option[String] = None, anchorStart: Int = 0)
      extends Scope {
    // the `<<` merge payload, held until the mapping closes so
    // local keys appearing AFTER the merge line still win
    var merge: Option[Vector[YamlEntry]] = None
  }
  private final case class SeqScope(indent: Int, path: String,
      var idx: Int, rowAt: Int, anchor: Option[String] = None,
      anchorStart: Int = 0) extends Scope

  /** Walk one document; None on any spec or subset violation. */
  private[graft] def parseYaml(raw: Array[Byte]): Option[Seq[YamlEntry]] = {
    if (raw == null || raw.length > (1 << 20)) return None
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val text =
        try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
        catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
      // strict text: LF line breaks only; tabs reject everywhere (the
      // YAML indentation law, applied to the whole subset)
      if (text.exists(ch => ch < 0x20 && ch != '\n')) throw Fail
      // a final \n terminates the last line rather than opening an
      // empty one — the phantom line would count as a trailing empty
      // inside a keep-chomped block scalar
      val lines0 = text.split("\n", -1)
      val lines =
        if (lines0.nonEmpty && lines0.last.isEmpty) lines0.dropRight(1)
        else lines0
      if (lines.length > 8192) throw Fail
      val out = scala.collection.mutable.ArrayBuffer.empty[YamlEntry]
      val stack = scala.collection.mutable.ArrayBuffer.empty[Scope]
      // `key:` awaiting a block, with an optional anchor to attach
      var pending: Option[(Int, String, Option[String])] = None
      var blk: Option[BlkSt] = None // an open block scalar
      var sawContent = false
      var sawDocStart = false
      val anchors = scala.collection.mutable.HashMap.empty[String, AnchorNode]
      // anchors whose subtree is still being captured: an alias to
      // one of these IS the cycle case
      val openAnchors = scala.collection.mutable.HashSet.empty[String]
      var expanded = 0 // whole-document alias-expansion budget

      /** Emit one captured entry re-rooted at `base`, under the
        * expansion budget and the path bounds. */
      def emitAt(e: YamlEntry, base: String): Unit = {
        expanded += 1
        if (expanded > 1024) throw Fail
        val p =
          if (e.path.isEmpty) base
          else if (base.isEmpty) e.path
          else base + "." + e.path
        if (p.isEmpty || p.length > 256 || p.count(_ == '.') >= 8)
          throw Fail
        emit(e.copy(path = p))
      }

      /** Scan `&name` / `*name` at the cursor (cursor ON the
        * indicator). */
      def anchorName(c: LCur): String = {
        c.p += 1
        val st = c.p
        while (c.p < c.s.length && isBareKeyChar(c.s(c.p))) c.p += 1
        if (c.p == st || c.p - st > 32) throw Fail
        c.s.substring(st, c.p)
      }

      /** Replay an anchored node at `tpath` (a `*name` use). */
      def expandAlias(name: String, tpath: String): Unit = {
        if (openAnchors.contains(name)) throw Fail // cycle
        val node = anchors.getOrElse(name, throw Fail) // undefined
        node.entries.foreach(emitAt(_, tpath))
      }

      def popTop(): Unit = {
        val s = stack.remove(stack.length - 1)
        s match {
          case sq: SeqScope =>
            // patch the container row with the now-known element count
            out(sq.rowAt) = out(sq.rowAt).copy(arrN = Some(sq.idx))
          case m: MapScope =>
            // merge-at-close: anchor-order emission of every merged
            // entry whose TOP-LEVEL key the mapping does not define
            // locally (local keys win regardless of line order)
            m.merge.foreach(_.foreach { e =>
              val dot = e.path.indexOf('.')
              val top = if (dot < 0) e.path else e.path.substring(0, dot)
              if (!m.seen.contains(top)) emitAt(e, m.path)
            })
        }
        // the anchored subtree is complete (container counts patched,
        // merges emitted): capture it with relative paths
        s.anchor.foreach { name =>
          val slice = out.slice(s.anchorStart, out.length)
          if (slice.isEmpty || slice.length > 256) throw Fail
          val rels = slice.map { e =>
            val rel =
              if (e.path == s.path) ""
              else e.path.substring(s.path.length + 1)
            e.copy(path = rel)
          }.toVector
          val kind = s match {
            case _: MapScope => "map"
            case _ => "seq"
          }
          anchors(name) = AnchorNode(kind, rels)
          openAnchors -= name
        }
      }

      def childPath(parent: String, key: String): String = {
        // depth 8 admits the canonical hub model-index shape
        // (model-index.0.results.0.metrics.0.value = 6 dots) with
        // headroom; still a hard bound, not a growth vector
        val p = if (parent.isEmpty) key else parent + "." + key
        if (p.length > 256 || p.count(_ == '.') >= 8) throw Fail
        p
      }

      def emit(e: YamlEntry): Unit = {
        if (out.length >= 2048) throw Fail
        out += e
      }

      /** Parse a block-scalar header at the cursor and open the
        * block: style (`|`/`>`), then at most one chomping indicator
        * and one indentation indicator, either order. `keyIndent` is
        * the owning node's column (the key's indent, or the dash's
        * for a block scalar as a sequence item) — content must sit
        * deeper, and the explicit indicator is relative to it. */
      def blkHeader(c: LCur, keyIndent: Int, path: String): Unit = {
        val folded = c.peek == '>'
        c.p += 1
        var chomp = 0
        var sawChomp = false
        var ind = -1
        var more = true
        while (more && c.p < c.s.length) {
          val ch = c.s(c.p)
          if ((ch == '-' || ch == '+') && !sawChomp) {
            sawChomp = true
            chomp = if (ch == '-') 1 else 2
            c.p += 1
          } else if (ch >= '1' && ch <= '9' && ind < 0) {
            ind = ch - '0'
            c.p += 1
          } else more = false
        }
        c.finish() // anything but a space-led comment rejects
        val b = new BlkSt(keyIndent, path, folded, chomp)
        if (ind > 0) b.indent = keyIndent + ind
        blk = Some(b)
      }

      def keyLine(c: LCur, m: MapScope): Unit = {
        if (c.peek == '<') { // `<<: *name` — the merge key
          if (!c.s.startsWith("<<:", c.p)) throw Fail
          c.p += 3
          if (c.p < c.s.length && c.s(c.p) != ' ') throw Fail
          c.ws()
          if (c.eol || c.peek != '*') throw Fail // only an alias merges
          val name = anchorName(c)
          if (m.merge.nonEmpty) throw Fail // one merge key per mapping
          if (openAnchors.contains(name)) throw Fail // cycle
          val node = anchors.getOrElse(name, throw Fail) // undefined
          if (node.kind != "map") throw Fail // merge needs a mapping
          m.merge = Some(node.entries)
          c.finish()
          return
        }
        val key = bareKey(c)
        if (!m.seen.add(key)) throw Fail // the key-uniqueness law
        if (c.peek != ':') throw Fail
        c.p += 1
        // the block-mapping indicator is ": " (or `:` at EOL) — a
        // colon glued to the value is plain-scalar content in YAML,
        // not a mapping, so accepting it would be a guess
        if (c.p < c.s.length && c.s(c.p) != ' ') throw Fail
        val path = childPath(m.path, key)
        c.ws()
        if (c.eol) { pending = Some((m.indent, path, None)); return }
        if (c.peek == '&') { // anchor definition
          val name = anchorName(c)
          if (anchors.contains(name) || openAnchors.contains(name))
            throw Fail // duplicate anchor name
          c.ws()
          if (c.eol) { // anchored COLLECTION: the block that follows
            openAnchors += name
            pending = Some((m.indent, path, Some(name)))
            return
          }
          // anchored SCALAR: plain or quoted only (anchors on flow /
          // block-scalar values stay out of subset via scalar())
          val e = scalar(c, flow = 0).copy(path = path)
          emit(e)
          anchors(name) = AnchorNode("scalar", Vector(e.copy(path = "")))
          c.finish()
          return
        }
        if (c.peek == '*') { // alias as the mapping value
          expandAlias(anchorName(c), path)
          c.finish()
          return
        }
        if (c.peek == '|' || c.peek == '>') {
          blkHeader(c, m.indent, path)
          return
        }
        if (c.peek == '[') { // one-level flow sequence value
          c.p += 1
          val rowAt = out.length
          emit(YamlEntry(path, "seq", None, None, None, Some(0)))
          var n = 0
          c.ws()
          if (c.peek == ']') c.p += 1
          else {
            var more = true
            while (more) {
              c.ws()
              if (n >= 256) throw Fail
              emit(scalar(c, flow = ']').copy(path = path + "." + n))
              n += 1
              c.ws()
              if (c.peek == ',') c.p += 1
              else { if (c.peek != ']') throw Fail; c.p += 1; more = false }
            }
          }
          out(rowAt) = out(rowAt).copy(arrN = Some(n))
        } else if (c.peek == '{') { // one-level flow mapping value
          c.p += 1
          val rowAt = out.length
          emit(YamlEntry(path, "map", None, None, None, Some(0)))
          var n = 0
          c.ws()
          if (c.peek == '}') c.p += 1
          else {
            val seen = scala.collection.mutable.HashSet.empty[String]
            var more = true
            while (more) {
              c.ws()
              if (n >= 256) throw Fail
              val k = bareKey(c)
              if (!seen.add(k)) throw Fail // key uniqueness, flow form
              if (c.peek != ':') throw Fail
              c.p += 1
              // the flow pair indicator is also ": " in this subset
              if (c.p >= c.s.length || c.s(c.p) != ' ') throw Fail
              c.ws()
              emit(scalar(c, flow = '}').copy(path = childPath(path, k)))
              n += 1
              c.ws()
              if (c.peek == ',') c.p += 1
              else { if (c.peek != '}') throw Fail; c.p += 1; more = false }
            }
          }
          out(rowAt) = out(rowAt).copy(arrN = Some(n))
        } else emit(scalar(c, flow = 0).copy(path = path))
        c.finish()
      }

      /** Feed one raw line to the open block scalar; false when the
        * line closes the block (caller reprocesses it). */
      def consumeBlk(b: BlkSt, line: String): Boolean = {
        var sp = 0
        while (sp < line.length && line(sp) == ' ') sp += 1
        if (sp == line.length) { // empty (all-space) line
          if (b.indent < 0) {
            b.pendingEmpties += 1
            if (sp > b.maxLead) b.maxLead = sp
          } else {
            // spaces past the block indent would be invisible content
            if (sp > b.indent) throw Fail
            b.lines += ""
          }
          true
        } else {
          if (b.indent < 0) {
            if (sp <= b.keyIndent) return false // no content: closes
            b.indent = sp // auto-detected from the first content line
            if (b.maxLead > sp) throw Fail // sec 8.1.1 leading-empty law
            (0 until b.pendingEmpties).foreach(_ => b.lines += "")
            b.pendingEmpties = 0
          } else if (sp < b.indent) return false // dedent closes
          val content = line.substring(b.indent)
          if (content.last == ' ') throw Fail // trailing-space law
          // folded: the spec does NOT fold breaks around more-indented
          // lines — out of subset rather than a second assembly mode
          if (b.folded && content(0) == ' ') throw Fail
          b.lines += content
          true
        }
      }

      /** Assemble the block scalar's value (sec 8.1 chomping laws). */
      def closeBlk(): Unit = {
        val b = blk.get
        blk = None
        val ls: Seq[String] =
          if (b.indent < 0) Seq.fill(b.pendingEmpties)("")
          else b.lines.toSeq
        var last = ls.length - 1
        while (last >= 0 && ls(last).isEmpty) last -= 1
        val body = ls.take(last + 1)
        val trailingEmpties = ls.length - (last + 1)
        val raw =
          if (!b.folded) body.mkString("\n")
          else {
            // fold a single break between content lines to a space; a
            // run of k empty lines contributes k newlines
            val sb = new StringBuilder
            var prevContent = false
            var pend = 0
            body.foreach { l =>
              if (l.isEmpty) pend += 1
              else {
                if (prevContent && pend == 0) sb += ' '
                else (0 until pend).foreach(_ => sb += '\n')
                sb ++= l
                prevContent = true
                pend = 0
              }
            }
            sb.toString
          }
        val value = b.chomp match {
          case 1 => raw // strip: no trailing breaks
          case 0 => if (raw.isEmpty) "" else raw + "\n" // clip: one
          case _ => // keep: the final break plus every trailing empty
            if (body.isEmpty) "\n" * trailingEmpties
            else raw + ("\n" * (1 + trailingEmpties))
        }
        emit(YamlEntry(b.path, "str", None, Some(value), None, None))
      }

      def seqItem(c: LCur, sq: SeqScope): Unit = {
        c.p += 1 // the dash
        if (c.p < c.s.length && c.s(c.p) != ' ') throw Fail
        c.ws()
        if (c.eol) throw Fail // bare `-` (anonymous nesting): out
        // a sequence item may itself be a block MAPPING (`- key: v`,
        // the hub model-card `model-index`/`results` shape). Detection
        // is lexical: a bare key, `:`, then space or EOL — anything
        // else (incl. `key:x`, plain-scalar content under the ": "
        // indicator law) stays a scalar item. The item mapping's
        // column is EXACTLY dash+2: extra spaces after the dash would
        // float the continuation-key column, so they reject for map
        // items (scalar items keep the established lenient spacing).
        val isMapItem = isBareKeyChar(c.peek) && {
          var q = c.p
          while (q < c.s.length && isBareKeyChar(c.s(q))) q += 1
          q - c.p <= 64 && q < c.s.length && c.s(q) == ':' &&
            (q + 1 == c.s.length || c.s(q + 1) == ' ')
        }
        val ipath = sq.path + "." + sq.idx
        sq.idx += 1
        if (c.peek == '*') { // alias as a sequence item (`- *name`)
          expandAlias(anchorName(c), ipath)
          c.finish()
        } else if (c.peek == '|' || c.peek == '>') {
          // a block scalar as the item ITSELF (`- |` — prompt lists
          // in eval/training configs): the dash column is the owning
          // indent, so content sits deeper than the dash and the
          // next item (or any dedent) closes the block
          blkHeader(c, sq.indent, ipath)
        } else if (isMapItem) {
          if (c.p != sq.indent + 2) throw Fail
          if (stack.length >= 8) throw Fail
          val m = MapScope(sq.indent + 2, ipath,
            scala.collection.mutable.HashSet.empty[String])
          stack += m
          // the first key rides the dash line; continuation keys
          // arrive as ordinary mapping lines at the item's indent
          keyLine(c, m)
        } else {
          emit(scalar(c, flow = 0).copy(path = ipath))
          c.finish()
        }
      }

      def structuralLine(line: String): Unit = {
        val c = new LCur(line)
        c.ws()
        val indent = c.p
        if (!c.eol) { // content line (blank / comment lines skip)
          val rest = line.substring(indent)
          if (rest == "---") {
            // document start marker: legal once, before any content
            if (sawContent || sawDocStart) throw Fail
            sawDocStart = true
          } else if (rest == "..." || rest.startsWith("--- ")) {
            throw Fail // document end / multi-doc streams: out
          } else {
            sawContent = true
            val isDash = rest(0) == '-' &&
              (rest.length == 1 || rest(1) == ' ')
            pending match {
              case Some((ki, kpath, anch)) =>
                pending = None
                if (isDash) {
                  // block sequence: at the key's own indent or deeper
                  if (indent < ki) throw Fail
                  if (stack.length >= 8) throw Fail
                  val sq = SeqScope(indent, kpath, 0, out.length,
                    anchor = anch, anchorStart = out.length)
                  emit(YamlEntry(kpath, "seq", None, None, None, Some(0)))
                  stack += sq
                  seqItem(c, sq)
                } else {
                  // nested mapping: strictly deeper than the key
                  if (indent <= ki) throw Fail
                  if (stack.length >= 8) throw Fail
                  val m = MapScope(indent, kpath,
                    scala.collection.mutable.HashSet.empty[String],
                    anchor = anch, anchorStart = out.length)
                  stack += m
                  keyLine(c, m)
                }
              case None =>
                while (stack.nonEmpty && stack.last.indent > indent)
                  popTop()
                // a same-indent sequence closes on the next mapping key
                if (stack.nonEmpty && !isDash &&
                    stack.last.isInstanceOf[SeqScope] &&
                    stack.last.indent == indent) popTop()
                if (stack.isEmpty) {
                  // the root must be a mapping at column 0
                  if (indent != 0 || isDash) throw Fail
                  stack += MapScope(0, "",
                    scala.collection.mutable.HashSet.empty[String])
                }
                val top = stack.last
                if (top.indent != indent) throw Fail
                (top, isDash) match {
                  case (sq: SeqScope, true) => seqItem(c, sq)
                  case (m: MapScope, false) => keyLine(c, m)
                  case _ => throw Fail
                }
            }
          }
        }
      }

      lines.foreach { line =>
        if (blk.isEmpty) structuralLine(line)
        else if (!consumeBlk(blk.get, line)) {
          closeBlk() // emit, then reprocess the closing line
          structuralLine(line)
        }
      }
      if (blk.nonEmpty) closeBlk() // EOF closes an open block scalar
      if (pending.nonEmpty) throw Fail // `key:` with no block
      while (stack.nonEmpty) popTop()
      if (out.isEmpty) throw Fail
      Some(out.toSeq)
    } catch { case Fail => None }
  }

  /** Bounded multi-document stream (`---`-separated — config dumps
    * and concatenated dataset shards). A column-0 `---` line is
    * unambiguous as a separator in this subset: block-scalar content
    * is always indented at least one space, so no document can own
    * one. Content before the first marker is document 0 (the
    * marker-less opener the single-document surface also allows);
    * each document then re-enters [[parseYaml]] so EVERY
    * single-document law applies per document, and any invalid
    * document invalidates the whole stream (reject, never guess).
    * At most 64 documents. */
  private[graft] def parseYamlDocs(
      raw: Array[Byte]): Option[Seq[Seq[YamlEntry]]] = {
    if (raw == null || raw.length > (1 << 20)) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val text =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        return None }
    if (text.exists(ch => ch < 0x20 && ch != '\n')) return None
    val lines0 = text.split("\n", -1)
    val lines =
      if (lines0.nonEmpty && lines0.last.isEmpty) lines0.dropRight(1)
      else lines0
    if (lines.length > 8192) return None
    val segs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    lines.foreach { ln =>
      if (ln == "---")
        segs += scala.collection.mutable.ArrayBuffer.empty[String]
      else segs.last += ln
    }
    // an empty FIRST segment is the explicit-opener form; an empty
    // segment anywhere else is an empty document, which parseYaml
    // rejects below (its no-content law)
    val docSegs =
      if (segs.head.isEmpty && segs.length > 1) segs.tail else segs.toSeq
    if (docSegs.length > 64) return None
    val docs = docSegs.map { seg =>
      // newline-TERMINATED per the front-matter lesson: a trailing
      // empty line is real content inside a keep-chomped block scalar
      parseYaml(seg.map(_ + "\n").mkString
        .getBytes(StandardCharsets.UTF_8))
    }
    if (docs.exists(_.isEmpty)) None else Some(docs.map(_.get).toSeq)
  }

  // ------------------------------------------------------------------
  // front matter (the static-site / model-card convention)

  private[graft] sealed trait FmResult
  private[graft] case object NoFm extends FmResult
  private[graft] case object BadFm extends FmResult
  private[graft] final case class Fm(yaml: Array[Byte]) extends FmResult

  /** Split a leading `---` … `---` front-matter fence off a text
    * document. NoFm when the first line is not the opener (a legal
    * plain document); BadFm when the opener never closes or the text
    * is not strict UTF-8. The YAML between the fences is returned
    * verbatim for [[parseYaml]]. */
  private[graft] def frontMatter(raw: Array[Byte]): FmResult = {
    if (raw == null) return BadFm
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val text =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        return BadFm }
    val lines = text.split("\n", -1)
    if (lines.isEmpty || lines.head != "---") return NoFm
    val close = lines.indexOf("---", 1)
    if (close < 0) return BadFm
    // newline-TERMINATED, not newline-joined: a trailing empty line in
    // the fence is real content (a keep-chomped block scalar counts
    // it), so the slice must round-trip through parseYaml's
    // final-newline normalization unchanged
    Fm(lines.slice(1, close).map(_ + "\n").mkString
      .getBytes(StandardCharsets.UTF_8))
  }

  // ------------------------------------------------------------------
  // extraction (DataFrame surface)

  private val outSchema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("seq", IntegerType, true),
    StructField("path", StringType, true),
    StructField("kind", StringType, true),
    StructField("lval", LongType, true),
    StructField("sval", StringType, true),
    StructField("fx100", LongType, true),
    StructField("arr_n", IntegerType, true),
    StructField("valid", BooleanType, false)))

  private def entryRows(id: Long, es: Seq[YamlEntry]): Seq[Row] =
    es.zipWithIndex.map { case (e, i) =>
      Row(id, i, e.path, e.kind, e.lval.map(Long.box).orNull,
        e.sval.orNull, e.fx100.map(Long.box).orNull,
        e.arrN.map(Int.box).orNull, true)
    }

  /** One row per leaf (plus a container row per sequence) in
    * appearance order; invalid → one flagged row. */
  def extractYaml(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseYaml(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(es) => entryRows(id, es)
          case None =>
            Seq(Row(id, 0, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Multi-document stream extraction over [[parseYamlDocs]] — one
    * row per leaf with the document index (the multi-page TIFF
    * shape); `seq` restarts per document; any invalid document flags
    * the whole stream. */
  def extractYamlDocs(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("doc", IntegerType, false),
      StructField("seq", IntegerType, true),
      StructField("path", StringType, true),
      StructField("kind", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("fx100", LongType, true),
      StructField("arr_n", IntegerType, true),
      StructField("n_docs", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseYamlDocs(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(ds) => ds.zipWithIndex.flatMap { case (es, d) =>
            es.zipWithIndex.map { case (e, i) =>
              Row(id, d, i, e.path, e.kind, e.lval.map(Long.box).orNull,
                e.sval.orNull, e.fx100.map(Long.box).orNull,
                e.arrN.map(Int.box).orNull, ds.length, true)
            }
          }
          case None =>
            Seq(Row(id, 0, null, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Front-matter composition over a TEXT corpus (Markdown/model
    * cards): documents without the fence get one `has_fm = false`
    * row; fenced documents route their YAML through [[parseYaml]]. */
  def extractFrontMatter(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(outSchema.dropRight(1) ++ Seq(
      StructField("has_fm", BooleanType, false),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(frontMatter(r.getAs[Array[Byte]](1)))
          .getOrElse(BadFm) match {
          case NoFm =>
            Seq(Row(id, 0, null, null, null, null, null, null, false, true))
          case BadFm =>
            Seq(Row(id, 0, null, null, null, null, null, null, true, false))
          case Fm(y) =>
            scala.util.Try(parseYaml(y)).toOption.flatten match {
              case Some(es) => es.zipWithIndex.map { case (e, i) =>
                Row(id, i, e.path, e.kind, e.lval.map(Long.box).orNull,
                  e.sval.orNull, e.fx100.map(Long.box).orNull,
                  e.arrN.map(Int.box).orNull, true, true)
              }
              case None =>
                Seq(Row(id, 0, null, null, null, null, null, null, true,
                  false))
            }
        }
      })
    spark.createDataFrame(rows, schema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  /** Fixture law (replayed closed-form by the oracle): doc i opens
    * with a comment (and a `---` start marker when i%3==0), then root
    * keys title (double-quoted with a é escape), count
    * (100+i, trailing comment), active (i%2==0), score (float
    * ((i·13)%90+1).((i·7)%100) → exact ×100), note (plain scalar with
    * spaces), empty (`null` on even i, `~` on odd), born (strict date
    * 2024-(1+i%12)-(1+(i·3)%28)), ids (a flow sequence of i%4
    * integers (i·5+j)%100), a nested `meta` mapping (owner: a
    * single-quoted scalar with the '' escape; level: 1+i%5), a block
    * sequence `steps` of 1+i%3 elements — ints (i·3+j)%50 on even
    * i+j, plain strings s((i+j)%10) on odd — indented DEEPER than the
    * key on even i and at the key's OWN indent on odd i (both
    * real-world emitter styles), and a depth-3 `build.env` mapping
    * (os: linux(i%3); jobs: 2+i%4). */
  def yamlFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, yamlDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Block-scalar front-matter fixture (q238). Law (replayed
    * closed-form by the oracle): doc i is a text document whose
    * front matter (absent when i%5==4) carries name: blk(i%5), a
    * block-scalar desc — literal on even i, folded on odd — with
    * chomping i%3 (0 clip, 1 strip, 2 keep), 1+(i/2)%3 content lines
    * "line j w((i+j)%7)" at indent 2, an interior empty line after
    * the first when i%4<2 and lines>=2, (i/3)%3 trailing empty
    * lines, an explicit `2` indentation indicator when i%5==0
    * (written chomp-first when i%10==5; literal explicit docs with
    * >=2 lines carry one extra-indented second line), and
    * tail: 100+i — omitted when i%7==3, closing the block at the end
    * of the front matter instead of by dedent. */
  def blockFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, blockDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def blockDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    if (i % 5 != 4) {
      sb.append("---\n")
      sb.append("name: blk" + i % 5 + "\n")
      val lit = i % 2 == 0
      val chompCh = i % 3 match { case 1 => "-"; case 2 => "+"; case _ => "" }
      val style = if (lit) "|" else ">"
      val ex = i % 5 == 0
      val hdr =
        if (ex && i % 10 == 5) style + chompCh + "2"
        else if (ex) style + "2" + chompCh
        else style + chompCh
      sb.append("desc: " + hdr + "\n")
      val nl = 1 + (i / 2) % 3
      val inter = i % 4 < 2 && nl >= 2
      def a(j: Int) = "line" + j + " w" + (i + j) % 7
      sb.append("  " + a(0) + "\n")
      if (inter) sb.append("\n")
      if (nl >= 2) sb.append("  " + (if (ex && lit) " " else "") + a(1) + "\n")
      if (nl >= 3) sb.append("  " + a(2) + "\n")
      (0 until (i / 3) % 3).foreach(_ => sb.append("\n"))
      if (i % 7 != 3) sb.append("tail: " + (100 + i) + "\n")
      sb.append("---\n")
    }
    sb.append("# Body " + i + "\n")
    sb.append("Body text " + i % 3 + ".\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Flow-mapping fixture (q240). Law (replayed closed-form by the
    * oracle): doc i carries svc: s(i%6), a flow mapping `cfg` of
    * i%4 entries — a: 3i+1 (int), b: a QUOTED string containing a
    * live comma AND close brace ("d,}"+i%7 double-quoted on even i,
    * 's,}'+i%7 single-quoted on odd), c: float (1+i%9).(i%100) on
    * the exact x100 axis — written with no space after commas when
    * i%3==0 and padded braces when i%5==3, an empty flow mapping
    * `lims`, and port: 1000+i. */
  def flowFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, flowDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def flowDoc(i: Int): Array[Byte] = {
    val ne = i % 4
    val qv =
      if (i % 2 == 0) "\"d,}" + i % 7 + "\""
      else "'s,}" + i % 7 + "'"
    val entries = (0 until ne).map {
      case 0 => "a: " + (3 * i + 1)
      case 1 => "b: " + qv
      case _ => "c: " + (1 + i % 9) + "." + f"${i % 100}%02d"
    }
    val sep = if (i % 3 == 0) "," else ", "
    val pad = if (i % 5 == 3) " " else ""
    val sb = new StringBuilder
    sb.append("# cfg " + i + "\n")
    sb.append("svc: s" + i % 6 + "\n")
    sb.append("cfg: {" + pad + entries.mkString(sep) + pad + "}\n")
    sb.append("lims: {}\n")
    sb.append("port: " + (1000 + i) + "\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Sequence-of-mappings fixture (q242). Law (replayed closed-form
    * by the oracle): doc i carries model: m(i%5), a block sequence
    * `results` of 1+i%3 MAPPING items — item j has task: t((i+j)%4),
    * ep: (3i+7j)%100, ok: (i+j)%2==0, plus w: ((i+5j)%40+1).((11i+j)
    * %100, two digits) on odd i+j — items indented DEEPER than the
    * key on even i and at the key's OWN indent on odd i (both
    * real-world emitter styles), and done: 10+i closing the sequence
    * by dedent. */
  def seqMapFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, seqMapDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def seqMapDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# seqmap fixture " + i + "\n")
    sb.append("model: m" + i % 5 + "\n")
    sb.append("results:\n")
    val ind = if (i % 2 == 0) "  " else ""
    (0 until 1 + i % 3).foreach { j =>
      sb.append(ind + "- task: t" + (i + j) % 4 + "\n")
      sb.append(ind + "  ep: " + (3 * i + 7 * j) % 100 + "\n")
      sb.append(ind + "  ok: " + ((i + j) % 2 == 0) + "\n")
      if ((i + j) % 2 == 1)
        sb.append(ind + "  w: " + ((i + 5 * j) % 40 + 1) + "." +
          f"${(11 * i + j) % 100}%02d" + "\n")
    }
    sb.append("done: " + (10 + i) + "\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Multi-document stream fixture (q243). Law (replayed closed-form
    * by the oracle): stream i carries 1+i%3 documents separated by
    * column-0 `---` lines; the stream opens with an explicit marker
    * except when i%4==3 (the marker-less first document). Document d
    * carries app: a((i+d)%5), v: (7i+3d)%50, up: (i+d)%2==0 and
    * r: (1+(i+d)%9).((13i+d)%100, two digits). */
  def docsFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, docsDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def docsDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    (0 until 1 + i % 3).foreach { d =>
      if (d > 0 || i % 4 != 3) sb.append("---\n")
      sb.append("app: a" + (i + d) % 5 + "\n")
      sb.append("v: " + (7 * i + 3 * d) % 50 + "\n")
      sb.append("up: " + ((i + d) % 2 == 0) + "\n")
      sb.append("r: " + (1 + (i + d) % 9) + "." +
        f"${(13 * i + d) % 100}%02d" + "\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** Prompt-list fixture (q245): block scalars as DIRECT sequence
    * items — the eval/training-config shape (`prompts:` followed by
    * `- |` items). Law (replayed closed-form by the oracle): doc i
    * carries name: p(i%4), a `prompts` sequence whose first item is
    * a two-line literal block "Ask q(i%3) w(i%5)" / "more t((3i)%7)"
    * with chomping i%3 (clip/strip/keep — no trailing empties, so
    * keep assembles like clip), a second strip-chomped item
    * "Short s(i%7)" on even i, items indented DEEPER than the key on
    * even i and at the key's OWN indent on odd i, and temp:
    * (1+i%3).(i%10) on the exact x100 axis. */
  def promptsFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, promptsDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def promptsDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("name: p" + i % 4 + "\n")
    sb.append("prompts:\n")
    val ind = if (i % 2 == 0) "  " else ""
    val chomp = i % 3 match { case 1 => "-"; case 2 => "+"; case _ => "" }
    sb.append(ind + "- |" + chomp + "\n")
    sb.append(ind + "  Ask q" + i % 3 + " w" + i % 5 + "\n")
    sb.append(ind + "  more t" + (3 * i) % 7 + "\n")
    if (i % 2 == 0) {
      sb.append(ind + "- |-\n")
      sb.append(ind + "  Short s" + i % 7 + "\n")
    }
    sb.append("temp: " + (1 + i % 3) + "." + i % 10 + "\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Model-card capstone fixture (q244): a real-shaped hub card
    * composing EVERY front-matter surface this engine parses — the
    * fence, a plain-scalar license, a flow-sequence tags list, a
    * literal block-scalar description, the canonical
    * model-index → results → metrics sequence-of-mappings nest (the
    * exact structure the r17 verdict named as the reason to ship
    * seq-of-maps), and a trailing root int. Law (replayed closed-form
    * by the oracle): doc i (no front matter when i%7==6) carries
    * license lic(i%3) ∈ {apache-2.0, mit, cc-by-4.0}, tags [nlp,
    * t(i%4)], desc two literal lines "Card c(i%5)" / "line w(i%3)",
    * model-index with one entry m(i%6) whose results hold one task
    * cls(i%3) and 1+[i even] metrics (acc 0.(7i%100), plus f1
    * 0.(11i%100) on even i), and downloads: 1000+3i. */
  def modelCardFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, modelCardDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def modelCardDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    if (i % 7 != 6) {
      sb.append("---\n")
      sb.append("license: " +
        Seq("apache-2.0", "mit", "cc-by-4.0")(i % 3) + "\n")
      sb.append("tags: [nlp, t" + i % 4 + "]\n")
      sb.append("desc: |\n")
      sb.append("  Card c" + i % 5 + "\n")
      sb.append("  line w" + i % 3 + "\n")
      sb.append("model-index:\n")
      sb.append("- name: m" + i % 6 + "\n")
      sb.append("  results:\n")
      sb.append("  - task: cls" + i % 3 + "\n")
      sb.append("    metrics:\n")
      sb.append("    - type: acc\n")
      sb.append(f"      value: 0.${(7 * i) % 100}%02d\n")
      if (i % 2 == 0) {
        sb.append("    - type: f1\n")
        sb.append(f"      value: 0.${(11 * i) % 100}%02d\n")
      }
      sb.append("downloads: " + (1000 + 3 * i) + "\n")
      sb.append("---\n")
    }
    sb.append("# Model card body " + i + "\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Anchors/aliases/merge fixture (q250) — the docker-compose
    * reuse shape. Law (replayed closed-form by the oracle): doc i
    * anchors a `defaults` mapping (&def: image img(i%5), retries
    * i%4, ping (1+i%3).((7i)%100, two digits)), then `svc_a` merges
    * it (`<<: *def`) under local port 8000+i%20 — overriding retries
    * with 50+i%6 on even i, where the local key wins although the
    * merged entries emit at mapping close — and `svc_b` merges it
    * under a local image alt(i%3). `motto` anchors a quoted scalar
    * "go (i%7)" that `again` aliases, and `nums` anchors a 2-element
    * block sequence ((3i)%40, n(i%9)) that `copy` replays container
    * row included. Emission order: local entries in appearance
    * order, merged entries at mapping close in anchor order. */
  def anchorsFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, anchorsDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def anchorsDoc(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# anchors fixture " + i + "\n")
    sb.append("defaults: &def\n")
    sb.append("  image: img" + i % 5 + "\n")
    sb.append("  retries: " + i % 4 + "\n")
    sb.append("  ping: " + (1 + i % 3) + "." + f"${(7 * i) % 100}%02d\n")
    sb.append("svc_a:\n")
    sb.append("  <<: *def\n")
    sb.append("  port: " + (8000 + i % 20) + "\n")
    if (i % 2 == 0) sb.append("  retries: " + (50 + i % 6) + "\n")
    sb.append("svc_b:\n")
    sb.append("  <<: *def\n")
    sb.append("  image: alt" + i % 3 + "\n")
    sb.append("motto: &m \"go " + i % 7 + "\"\n")
    sb.append("again: *m\n")
    sb.append("nums: &ns\n")
    sb.append("  - " + (3 * i) % 40 + "\n")
    sb.append("  - n" + i % 9 + "\n")
    sb.append("copy: *ns\n")
    sb.toString.getBytes("UTF-8")
  }

  /** One fixture document (shared with the ScaleProof generator). */
  private[graft] def yamlDoc(i: Int): Array[Byte] = {
    {
      val sb = new StringBuilder
      sb.append("# graft fixture " + i + "\n")
      if (i % 3 == 0) sb.append("---\n")
      sb.append("title: \"doc \\u00E9" + i % 7 + "\"\n")
      sb.append("count: " + (100 + i) + " # cores\n")
      sb.append("active: " + (i % 2 == 0) + "\n")
      sb.append("score: " + ((i * 13) % 90 + 1) + "." +
        f"${(i * 7) % 100}%02d" + "\n")
      sb.append("note: plain text " + i % 5 + "\n")
      sb.append("empty: " + (if (i % 2 == 0) "null" else "~") + "\n")
      sb.append(f"born: 2024-${1 + i % 12}%02d-${1 + (i * 3) % 28}%02d\n")
      val ids = (0 until i % 4).map(j => (i * 5 + j) % 100)
      sb.append("ids: [" + ids.mkString(", ") + "]\n")
      sb.append("meta:\n")
      sb.append("  owner: 'it''s t" + i % 6 + "'\n")
      sb.append("  # nested comment " + i + "\n")
      sb.append("  level: " + (1 + i % 5) + "\n")
      sb.append("steps:\n")
      val stepIndent = if (i % 2 == 0) "  " else ""
      (0 until 1 + i % 3).foreach { j =>
        val v = if ((i + j) % 2 == 0) ((i * 3 + j) % 50).toString
          else "s" + (i + j) % 10
        sb.append(stepIndent + "- " + v + "\n")
      }
      sb.append("build:\n")
      sb.append("  env:\n")
      sb.append("    os: linux" + i % 3 + "\n")
      sb.append("    jobs: " + (2 + i % 4) + "\n")
      sb.toString.getBytes("UTF-8")
    }
  }
}
