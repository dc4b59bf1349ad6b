package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as codegen Catalyst expressions —
  * the canonicalization step under every text dedup key and every
  * cross-source join on strings: the SAME user-visible text arrives
  * from the web in precomposed (é) and decomposed (e + U+0301) forms,
  * and a corpus that hashes them differently double-counts documents
  * and leaks near-duplicates past exact dedup.
  *
  * Three forms, all total and deterministic (JDK `java.text
  * .Normalizer` — ICU-free, ships in the JVM):
  *
  *  - `nfc`: canonical composition — the dedup-key canonical form;
  *  - `nfkc`: compatibility composition (ligatures ﬁ→fi, circled and
  *    full-width forms to ASCII) — the aggressive matching form;
  *  - `strip`: accent strip = NFD → drop non-spacing marks (category
  *    Mn) → NFC. Characters whose "accents" are not combining marks
  *    (ø, ß, æ) are NOT touched — same contract as DuckDB/utf8proc's
  *    `strip_accents`, which the q163 oracle uses as the independent
  *    reference implementation.
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires a string argument, got ${child.dataType}")
    else if (!UnicodeNorm.Forms.contains(form)) TypeCheckResult.TypeCheckFailure(
      s"unicode_norm form must be one of ${UnicodeNorm.Forms.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"unicode_norm_$form"

  protected override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("form", form, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.normalize($c, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {

  private[graft] val Forms = Set("nfc", "nfkc", "strip")

  def nfc(c: Column): Column =
    ColumnShim.column(UnicodeNorm(ColumnShim.expression(c), "nfc"))
  def nfkc(c: Column): Column =
    ColumnShim.column(UnicodeNorm(ColumnShim.expression(c), "nfkc"))
  def stripAccents(c: Column): Column =
    ColumnShim.column(UnicodeNorm(ColumnShim.expression(c), "strip"))

  def normalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(normalizeStr(s.toString, form))

  def normalizeStr(s: String, form: String): String = form match {
    case "nfc"  => Normalizer.normalize(s, Normalizer.Form.NFC)
    case "nfkc" => Normalizer.normalize(s, Normalizer.Form.NFKC)
    case _ =>
      val d = Normalizer.normalize(s, Normalizer.Form.NFD)
      val b = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          b.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      Normalizer.normalize(b.toString, Normalizer.Form.NFC)
  }
}
