package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML boilerplate stripper — stage 0 of a crawl-corpus
  * pipeline, BEFORE any L4 tokenization sees the text. One pass over
  * the raw markup, no libraries, never throws on malformed input
  * (unclosed tags/comments/CDATA degrade to documented behavior, the
  * jusText/Arc90 posture: curation filters decide, parsers don't die):
  *
  *  - `<script>`/`<style>` elements are removed WITH their content
  *    (case-insensitive; unclosed → dropped to end of input);
  *  - `<!-- comments -->` are removed, emitting nothing (unclosed →
  *    dropped to end);
  *  - `<![CDATA[ ... ]]>` keeps its content VERBATIM (entities inside
  *    are not decoded — CDATA's whole point; unclosed → verbatim to
  *    end);
  *  - every other tag is dropped; quoted attribute values may contain
  *    `>` without ending the tag (a tag with no closing `>` drops the
  *    rest of the input);
  *  - BLOCK tags ([[HtmlStrip.BlockTags]]) are PARAGRAPH boundaries;
  *    inline tags become a single space;
  *  - entities decode: the named set ([[HtmlStrip.NamedEntities]],
  *    `&nbsp;` to a plain space) plus numeric `&#ddd;` / `&#xhh;` for
  *    any valid non-surrogate scalar. Anything unknown, unterminated
  *    (no `;` within 12 chars), or out of range stays verbatim.
  *
  * Paragraphs then pass a TEXT-DENSITY filter: a paragraph survives iff
  * its whitespace-normalized token count ≥ `minTokens` AND its density
  * `1000·text / (text + markup)` ≥ `minDensityPermille`, where `text`
  * counts the characters the paragraph contributed to output (raw text,
  * decoded entities, CDATA) and `markup` counts the source characters
  * consumed by tags/comments/script/style while the paragraph was open
  * — the boilerplate-vs-content ratio boilerplate detectors cut on
  * (navigation chrome is tag-dense, body text is text-dense).
  *
  * Output struct: (text_clean = kept paragraphs, whitespace-normalized,
  * joined by '\n'; n_paras = non-empty paragraphs seen; n_kept).
  * Null input → null struct. CodegenFallback like [[GopherStats]]: the
  * kernel is one opaque per-row call either way, and the surrounding
  * projection stays codegen'd.
  */
case class HtmlStrip(child: Expression, minTokens: Int, minDensityPermille: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_strip expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_paras", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "html_strip"

  override protected def nullSafeEval(input: Any): Any = {
    val (clean, nParas, nKept) = HtmlStrip.strip(
      input.asInstanceOf[UTF8String].toString, minTokens, minDensityPermille)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(clean), nParas, nKept))
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}

object HtmlStrip {

  /** Tags that end a paragraph (either form, opening or closing). */
  val BlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "ul", "ol", "table", "blockquote")

  /** Named entities decoded in text context (`&nbsp;` to a PLAIN space
    * so downstream whitespace normalization treats it uniformly —
    * U+00A0 is not Java whitespace).
    */
  val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Longest entity body considered (`&#x10FFFF;` is 9 incl. `#`). */
  private val MaxEntityBody = 12

  def strip(html: String, minTokens: Int, minDensityPermille: Int)
      : (String, Int, Int) = {
    val n = html.length
    val kept = new java.lang.StringBuilder
    val para = new java.lang.StringBuilder
    var textChars = 0L
    var markupChars = 0L
    var nParas = 0
    var nKept = 0

    def flushPara(): Unit = {
      // whitespace-normalize: token list, single-space joined
      var tokens = 0
      val norm = new java.lang.StringBuilder
      var j = 0
      val m = para.length
      while (j < m) {
        while (j < m && Character.isWhitespace(para.charAt(j))) j += 1
        val start = j
        while (j < m && !Character.isWhitespace(para.charAt(j))) j += 1
        if (j > start) {
          if (tokens > 0) norm.append(' ')
          norm.append(para, start, j)
          tokens += 1
        }
      }
      if (tokens > 0) {
        nParas += 1
        val denom = textChars + markupChars
        val density = if (denom == 0) 1000L else textChars * 1000L / denom
        if (tokens >= minTokens && density >= minDensityPermille) {
          if (nKept > 0) kept.append('\n')
          kept.append(norm)
          nKept += 1
        }
      }
      para.setLength(0); textChars = 0L; markupChars = 0L
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          val stop = if (end < 0) n else end + 3
          markupChars += stop - i
          i = stop
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          para.append(html, i + 9, stop)
          textChars += stop - (i + 9)
          markupChars += 9 + (if (end < 0) 0 else 3)
          i = if (end < 0) n else end + 3
        } else if (i + 1 >= n ||
            (!Character.isLetter(html.charAt(i + 1)) &&
             html.charAt(i + 1) != '/' && html.charAt(i + 1) != '!')) {
          // a lone '<' not opening anything tag-shaped is TEXT ("1 < 2")
          para.append('<'); textChars += 1; i += 1
        } else {
          // tag: optional '/' or '!' (DOCTYPE), name, attributes
          // (quote-aware) to '>'
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          if (j < n && html.charAt(j) == '!') j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          var quote: Char = 0
          var end = -1
          var k = j
          while (end < 0 && k < n) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          if (end < 0) { markupChars += n - i; i = n } // unclosed: drop rest
          else {
            markupChars += end + 1 - i
            i = end + 1
            if (!closing && (name == "script" || name == "style")) {
              // consume content + closing tag, case-insensitively
              val lower = "</" + name
              var m2 = i
              var found = -1
              while (found < 0 && m2 + lower.length <= n) {
                if (html.regionMatches(true, m2, lower, 0, lower.length)) found = m2
                else m2 += 1
              }
              if (found < 0) { markupChars += n - i; i = n }
              else {
                val gt = html.indexOf('>', found)
                val stop = if (gt < 0) n else gt + 1
                markupChars += stop - i
                i = stop
              }
            }
            if (name.nonEmpty && BlockTags.contains(name)) flushPara()
            else para.append(' ') // inline/unknown tag: word separator
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i - 1 > MaxEntityBody) null
          else {
            val body = html.substring(i + 1, semi)
            if (body.startsWith("#")) {
              val (digits, radix) =
                if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                  (body.substring(2), 16) else (body.substring(1), 10)
              try {
                val v = java.lang.Integer.parseInt(digits, radix)
                if (v > 0 && v <= 0x10FFFF && !(v >= 0xD800 && v <= 0xDFFF))
                  new String(Character.toChars(v))
                else null
              } catch { case _: NumberFormatException => null }
            } else NamedEntities.getOrElse(body, null)
          }
        if (decoded == null) { para.append('&'); textChars += 1; i += 1 }
        else {
          para.append(decoded)
          textChars += decoded.length
          markupChars += (semi + 1 - i) - decoded.length
          i = semi + 1
        }
      } else {
        para.append(c)
        textChars += 1
        i += 1
      }
    }
    flushPara()
    (kept.toString, nParas, nKept)
  }

  /** Column builder (mirrors the Det/ColumnBridge pattern so the
    * expression works under any SparkSession, extensions or not).
    */
  def colOf(c: Column, minTokens: Int = 2, minDensityPermille: Int = 0): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      HtmlStrip(ColumnBridge.expression(c), minTokens, minDensityPermille))
  }
}
