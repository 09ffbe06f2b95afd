package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword tokenization — the reference's IK-analyzer UDTF (SURVEY.md
  * §2.8 U1; ref app/func/SplitFunction.java:12-28 +
  * utils/KeywordUtil.java:13-34) re-expressed without the third-party
  * dependency: latin tokens split on non-alphanumerics, CJK runs emitted
  * as overlapping bigrams (the classic IK-lite fallback). Pure Scala so
  * it is usable as a UDF inside codegen'd plans; `explode(tokenize(c))`
  * replaces `LATERAL TABLE(SplitFunction(...))`. */
object Tokenize {

  private def isHan(ch: Char): Boolean =
    Character.UnicodeScript.of(ch) == Character.UnicodeScript.HAN

  def split(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      if (Character.isLetterOrDigit(ch)) {
        val han = isHan(ch)
        var j = i + 1
        while (j < n && Character.isLetterOrDigit(text.charAt(j)) &&
          isHan(text.charAt(j)) == han) j += 1
        val run = text.substring(i, j)
        if (han) {
          if (run.length == 1) out += run
          else run.sliding(2).foreach(out += _)
        } else out += run.toLowerCase
        i = j
      } else i += 1
    }
    out.result()
  }

  val tokenizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => split(s))

  def tokenize(c: Column): Column = tokenizeUdf(c)
}
