package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup/boilerplate removal — the extraction pass a web-crawl corpus
  * runs between the raw HTML scan and every text operator (trembita has
  * no analog; training-data pipeline mandate). Pure `regexp_replace`
  * chains in the Java∩RE2 dialect (char classes, non-greedy `.*?`,
  * literal entity strings), so a DuckDB oracle replays the whole pass
  * byte-for-byte — the operator is oracle-gated, not spec-only.
  *
  * One narrow codegen'd projection per document: no explode, no shuffle,
  * no UDF. At 100 TB this runs inside whole-stage codegen over the scan
  * and the filter/projection above it still pushes into parquet.
  */
object Cleanup {

  /** (pattern, replacement) chain applied in order by [[stripMarkup]].
    *
    * Order is load-bearing twice: (1) comment and script/style BLOCKS go
    * before the generic tag rule, else `<script>` loses its closing
    * context and the payload survives as text; (2) `&amp;` is unescaped
    * LAST, so a double-escaped `&amp;lt;` correctly yields the literal
    * text `&lt;` (one unescape level), never `<`.
    *
    * Tags are replaced by a SPACE, not the empty string — block tags
    * separate words (`…end.<p>Next…`), and the final whitespace collapse
    * folds any doubled separators back to one. Patterns stay lowercase-
    * tag only (the normalize-before-extract order every pipeline uses).
    * The three block rules run with `(?s)` (supported by Java and RE2
    * alike, so oracle parity holds): real crawl HTML has multi-line
    * script/style/comment bodies, and without DOTALL their payload leaks
    * into `clean_text`.
    */
  val markupRules: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> " ",
    "(?s)<script[^>]*>.*?</script>" -> " ",
    "(?s)<style[^>]*>.*?</style>" -> " ",
    "<[^>]*>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** The markup-stripped body of `textCol`: rules applied in order, then
    * whitespace runs collapsed ([[TextStats.WsRun]] — the explicit
    * Java∩RE2 class) and trimmed. */
  def cleanText(textCol: Column): Column =
    trim(regexp_replace(
      markupRules.foldLeft(textCol) { case (c, (p, r)) => regexp_replace(c, p, r) },
      TextStats.WsRun, " "))

  /** Strip markup from a document table: emits `clean_text`, the count of
    * markup elements removed (`n_tags` — every `<…>` group, comments
    * included, counted on the raw input) and `chars_removed` for pipeline
    * accounting. */
  def stripMarkup(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), col(textCol), cleanText(col(textCol)).as("clean_text"))
      .select(col(idCol), col("clean_text"),
        size(regexp_extract_all(col(textCol), lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"),
        (length(col(textCol)) - length(col("clean_text"))).cast("long")
          .as("chars_removed"))
}
