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

  /** Per-domain boilerplate removal — the host-scoped companion to
    * [[Dedup.paragraphDedup]] (C4's line-frequency filter / RefinedWeb's
    * host-level cleanup pass): a paragraph that appears in at least
    * `ratioPct`% of a DOMAIN's documents (and in ≥ `minDf` of them) is
    * navigation/footer chrome for that host and is stripped from EVERY
    * document of the domain. Scoping by domain is the point — a cooking
    * site's "subscribe" banner must not be deleted from the one news
    * article that quotes it, and a paragraph common on host A but rare
    * on host B is stripped only on A. Where [[Dedup.paragraphDedup]]
    * keeps a duplicated paragraph's first global occurrence, this keeps
    * NO occurrence of chrome (a footer's "first" copy is still chrome).
    *
    * The threshold is integer cross-multiplied (`df·100 ≥ nd·ratioPct`,
    * ties strip — exact at any count, the [[TextStats.domainGate]]
    * discipline); `minDf` floors tiny domains so a 1-document host never
    * strips its entire body. Document frequency counts DISTINCT docs, so
    * a paragraph repeated inside one page is not inflated toward chrome.
    *
    * Returns (id, domain, text, n_kept) for every input document,
    * reassembled in paragraph order ([[Dedup.paragraphDedup]] contract;
    * `idCol` must be unique per row).
    *
    * Scale shape (100 TB): paragraph stats travel as fixed-width
    * (domain, 32-byte sha2, id) rows — the document body never rides the
    * counting path. Doc frequency is one partial-aggregated groupBy;
    * per-domain doc counts are domain-cardinality-sized and the
    * stats⋈counts join is broadcast-sized. The chrome set (a few
    * paragraphs per domain) anti-joins the paragraph stream on
    * (domain, hash) — AQE broadcasts it when it fits, so the only
    * unavoidable wide text exchange is the per-doc reassembly groupBy
    * the output contract requires. */
  def domainBoilerplate(docs: DataFrame, ratioPct: Int = 50, minDf: Int = 2,
                        sep: String = "\n\n", idCol: String = "doc_id",
                        domainCol: String = "domain",
                        textCol: String = "text"): DataFrame = {
    require(ratioPct > 0 && ratioPct <= 100, "ratioPct must be in 1..100")
    require(minDf >= 1, "minDf must be at least 1")
    val paras = docs
      .select(col(idCol), col(domainCol),
        posexplode(split(col(textCol), sep)).as(Seq("idx0", "para")))
      .select(col(idCol), col(domainCol), (col("idx0") + 1).as("idx"),
        col("para"), sha2(col("para"), 256).as("__ph"))
    val docFreq = paras
      .groupBy(col(domainCol), col("__ph"))
      .agg(count_distinct(col(idCol)).as("__df"))
    val domDocs = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("__nd"))
    val chrome = docFreq.join(domDocs, Seq(domainCol))
      .where(col("__df") >= minDf &&
        col("__df") * 100 >= col("__nd") * ratioPct)
      .select(col(domainCol), col("__ph"))
    val surv = paras.join(chrome, Seq(domainCol, "__ph"), "left_anti")
    val rebuilt = surv.groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("idx"), col("para")))),
          s => s.getField("para")), sep).as(textCol),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol), col(domainCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col(domainCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
