package graft.llm

import graft.SparkSpec

/** Markup stripping: tag/comment/block removal, entity unescape order,
  * accounting columns, and clean-text passthrough. */
class CleanupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(texts: (Long, String)*): Map[Long, (String, Long, Long)] =
    Cleanup.stripMarkup(texts.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, n, c) => id -> (t, n, c) }.toMap

  test("tags are removed and act as word separators") {
    val out = strip(1L -> "<html><body><p>hello</p><p>world</p></body></html>")
    out(1L)._1 shouldBe "hello world"
  }

  test("comment, script and style bodies are dropped, not leaked as text") {
    val out = strip(
      1L -> """pre<!-- hidden nav -->post""",
      2L -> """a<script type="x">var secret = 1;</script>b""",
      3L -> """a<style>p{color:red}</style>b""")
    out(1L)._1 shouldBe "pre post"
    out(2L)._1 shouldBe "a b"
    out(3L)._1 shouldBe "a b"
  }

  test("multi-line script/style/comment bodies are dropped (DOTALL)") {
    val out = strip(
      1L -> "a<script>\nvar secret = 1;\nvar more = 2;\n</script>b",
      2L -> "a<style>\np { color: red }\n</style>b",
      3L -> "a<!-- line one\nline two -->b")
    out(1L)._1 shouldBe "a b"
    out(2L)._1 shouldBe "a b"
    out(3L)._1 shouldBe "a b"
  }

  test("entities unescape once, ampersand last") {
    val out = strip(
      1L -> "x &lt;tag&gt; &quot;q&#39;s&quot; a&nbsp;b &amp; done",
      // double-escaped: one unescape level, never two — &amp;lt; is the
      // TEXT '&lt;', not a '<'
      2L -> "&amp;lt;not-a-tag&amp;gt;")
    out(1L)._1 shouldBe "x <tag> \"q's\" a b & done"
    out(2L)._1 shouldBe "&lt;not-a-tag&gt;"
  }

  test("accounting: n_tags counts every <...> group, chars_removed reconciles") {
    val raw = "<html><!-- c --><p>two words</p><br/></html>"
    val out = strip(1L -> raw)
    val (clean, nTags, charsRemoved) = out(1L)
    clean shouldBe "two words"
    nTags shouldBe 6L // html, comment, p, /p, br/, /html
    charsRemoved shouldBe (raw.length - clean.length).toLong
  }

  test("markup-free text passes through unchanged with zero accounting") {
    val out = strip(1L -> "plain prose stays as is")
    out(1L) shouldBe (("plain prose stays as is", 0L, 0L))
  }

  // ----- domainBoilerplate -------------------------------------------
  // Hand-computed literals, NOT a mirror of the operator's arithmetic
  // (auto-memory: mirrored oracles are blind to both-sides bugs).
  // Domain a (5 docs): FOOTER df=4 → 80% chrome; TIE df=2 → exactly
  // 2·100 == 5·40 (ties strip). Domain b (4 docs): FOOTER df=1 (rare
  // copy of a's chrome — domain scoping), REP appears TWICE in doc 6
  // but df=1 (distinct docs; occurrence-counting would hit 2/4=50% and
  // wrongly strip). Domain c: one doc — minDf floors it.
  private val boilerDocs = Seq(
    (1L, "a", "ua1\n\nFOOTER\n\nTIE"),
    (2L, "a", "ua2\n\nTIE\n\nFOOTER"),
    (3L, "a", "ua3\n\nFOOTER"),
    (4L, "a", "ua4"),
    (10L, "a", "FOOTER"),
    (5L, "b", "ub5\n\nFOOTER"),
    (6L, "b", "REP\n\nub6\n\nREP"),
    (7L, "b", "ub7"),
    (8L, "b", "ub8"),
    (9L, "c", "LONE"))

  private def boiler(): Map[Long, (String, String, Long)] =
    Cleanup.domainBoilerplate(boilerDocs.toDF("doc_id", "domain", "text"),
        ratioPct = 40)
      .as[(Long, String, String, Long)].collect()
      .map { case (id, d, t, n) => id -> (d, t, n) }.toMap

  test("domainBoilerplate strips chrome per domain; rare and cross-domain copies survive") {
    val out = boiler()
    out(1L) shouldBe (("a", "ua1", 1L))
    out(2L) shouldBe (("a", "ua2", 1L))
    out(3L) shouldBe (("a", "ua3", 1L))
    out(4L) shouldBe (("a", "ua4", 1L))
    // b's lone FOOTER copy is NOT chrome there, even though it is in a
    out(5L) shouldBe (("b", "ub5\n\nFOOTER", 2L))
    out(7L) shouldBe (("b", "ub7", 1L))
    out(8L) shouldBe (("b", "ub8", 1L))
  }

  test("domainBoilerplate ties strip: df·100 == nd·ratioPct is chrome") {
    // TIE is in 2 of a's 5 docs = exactly 40% — a '>' where '≥' belongs
    // would keep it in docs 1 and 2
    val out = boiler()
    out(1L)._2 should not include "TIE"
    out(2L)._2 should not include "TIE"
  }

  test("domainBoilerplate counts distinct docs, not occurrences") {
    // REP twice within doc 6 is df=1: kept (and kept twice, in order)
    boiler()(6L) shouldBe (("b", "REP\n\nub6\n\nREP", 3L))
  }

  test("domainBoilerplate minDf floors single-doc domains") {
    // c has one doc: every paragraph is 100% of the domain, but df=1 < 2
    boiler()(9L) shouldBe (("c", "LONE", 1L))
  }

  test("domainBoilerplate fully-chrome document survives empty with n_kept 0") {
    boiler()(10L) shouldBe (("a", "", 0L))
  }
}
