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
}
