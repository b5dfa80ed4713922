package graft.serve

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** The serving surface (SURVEY §2.1 S9 engine analog): a query from the
  * declared registry driven end to end over the TCP line protocol —
  * request in, header + rows + trailer out — plus the error and
  * limit-clamp contracts. */
class ServeSpec extends SparkSpec {

  private def roundTrip(port: Int, request: String): Seq[String] = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      out.write(request); out.write("\n"); out.flush()
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
    } finally sock.close()
  }

  test("serves a declared query end to end over the socket") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      val lines = roundTrip(h.port, """{"query":"src_inline"}""")
      lines.head shouldBe """{"columns":["id","name"]}"""
      lines.last shouldBe """{"done":3}"""
      val rows = lines.slice(1, lines.length - 1)
      rows should have length 3
      rows.head shouldBe """{"id":1,"name":"alpha"}"""
    } finally h.close()
  }

  test("limit clamps the collected page; the query still answers") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      val lines = roundTrip(h.port, """{"query":"src_range","limit":7}""")
      lines.head shouldBe """{"columns":["id"]}"""
      lines.last shouldBe """{"done":7}"""
      // an absurd limit clamps to MaxRows instead of collecting a corpus
      val big = roundTrip(h.port,
        s"""{"query":"src_range","limit":${Int.MaxValue}}""")
      big.last shouldBe """{"done":100}""" // src_range is 100 rows total
    } finally h.close()
  }

  test("list discovers the full declared registry") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      val line = roundTrip(h.port, """{"list":true}""").head
      graft.SparkEntry.queries.keys.foreach(q =>
        line should include(s""""$q""""))
    } finally h.close()
  }

  test("offset pages tile the full result past the clamp, in declared order") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      // src_range is 100 rows with a declared ORDER BY id — four
      // offset/limit windows must reassemble it exactly, no overlap, no
      // gap (the read-past-the-clamp contract, scaled down)
      val pages = Seq(0, 30, 60, 90).map { off =>
        val lines = roundTrip(h.port,
          s"""{"query":"src_range","limit":30,"offset":$off}""")
        lines.slice(1, lines.length - 1)
      }
      pages.map(_.length) shouldBe Seq(30, 30, 30, 10)
      val whole = roundTrip(h.port, """{"query":"src_range","limit":100}""")
      pages.flatten shouldBe whole.slice(1, whole.length - 1)
      // an offset past the end is an empty page, not an error
      val past = roundTrip(h.port,
        """{"query":"src_range","limit":30,"offset":5000}""")
      past.last shouldBe """{"done":0}"""
    } finally h.close()
  }

  test("two clients in flight concurrently each get a complete response") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      // open A, send its request, and only AFTER a full round trip on a
      // second connection read A's response: one worker per connection
      // means B completes while A's response is still unread
      val a = new Socket("127.0.0.1", h.port)
      try {
        val aOut = new BufferedWriter(
          new OutputStreamWriter(a.getOutputStream, StandardCharsets.UTF_8))
        aOut.write("""{"query":"src_inline"}"""); aOut.write("\n"); aOut.flush()
        val b = roundTrip(h.port, """{"query":"src_range","limit":5}""")
        b.last shouldBe """{"done":5}"""
        val aIn = new BufferedReader(
          new InputStreamReader(a.getInputStream, StandardCharsets.UTF_8))
        val aLines = Iterator.continually(aIn.readLine()).takeWhile(_ != null).toSeq
        aLines.head shouldBe """{"columns":["id","name"]}"""
        aLines.last shouldBe """{"done":3}"""
      } finally a.close()
    } finally h.close()
  }

  test("unknown query and garbage input answer with one error line") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      roundTrip(h.port, """{"query":"nope"}""").head should
        include("unknown query")
      roundTrip(h.port, "not json at all").head should include("error")
    } finally h.close()
  }

  // a ~10 MB page — far past any socket buffer pair, so the server's
  // write phase genuinely blocks on a non-consuming client
  private val bigPage: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "big" -> ((s, _) => s.range(10000).select(
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.lpad(
        org.apache.spark.sql.functions.col("id").cast("string"), 1000, "x")
        .as("pad")).orderBy("id")))

  test("watchdog: a slow-but-reading client outlasting the deadline still gets the page") {
    // the r12 ADVICE case: the deadline bounds time WITHOUT progress,
    // not the whole response — this client drains the 10k-row page over
    // ~4 x the 700 ms deadline, sleeping between bursts, and must see
    // the done trailer because every drained chunk re-arms the timer
    val h = Serve.start(spark, "/root/testdata/sf0.001",
      registry = bigPage, writeDeadlineMs = 700L)
    try {
      val sock = new Socket("127.0.0.1", h.port)
      try {
        sock.setReceiveBufferSize(32 * 1024)
        val out = new BufferedWriter(
          new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        out.write("""{"query":"big","limit":10000}"""); out.write("\n"); out.flush()
        val t0 = System.nanoTime()
        var n = 0
        var last: String = null
        var line = in.readLine()
        while (line != null) {
          last = line; n += 1
          if (n % 500 == 0) Thread.sleep(150) // slow consumer, steady progress
          line = in.readLine()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        withClue(s"read $n lines in $secs s, last=$last") {
          secs should be > 1.4 // genuinely outlasted the 0.7 s deadline
          last shouldBe """{"done":10000}"""
        }
      } finally sock.close()
    } finally h.close()
  }

  test("watchdog: a stalled client is reset within one deadline of its last progress") {
    val h = Serve.start(spark, "/root/testdata/sf0.001",
      registry = bigPage, writeDeadlineMs = 300L)
    try {
      val sock = new Socket("127.0.0.1", h.port)
      try {
        sock.setReceiveBufferSize(32 * 1024)
        val out = new BufferedWriter(
          new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        out.write("""{"query":"big","limit":10000}"""); out.write("\n"); out.flush()
        Thread.sleep(2000) // read NOTHING — the server must cut us loose
        // drain whatever was buffered: the stream must END (EOF or reset)
        // before the done trailer ever arrives
        val sawDone =
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .exists(_.contains("\"done\""))
          catch { case _: java.io.IOException => false } // reset mid-drain
        sawDone shouldBe false
      } finally sock.close()
    } finally h.close()
  }
}
