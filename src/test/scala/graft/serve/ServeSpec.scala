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

  test("unknown query and garbage input answer with one error line") {
    val h = Serve.start(spark, "/root/testdata/sf0.001")
    try {
      roundTrip(h.port, """{"query":"nope"}""").head should
        include("unknown query")
      roundTrip(h.port, "not json at all").head should include("error")
    } finally h.close()
  }
}
