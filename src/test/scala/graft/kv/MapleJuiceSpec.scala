package graft.kv

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MapleJuiceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: String =
    getClass.getResource("/wordcount_input.txt").getPath

  /** Independent oracle: single-threaded Scala wordcount with the
    * reference tokenizer (word_count_map.cpp:20). */
  private lazy val goldenCounts: Map[String, Long] = {
    val raw = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture)),
      java.nio.charset.StandardCharsets.UTF_8)
    raw.split("[^A-Za-z0-9-]+").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
  }

  test("wordCount matches independent golden on the reference sample (CRLF)") {
    val got = MapleJuice.wordCount(spark.read.textFile(fixture))
      .as[(String, Long)].collect()
    assert(got.length === goldenCounts.size)
    got.foreach { case (w, c) => assert(goldenCounts(w) === c, s"word $w") }
    // output is lexicographically key-sorted (C5 semantics)
    assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
    // CRLF must delimit: no token may contain \r
    assert(!got.exists(_._1.contains("\r")))
  }

  test("maple + juice wordcount equals the DataFrame fast path") {
    val lines = spark.read.textFile(fixture)
    val kv = MapleJuice.maple(lines, 8)(
      _.split("[^A-Za-z0-9-]+").iterator.filter(_.nonEmpty).map(w => (w, "1")))
    val out = MapleJuice.juice(kv, 4)((k, vs) =>
        Iterator.single((k, vs.map(_.toLong).sum.toString)))
      .collect()
    assert(out.length === goldenCounts.size)
    out.foreach { case (w, c) => assert(goldenCounts(w) === c.toLong) }
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("numTasks clamping matches reference semantics (MapleJuice.cpp:227-235)") {
    assert(MapleJuice.clampTasks(spark, 0) === 1)
    assert(MapleJuice.clampTasks(spark, -5) === 1)
    val p = spark.sparkContext.defaultParallelism
    assert(MapleJuice.clampTasks(spark, 1000000) === p)
    assert(MapleJuice.clampTasks(spark, 2) === math.min(2, p))
  }

  test("reverseGraph groups reversed edges, token-stream parsed") {
    // pairs span lines: (a b) (c b) (a d) (c d) — from the token stream
    val lines = Seq("a b c", "b a d c", "d").toDS()
    val got = MapleJuice.reverseGraph(lines)
      .as[(String, String)].collect().toMap
    assert(got === Map("b" -> "a c", "d" -> "a c"))
    val hadoop = MapleJuice.reverseGraphHadoopStyle(lines)
      .as[(String, String)].collect().toMap
    assert(hadoop("b") === "(a c)")
  }

  test("KV line format: key then values, trailing space (MapleJuice.cpp:272-279)") {
    val kv = Seq(("k1", "a"), ("k1", "b"), ("k2", "z")).toDS()
    val lines = MapleJuice.toKvLines(kv).as[String].collect().sorted
    assert(lines.forall(_.endsWith(" ")))
    assert(lines.exists(l => l == "k1 a b " || l == "k1 b a "))
    assert(lines.contains("k2 z "))
  }

  test("logQuery counts per node plus TOTAL (logger.cpp:223)") {
    val dir = java.nio.file.Files.createTempDirectory("greplogs").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "node1.log").toPath, "err x\nok\nerr y\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "node2.log").toPath, "ok\nerr z\n")
    val got = MapleJuice.logQuery(spark, dir.getAbsolutePath + "/*.log", "^err")
      .as[(String, Long)].collect().toMap
    assert(got("TOTAL") === 3)
    assert(got.filter(_._1.contains("node1")).values.sum === 2)
    assert(got.filter(_._1.contains("node2")).values.sum === 1)
  }

  test("maplePipe runs an external exe as the mapper (C1 exe contract)") {
    val lines = Seq("x 1", "y 2", "x 3").toDS()
    // awk as the 'user executable': emits key value pairs on stdout
    val kv = MapleJuice.maplePipe(lines, 2, Seq("awk", "{print $1, $2}"))
    val out = MapleJuice.juice(kv, 2)((k, vs) =>
      Iterator.single((k, vs.map(_.toLong).sum.toString))).collect().toMap
    assert(out === Map("x" -> "4", "y" -> "2"))
  }

  test("perKeyFanout writes one partition dir per key (S4)") {
    val kv = Seq(("k1", "a"), ("k2", "b")).toDS()
    val out = java.nio.file.Files.createTempDirectory("fanout").toString
    MapleJuice.perKeyFanout(kv, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("key="))
    assert(dirs.toSet === Set("key=k1", "key=k2"))
  }

  test("juicePipe runs an external exe as the reducer (C3 exe contract)") {
    // full exe-pair job: awk mapper emits (word, 1); awk reducer reads
    // the grouped `key v1 v2 … ` line and sums — the reference's
    // word_count_map + word_count_reduce pair, executor-local.
    val lines = spark.read.textFile(fixture)
    val kv = MapleJuice.maplePipe(lines, 4,
      Seq("awk", """{ n = split($0, w, /[^A-Za-z0-9-]+/)
                     for (i = 1; i <= n; i++) if (w[i] != "") print w[i], 1 }"""))
    val out = MapleJuice.juicePipe(kv, 4,
        Seq("awk", "{ s = 0; for (i = 2; i <= NF; i++) s += $i; print $1, s }"))
      .collect()
    assert(out.length === goldenCounts.size)
    out.foreach { case (w, c) => assert(goldenCounts(w) === c.toLong, s"word $w") }
    // final merge is key-sorted (C5), matching the reference juice master
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("perKeyFanoutText writes <prefix>_<key>.txt grouped lines (MapleJuice.cpp:285-298)") {
    val kv = Seq(("k1", "a"), ("k1", "b"), ("k2", "z")).toDS()
    val out = java.nio.file.Files.createTempDirectory("fanouttext").toString
    MapleJuice.perKeyFanoutText(kv, out, "wc")
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // ignore Hadoop local-FS .crc siblings
    assert(files === Set("wc_k1.txt", "wc_k2.txt"))
    val k1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "wc_k1.txt")).stripLineEnd
    assert(k1 == "k1 a b " || k1 == "k1 b a ")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "wc_k2.txt")).stripLineEnd === "k2 z ")
  }
}
