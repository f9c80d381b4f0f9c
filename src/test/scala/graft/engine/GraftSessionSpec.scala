package graft.engine

import graft.SparkSpec

class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gs = new GraftSession(spark,
    java.nio.file.Files.createTempDirectory("graft-wh").toString)

  test("put/get/store round-trip (temp-view dataset)") {
    gs.put("ds_a", Seq((1, "x"), (2, "y")).toDF("id", "s"))
    assert(gs.get("ds_a").count() === 2)
    assert(gs.store().contains("ds_a"))
  }

  test("persisted put backs the view with parquet files; ls lists them") {
    gs.put("ds_b", Seq((1, "x")).toDF("id", "s"), persist = true)
    assert(gs.get("ds_b").count() === 1)
    assert(gs.ls("ds_b").exists(_.contains("parquet")))
  }

  test("delete drops both view and files (delete-then-put overwrite)") {
    gs.put("ds_c", Seq((1, "x")).toDF("id", "s"), persist = true)
    gs.delete("ds_c")
    assert(gs.ls("ds_c").isEmpty)
    assert(!gs.store().contains("ds_c"))
    // re-put after delete works (SDFS.cpp:135 delete-before-put)
    gs.put("ds_c", Seq((2, "z")).toDF("id", "s"), persist = true)
    assert(gs.get("ds_c").count() === 1)
  }

  test("putText registers a line dataset") {
    val f = java.nio.file.Files.createTempFile("lines", ".txt")
    java.nio.file.Files.writeString(f, "l1\nl2\n")
    gs.putText("ds_t", f.toString)
    assert(gs.get("ds_t").count() === 2)
  }
}
