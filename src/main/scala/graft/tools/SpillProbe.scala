package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.queries.Graph

/** Per-stage disk profile for the triangle family — which stage's
  * spill/shuffle actually owns the bytes (the r8 sf5/sf10 single-box
  * disk deaths made "probably the pair distinct" not good enough).
  * Runs g02's trianglesDf at a given dir with a listener recording
  * per-stage spill + shuffle-write bytes and prints the top stages
  * with their callsites.
  *
  * Usage: sbt "runMain graft.tools.SpillProbe <sfDir>"
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.sfscale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class StageRow(id: Int, name: String, spill: Long, shuffleW: Long,
      inRec: Long, outRec: Long)
    val rows = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        rows += StageRow(si.stageId, si.name.take(60),
          m.diskBytesSpilled, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
          m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten)
      }
    })

    val li = Tables.t(spark, sfDir, "lineitem")
    val t0 = System.nanoTime()
    Graph.trianglesDf(li).foreach(_ => ())
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the last stage-completed events land
    val gb = 1024.0 * 1024 * 1024
    println(f"== g02 at $sfDir: $dt%.1f s; stages by (spill + shuffle write):")
    rows.sortBy(r => -(r.spill + r.shuffleW)).take(12).foreach { r =>
      println(f"stage ${r.id}%4d spill=${r.spill / gb}%7.2f GB " +
        f"shufW=${r.shuffleW / gb}%7.2f GB in=${r.inRec}%12d out=${r.outRec}%12d  ${r.name}")
    }
    println(f"TOTAL spill=${rows.map(_.spill).sum / gb}%.2f GB " +
      f"shufW=${rows.map(_.shuffleW).sum / gb}%.2f GB")
    spark.stop()
  }
}
