package graft.kv

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Combiner fidelity (SURVEY.md §2.2 C6): the reference wordcount
  * mapper pre-aggregates counts inside each split
  * (`word_count_map.cpp:13-38`; Hadoop twin `setCombinerClass`,
  * `WordCount.java:98`). In Spark that contract is a typed
  * [[Aggregator]]: `reduce` is the in-split combine, `merge` the
  * post-shuffle combine — partial aggregation is guaranteed by the
  * aggregate planner, not by hand-rolled mapper state.
  */
object Combiners {

  /** Count-per-key with map-side combine. */
  val countCombiner: Aggregator[(String, String), Long, Long] =
    new Aggregator[(String, String), Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: (String, String)): Long = b + 1
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Sum-of-long-values per key (the wordcount juice,
    * `word_count_reduce.cpp:19-27`) with map-side combine. */
  val sumCombiner: Aggregator[(String, String), Long, Long] =
    new Aggregator[(String, String), Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: (String, String)): Long = b + a._2.toLong
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Wordcount via the typed KV algebra + combiner — semantically equal
    * to [[MapleJuice.wordCount]], shaped exactly as maple → combine →
    * shuffle → merge. */
  def wordCountCombined(lines: Dataset[String]): Dataset[(String, Long)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .flatMap(_.split("[^A-Za-z0-9-]+").iterator.filter(_.nonEmpty)
        .map(w => (w, "1")))
      .groupByKey(_._1)
      .agg(countCombiner.toColumn.name("cnt"))
      .orderBy("key")
  }
}
