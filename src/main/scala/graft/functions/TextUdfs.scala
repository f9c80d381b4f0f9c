package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scala-UDF surface (SURVEY.md §2.4 UDF row). The engine's own hot
  * paths use codegen'd built-ins or native expressions — UDFs are the
  * documented LAST-resort extension point for logic the expression
  * library can't say (a JVM closure per row, opaque to Catalyst: no
  * pushdown through it, no codegen of its body). Provided so a
  * reference user's arbitrary per-record logic has a first-class home.
  */
object TextUdfs {

  /** Example: Flesch-ish readability proxy (needs branching + loops —
    * genuinely awkward as expressions). */
  val readability: UserDefinedFunction = udf { (text: String) =>
    if (text == null || text.isEmpty) 0.0
    else {
      val words = text.split("\\s+").filter(_.nonEmpty)
      val syllables = words.map(w =>
        math.max(1, w.count("aeiou".contains(_)))).sum
      val wps = words.length.toDouble
      206.835 - 1.015 * wps - 84.6 * (syllables / math.max(wps, 1.0))
    }
  }

  /** Register all UDFs for the SQL surface. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_readability", readability)

  def readabilityCol(c: Column): Column = readability(c)
}
