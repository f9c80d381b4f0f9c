package graft.queries

/** Shared DuckDB-SQL spellings used by multiple oracle twins — ONE
  * definition so a fix to the spelling can never desync a copy (the
  * same rule the Spark side applies to shared scoring/shard logic). */
private[queries] object OracleDsl {

  /** Horner-chain hex→BIGINT over the first `n` chars of `hexExpr` —
    * the SQL spelling of Spark's `conv(substring(hex, 1, n), 16, 10)`
    * for lowercase hex. NOTE: `hexExpr` is re-evaluated once per
    * char; bind expensive expressions (md5 of a long payload) to a
    * column in a subquery first. */
  def hornerHex(hexExpr: String, n: Int): String =
    (1 to n).map(i =>
      s"(strpos('0123456789abcdef', substring($hexExpr, $i, 1)) - 1)")
      .reduce((acc, d) => s"($acc * 16 + $d)")
}
