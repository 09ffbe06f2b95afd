package graft.queries

/** DuckDB twin of [[graft.functions.GramHash]]: the positional modular
  * character polynomial, stated as a Horner fold. Every intermediate is
  * bounded — h < P < 2^55, so h·131 + 255 < 2^63 — which DuckDB's
  * overflow-CHECKED BIGINT arithmetic can state safely.
  *
  * Horner via `list_reduce`, NOT the positional-sum form with a
  * powers-of-131 literal array: DuckDB rebuilds a literal list PER
  * LAMBDA EVALUATION, so indexing a 512-element literal inside
  * `list_transform` cost ~0.8 ms per hashed string — 700× slower than
  * the fold (measured: 212 s vs 0.3 s for 250k strings, identical
  * values). Oracles should still evaluate hashes once per DISTINCT
  * string where possible (see the minhash vocab CTEs).
  */
private[queries] object OracleHash {
  /** SQL expression hashing the string expression `g` exactly like
    * `GramHash.hashes` hashes the corresponding text window. */
  def polySql(g: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len($g) + 1),
       |        j -> CAST(ascii(substr($g, j, 1)) % 256 AS BIGINT))),
       |      (h, c) -> (h * ${graft.functions.GramHash.Base} + c)
       |        % ${graft.functions.GramHash.P})""".stripMargin
}
