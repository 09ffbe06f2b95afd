package graft.queries

/** DuckDB twin of [[graft.functions.GramHash]]: the positional modular
  * character polynomial, stated without a fold so every intermediate
  * stays inside DuckDB's overflow-checked BIGINT (each term is bounded
  * by 255·(P−1) < 2^63; the list_sum of ≤512 sub-P terms by 512·2^55
  * < 2^64 — cast through HUGEINT-tolerant list_sum, reduced mod P,
  * then cast back). Supports gram strings up to 512 chars. */
private[queries] object OracleHash {
  private val pows: String = Array.iterate(1L, 512)(p =>
    math.floorMod(p * graft.functions.GramHash.Base, graft.functions.GramHash.P))
    .mkString("[", ",", "]")

  /** SQL expression hashing the string expression `g` exactly like
    * `GramHash.hashes` hashes the corresponding text window. */
  def polySql(g: String): String = {
    val p = graft.functions.GramHash.P
    s"""CAST(list_sum(list_transform(range(1, len($g) + 1),
       |      j -> (ascii(substr($g, j, 1)) % 256) * ($pows)[len($g) - j + 1] % $p))
       |      % $p AS BIGINT)""".stripMargin
  }
}
