package graft

/** Tiny shared JSON rendering helpers for the artifact writers
  * (Bench, ClusterGate, Soak). Hand-rolled on purpose — the artifacts
  * are single-line JSON with a fixed shape and zero dependencies — but
  * hand-rolled ONCE: the escaping rules live here so a fix cannot be
  * applied to one writer and missed in another (code-review r12). */
object Json {

  /** JSON string literal with full escaping of quote, backslash and
    * control characters. */
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Fixed-point number rendering, LOCALE-INDEPENDENT: the default
    * f"%.2f" interpolator uses the JVM default locale, which renders
    * "12,34" on comma-decimal locales and corrupts the artifact.
    * Non-finite values render as `null` — "NaN"/"Infinity" are not
    * JSON tokens and would make the artifact unparseable (ADVICE r12). */
  def num(v: Double, decimals: Int): String =
    if (java.lang.Double.isFinite(v))
      String.format(java.util.Locale.ROOT, s"%.${decimals}f",
        Double.box(v))
    else "null"
}
