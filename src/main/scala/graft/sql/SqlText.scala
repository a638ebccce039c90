package graft.sql

/** String-literal escaping for SQL text fed to `spark.sql`.
  *
  * Spark's lexer does NOT use the ANSI doubled-quote convention: `''`
  * is parsed as two adjacent string literals which the grammar
  * concatenates, so `'O''Brien'` silently becomes `OBrien`. With the
  * default `spark.sql.parser.escapedStringLiterals=false`, backslash
  * escaping is the correct form — `\\` for a backslash, `\'` for a
  * quote.
  */
object SqlText {

  /** `s` rendered as a single-quoted Spark SQL string literal. */
  def lit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
