package graft.sql

import org.apache.spark.sql.SparkSession

import graft.exceptions.InvalidArgumentValue

/** String-literal escaping for SQL text fed to `spark.sql`.
  *
  * Spark's lexer does NOT use the ANSI doubled-quote convention: `''`
  * is parsed as two adjacent string literals which the grammar
  * concatenates, so `'O''Brien'` silently becomes `OBrien`. With the
  * default `spark.sql.parser.escapedStringLiterals=false`, backslash
  * escaping is the correct form — `\\` for a backslash, `\'` for a
  * quote. Under the legacy `escapedStringLiterals=true` parser
  * backslashes are plain characters, so the only way to embed a quote
  * is to switch the delimiter to the other quote kind.
  */
object SqlText {

  /** `s` rendered as a Spark SQL string literal valid under the
    * SESSION's active parser mode.
    */
  def lit(spark: SparkSession, s: String): String =
    if (spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        .toBoolean) {
      if (!s.contains("'")) s"'$s'"
      else if (!s.contains("\"")) "\"" + s + "\""
      else throw InvalidArgumentValue(
        "cannot embed a value containing both quote kinds in a SQL " +
          "literal under spark.sql.parser.escapedStringLiterals=true")
    } else lit(s)

  /** Default-parser form (backslash escapes active). */
  def lit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
