package graft.types

import java.text.Normalizer

import org.apache.spark.sql.types._

import graft.exceptions._

/** Bidirectional bridge between Athena/Glue SQL type strings and Spark
  * `DataType`s, plus Athena-compatible name sanitization.
  *
  * Semantics follow the reference's type lattice
  * (reference: awswrangler/_data_types.py:24-189) re-centered on
  * `org.apache.spark.sql.types`:
  *   - `char`/`varchar` collapse to `StringType` (engine-internal strings
  *     are unbounded; length is metadata only).
  *   - `NullType` (all-null column with no override) raises
  *     `UndetectedType`, preserving the reference's "pass an explicit
  *     dtype for null columns" escape hatch (_data_types.py:187-188).
  *   - timestamps are microsecond-precision `TimestampType` (documented
  *     divergence from the reference's ns-read/ms-write pandas behavior).
  */
object AthenaTypes {

  /** Parse an Athena/Glue type string to a Spark DataType.
    * Grammar (reference: awswrangler/_data_types.py:24-58) is
    * DDL-compatible modulo synonyms handled below.
    */
  def toSpark(athenaType: String): DataType = {
    val t = athenaType.trim
    val lower = t.toLowerCase
    lower match {
      case "tinyint"             => ByteType
      case "smallint"            => ShortType
      case "int" | "integer"     => IntegerType
      case "bigint"              => LongType
      case "float" | "real"      => FloatType
      case "double"              => DoubleType
      case "boolean"             => BooleanType
      case "string"              => StringType
      case "timestamp"           => TimestampType
      case "date"                => DateType
      case "binary" | "varbinary" => BinaryType
      case "decimal"             => DecimalType(38, 18)
      case _ if lower.startsWith("char") || lower.startsWith("varchar") =>
        StringType
      case _ if lower.startsWith("decimal") =>
        parseDecimal(t)
      case _ if lower.startsWith("array") || lower.startsWith("struct") ||
                lower.startsWith("map") =>
        parseNested(t)
      case "" => throw InvalidArgumentValue("empty type string")
      case _  => throw UnsupportedType(s"Unsupported Athena type: $t")
    }
  }

  private def parseDecimal(t: String): DataType = {
    val open = t.indexOf('(')
    val close = t.lastIndexOf(')')
    // bare `decimal` is valid Athena/Hive and means decimal(10,0)
    if (open < 0 && t.trim.equalsIgnoreCase("decimal"))
      return DecimalType(10, 0)
    if (open < 0 || close < open)
      throw UnsupportedType(s"Bad decimal type: $t")
    val parts = t.substring(open + 1, close).split(',').map(_.trim)
    try parts match {
      case Array(p)    => DecimalType(p.toInt, 0)
      case Array(p, s) => DecimalType(p.toInt, s.toInt)
      case _ => throw UnsupportedType(s"Bad decimal type: $t")
    } catch {
      case _: NumberFormatException =>
        throw UnsupportedType(s"Bad decimal type: $t")
    }
  }

  /** array<...> / struct<...> / map<...> — recursive, with synonym
    * rewrite (int/float aliases) applied to leaf tokens so
    * `DataType.fromDDL` accepts the whole string.
    */
  private def parseNested(t: String): DataType = {
    val lower = t.toLowerCase
    if (lower.startsWith("array")) {
      ArrayType(toSpark(innerOf(t)))
    } else if (lower.startsWith("map")) {
      val (k, v) = splitTopLevel2(innerOf(t))
      MapType(toSpark(k), toSpark(v))
    } else { // struct<name:type,...>
      val fields = splitTopLevel(innerOf(t)).map { f =>
        val i = f.indexOf(':')
        if (i < 0) throw UnsupportedType(s"Bad struct field: $f in $t")
        StructField(f.substring(0, i).trim, toSpark(f.substring(i + 1)))
      }
      StructType(fields)
    }
  }

  private def innerOf(t: String): String = {
    val open = t.indexOf('<')
    val close = t.lastIndexOf('>')
    if (open < 0 || close < open)
      throw UnsupportedType(s"Malformed nested type: $t")
    t.substring(open + 1, close)
  }

  /** Split on top-level commas only (depth tracked over <> and ()). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def splitTopLevel2(s: String): (String, String) =
    splitTopLevel(s) match {
      case Seq(a, b) => (a, b)
      case other => throw UnsupportedType(s"Expected 2 type args, got: $other")
    }

  /** Spark DataType → Athena/Glue type string
    * (reference: awswrangler/_data_types.py:151-189 pyarrow2athena).
    */
  def fromSpark(dt: DataType): String = dt match {
    case ByteType       => "tinyint"
    case ShortType      => "smallint"
    case IntegerType    => "int"
    case LongType       => "bigint"
    case FloatType      => "float"
    case DoubleType     => "double"
    case BooleanType    => "boolean"
    case StringType     => "string"
    case _: CharType | _: VarcharType => "string"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType       => "date"
    case BinaryType     => "binary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType   => s"array<${fromSpark(a.elementType)}>"
    case m: MapType     => s"map<${fromSpark(m.keyType)},${fromSpark(m.valueType)}>"
    case s: StructType  =>
      s.fields.map(f => s"${f.name}:${fromSpark(f.dataType)}")
        .mkString("struct<", ",", ">")
    case NullType =>
      throw UndetectedType(
        "Column has only null values; pass an explicit dtype for it")
    case other =>
      throw UnsupportedType(s"Unsupported Spark type: $other")
  }

  /** Schema → {column -> athena type}, preserving field order. */
  def fromSchema(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> fromSpark(f.dataType))

  /** Athena-compatible identifier sanitization
    * (reference: awswrangler/catalog/_utils.py:22-26): strip accents,
    * CamelCase → snake_case, non-alphanumerics → `_`, lowercase.
    */
  def sanitizeName(name: String): String = {
    val deaccented = Normalizer.normalize(name, Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
    val snake = deaccented
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
    snake.toLowerCase.replaceAll("[^a-z0-9_]", "_")
  }

  def sanitizeColumnNames(names: Seq[String]): Seq[String] =
    names.map(sanitizeName)
}
