package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.AthenaTypes
import graft.exceptions._

class AthenaTypesSpec extends AnyFunSuite {

  test("scalar athena -> spark") {
    assert(AthenaTypes.toSpark("tinyint") == ByteType)
    assert(AthenaTypes.toSpark("smallint") == ShortType)
    assert(AthenaTypes.toSpark("int") == IntegerType)
    assert(AthenaTypes.toSpark("integer") == IntegerType)
    assert(AthenaTypes.toSpark("bigint") == LongType)
    assert(AthenaTypes.toSpark("float") == FloatType)
    assert(AthenaTypes.toSpark("real") == FloatType)
    assert(AthenaTypes.toSpark("double") == DoubleType)
    assert(AthenaTypes.toSpark("boolean") == BooleanType)
    assert(AthenaTypes.toSpark("string") == StringType)
    assert(AthenaTypes.toSpark("varchar(256)") == StringType)
    assert(AthenaTypes.toSpark("char(3)") == StringType)
    assert(AthenaTypes.toSpark("timestamp") == TimestampType)
    assert(AthenaTypes.toSpark("date") == DateType)
    assert(AthenaTypes.toSpark("binary") == BinaryType)
    assert(AthenaTypes.toSpark("decimal(3,2)") == DecimalType(3, 2))
  }

  test("nested athena -> spark") {
    assert(AthenaTypes.toSpark("array<int>") == ArrayType(IntegerType))
    assert(AthenaTypes.toSpark("array<array<bigint>>") ==
      ArrayType(ArrayType(LongType)))
    assert(AthenaTypes.toSpark("map<string,int>") ==
      MapType(StringType, IntegerType))
    assert(AthenaTypes.toSpark("struct<a:int,b:array<double>>") ==
      StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", ArrayType(DoubleType)))))
    assert(AthenaTypes.toSpark("map<string, array<struct<x:decimal(10,2)>>>") ==
      MapType(StringType,
        ArrayType(StructType(Seq(StructField("x", DecimalType(10, 2)))))))
  }

  test("spark -> athena round trip") {
    val types = Seq("tinyint", "smallint", "int", "bigint", "float", "double",
      "boolean", "string", "timestamp", "date", "binary", "decimal(3,2)",
      "array<int>", "map<string,int>", "struct<a:int,b:string>")
    types.foreach { a =>
      assert(AthenaTypes.fromSpark(AthenaTypes.toSpark(a)) == a)
    }
  }

  test("null column raises UndetectedType; unknown raises UnsupportedType") {
    assertThrows[UndetectedType](AthenaTypes.fromSpark(NullType))
    assertThrows[UnsupportedType](AthenaTypes.toSpark("uint64"))
  }

  test("name sanitization") {
    assert(AthenaTypes.sanitizeName("CamelCaseCol") == "camel_case_col")
    assert(AthenaTypes.sanitizeName("with space-and.dots") ==
      "with_space_and_dots")
    assert(AthenaTypes.sanitizeName("café") == "cafe")
    assert(AthenaTypes.sanitizeName("already_snake9") == "already_snake9")
  }
}
