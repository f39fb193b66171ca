package graft

import org.apache.arrow.vector.types.pojo.ArrowType
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.TypeMapping

/** Pins the §1.2 type table: Arrow↔Spark round trips and the documented
  * widenings (unsigned, float16, dictionary). */
class TypeMappingSpec extends AnyFunSuite {

  test("signed ints, floats, bool, string, binary round-trip") {
    val roundTrip = Seq(BooleanType, ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, StringType, BinaryType, DateType,
      TimestampType, DecimalType(12, 2))
    for (t <- roundTrip)
      assert(TypeMapping.toSpark(TypeMapping.toArrow(t)) === t, t)
  }

  test("unsigned ints widen to the next signed type") {
    assert(TypeMapping.toSpark(new ArrowType.Int(8, false)) === ShortType)
    assert(TypeMapping.toSpark(new ArrowType.Int(16, false)) === IntegerType)
    assert(TypeMapping.toSpark(new ArrowType.Int(32, false)) === LongType)
    assert(TypeMapping.toSpark(new ArrowType.Int(64, false)) ===
      DecimalType(20, 0))
  }

  test("float16 maps to FloatType") {
    assert(TypeMapping.toSpark(
      new ArrowType.FloatingPoint(FloatingPointPrecision.HALF)) === FloatType)
  }

  test("list fields nest (list<string>, list<list<long>>)") {
    val arrowSchema = TypeMapping.schemaToArrow(StructType(Seq(
      StructField("tags", ArrayType(StringType), nullable = true),
      StructField("mat", ArrayType(ArrayType(LongType))))))
    val back = TypeMapping.schemaToSpark(arrowSchema)
    assert(back("tags").dataType === ArrayType(StringType))
    assert(back("mat").dataType === ArrayType(ArrayType(LongType)))
  }

  test("schema round-trip preserves names and nullability") {
    val s = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", ArrayType(StringType), nullable = false)))
    val back = TypeMapping.schemaToSpark(TypeMapping.schemaToArrow(s))
    assert(back === s)
  }

  test("unsupported types throw") {
    assertThrows[UnsupportedOperationException](
      TypeMapping.toArrow(MapType(StringType, LongType)))
  }
}
