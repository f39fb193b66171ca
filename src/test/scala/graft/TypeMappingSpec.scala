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

  test("DDL strings cover the §1.2 table in both directions " +
      "(reference construct_from_string, base.py:252-302)") {
    // DDL → Arrow: every supported scalar spelling parses to the
    // canonical Arrow type
    val ddlToArrow = Seq(
      "boolean" -> ArrowType.Bool.INSTANCE,
      "tinyint" -> new ArrowType.Int(8, true),
      "smallint" -> new ArrowType.Int(16, true),
      "int" -> new ArrowType.Int(32, true),
      "bigint" -> new ArrowType.Int(64, true),
      "float" -> new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE),
      "double" -> new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE),
      "string" -> ArrowType.Utf8.INSTANCE,
      "binary" -> ArrowType.Binary.INSTANCE,
      "decimal(12,2)" -> new ArrowType.Decimal(12, 2, 128))
    for ((ddl, arrow) <- ddlToArrow)
      assert(TypeMapping.fromDdl(ddl) === arrow, ddl)
    // Arrow → DDL → Arrow: identity on the canonical set (incl. the
    // types whose DDL spelling isn't in the list above)
    val canonical = ddlToArrow.map(_._2) ++ Seq(
      new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY),
      new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC"))
    for (arrow <- canonical)
      assert(TypeMapping.fromDdl(TypeMapping.toDdl(arrow)) === arrow,
        s"$arrow via '${TypeMapping.toDdl(arrow)}'")
    // a NON-canonical Arrow type normalizes through its documented
    // widening, exactly like the value path (uint32 → bigint → int64)
    assert(TypeMapping.toDdl(new ArrowType.Int(32, false)) === "bigint")
    assert(TypeMapping.fromDdl(
      TypeMapping.toDdl(new ArrowType.Int(32, false))) ===
      new ArrowType.Int(64, true))
    assert(TypeMapping.toDdl(
      new ArrowType.FloatingPoint(FloatingPointPrecision.HALF)) === "float")
    // uint64 exceeds long → decimal(20,0), same as toSpark
    assert(TypeMapping.toDdl(new ArrowType.Int(64, false)) ===
      "decimal(20,0)")
  }

  test("DDL field surface handles list nesting both directions " +
      "(reference 'list<item: string>' special case)") {
    val f = TypeMapping.fieldFromDdl("tags", "array<string>")
    assert(TypeMapping.fieldToSpark(f).dataType === ArrayType(StringType))
    assert(TypeMapping.fieldToDdl(f) === "array<string>")
    val nested = TypeMapping.fieldFromDdl("mat", "array<array<bigint>>")
    assert(TypeMapping.fieldToDdl(nested) === "array<array<bigint>>")
    // unsupported DDL (maps) throws like the rest of the mapping
    assertThrows[UnsupportedOperationException](
      TypeMapping.fieldFromDdl("m", "map<string,bigint>"))
  }
}
