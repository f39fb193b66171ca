package graft.types

import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Arrow ↔ Spark type mapping for the reference's supported type set
  * (SURVEY.md §1.2; reference `_python_type_map` base.py:48-74).
  *
  * Deliberate widenings, matching how fletcher data lands in Spark:
  *  - unsigned ints → the next wider signed type (Spark has no unsigned);
  *  - float16 → float32;
  *  - any timestamp unit → TimestampType (µs) — sub-µs truncates;
  *  - dictionary<idx,val> → the VALUE type (dictionary-encoding is an
  *    execution detail here, see factorize §2.4).
  */
object TypeMapping {

  /** Arrow → Spark. Throws on types outside the supported set. */
  def toSpark(t: ArrowType): DataType = t match {
    case _: ArrowType.Null => NullType
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
      case 8 => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
    }
    case i: ArrowType.Int => i.getBitWidth match {  // unsigned → wider signed
      case 8 => ShortType
      case 16 => IntegerType
      case 32 => LongType
      case 64 => DecimalType(20, 0)                 // uint64 exceeds long
    }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.HALF => FloatType
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
    }
    case _: ArrowType.Date => DateType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Duration => DayTimeIntervalType()
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Utf8 => StringType
    case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
    case other =>
      throw new UnsupportedOperationException(s"unsupported Arrow type: $other")
  }

  /** Spark → Arrow (canonical choice per Spark type). */
  def toArrow(t: DataType): ArrowType = t match {
    case NullType => ArrowType.Null.INSTANCE
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case _: DayTimeIntervalType => new ArrowType.Duration(TimeUnit.MICROSECOND)
    case BinaryType => ArrowType.Binary.INSTANCE
    case StringType => ArrowType.Utf8.INSTANCE
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case other =>
      throw new UnsupportedOperationException(s"unsupported Spark type: $other")
  }

  /** Field-level mapping incl. list nesting (fletcher supports
    * list/large_list of any supported type, base.py:66-70). */
  def fieldToSpark(f: Field): StructField = f.getType match {
    case _: ArrowType.List | _: ArrowType.LargeList =>
      val elem = fieldToSpark(f.getChildren.get(0))
      StructField(f.getName, ArrayType(elem.dataType, elem.nullable),
        f.isNullable)
    case t => StructField(f.getName, toSpark(t), f.isNullable)
  }

  def fieldToArrow(f: StructField): Field = f.dataType match {
    case ArrayType(elem, containsNull) =>
      new Field(f.name,
        new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
        List(fieldToArrow(StructField("element", elem, containsNull))).asJava)
    case t =>
      new Field(f.name,
        new FieldType(f.nullable, toArrow(t), null), List.empty.asJava)
  }

  def schemaToSpark(s: Schema): StructType =
    StructType(s.getFields.asScala.map(fieldToSpark).toSeq)

  def schemaToArrow(s: StructType): Schema =
    new Schema(s.fields.map(fieldToArrow).toList.asJava)

  /** DDL-string dtype surface — the Spark-native analog of the
    * reference's string round-trip (`construct_from_string` /
    * `__str__`, reference fletcher/base.py:243-302, which parses
    * "fletcher_continuous[int64]"-style strings via pyarrow's alias
    * table). Spark's public type grammar is the DDL string
    * (`DataType.fromDDL` — "bigint", "decimal(20,0)",
    * "array<string>"), so that is the accepted spelling here.
    *
    * [[fromDdl]] parses any Spark DDL type string and returns the
    * canonical Arrow type per the §1.2 table; [[toDdl]] renders the
    * Spark type an Arrow type lands on. `fromDdl(toDdl(t))` is identity
    * on the canonical type set; a NON-canonical Arrow type (unsigned,
    * float16) normalizes through its documented widening, exactly like
    * the value path. List nesting goes through the field-level pair
    * ([[fieldFromDdl]]/[[fieldToDdl]]), mirroring
    * fieldToSpark/fieldToArrow. Unsupported DDL (maps, structs) throws
    * UnsupportedOperationException from the underlying mapping. */
  def fromDdl(ddl: String): ArrowType = toArrow(DataType.fromDDL(ddl))

  def toDdl(t: ArrowType): String = toSpark(t).catalogString

  /** DDL → Arrow field, supporting `array<...>` nesting (nullable, like
    * the reference's pyarrow fields). */
  def fieldFromDdl(name: String, ddl: String): Field =
    fieldToArrow(StructField(name, DataType.fromDDL(ddl)))

  /** Arrow field → its Spark DDL type string (list nesting included). */
  def fieldToDdl(f: Field): String = fieldToSpark(f).dataType.catalogString
}
