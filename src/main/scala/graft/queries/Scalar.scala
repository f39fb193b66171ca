package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Elementwise scalar surface (SURVEY.md §2.8.1-§2.8.2): arithmetic with
  * null propagation, comparisons, and Kleene three-valued logic. All pure
  * narrow expressions — stay inside whole-stage codegen, never shuffle.
  */
object Scalar {

  val defs: Map[String, Q] = Map(
    // +,-,*,/,%,floordiv,divmod on doubles and ints. Both engines: `/` is
    // double division; fmod matches Spark's double %; Spark `div`/DuckDB `//`
    // agree on non-negative ints.
    "q_arith" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .select(
            $"l_orderkey", $"l_linenumber",
            ($"l_quantity" + $"l_tax").as("add"),
            ($"l_quantity" - $"l_discount").as("sub"),
            ($"l_quantity" * $"l_extendedprice").as("mul"),
            ($"l_extendedprice" / $"l_quantity").as("div"),
            ($"l_quantity" % lit(7.0)).as("mod"),
            // floor(double) is BIGINT in Spark but DOUBLE in DuckDB; cast to
            // double so both engines emit the same result type.
            floor($"l_extendedprice" / $"l_quantity").cast("double").as("floordiv"),
            ($"l_orderkey" % lit(97L)).as("imod"),
            expr("l_orderkey div 7").as("idiv"),
            ($"l_quantity" * $"l_quantity").as("sq"),
            // ** dunder: spelled as repeated multiplication so both engines
            // execute the identical IEEE multiply sequence (Math.pow vs libm
            // pow differ by 1 ulp on some inputs even for integral exponents).
            ($"l_quantity" * $"l_quantity" * $"l_quantity").as("cube"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_quantity + l_tax AS add,
             |  l_quantity - l_discount AS sub,
             |  l_quantity * l_extendedprice AS mul,
             |  l_extendedprice / l_quantity AS div,
             |  fmod(l_quantity, 7.0) AS mod,
             |  floor(l_extendedprice / l_quantity) AS floordiv,
             |  l_orderkey % 97 AS imod,
             |  l_orderkey // 7 AS idiv,
             |  l_quantity * l_quantity AS sq,
             |  l_quantity * l_quantity * l_quantity AS cube
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Comparison dunders (==, !=, <, <=, >, >=) with null propagation via a
    // synthesized-null operand (reference base.py:592-612).
    "q_compare" -> Q(
      (s, dir) => {
        import s.implicits._
        val v = when($"value" < 10.0, lit(null)).otherwise($"value")
        tbl(s, dir, "events")
          .select(
            $"event_id",
            ($"value" === lit(50.0)).as("eq"),
            ($"value" =!= lit(50.0)).as("ne"),
            ($"value" < lit(50.0)).as("lt"),
            ($"value" <= lit(50.0)).as("le"),
            ($"value" > lit(50.0)).as("gt"),
            ($"value" >= lit(50.0)).as("ge"),
            (v > lit(50.0)).as("gt_null"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             |  value = 50.0 AS eq,
             |  value <> 50.0 AS ne,
             |  value < 50.0 AS lt,
             |  value <= 50.0 AS le,
             |  value > 50.0 AS gt,
             |  value >= 50.0 AS ge,
             |  (CASE WHEN value < 10.0 THEN NULL ELSE value END) > 50.0 AS gt_null
             |FROM events ORDER BY event_id""".stripMargin)),

    // Kleene OR/AND full truth table incl. NULL operands (reference
    // bool.py:104-415 `or_*` kernel family; SQL OR/AND are Kleene natively).
    "q_kleene" -> Q(
      (s, dir) => {
        import s.implicits._
        val a = when($"value" < 30.0, lit(null).cast(BooleanType))
          .otherwise($"value" > 50.0)
        val b = when($"value" % 7 < 1.0, lit(null).cast(BooleanType))
          .otherwise($"value" % 2 >= 1.0)
        tbl(s, dir, "events")
          .select(
            $"event_id", a.as("a"), b.as("b"),
            (a || b).as("or_ab"),
            (a && b).as("and_ab"),
            (a || lit(null).cast(BooleanType)).as("or_null"),
            (a && lit(null).cast(BooleanType)).as("and_null"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, a, b,
             |  a OR b AS or_ab,
             |  a AND b AS and_ab,
             |  a OR NULL AS or_null,
             |  a AND NULL AS and_null
             |FROM (SELECT event_id,
             |  CASE WHEN value < 30.0 THEN NULL ELSE value > 50.0 END AS a,
             |  CASE WHEN fmod(value, 7) < 1.0 THEN NULL
             |       ELSE fmod(value, 2) >= 1.0 END AS b
             | FROM events)
             |ORDER BY event_id""".stripMargin))
  )
}
