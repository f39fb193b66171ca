package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core column-function surface of the engine.
  *
  * Mirrors the capability set of the reference's kernel library
  * (fletcher/_algorithms.py, fletcher/algorithms/{bool,string}.py — see
  * SURVEY.md §2) re-expressed as Spark `Column` functions. Everything here
  * composes built-in (codegen'd) expressions so Catalyst keeps pushdown,
  * pruning and whole-stage codegen; custom Catalyst Expressions live in
  * `graft.expressions` and are only used where built-ins can't express the
  * semantics.
  */
object GraftFunctions {

  // ===========================================================================
  // Deterministic numeric aggregation helpers.
  //
  // Double sums are order-dependent (floating-point), which breaks
  // cross-engine hash comparison and makes results vary run-to-run at scale.
  // Summing through an exact decimal is order-independent AND engine-agnostic:
  // a double→decimal(_, s≥1) cast can never hit a rounding tie (midpoints
  // 5·10^-s are never exactly representable in binary), so Spark (HALF_UP) and
  // any IEEE engine (HALF_EVEN) round identically. The final cast back to
  // double is deterministic. This is the partial/final-agg-safe way to sum
  // doubles reproducibly on a 1000-executor cluster.
  //
  // CROSS-ENGINE BOUNDARY on the final decimal→double cast (found by the
  // r18 full-surface sf1 oracle run): Spark's Decimal.toDouble is correctly
  // rounded (BigDecimal.doubleValue), but DuckDB's is the naive two-step —
  // (double)(scaled hugeint) / 10^scale — which drifts by ulps once
  // |sum|·10^scale exceeds 2^53 (q_stats' s4 at sf1: the exact integer
  // 2615682203940 read back as …939.9995 on the DuckDB side only). The
  // Spark side needs no change; an ORACLE comparing one of these sums must
  // keep |sum|·10^scale < 2^53, or — when the summed values are integral —
  // hop the decimal to scale 0 before the double cast (exact below 2^53;
  // q_stats' oracle does this).
  // ===========================================================================

  /** Order-independent, exact sum of a double column (scale-4 decimal). */
  def detSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Reference-quirk mean: sum(skipna) / COUNT INCLUDING NULLS.
    * The reference deliberately divides by the total length, not the valid
    * count (reference base.py:504-505) — NOT equal to `avg` when nulls exist.
    */
  def fletcherMean(c: Column): Column =
    detSum(c) / count(lit(1))

  /** Deterministic sample variance via exact decimal moments:
    * (S2 - S1²/n) / (n-1). Same formula must be used on the oracle side.
    */
  def detVarSamp(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s1 = detSum(c, 6)
    val s2 = sum((c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    (s2 - s1 * s1 / n) / (n - lit(1.0))
  }

  /** Deterministic sample stddev (sqrt of [[detVarSamp]]). */
  def detStddevSamp(c: Column): Column = sqrt(detVarSamp(c))

  /** Population skewness from exact decimal moments:
    * m3 / m2^1.5 with m_k = Σ(x-μ)^k / n, expanded to raw power sums so the
    * aggregation stays a single partial/final-capable pass.
    */
  def detSkewness(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s1 = detSum(c, 6)
    val s2 = sum((c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    val s3 = sum((c * c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - lit(3.0) * m * s2 / n + lit(2.0) * m * m * m
    // m2*sqrt(m2) instead of pow(m2, 1.5): sqrt is IEEE-correctly-rounded in
    // every engine, pow is not — keeps the result engine-independent.
    m3 / (m2 * sqrt(m2))
  }

  /** Population kurtosis (excess) from exact decimal power sums. */
  def detKurtosis(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s1 = detSum(c, 6)
    val s2 = sum((c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    val s3 = sum((c * c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    val s4 = sum((c * c * c * c).cast(DecimalType(38, 6))).cast(DoubleType)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m4 = s4 / n - lit(4.0) * m * s3 / n + lit(6.0) * m * m * s2 / n -
      lit(3.0) * m * m * m * m
    m4 / (m2 * m2) - lit(3.0)
  }

  // ===========================================================================
  // Boolean reductions with the reference's null semantics
  // (reference fletcher/algorithms/bool.py:14-101).
  // ===========================================================================

  /** `any` with skipna=False: a null row counts as True
    * (reference bool.py:22-23 — `(valid and value) or (not valid)`). */
  def anyNullIsTrue(c: Column): Column = bool_or(coalesce(c, lit(true)))

  /** `all`: "True as long as there is no False" — nulls never falsify
    * (reference bool.py:69). */
  def allNullSkipped(c: Column): Column = bool_and(coalesce(c, lit(true)))

  /** Kleene OR (three-valued). Spark's OR is already Kleene; exposed for API
    * parity with the reference's `or_*` kernel family (bool.py:104-415). */
  def kleeneOr(a: Column, b: Column): Column = a || b

  /** Kleene AND (Spark native; absent in the reference, free here). */
  def kleeneAnd(a: Column, b: Column): Column = a && b

  // ===========================================================================
  // Null handling (reference base.py:1155-1213 fillna, base.py:892-902 isna).
  // ===========================================================================

  /** fillna with a scalar/column value. */
  def fillNa(c: Column, value: Column): Column = coalesce(c, value)

  /** Forward-fill over an explicit ordering within a partition key.
    * Maps the reference's `fillna(method='ffill')` (base.py:1196-1205) to a
    * running `last(ignoreNulls)` window — shuffle-once, scalable.
    */
  def ffill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Backward-fill (reference `method='bfill'`). Spelled as a RUNNING
    * `last(ignoreNulls)` frame over the REVERSED sort, not
    * `first(ignoreNulls)` over [current, unbounded following]: identical
    * value, but Spark evaluates running frames with an O(n) sliding
    * accumulator while unbounded-following frames re-aggregate the whole
    * partition tail per row — O(n²) per key (see Resample.resampleInterp,
    * where the difference measured 16×). */
  def bfill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*)
        .orderBy(orderBy.map(org.apache.spark.sql.GraftSortShim.reverse): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Forward-fill with a limit: only nulls within `limit` rows of the last
    * non-null are filled (reference `fillna(method='ffill', limit=n)`,
    * base.py:1196-1205; the row_number arithmetic SURVEY §2.2 prescribes).
    * Window functions can't nest, so this is a DataFrame transform with two
    * staged Window projections — both share the same partitioning/ordering,
    * so Spark plans ONE shuffle and adjacent Window operators. Adds
    * `outName`. */
  def ffillLimit(df: org.apache.spark.sql.DataFrame, c: Column, limit: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column],
      outName: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val prefix = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(outName,
        when(c.isNotNull, c)
          .when(col("__rn") - max(when(c.isNotNull, col("__rn"))).over(prefix)
              <= limit,
            last(c, ignoreNulls = true).over(prefix)))
      .drop("__rn")
  }

  // ===========================================================================
  // String surface — built-in-mapped subset (reference algorithms/string.py,
  // string_mixin.py; SURVEY §2.8.3-2.8.4). Custom-Expression-backed functions
  // (count/replaceN/slice/is*/casefold/normalize/wrap/zfill) are in
  // graft.expressions and surfaced ergonomically via graft.accessor.syntax.
  // ===========================================================================

  /** Literal substring containment (reference `contains(regex=False)`,
    * string.py:240-328 KMP kernel → Spark UTF8String.contains, codegen'd). */
  def textContains(c: Column, pat: String): Column = c.contains(lit(pat))

  /** Regex containment (reference falls back to pandas, string_array.py:419). */
  def textContainsRegex(c: Column, pat: String): Column = c.rlike(pat)

  /** Elementwise concat, null if either side null (reference `cat`,
    * string.py:94-118 — concat is null-propagating in Spark too). */
  def textCat(a: Column, b: Column): Column = concat(a, b)

  def textStartsWith(c: Column, pat: String): Column = c.startsWith(pat)
  def textEndsWith(c: Column, pat: String): Column = c.endsWith(pat)

  /** The reference's default strip set includes Unicode spaces
    * (reference string_array.py:469-478); Spark `trim` only strips ASCII
    * space, so the set is passed explicitly. */
  val FletcherStripChars: String =
    " \t\r\n\u0085\u001f\u001e\u001d\u001c\u000c\u000b\u00a0" +
      "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008" +
      "\u2009\u200A\u2028\u2029\u202F\u205F"

  def textStrip(c: Column): Column = trim(c, FletcherStripChars)
  def textLStrip(c: Column): Column = ltrim(c, FletcherStripChars)
  def textRStrip(c: Column): Column = rtrim(c, FletcherStripChars)
  def textStrip(c: Column, chars: String): Column = trim(c, chars)
}
