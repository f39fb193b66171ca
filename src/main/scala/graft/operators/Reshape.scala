package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators: list-column expansion and indicator encoding.
  *
  * Scale notes: explode is a narrow per-partition expansion (no shuffle);
  * getDummies collects only the tiny category dictionary to the driver
  * (same contract as pandas get_dummies — the category set must fit in
  * memory), then emits one codegen'd indicator expression per category,
  * so the big table is a single narrow scan.
  */
object Reshape {

  /** Pandas str.get_dummies(sep): split `strCol` on the literal separator
    * and emit one 0/1 int column per distinct token, named by the token,
    * sorted. Two-pass: pass 1 derives the dictionary (distinct tokens —
    * small by contract), pass 2 is a narrow scan.
    *
    * `maxCategories` guards the driver: the dictionary pass counts first
    * (cheap distinct-count aggregate) and fails fast with a clear error
    * instead of OOMing the driver collect when the column turns out to be
    * high-cardinality (e.g. free text instead of a tag list).
    * Reference: tests/test_text.py:950-975.
    */
  def getDummies(df: DataFrame, strCol: Column, sep: String,
      keep: Seq[Column], maxCategories: Int = 10000): DataFrame = {
    val toks = split(strCol, java.util.regex.Pattern.quote(sep))
    val distinctToks = df.select(explode(array_distinct(toks)).as("t"))
      .distinct()
    val nCats = distinctToks.count()
    require(nCats <= maxCategories,
      s"getDummies: $nCats distinct categories exceeds maxCategories=" +
        s"$maxCategories — indicator encoding needs a driver-resident " +
        "dictionary and one output column per category; raise the cap only " +
        "if you really want that many columns")
    val cats = distinctToks.orderBy(col("t"))
      .collect().map(_.getString(0)).toSeq
    val indicators = cats.map(c =>
      when(array_contains(toks, c), 1).otherwise(0).as(c))
    df.select(keep ++ indicators: _*)
  }

  /** Flatten a list column to one row per element with its 0-based
    * position (fletcher list-flatten, reference base.py:1272-1276) —
    * a narrow per-partition expansion, no shuffle. */
  def explodeWithPos(df: DataFrame, arr: Column, keep: Seq[Column],
      posName: String = "pos", elemName: String = "elem"): DataFrame =
    df.select(keep :+ posexplode(arr).as(Seq(posName, elemName)): _*)
}
