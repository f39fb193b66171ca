package graft

import org.apache.spark.sql.Column
import graft.functions.GraftFunctions
import graft.expressions.TextExpressions

/** Ergonomic accessor surface — the Spark-native spelling of the
  * reference's `.fr_str`/`.fr_strx` pandas accessors (string.py:94-328,
  * string_mixin.py) and its ufunc/`_reduce` dispatch (base.py:532-627,
  * 1044-1130): `import graft.accessor.syntax._` and every engine function
  * hangs off `Column` directly:
  *
  * {{{
  *   df.select($"name".strCount("a"), $"text".strSliceReplace("X", 1, 3),
  *             $"flag".kleeneOr($"other"), $"score".fillNa(lit(0)))
  * }}}
  *
  * Pure forwarding — each method delegates to the same codegen'd
  * expression/function the query surface uses, so the accessor adds zero
  * plan overhead.
  */
package object accessor {

  object syntax {

    /** `.str`-style string methods (reference fr_str/fr_strx accessor). */
    implicit class GraftStringOps(private val c: Column) extends AnyVal {
      def strContains(pat: String): Column = GraftFunctions.textContains(c, pat)
      def strContainsRegex(pat: String): Column =
        GraftFunctions.textContainsRegex(c, pat)
      def strStartsWith(pat: String): Column =
        GraftFunctions.textStartsWith(c, pat)
      def strEndsWith(pat: String): Column = GraftFunctions.textEndsWith(c, pat)
      def strCat(other: Column): Column = GraftFunctions.textCat(c, other)
      def strStrip(): Column = GraftFunctions.textStrip(c)
      def strStrip(chars: String): Column = GraftFunctions.textStrip(c, chars)
      def strLStrip(): Column = GraftFunctions.textLStrip(c)
      def strRStrip(): Column = GraftFunctions.textRStrip(c)
      def strCount(pat: String): Column = TextExpressions.textCount(c, pat)
      def strReplace(pat: String, repl: String, n: Int = -1): Column =
        TextExpressions.textReplaceN(c, pat, repl, n)
      def strSlice(start: Int = Int.MinValue, end: Int = Int.MinValue,
          step: Int = 1): Column = TextExpressions.textSlice(c, start, end, step)
      def strSliceReplace(repl: String, start: Int = Int.MinValue,
          end: Int = Int.MinValue): Column =
        TextExpressions.textSliceReplace(c, repl, start, end)
      def strFind(sub: String): Column =
        org.apache.spark.sql.functions.locate(sub, c) - 1
      def strRFind(sub: String): Column = TextExpressions.textRFind(c, sub)
      def strPartition(sep: String, idx: Int): Column =
        TextExpressions.textPartition(c, sep, idx)
      def strRPartition(sep: String, idx: Int): Column =
        TextExpressions.textPartition(c, sep, idx, fromRight = true)
      def strRSplit(sep: String, n: Int = -1): Column =
        TextExpressions.textRSplit(c, sep, n)
      def strZfill(width: Int): Column = TextExpressions.zfill(c, width)
      def strWrap(width: Int): Column = TextExpressions.wrapText(c, width)
      def strCaseFold(): Column = TextExpressions.caseFold(c)
      def strNormalize(form: String = "NFC"): Column =
        TextExpressions.normalizeText(c, form)
      def strSwapCase(): Column = TextExpressions.swapCase(c)
      def strIsAlpha(): Column = TextExpressions.utf8Is(c, "alpha")
      def strIsDigit(): Column = TextExpressions.utf8Is(c, "digit")
      def strIsAlnum(): Column = TextExpressions.utf8Is(c, "alnum")
      def strIsSpace(): Column = TextExpressions.utf8Is(c, "space")
      def strIsLower(): Column = TextExpressions.utf8Is(c, "lower")
      def strIsUpper(): Column = TextExpressions.utf8Is(c, "upper")
      def strIsTitle(): Column = TextExpressions.utf8Is(c, "title")
      def strIsNumeric(): Column = TextExpressions.utf8Is(c, "numeric")
      def strIsDecimal(): Column = TextExpressions.utf8Is(c, "decimal")
      def polyHash(): Column = TextExpressions.polyHash(c)
    }

    /** Null-handling + Kleene logic + reduction dispatch (reference
      * `_reduce` base.py:1044-1130, fillna/ffill base.py:766-842). */
    implicit class GraftColumnOps(private val col: Column) extends AnyVal {
      def isNa: Column = col.isNull
      def fillNa(value: Column): Column = GraftFunctions.fillNa(col, value)
      def kleeneOr(other: Column): Column = GraftFunctions.kleeneOr(col, other)
      def kleeneAnd(other: Column): Column = GraftFunctions.kleeneAnd(col, other)
      def ffill(partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
        GraftFunctions.ffill(col, partitionBy, orderBy)
      def bfill(partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
        GraftFunctions.bfill(col, partitionBy, orderBy)

      /** `_reduce(name)` dispatcher — the reference's single entry point
        * for named reductions, mapped to the engine's deterministic
        * aggregate spellings. */
      def reduce(name: String): Column = name match {
        case "sum" => GraftFunctions.detSum(col)
        case "mean" => GraftFunctions.fletcherMean(col)
        case "min" => org.apache.spark.sql.functions.min(col)
        case "max" => org.apache.spark.sql.functions.max(col)
        case "prod" => graft.expressions.ProductAgg.prodAgg(col)
        case "std" => GraftFunctions.detStddevSamp(col)
        case "var" => GraftFunctions.detVarSamp(col)
        case "skew" => GraftFunctions.detSkewness(col)
        case "kurt" => GraftFunctions.detKurtosis(col)
        case "any" => GraftFunctions.anyNullIsTrue(col)
        case "all" => GraftFunctions.allNullSkipped(col)
        case "median" =>
          org.apache.spark.sql.functions.percentile(col,
            org.apache.spark.sql.functions.lit(0.5))
        case other =>
          throw new IllegalArgumentException(s"unknown reduction: $other")
      }
    }

    /** DataFrame-level operators (temporal joins, sessions, sampling) —
      * forwarding sugar over graft.operators.*. */
    implicit class GraftDataFrameOps(
        private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
      def asofJoin(right: org.apache.spark.sql.DataFrame, keys: Seq[String],
          leftTime: String, rightTime: String, rightPayload: Seq[String],
          direction: String = "backward",
          tolerance: Option[Long] = None): org.apache.spark.sql.DataFrame =
        graft.operators.AsofJoin.asof(df, right, keys, leftTime, rightTime,
          rightPayload, direction, tolerance)
      def rangeJoin(intervals: org.apache.spark.sql.DataFrame,
          keys: Seq[String], pointCol: String, startCol: String,
          endCol: String, binWidth: Long): org.apache.spark.sql.DataFrame =
        graft.operators.RangeJoin.pointInInterval(df, intervals, keys,
          pointCol, startCol, endCol, binWidth)
      def sessionize(keys: Seq[String], tsCol: String,
          gap: Long): org.apache.spark.sql.DataFrame =
        graft.operators.Sessionize.sessionize(df, keys, tsCol, gap)
      def stratifiedSample(content: Column, stratum: Column,
          rates: Map[String, Double],
          defaultRate: Double): org.apache.spark.sql.DataFrame =
        df.filter(graft.operators.TextOps.stratifiedKeep(content, stratum,
          rates, defaultRate))
      def repetitionSignals(textCol: String, idCol: String,
          ks: Seq[Int] = Seq(2, 3)): org.apache.spark.sql.DataFrame =
        graft.operators.Quality.repetitionSignals(df, textCol, idCol, ks)
      def decontaminate(textCol: String, idCol: String, isEval: Column,
          k: Int, broadcastEval: Boolean = true): org.apache.spark.sql.DataFrame =
        graft.operators.Dedup.ngramContamination(df, textCol, idCol, isEval,
          k, broadcastEval)
      def capPerKey(keyCol: String, idCol: String,
          n: Int): org.apache.spark.sql.DataFrame =
        graft.operators.TextOps.capPerKey(df, keyCol, idCol, n)
      def chunkDocuments(textCol: String, idCol: String, size: Int,
          stride: Int): org.apache.spark.sql.DataFrame =
        graft.operators.TextOps.chunkDocuments(df, textCol, idCol, size,
          stride)
      def cleanCorpus(textCol: String, idCol: String, isEval: Column,
          k: Int = 3, minTokens: Int = 10, maxTokens: Int = 1000,
          minStopRatio: Double = 0.01, keepLang: String = "en",
          maxOverlap: Long = 0L): org.apache.spark.sql.DataFrame =
        graft.operators.Quality.cleanCorpus(df, textCol, idCol, isEval, k,
          minTokens, maxTokens, minStopRatio, keepLang, maxOverlap)
      def resample(keyCol: String, tsCol: String, stepNs: Long,
          valueCol: String): org.apache.spark.sql.DataFrame =
        graft.operators.Resample.resample(df, keyCol, tsCol, stepNs, valueCol)
      def resampleInterp(keyCol: String, tsCol: String, stepNs: Long,
          valueCol: String): org.apache.spark.sql.DataFrame =
        graft.operators.Resample.resampleInterp(df, keyCol, tsCol, stepNs,
          valueCol)
      def fuzzySelfJoin(idCol: String,
          strCol: String): org.apache.spark.sql.DataFrame =
        graft.operators.Fuzzy.edSelfJoin(df, idCol, strCol)
      def sortedNeighborhoodJoin(idCol: String, strCol: String, w: Int,
          maxEd: Int = 1): org.apache.spark.sql.DataFrame =
        graft.operators.Fuzzy.sortedNeighborhood(df, idCol, strCol, w, maxEd)
      def profile(cols: Seq[String],
          exact: Boolean = true): org.apache.spark.sql.DataFrame =
        graft.operators.Profile.profile(df, cols, exact)
      def groupedPrefixSum(grpCols: Seq[String], ordCols: Seq[Column],
          valCol: Column, outCol: String): org.apache.spark.sql.DataFrame =
        graft.operators.Positional.groupedPrefixSum(df, grpCols, ordCols,
          valCol, outCol)
      def upsert(updates: org.apache.spark.sql.DataFrame,
          key: String): org.apache.spark.sql.DataFrame =
        graft.operators.Merge.upsert(df, updates, key)
      def upsertLatest(updates: org.apache.spark.sql.DataFrame, key: String,
          ord: Seq[String]): org.apache.spark.sql.DataFrame =
        graft.operators.Merge.upsertLatest(df, updates, key, ord)
      def scd2(key: String, tsCol: String, tieBreak: Seq[String],
          horizon: Long): org.apache.spark.sql.DataFrame =
        graft.operators.Merge.scd2(df, key, tsCol, tieBreak, horizon)
      def snapshotDiff(next: org.apache.spark.sql.DataFrame, key: String,
          compareCols: Seq[String]): org.apache.spark.sql.DataFrame =
        graft.operators.Merge.snapshotDiff(df, next, key, compareCols)
      def joinStats(right: org.apache.spark.sql.DataFrame, leftKey: String,
          rightKey: String): org.apache.spark.sql.DataFrame =
        graft.operators.Profile.joinStats(df, leftKey, right, rightKey)
    }
  }
}
