package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.expressions.TextExpressions._

/** String-function surface (SURVEY.md §2.8.3-§2.8.4) — the heart of the
  * reference library. Built-ins where Spark has them (codegen'd, pushdown-
  * safe); custom Catalyst Expressions (graft.expressions) for count/
  * replace-n/slice/is-predicates/casefold/normalize/zfill; all pure narrow
  * expressions.
  */
object Strings {

  val defs: Map[String, Q] = Map(
    // contains / startswith / endswith / cat (reference string.py:94-328).
    "q_str_predicates" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "part")
          .select(
            $"p_partkey",
            textContains($"p_name", "green").as("has_green"),
            textStartsWith($"p_name", "bl").as("starts_bl"),
            textEndsWith($"p_type", "OMY").as("ends_omy"),
            textContainsRegex($"p_type", "^(ECONOMY|PROMO)$").as("rx"),
            textCat($"p_brand", $"p_type").as("brand_type"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  contains(p_name, 'green') AS has_green,
             |  starts_with(p_name, 'bl') AS starts_bl,
             |  ends_with(p_type, 'OMY') AS ends_omy,
             |  regexp_matches(p_type, '^(ECONOMY|PROMO)$') AS rx,
             |  p_brand || p_type AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // upper/lower/length/substring/reverse/left/right (§2.8.4).
    "q_str_basic" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select(
            $"c_custkey",
            upper($"c_name").as("up"),
            lower($"c_mktsegment").as("lo"),
            length($"c_name").as("len"),
            substring($"c_name", 3, 5).as("sub"),
            reverse($"c_name").as("rev"),
            $"c_name".substr(lit(1), lit(4)).as("head4"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  upper(c_name) AS up,
             |  lower(c_mktsegment) AS lo,
             |  CAST(length(c_name) AS INTEGER) AS len,
             |  substr(c_name, 3, 5) AS sub,
             |  reverse(c_name) AS rev,
             |  substr(c_name, 1, 4) AS head4
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // pad family: lpad/rpad/center + zfill custom expression (§2.8.4).
    "q_str_pad" -> Q(
      (s, dir) => {
        import s.implicits._
        val name = $"s_name"
        tbl(s, dir, "supplier")
          .select(
            $"s_suppkey",
            lpad(name, 25, "*").as("ljust"),
            rpad(name, 25, "*").as("rjust"),
            // center = pandas str.center: left pad gets the smaller half
            rpad(lpad(name,
              (length(name) + ((lit(25) - length(name)) / 2).cast("int")),
              lit("*")), lit(25), lit("*")).as("center"),
            zfill($"s_suppkey".cast("string"), 8).as("zf"),
            zfill(concat(lit("-"), $"s_suppkey".cast("string")), 8).as("zf_neg"))
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey,
             |  lpad(s_name, 25, '*') AS ljust,
             |  rpad(s_name, 25, '*') AS rjust,
             |  rpad(lpad(s_name, CAST(length(s_name) + (25 - length(s_name)) // 2 AS INTEGER), '*'), 25, '*') AS center,
             |  lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS zf,
             |  '-' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') AS zf_neg
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // trim family with explicit char sets (reference strip, string.py:545-684).
    "q_str_trim" -> Q(
      (s, dir) => {
        import s.implicits._
        val padded = concat(lit("  \t"), $"n_name", lit("xx "))
        tbl(s, dir, "nation")
          .select(
            $"n_nationkey",
            textStrip(padded).as("stripped"),
            textLStrip(padded).as("lstripped"),
            textRStrip(textStrip(padded, " \tx")).as("custom"))
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey,
             |  trim(p, ' ' || chr(9) || chr(10) || chr(13)) AS stripped,
             |  ltrim(p, ' ' || chr(9) || chr(10) || chr(13)) AS lstripped,
             |  rtrim(trim(p, ' ' || chr(9) || 'x'), ' ' || chr(9) || chr(10) || chr(13)) AS custom
             |FROM (SELECT n_nationkey, '  ' || chr(9) || n_name || 'xx ' AS p
             |      FROM nation)
             |ORDER BY n_nationkey""".stripMargin)),

    // find/locate/instr (§2.8.4 find/index → Spark locate is 1-based like
    // DuckDB instr; pandas find is 0-based → minus 1).
    "q_str_find" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "part")
          .select(
            $"p_partkey",
            (locate("a", $"p_name") - 1).as("find_a"),
            locate("ECON", $"p_type").as("locate_econ"),
            textCount($"p_name", "a").as("count_a"),
            textCount($"p_name", "").as("count_empty"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CAST(instr(p_name, 'a') - 1 AS INTEGER) AS find_a,
             |  CAST(instr(p_type, 'ECON') AS INTEGER) AS locate_econ,
             |  CAST((length(p_name) - length(replace(p_name, 'a', ''))) AS INTEGER) AS count_a,
             |  CAST(length(p_name) + 1 AS INTEGER) AS count_empty
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // split / rsplit-style access (§2.8.4 split/partition/get).
    "q_str_split" -> Q(
      (s, dir) => {
        import s.implicits._
        val parts = split($"p_name", " ")
        tbl(s, dir, "part")
          .select(
            $"p_partkey",
            parts.getItem(0).as("first_tok"),
            element_at(parts, -1).as("last_tok"),
            size(parts).as("n_tok"),
            substring_index($"p_name", " ", 1).as("before_first"),
            substring_index($"p_name", " ", -1).as("after_last"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  string_split(p_name, ' ')[1] AS first_tok,
             |  string_split(p_name, ' ')[-1] AS last_tok,
             |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_tok,
             |  split_part(p_name, ' ', 1) AS before_first,
             |  string_split(p_name, ' ')[-1] AS after_last
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // regex surface: extract / replace-all / count (§2.8.4
    // extract/findall/match → regexp_extract/regexp_replace/regexp_count).
    "q_str_regex" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select(
            $"c_custkey",
            regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
            regexp_replace($"c_name", "[0-9]", "#").as("masked"),
            regexp_count($"c_name", lit("0")).as("zeros"),
            // pandas match = anchored at start; fullmatch = whole string
            $"c_name".rlike("^Customer#0*1").as("rx_match"),
            $"c_name".rlike("^Customer#0*1$").as("rx_fullmatch"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             |  CAST(len(regexp_extract_all(c_name, '0')) AS INTEGER) AS zeros,
             |  regexp_matches(c_name, '^Customer#0*1') AS rx_match,
             |  regexp_full_match(c_name, 'Customer#0*1') AS rx_fullmatch
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // repeat / translate / literal replace-all (§2.8.4).
    "q_str_misc" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "region")
          .select(
            $"r_regionkey",
            repeat($"r_name", 3).as("rep"),
            translate($"r_name", "AEIOU", "aeiou").as("tr"),
            expr("replace(r_name, 'A', '@')").as("repl_all"))
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey,
             |  repeat(r_name, 3) AS rep,
             |  translate(r_name, 'AEIOU', 'aeiou') AS tr,
             |  replace(r_name, 'A', '@') AS repl_all
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    // title-case (initcap) — composed per-word in the oracle (no DuckDB
    // initcap); capitalize = first-char upper + rest lower.
    "q_str_title" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "documents")
          .select(
            $"doc_id",
            initcap($"lang").as("title_lang"),
            concat(upper(substring($"source", 1, 1)),
              lower(substring($"source", 2, 1000))).as("cap_source"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  upper(lang[1]) || lower(lang[2:]) AS title_lang,
             |  upper(source[1]) || lower(source[2:]) AS cap_source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // custom TextReplaceN: bounded-n and empty-pattern replace — the
    // semantics Spark's replace/regexp_replace can't do (SURVEY §4).
    "q_str_replace_n" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "nation")
          .select(
            $"n_nationkey",
            textReplaceN($"n_name", "N", "@", 1).as("r1"),
            textReplaceN($"n_name", "N", "@", 2).as("r2"),
            textReplaceN($"n_name", "N", "@", -1).as("rall"),
            textReplaceN($"n_name", "", "-", -1).as("rempty"))
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey,
             |  regexp_replace(n_name, 'N', '@') AS r1,
             |  regexp_replace(regexp_replace(n_name, 'N', '@'), 'N', '@') AS r2,
             |  replace(n_name, 'N', '@') AS rall,
             |  '-' || list_aggregate(list_transform(regexp_split_to_array(n_name, ''), c -> c || '-'), 'string_agg', '') AS rempty
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // custom TextSlice: Python codepoint slicing with negative indices and
    // step — oracle via substr arithmetic / list gymnastics.
    "q_str_slice" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select(
            $"c_custkey",
            textSlice($"c_name", 2, 10).as("s2_10"),
            textSlice($"c_name", end = -3).as("drop3"),
            textSlice($"c_name", -5).as("last5"),
            textSlice($"c_name", 1, -1).as("trim_ends"),
            textSlice($"c_name", 0, Int.MinValue, 2).as("evens"),
            textSlice($"c_name", Int.MinValue, Int.MinValue, -1).as("rev"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  substr(c_name, 3, 8) AS s2_10,
             |  substr(c_name, 1, greatest(length(c_name) - 3, 0)) AS drop3,
             |  substr(c_name, greatest(length(c_name) - 5, 0) + 1) AS last5,
             |  substr(c_name, 2, greatest(length(c_name) - 2, 0)) AS trim_ends,
             |  list_aggregate(list_transform(
             |    range(1, CAST(length(c_name) AS BIGINT) + 1, 2),
             |    i -> substr(c_name, CAST(i AS INTEGER), 1)), 'string_agg', '') AS evens,
             |  reverse(c_name) AS rev
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // custom Utf8Is predicates (ASCII-safe oracle via regex classes) —
    // all nine exercised (title/numeric/decimal included).
    "q_str_is" -> Q(
      (s, dir) => {
        import s.implicits._
        val tok = split($"p_name", " ").getItem(0)
        val digits = regexp_extract($"p_brand", "([0-9]+)", 1)
        tbl(s, dir, "part")
          .select(
            $"p_partkey",
            utf8Is(tok, "alpha").as("is_alpha"),
            utf8Is(tok, "digit").as("is_digit"),
            utf8Is(tok, "alnum").as("is_alnum"),
            utf8Is(tok, "lower").as("is_lower"),
            utf8Is(tok, "upper").as("is_upper"),
            utf8Is($"p_brand", "space").as("is_space"),
            utf8Is($"p_brand", "title").as("is_title"),
            utf8Is(initcap(tok), "title").as("is_title_cap"),
            utf8Is(digits, "numeric").as("is_numeric"),
            utf8Is(digits, "decimal").as("is_decimal"),
            utf8Is($"p_type", "decimal").as("is_decimal_type"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  regexp_matches(t, '^[A-Za-z]+$') AS is_alpha,
             |  regexp_matches(t, '^[0-9]+$') AS is_digit,
             |  regexp_matches(t, '^[A-Za-z0-9]+$') AS is_alnum,
             |  regexp_matches(t, '^[^A-Z]*[a-z][^A-Z]*$') AS is_lower,
             |  regexp_matches(t, '^[^a-z]*[A-Z][^a-z]*$') AS is_upper,
             |  regexp_matches(p_brand, '^\s+$') AS is_space,
             |  regexp_matches(p_brand, '^([^A-Za-z]*[A-Z][a-z]*)+[^A-Za-z]*$') AS is_title,
             |  regexp_matches(upper(t[1]) || t[2:], '^([^A-Za-z]*[A-Z][a-z]*)+[^A-Za-z]*$') AS is_title_cap,
             |  regexp_matches(regexp_extract(p_brand, '([0-9]+)', 1), '^[0-9]+$') AS is_numeric,
             |  regexp_matches(regexp_extract(p_brand, '([0-9]+)', 1), '^[0-9]+$') AS is_decimal,
             |  regexp_matches(regexp_extract(p_type, '([0-9]+)', 1), '^[0-9]+$') AS is_decimal_type
             |FROM (SELECT p_partkey, p_brand, p_type,
             |        string_split(p_name, ' ')[1] AS t
             |      FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // casefold + normalize (ASCII data: casefold ≡ lower; NFC is identity —
    // full Unicode behavior pinned in StringExpressionsSpec).
    "q_str_fold_norm" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select(
            $"c_custkey",
            caseFold($"c_name").as("folded"),
            normalizeText($"c_name", "NFC").as("nfc"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  lower(c_name) AS folded,
             |  nfc_normalize(c_name) AS nfc
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // right-anchored surface: rfind/rindex, rpartition, rsplit(n),
    // slice_replace, swapcase (reference tests/test_text.py:605-700,668,773).
    "q_str_right_ops" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "part")
          .select(
            $"p_partkey",
            textRFind($"p_name", "e").as("rfind_e"),
            textRFind($"p_name", "er").as("rfind_er"),
            textRFind($"p_name", "e").as("rindex_e"),
            textPartition($"p_name", " ", 0, fromRight = true).as("rp_head"),
            textPartition($"p_name", " ", 1, fromRight = true).as("rp_sep"),
            textPartition($"p_name", " ", 2, fromRight = true).as("rp_tail"),
            textPartition($"p_name", " ", 0).as("lp_head"),
            element_at(textRSplit($"p_name", " ", 1), 1).as("rsplit1_head"),
            element_at(textRSplit($"p_name", " ", 1), -1).as("rsplit1_tail"),
            size(textRSplit($"p_name", " ", 1)).as("rsplit1_n"),
            textSliceReplace($"p_name", "X", 1, 3).as("srepl_1_3"),
            textSliceReplace($"p_name", "X", start = 2).as("srepl_from2"),
            textSliceReplace($"p_name", "X", end = 2).as("srepl_to2"),
            textSliceReplace($"p_name", "X", -3).as("srepl_neg"),
            swapCase($"p_brand").as("swapped"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CASE WHEN instr(reverse(p_name), 'e') = 0 THEN -1
             |       ELSE CAST(length(p_name) - instr(reverse(p_name), 'e') AS INTEGER) END AS rfind_e,
             |  CASE WHEN instr(reverse(p_name), 're') = 0 THEN -1
             |       ELSE CAST(length(p_name) - instr(reverse(p_name), 're') - 1 AS INTEGER) END AS rfind_er,
             |  CASE WHEN instr(reverse(p_name), 'e') = 0 THEN -1
             |       ELSE CAST(length(p_name) - instr(reverse(p_name), 'e') AS INTEGER) END AS rindex_e,
             |  CASE WHEN contains(p_name, ' ') THEN regexp_extract(p_name, '^(.*)[ ]', 1) ELSE '' END AS rp_head,
             |  CASE WHEN contains(p_name, ' ') THEN ' ' ELSE '' END AS rp_sep,
             |  CASE WHEN contains(p_name, ' ') THEN string_split(p_name, ' ')[-1] ELSE p_name END AS rp_tail,
             |  CASE WHEN contains(p_name, ' ') THEN split_part(p_name, ' ', 1) ELSE p_name END AS lp_head,
             |  CASE WHEN contains(p_name, ' ')
             |       THEN regexp_extract(p_name, '^(.*)[ ]', 1)
             |       ELSE p_name END AS rsplit1_head,
             |  string_split(p_name, ' ')[-1] AS rsplit1_tail,
             |  CAST(CASE WHEN contains(p_name, ' ') THEN 2 ELSE 1 END AS INTEGER) AS rsplit1_n,
             |  substr(p_name, 1, 1) || 'X' || substr(p_name, 4) AS srepl_1_3,
             |  substr(p_name, 1, 2) || 'X' AS srepl_from2,
             |  'X' || substr(p_name, 3) AS srepl_to2,
             |  substr(p_name, 1, greatest(length(p_name) - 3, 0)) || 'X' AS srepl_neg,
             |  translate(p_brand,
             |    'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
             |    'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ') AS swapped
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // greedy word-wrap (WrapText): long-word chunking on single-token names,
    // identity when everything fits (reference tests/test_text.py:804).
    "q_str_wrap" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select(
            $"c_custkey",
            wrapText($"c_name", 10).as("wrap10"),
            wrapText($"c_name", 7).as("wrap7"),
            wrapText($"c_name", 100).as("wrap_fit"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  array_to_string(list_transform(
             |    range(1, CAST(length(c_name) AS BIGINT) + 1, 10),
             |    i -> substr(c_name, CAST(i AS INTEGER), 10)), chr(10)) AS wrap10,
             |  array_to_string(list_transform(
             |    range(1, CAST(length(c_name) AS BIGINT) + 1, 7),
             |    i -> substr(c_name, CAST(i AS INTEGER), 7)), chr(10)) AS wrap7,
             |  c_name AS wrap_fit
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // extractall: one row per regex match with its match index — the
    // row-expanding half of the regex surface (reference tests/test_text.py:466).
    "q_str_extractall" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .select($"c_custkey",
            posexplode(regexp_extract_all($"c_name", lit("[1-9]"), lit(0)))
              .as(Seq("match_idx", "m")))
          .orderBy($"c_custkey", $"match_idx")
      },
      Some("""SELECT c_custkey,
             |  CAST(unnest(range(len(regexp_extract_all(c_name, '[1-9]')))) AS INTEGER) AS match_idx,
             |  unnest(regexp_extract_all(c_name, '[1-9]')) AS m
             |FROM customer ORDER BY c_custkey, match_idx""".stripMargin)),

    // SQL-text entry point: the same engine surface reached through
    // spark.sql(...) with the graft_* functions registered in the session
    // registry (functions/SqlFunctions) — proves the SQL client path, not
    // just the Column DSL, under the oracle gate.
    "q_sql_text" -> Q(
      (s, dir) => {
        graft.functions.SqlFunctions.register(s)
        tbl(s, dir, "part").createOrReplaceTempView("graft_part_v")
        s.sql("""SELECT p_partkey,
                |  graft_count(p_name, 'a') AS cnt_a,
                |  graft_zfill(CAST(p_partkey AS STRING), 8) AS zk,
                |  graft_rfind(p_name, 'e') AS rf,
                |  graft_polyhash(p_type) AS ph
                |FROM graft_part_v ORDER BY p_partkey""".stripMargin)
      },
      Some(s"""SELECT p_partkey,
              |  CAST(length(p_name) - length(replace(p_name, 'a', ''))
              |       AS INTEGER) AS cnt_a,
              |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS zk,
              |  CASE WHEN instr(reverse(p_name), 'e') = 0 THEN -1
              |       ELSE CAST(length(p_name) - instr(reverse(p_name), 'e')
              |            AS INTEGER) END AS rf,
              |  ${DuckFrag.polyHashSql("p_type")} AS ph
              |FROM part ORDER BY p_partkey""".stripMargin)),

    // User-kernel extension surface end to end (reference's jitted
    // apply_binary_str pitch, string.py:1046-1119 + tests/test_text.py:
    // 967-984 prefix_length): BOTH spellings of the same user kernel —
    // the interpreted lambda (`prefixLengthLambda`, what a user writes
    // first) and its promoted static-Java + doGenCode form
    // (`prefixLength`) — run under one oracle, so the gate proves the
    // promotion preserved semantics, not just that each path returns
    // rows. Columns are ASCII, so the kernel's byte-wise LCP equals the
    // oracle's character-wise count (multi-byte divergence is pinned in
    // UdfSurfaceSpec). The %97 NULL injection pins the
    // validity-bitmap-AND null contract through the oracle too.
    "q_user_kernel" -> Q(
      (s, dir) => {
        import s.implicits._
        val typeOrNull =
          when($"p_partkey" % 97 === 0, lit(null)).otherwise($"p_type")
        val probe = concat(substring($"p_name", 1, 7), lit("##"))
        tbl(s, dir, "part").select(
            $"p_partkey",
            graft.functions.UdfSurface
              .prefixLength($"p_name", typeOrNull).as("lcp_promoted"),
            graft.functions.UdfSurface
              .prefixLengthLambda($"p_name", typeOrNull).as("lcp_lambda"),
            graft.functions.UdfSurface
              .prefixLength($"p_name", probe).as("lcp_probe"))
          .orderBy($"p_partkey")
      },
      Some {
        // NULL guard is mandatory: DuckDB's least() IGNORES NULL
        // arguments, so without it the NULL-injected rows would
        // evaluate range(1, length(a)+1) and emit 0 instead of the
        // kernel's (correct, validity-AND) NULL.
        def lcp(a: String, b: String) =
          s"""CASE WHEN $a IS NULL OR $b IS NULL THEN NULL
             |ELSE CAST(len(list_filter(
             |    range(1, least(length($a), length($b)) + 1),
             |    i -> substr($a, 1, CAST(i AS INTEGER)) =
             |         substr($b, 1, CAST(i AS INTEGER)))) AS INTEGER) END""".stripMargin
        s"""WITH p AS (
           |  SELECT p_partkey, p_name,
           |    CASE WHEN p_partkey % 97 = 0 THEN NULL ELSE p_type END AS t,
           |    substr(p_name, 1, 7) || '##' AS probe
           |  FROM part)
           |SELECT p_partkey,
           |  ${lcp("p_name", "t")} AS lcp_promoted,
           |  ${lcp("p_name", "t")} AS lcp_lambda,
           |  ${lcp("p_name", "probe")} AS lcp_probe
           |FROM p ORDER BY p_partkey""".stripMargin
      }),

    // get_dummies: token-indicator encoding over a '|'-delimited column
    // (reference tests/test_text.py:950). Dictionary derived from the data
    // (two-pass, pandas contract); indicator columns are named by token.
    "q_str_dummies" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Reshape.getDummies(
          tbl(s, dir, "documents")
            .withColumn("tags", concat_ws("|", $"lang", $"source")),
          col("tags"), "|", Seq(col("doc_id")))
          .orderBy($"doc_id")
      },
      Some {
        val cats = Seq("de", "en", "es", "fr", "zh") ++
          (0 until 20).map(i => s"src$i")
        val cols = cats.sorted.map(c =>
          s"""CASE WHEN lang = '$c' OR source = '$c' THEN 1 ELSE 0 END AS "$c"""")
        s"""SELECT doc_id, ${cols.mkString(", ")}
           |FROM documents ORDER BY doc_id""".stripMargin
      })
  )
}
