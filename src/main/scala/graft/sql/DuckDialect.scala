package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** DuckDB-dialect SQL surface: a source-to-source rewriter that lets a
  * user paste the reference engine's SQL and run it on Spark.
  *
  * The reference accepts the full DuckDB grammar (reference
  * `src/parser/parser.cpp:150-168` over the libpg_query grammar); Spark's
  * parser already covers most of it — probed on Spark 4.1.2: GROUP BY
  * ALL / ORDER BY ALL, agg FILTER (WHERE ...), ILIKE, `expr::type`
  * casts, and `SELECT * EXCEPT (...)` all parse natively and match
  * DuckDB's semantics. What remains is a small dialect delta, handled
  * here as token-level rewrites (never inside string literals, quoted
  * identifiers, or comments):
  *
  *   - `a // b`            → `a DIV b`        (truncating int division)
  *   - `* EXCLUDE (c, …)`  → `* EXCEPT (c, …)`
  *   - `* REPLACE (e AS c)`→ `* EXCEPT (c), e AS c` (column ORDER moves
  *     to the end — callers that need DuckDB's in-place position must
  *     re-project; value-wise identical)
  *   - `list_*` / `len` / `strpos` / `string_split` / `regexp_matches` /
  *     `printf` / `epoch` → the Spark builtin of the same semantics
  *     (rename applied only when the word is invoked as a function);
  *     `string_split`'s literal separator is regex-escaped because
  *     Spark's `split` takes a regex where DuckDB takes a plain string
  *   - `read_parquet('p')` → ``parquet.`p` `` (direct-path table scan)
  *   - FROM-first queries (`FROM t`, `FROM t SELECT c WHERE …`) →
  *     standard SELECT form, at every query-start position (CTE bodies,
  *     subqueries, set-op branches included)
  *   - `QUALIFY p`         → post-window filter via a subquery that
  *     computes `p` as a projected column (windows can't sit in WHERE)
  *   - `SELECT DISTINCT ON (e, …) … ORDER BY o` → `row_number() OVER
  *     (PARTITION BY e ORDER BY o) = 1` (the same recipe
  *     `Shaping.distinctOn` uses, reached from a SQL string)
  *
  * QUALIFY / DISTINCT ON are rewritten recursively inside every
  * parenthesized subquery and CTE body (innermost first), so they
  * compose with joins and WITH chains.
  *
  * Documented contracts (throw `GraftSqlException` where detectable):
  *   - QUALIFY with SELECT DISTINCT is unsupported (the injected helper
  *     column would change the dedup key).
  *   - DISTINCT ON requires an ORDER BY (DuckDB keeps an arbitrary row
  *     without one — nondeterministic, so we refuse rather than guess)
  *     and its ORDER BY must reference FROM-visible columns, not select
  *     aliases.
  *   - Fractional-to-integer casts diverge by engine (DuckDB rounds,
  *     Spark ANSI truncates) and are NOT rewritten — `round()` first for
  *     portable results (same note as `operators/EdgeQueries`).
  *   - `//` on FRACTIONAL operands also diverges: DuckDB floor-divides
  *     and returns DOUBLE, Spark's DIV truncates toward zero and returns
  *     BIGINT — negative fractional quotients differ by one. A
  *     fractional numeric LITERAL operand is detectable at token level
  *     and REFUSED (pointer: `floor(a / b)`); identifier operands pass
  *     through under the integer-only contract (pinned by
  *     `edge_intdiv_mod`).
  *   - Bracket list literals `[1, 2, 3]` and the `ARRAY[…]` constructor
  *     → Spark's `array(…)` constructor (nested literals included).
  *   - Struct literals `{'a': e}` → `named_struct('a', e)`; map literals
  *     `MAP {'k': v}` → `map('k', v)`. Struct field access (`s.a`)
  *     agrees verbatim; map subscript `m['k']` is VERSION-dependent on
  *     the DuckDB side (scalar on Spark; a single-element LIST on
  *     DuckDB ≤1.0, scalar from 1.1) — the subscript still passes
  *     through because refusing would break the dominant modern usage.
  *   - DuckDB list indexing `l[1]` is 1-based, Spark's 0-based — a
  *     positional subscript pasted from DuckDB would RUN and silently
  *     return the wrong element, so the translator THROWS on any
  *     subscript whose index is not a single string literal, pointing at
  *     `element_at` (1-based on Spark too). String-literal subscripts
  *     (`m['key']` map access) pass through: key-based, both engines
  *     agree. SCOPE: this interception exists on the `translate` surface
  *     only — SQL that is ALSO valid Spark syntax and reaches the
  *     injected session parser (`DuckFallbackParser`) without needing
  *     translation executes with Spark semantics; see that class's
  *     scaladoc.
  *   - QUALIFY predicates may reference select-list aliases (the
  *     dominant DuckDB idiom `… AS rn … QUALIFY rn = 1`): alias
  *     definitions are inlined into the predicate before it is projected,
  *     because Spark's lateral column alias resolution does not reach
  *     window expressions. One level of inlining — an alias whose
  *     definition references another select alias is not resolved.
  */
object DuckDialect {

  final class GraftSqlException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- tokens

  /** Token kinds: 0 ws, 1 comment, 2 string literal, 3 quoted ident,
    * 4 word, 5 number, 6 symbol. Text always round-trips verbatim. */
  private[sql] final case class Tok(kind: Int, text: String) {
    def isWs: Boolean = kind == 0 || kind == 1
    def word: String = if (kind == 4) text.toLowerCase else ""
    def is(sym: String): Boolean = kind == 6 && text == sym
  }
  private def ws(t: String) = Tok(0, t)
  private def word(t: String) = Tok(4, t)
  private def sym(t: String) = Tok(6, t)

  private val multiSyms =
    Seq("::", "//", "<=", ">=", "<>", "!=", "||", "->", "**")

  private[sql] def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) {
        val s = i; while (i < n && sql(i).isWhitespace) i += 1
        out += ws(sql.substring(s, i))
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val s = i; while (i < n && sql(i) != '\n') i += 1
        out += Tok(1, sql.substring(s, i))
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        val s = i; val e = sql.indexOf("*/", i + 2)
        i = if (e < 0) n else e + 2
        out += Tok(1, sql.substring(s, i))
      } else if (c == '\'') {
        val s = i; i += 1
        while (i < n && !(sql(i) == '\'' && (i + 1 >= n || sql(i + 1) != '\''))) {
          if (sql(i) == '\'' && i + 1 < n && sql(i + 1) == '\'') i += 2 else i += 1
        }
        i = math.min(i + 1, n)
        out += Tok(2, sql.substring(s, i))
      } else if (c == '"' || c == '`') {
        // doubled-quote escape (`""` / ```` ``` ````) stays inside the token
        val q = c; val s = i; i += 1
        while (i < n && !(sql(i) == q && (i + 1 >= n || sql(i + 1) != q))) {
          if (sql(i) == q && i + 1 < n && sql(i + 1) == q) i += 2 else i += 1
        }
        i = math.min(i + 1, n)
        out += Tok(3, sql.substring(s, i))
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Tok(4, sql.substring(s, i))
      } else if (c.isDigit) {
        val s = i
        while (i < n && (sql(i).isDigit || sql(i) == '.')) i += 1
        out += Tok(5, sql.substring(s, i))
      } else {
        multiSyms.find(m => sql.startsWith(m, i)) match {
          case Some(m) => out += sym(m); i += m.length
          case None    => out += sym(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  private def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  /** FINAL render only (the single exit of [[translate]]): convert each
    * string-literal token from DuckDB convention to Spark convention.
    * DuckDB treats backslash as an ordinary character inside '…' while
    * Spark's parser consumes it as an escape (probed: `'a\]b'` has
    * length 3 in Spark) — so every literal backslash doubles exactly
    * once here. All intermediate rewrites (which re-render spans and
    * re-tokenize replacements) therefore keep token text in DuckDB
    * convention: a synthesized regex literal holds ONE backslash per
    * regex-level backslash (see [[regexEscapeLiteral]],
    * [[globClassToRegex]]). Doubled quotes ('') parse identically on
    * both engines (probed) and pass through untouched. */
  private def renderFinal(toks: Seq[Tok]): String = toks.map { t =>
    if (t.kind == 2) t.text.replace("\\", "\\\\") else t.text
  }.mkString

  private def nextIdx(toks: Vector[Tok], from: Int): Int = {
    var j = from + 1
    while (j < toks.length && toks(j).isWs) j += 1
    j
  }
  private def prevIdx(toks: Vector[Tok], from: Int): Int = {
    var j = from - 1
    while (j >= 0 && toks(j).isWs) j -= 1
    j
  }

  /** Index of the `)` matching the `(` at `open` (same vector). */
  private def matching(toks: Vector[Tok], open: Int): Int = {
    var d = 0; var j = open
    while (j < toks.length) {
      if (toks(j).is("(")) d += 1
      else if (toks(j).is(")")) { d -= 1; if (d == 0) return j }
      j += 1
    }
    throw new GraftSqlException("unbalanced parentheses in SQL")
  }

  // ------------------------------------------------------- flat rewrites

  /** `//` → ` DIV ` (DuckDB truncating integer division; both engines
    * truncate toward zero on negatives — pinned by `edge_intdiv_mod`).
    * The rewrite is only correct for INTEGER operands: on fractional
    * operands DuckDB floor-divides returning DOUBLE while Spark's DIV
    * truncates toward zero returning BIGINT — negative quotients differ
    * by one. A fractional NUMERIC LITERAL on either side is detectable
    * at token level, so that case is refused loudly (pointer:
    * `floor(a / b)`); identifier operands can't be type-checked here and
    * pass through under the documented integer-only contract. */
  private def rewriteIntDiv(toks: Vector[Tok]): Vector[Tok] = {
    // A fractional literal reaches the tokenizer in three spellings:
    //   2.5   → num("2.5")                     (kind-5 with '.')
    //   .5    → sym(".") + num("5")
    //   1e3   → num("1") + word("e3")          (exponent ⇒ DOUBLE in SQL)
    // All three must refuse; a bare identifier like `e3` must not.
    val expWord = "^[eE][0-9]+$".r
    def isNum(j: Int) = j >= 0 && j < toks.length && toks(j).kind == 5
    def fractionalForward(j0v: Int): Boolean = { // operand starting at j0v
      var j0 = j0v // skip unary sign(s): `a // -2.5` is sym('-') + num('2.5')
      while (j0 < toks.length && (toks(j0).is("-") || toks(j0).is("+")))
        j0 = nextIdx(toks, j0)
      if (j0 >= toks.length) return false
      if (toks(j0).is(".")) return true // .5
      if (toks(j0).kind == 5) {
        if (toks(j0).text.contains(".")) return true // 2.5
        val after = j0 + 1 // exponent must be ADJACENT (no ws) to the digits
        if (after < toks.length && toks(after).kind == 4 &&
            expWord.matches(toks(after).text)) return true // 1e3
      }
      false
    }
    def fractionalBackward(jn: Int): Boolean = { // operand ending at jn
      if (jn < 0) return false
      if (toks(jn).kind == 5) {
        if (toks(jn).text.contains(".")) return true // 2.5
        if (jn - 1 >= 0 && toks(jn - 1).is(".")) return true // .5
      }
      if (toks(jn).kind == 4 && expWord.matches(toks(jn).text) &&
          isNum(jn - 1)) return true // 1e3
      false
    }
    toks.zipWithIndex.map { case (t, i) =>
      if (t.is("//")) {
        if (fractionalBackward(prevIdx(toks, i)) || fractionalForward(nextIdx(toks, i)))
          throw new GraftSqlException(
            "`//` on fractional operands diverges by engine (DuckDB floor-divides " +
              "returning DOUBLE; Spark DIV truncates toward zero returning BIGINT) — " +
              "use floor(a / b) for portable fractional floor division")
        word(" DIV ")
      } else t
    }
  }

  /** Function renames, applied only when invoked as `name(`. */
  private val fnRename = Map(
    "list_value" -> "array",
    "list_pack" -> "array",
    "list_contains" -> "array_contains",
    "list_has" -> "array_contains",
    // list_position/list_indexof → array_position: at DuckDB 1.0.0 (the
    // oracle's version) the semantics MATCH Spark's exactly — 1-based,
    // 0 on miss, NULL on NULL input (verified against the oracle:
    // `SELECT list_position([0,2,4], 1)` → 0). NULL-on-miss behavior
    // belongs to other DuckDB versions only; the reference implements it in
    // `src/function/scalar/list/contains_or_position.cpp`, whose
    // PositionFunctor::Initialize() == 0 leaves a miss at 0 with validity
    // intact — confirming 0-on-miss matches Spark. Result is INT on Spark
    // vs BIGINT on DuckDB — the verify gate compares values, not widths.
    "list_position" -> "array_position",
    "list_indexof" -> "array_position",
    "list_transform" -> "transform",
    "list_apply" -> "transform",
    "list_filter" -> "filter",
    "list_distinct" -> "array_distinct",
    // list_sort → array_sort (both default ASC NULLS LAST; Spark's
    // sort_array would put NULLs first). list_slice / list_prepend /
    // list_concat / list_reverse_sort differ STRUCTURALLY (inclusive
    // endpoints, argument order, NULL-as-empty, extra flag) — rewritten
    // in rewriteListFns, not renamed here.
    "list_sort" -> "array_sort",
    // unnest → explode: same one-level flattening in the select list AND
    // as a FROM-clause table function (Spark allows generators in FROM).
    // Caveats held by the engines' own loud errors, not silent change:
    // DuckDB ZIPS multiple unnests in one select list — Spark refuses
    // ("only one generator allowed"); auto column names differ ("unnest"
    // vs "col") — alias for portable output; unnest(recursive := true)
    // keeps its named argument and fails Spark's parse rather than
    // silently flattening one level.
    "unnest" -> "explode",
    // array_to_string is NOT a plain rename: empty list → NULL in DuckDB
    // vs '' in Spark's array_join — rewritten structurally in
    // rewriteListFns (probed; NULL elements are skipped by BOTH).
    "list_append" -> "array_append",
    "list_max" -> "array_max",
    "list_min" -> "array_min",
    "array_length" -> "size",
    "len" -> "length",
    "strpos" -> "instr",
    "regexp_matches" -> "regexp_like",
    "printf" -> "format_string",
    "epoch" -> "unix_timestamp",
    "str_split" -> "split",
    "string_split" -> "split",
    "string_to_array" -> "split",
    // arg_max/arg_min ≡ max_by/min_by: both engines return the arg at the
    // extremal value and ignore NULL ordering values (verified on the
    // 1.0.0 oracle and Spark 4.1.2 side by side). list_concat's
    // NULL-as-empty semantics are handled structurally in rewriteListFns.
    "arg_max" -> "max_by",
    "argmax" -> "max_by",
    "arg_min" -> "min_by",
    "argmin" -> "min_by",
    "starts_with" -> "startswith",
    "ends_with" -> "endswith")

  /** Separator-taking splits whose second argument is a plain string in
    * DuckDB but a regex in Spark: the literal gets regex-escaped. */
  private val plainSepFns = Set("str_split", "string_split", "string_to_array")

  private def regexEscapeLiteral(lit: String): String = {
    // lit includes the surrounding quotes; escape Java-regex metachars in
    // the body. Token text stays in DuckDB convention (backslash is an
    // ordinary character): ONE backslash per regex-level backslash here —
    // [[renderFinal]] doubles each for Spark's escape-processing parser,
    // so the parsed string Spark's regex engine sees is exactly the
    // intended regex. A literal backslash separator is the regex escape
    // \\ (two token characters).
    val body = lit.substring(1, lit.length - 1)
    val meta = ".[]{}()*+?^$|"
    val escaped = body.flatMap { ch =>
      if (ch == '\\') "\\\\"
      else if (meta.indexOf(ch) >= 0) "\\" + ch
      else ch.toString
    }
    "'" + escaped + "'"
  }

  /** List functions whose conventions DIFFER between the engines —
    * rewritten structurally rather than renamed (reference kernels:
    * `src/core_functions/scalar/list/` slice/concat/sort; every
    * semantic below probed on the 1.0.0 oracle):
    *
    *   - `list_slice(l, b, e)` — 1-based INCLUSIVE endpoints, negative
    *     = from-end (−1 = last), 0 clamps to the edge, out-of-range
    *     clamps, e<b → empty, any NULL argument → NULL (all probed on
    *     1.0.0). Same-sign integer literals keep the constant-folded
    *     fast path `slice(l, b, max(e-b+1, 0))`; everything else —
    *     non-literal, mixed-sign, zero endpoints — takes the GENERAL
    *     size-normalized form (round 16): endpoints normalize through
    *     `size(l)` (negative → L+x+1), clamp to [1, L], and the length
    *     is floored at 0 because a negative Spark slice length THROWS.
    *     The three arguments are bound ONCE via
    *     `transform(array(struct(...)), g -> ...)[0]` so
    *     non-deterministic endpoints evaluate exactly once (DuckDB's
    *     argument-evaluation contract) and nested dynamic slices stay
    *     linear in SQL size.
    *   - `list_prepend(e, l)` → `array_prepend(l, e)` (argument order
    *     swaps).
    *   - `list_concat(a, b)` — NULL operand = empty list, but NULL when
    *     BOTH are NULL; Spark concat is NULL-on-any-NULL. →
    *     `CASE WHEN (a) IS NULL AND (b) IS NULL THEN NULL ELSE
    *     concat(ifnull((a), array()), ifnull((b), array())) END`
    *     (arguments re-render twice; SQL expressions are pure).
    *   - `list_reverse_sort(l)` → `sort_array(l, false)` (both are
    *     DESC NULLS LAST — probed); the comparator/NULL-order overload
    *     stays untranslated.
    */
  private def rewriteListFns(toks: Vector[Tok]): Vector[Tok] = {
    // depth-1 comma-split argument spans of the call opening at `open`
    def argSpans(v: Vector[Tok], open: Int, close: Int): Vector[Vector[Tok]] = {
      val out = Vector.newBuilder[Vector[Tok]]
      var d = 0; var s = open + 1
      for (j <- open to close) {
        val t = v(j)
        if (t.is("(") || t.is("[") || t.is("{")) d += 1
        else if (t.is(")") || t.is("]") || t.is("}")) {
          d -= 1; if (d == 0) { out += v.slice(s, j) }
        }
        else if (d == 1 && t.is(",")) { out += v.slice(s, j); s = j + 1 }
      }
      out.result()
    }
    def intLit(span: Vector[Tok]): Option[Long] =
      span.filterNot(_.isWs) match {
        case Vector(n) if n.kind == 5 && n.text.forall(_.isDigit) =>
          Some(n.text.toLong)
        case Vector(m, n) if m.is("-") && n.kind == 5 && n.text.forall(_.isDigit) =>
          Some(-n.text.toLong)
        case _ => None
      }
    var v = toks
    var i = 0
    while (i < v.length) {
      val t = v(i)
      val isCall = t.kind == 4 && {
        val n = nextIdx(v, i); n < v.length && v(n).is("(")
      }
      if (isCall && Set("list_slice", "list_prepend", "list_concat",
          "list_reverse_sort", "array_to_string")(t.word)) {
        val open = nextIdx(v, i)
        val close = matching(v, open)
        val args = argSpans(v, open, close).map(a => render(a).trim)
        val spans = argSpans(v, open, close)
        val repl: Option[String] = t.word match {
          case "list_slice" if args.length == 3 =>
            (intLit(spans(1)), intLit(spans(2))) match {
              case (Some(b), Some(e)) if b.signum == e.signum && b != 0 && e != 0 =>
                Some(s"slice((${args(0)}), $b, ${math.max(e - b + 1, 0L)})")
              case _ =>
                // general size-normalized form (see scaladoc): pb/pe are
                // the clamped 1-based inclusive endpoints. The three
                // argument expressions are BOUND ONCE into a struct and
                // the arithmetic references the struct's fields (r16
                // advice: the previous spelling re-rendered each argument
                // up to 5×, which evaluates non-deterministic endpoints
                // inconsistently — DuckDB evaluates each argument once —
                // and grew nested dynamic slices ~5× per level).
                // transform(array(struct(...)), g -> ...)[0] is the
                // expression-level let-binding Spark SQL has.
                val (l, b, e) = (args(0), args(1), args(2))
                val pb = "greatest(CASE WHEN g.gb < 0 " +
                  "THEN size(g.gl) + g.gb + 1 ELSE g.gb END, 1)"
                val pe = "least(CASE WHEN g.ge < 0 " +
                  "THEN size(g.gl) + g.ge + 1 ELSE g.ge END, size(g.gl))"
                Some(s"transform(array(struct(($l) AS gl, ($b) AS gb, " +
                  s"($e) AS ge)), g -> CASE WHEN g.gl IS NULL OR " +
                  s"g.gb IS NULL OR g.ge IS NULL THEN NULL ELSE " +
                  s"slice(g.gl, $pb, greatest($pe - $pb + 1, 0)) END)[0]")
            }
          case "list_prepend" if args.length == 2 =>
            Some(s"array_prepend((${args(1)}), (${args(0)}))")
          case "list_concat" if args.length == 2 =>
            Some(s"(CASE WHEN (${args(0)}) IS NULL AND (${args(1)}) IS NULL " +
              s"THEN NULL ELSE concat(ifnull((${args(0)}), array()), " +
              s"ifnull((${args(1)}), array())) END)")
          case "list_reverse_sort" if args.length == 1 =>
            Some(s"sort_array((${args(0)}), false)")
          case "array_to_string" if args.length == 2 =>
            // DuckDB: empty list → NULL; Spark array_join: '' — guard
            // the empty case (size(NULL) is NULL → else-branch → NULL ✓;
            // NULL ELEMENTS are skipped identically by both engines)
            Some(s"(CASE WHEN size((${args(0)})) = 0 THEN NULL " +
              s"ELSE array_join((${args(0)}), (${args(1)})) END)")
          case _ => None
        }
        repl match {
          case Some(r) =>
            v = v.take(i) ++ tokenize(r) ++ v.drop(close + 1)
            // re-examine from i: the rendered args may contain nested
            // list_* calls that still need this rewrite
          case None => i += 1
        }
      } else i += 1
    }
    v
  }

  private def rewriteFunctions(toks: Vector[Tok]): Vector[Tok] = {
    val out = toks.toBuffer
    var i = 0
    while (i < out.length) {
      val t = out(i)
      // Bare VARCHAR type name (no length): Spark requires VARCHAR(n),
      // DuckDB treats bare VARCHAR as unbounded — map to STRING unless a
      // parenthesized length follows. (TEXT is NOT mapped: `text` is a
      // live column name in the documents fixture, and DuckDB users cast
      // with ::VARCHAR overwhelmingly.)
      if (t.kind == 4 && t.word == "varchar" &&
          !(nextIdx(out.toVector, i) < out.length && out(nextIdx(out.toVector, i)).is("("))) {
        out(i) = word("STRING")
      } else if (t.kind == 4 && fnRename.contains(t.word)) {
        val j = nextIdx(out.toVector, i)
        if (j < out.length && out(j).is("(")) {
          val orig = t.word
          out(i) = word(fnRename(orig))
          if (plainSepFns(orig)) {
            // regex-escape a literal separator (second argument)
            val v = out.toVector
            val close = matching(v, j)
            var d = 0; var k = j; var commaAt = -1
            while (k < close && commaAt < 0) {
              if (v(k).is("(")) d += 1
              else if (v(k).is(")")) d -= 1
              else if (v(k).is(",") && d == 1) commaAt = k
              k += 1
            }
            if (commaAt >= 0) {
              val a = nextIdx(v, commaAt)
              if (a < close && v(a).kind == 2 && nextIdx(v, a) == close)
                out(a) = Tok(2, regexEscapeLiteral(v(a).text))
            }
          }
        }
      }
      i += 1
    }
    out.toVector
  }

  /** C-style strftime format → JDK DateTimeFormatter pattern (reference
    * `src/core_functions/scalar/date/strftime.cpp` specifier table; JDK
    * side is what Spark's date_format/to_timestamp accept). None = a
    * specifier with no faithful JDK twin — caller refuses loudly. Bare
    * letters in literal text are JDK-quoted; embedded single quotes are
    * refused (nested quoting has no safe one-pass spelling). */
  private def strftimeToJdk(fmt: String): Option[String] = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val ch = fmt(i)
      if (ch == '%') {
        if (i + 1 >= fmt.length) return None
        val dash = fmt(i + 1) == '-' && i + 2 < fmt.length
        val tok = if (dash) s"-${fmt(i + 2)}" else fmt(i + 1).toString
        val mapped = tok match {
          case "Y" => "yyyy"; case "y" => "yy"; case "m" => "MM"
          case "d" => "dd"; case "H" => "HH"; case "I" => "hh"
          case "M" => "mm"; case "S" => "ss"; case "f" => "SSSSSS"
          case "g" => "SSS"; case "p" => "a"; case "j" => "DDD"
          case "a" => "EEE"; case "A" => "EEEE"; case "b" => "MMM"
          case "B" => "MMMM"; case "%" => "%"
          case "-d" => "d"; case "-m" => "M"; case "-H" => "H"
          case "-I" => "h"; case "-M" => "m"; case "-S" => "s"
          case "-j" => "D"
          case _ => return None
        }
        out ++= mapped
        i += (if (dash) 3 else 2)
      } else if (ch == '\'') return None
      else if (ch.isLetter) {
        // quote the whole literal-letter RUN: individually-quoted adjacent
        // letters ('o''k') would read as an escaped quote in JDK patterns
        val s = i
        while (i < fmt.length && fmt(i).isLetter && fmt(i) != '%') i += 1
        out += '\''; out ++= fmt.substring(s, i); out += '\''
      }
      else { out += ch; i += 1 }
    }
    Some(out.toString)
  }

  /** strftime/strptime with a LITERAL format → date_format/to_timestamp
    * with the converted JDK pattern. Non-literal or untranslatable
    * formats refuse loudly (a silently-different format string would be
    * the worst kind of wrong). The reference overloads BOTH argument
    * orders — (value, format) and (format, value), reference
    * strftime.cpp bind — so the format is the literal argument carrying
    * '%' specifiers; with two literal arguments the canonical last
    * position wins unless only the FIRST contains '%'. A format-first
    * call has its argument spans swapped so the Spark call reads
    * (value, format). */
  private def rewriteStrftime(toks: Vector[Tok]): Vector[Tok] = {
    val out = toks.toBuffer
    var i = 0
    while (i < out.length) {
      val t = out(i)
      if (t.kind == 4 && (t.word == "strftime" || t.word == "strptime")) {
        val v = out.toVector
        val open = nextIdx(v, i)
        if (open < v.length && v(open).is("(")) {
          val close = matching(v, open)
          // top-level commas, in order
          var d = 0; val commasB = Vector.newBuilder[Int]; var k = open
          while (k < close) {
            if (v(k).is("(")) d += 1
            else if (v(k).is(")")) d -= 1
            else if (v(k).is(",") && d == 1) commasB += k
            k += 1
          }
          val cs = commasB.result()
          // index of an argument span that is exactly ONE string literal
          def singleLit(afterTok: Int, endTok: Int): Int = {
            val a = nextIdx(v, afterTok)
            if (a < endTok && v(a).kind == 2 && nextIdx(v, a) == endTok) a
            else -1
          }
          val lastLit = if (cs.nonEmpty) singleLit(cs.last, close) else -1
          val firstLit = if (cs.length == 1) singleLit(open, cs.head) else -1
          def hasPct(idx: Int) = idx >= 0 && v(idx).text.contains("%")
          // format-first is a strftime-only overload: strptime's bind
          // takes the format from the LAST argument, always, and requires
          // it constant (reference strftime.cpp StrpTimeBindFunction
          // "strptime format must be a constant") — strptime('%fmt', s)
          // is an ERROR in the reference, so it refuses here too instead
          // of silently swapping
          val fmtAt =
            if (t.word == "strptime") lastLit
            else if (lastLit >= 0 && (firstLit < 0 || hasPct(lastLit) || !hasPct(firstLit)))
              lastLit
            else firstLit
          if (fmtAt < 0)
            throw new GraftSqlException(
              s"${t.text}: only a literal format string argument is " +
                "translatable — a non-literal format cannot be converted " +
                "to a Spark pattern at plan time")
          val raw = v(fmtAt).text
          val inner = raw.substring(1, raw.length - 1).replace("''", "'")
          strftimeToJdk(inner) match {
            case Some(jdk) =>
              out(i) = word(
                if (t.word == "strftime") "date_format" else "to_timestamp")
              out(fmtAt) = Tok(2, "'" + jdk.replace("'", "''") + "'")
              if (fmtAt == firstLit && fmtAt != lastLit) {
                // format-first overload: swap the two argument spans
                val comma = cs.head
                val fmtSpan = out.slice(open + 1, comma).toVector
                val valSpan = out.slice(comma + 1, close).toVector
                val rebuilt = valSpan ++ Vector(v(comma)) ++ fmtSpan
                var j = open + 1
                rebuilt.foreach { tk => out(j) = tk; j += 1 }
              }
            case None =>
              throw new GraftSqlException(
                s"${t.text}: format '$inner' uses a specifier with no " +
                  "faithful Spark pattern equivalent — reformat with " +
                  "date_format/to_timestamp directly")
          }
        }
      }
      i += 1
    }
    out.toVector
  }

  // ------------------------------------------------------------ macros

  /** SQL-text macros (reference `CREATE MACRO`,
    * `src/parser/parsed_data/create_macro_info.hpp`): DuckDB macros are
    * INLINED at bind time, so the faithful Spark-side treatment is
    * textual inlining before translation — no UDF, the expanded
    * expression stays inside whole-stage codegen. Registered via
    * [[registerSqlMacro]] (the `CREATE MACRO` statement face in
    * `DuckDml.exec` routes here); expansion is arity-checked,
    * parenthesizes every argument substitution (operator precedence
    * cannot leak), supports macro-in-macro bodies, and caps total
    * expansions to refuse cycles loudly.
    *
    * GLOBAL-STATE CONTRACT: the registry is PROCESS-GLOBAL (DuckDB's own
    * macro catalog is database-global, but this JVM may host many
    * sessions), so a registered macro changes `translate` results for
    * every caller until dropped — translation is order-dependent across
    * registrations. Callers that register macros for a bounded task
    * (tests, the `ducksql_macro_stmt` gate) must wrap the task in
    * [[withMacroScope]], which snapshots the registry and restores it on
    * exit so nothing leaks to unrelated sessions; [[clearSqlMacros]] is
    * the explicit full reset. Scopes are not isolated across THREADS —
    * concurrent scoped tasks registering the same macro name race, so
    * keep scoped names task-unique. */
  private val sqlMacros =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], Vector[Tok])]()

  def registerSqlMacro(name: String, params: Seq[String], bodySql: String): Unit =
    sqlMacros.put(name.toLowerCase,
      (params.map(_.toLowerCase), tokenize(bodySql)))

  def dropSqlMacro(name: String): Unit = sqlMacros.remove(name.toLowerCase)

  /** Remove every registered macro — the explicit global reset. */
  def clearSqlMacros(): Unit = sqlMacros.clear()

  /** Run `f` with the current macro registry snapshotted and restored on
    * exit: registrations made inside the scope (and drops of pre-existing
    * macros) are undone, whether `f` returns or throws. */
  def withMacroScope[T](f: => T): T = {
    val snapshot = new java.util.HashMap[String, (Seq[String], Vector[Tok])](sqlMacros)
    try f
    finally { sqlMacros.clear(); sqlMacros.putAll(snapshot) }
  }

  /** ATTACH registry (reference `ATTACH 'file.db' AS name` + `name.table`
    * qualified resolution): alias → fixture DIRECTORY. The `DuckDml`
    * ATTACH statement registers the alias (and creates one temp view per
    * table, named `<alias>__<table>`); [[rewriteAttachedRefs]] rewrites
    * every `alias.table` qualified reference to that flat view name, so
    * pasted cross-catalog SQL resolves. Same process-global contract as
    * [[sqlMacros]] — bound uses via [[withAttachScope]]. A query-local
    * TABLE alias shadowing an attached catalog name is the caller's
    * collision to avoid (DuckDB has the same ambiguity). */
  private val attachedCatalogs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerAttachment(alias: String, dir: String): Unit =
    attachedCatalogs.put(alias.toLowerCase, dir)

  def removeAttachment(alias: String): Option[String] =
    Option(attachedCatalogs.remove(alias.toLowerCase))

  def attachmentDir(alias: String): Option[String] =
    Option(attachedCatalogs.get(alias.toLowerCase))

  /** Snapshot/restore the ATTACH registry around `f`. */
  def withAttachScope[T](f: => T): T = {
    val snap = new java.util.HashMap[String, String](attachedCatalogs)
    try f
    finally { attachedCatalogs.clear(); attachedCatalogs.putAll(snap) }
  }

  /** `alias.table` → `alias__table` for registered attachments. */
  private def rewriteAttachedRefs(toks0: Vector[Tok]): Vector[Tok] = {
    if (attachedCatalogs.isEmpty) return toks0
    val v = toks0
    val b = Vector.newBuilder[Tok]
    var i = 0
    while (i < v.length) {
      val t = v(i)
      val n1 = nextIdx(v, i)
      val n2 = if (n1 < v.length) nextIdx(v, n1) else v.length
      if (t.kind == 4 && attachedCatalogs.containsKey(t.word) &&
          n1 < v.length && v(n1).is(".") && n2 < v.length && v(n2).kind == 4) {
        b += Tok(4, s"${t.word}__${v(n2).word}")
        i = n2 + 1
      } else { b += t; i += 1 }
    }
    b.result()
  }

  private def rewriteMacros(toks0: Vector[Tok]): Vector[Tok] = {
    if (sqlMacros.isEmpty) return toks0
    var toks = toks0
    var expansions = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val mac = if (t.kind == 4) sqlMacros.get(t.word) else null
      val open = if (mac != null) nextIdx(toks, i) else -1
      if (mac != null && open < toks.length && open >= 0 && toks(open).is("(")) {
        expansions += 1
        if (expansions > 100)
          throw new GraftSqlException(
            s"macro expansion exceeded 100 substitutions at '${t.text}' — " +
              "cyclic macro definitions?")
        val close = matching(toks, open)
        // split top-level args
        val b = Vector.newBuilder[Vector[Tok]]
        var d = 0; var s = open + 1; var j = open + 1
        while (j < close) {
          if (toks(j).is("(") || toks(j).is("[")) d += 1
          else if (toks(j).is(")") || toks(j).is("]")) d -= 1
          else if (d == 0 && toks(j).is(",")) { b += toks.slice(s, j); s = j + 1 }
          j += 1
        }
        if (close > open + 1) b += toks.slice(s, close)
        val rawArgs = b.result()
        if (rawArgs.exists(_.forall(_.isWs)))
          throw new GraftSqlException(
            s"empty argument in macro call '${t.text}'")
        val (params, body) = (mac._1, mac._2)
        if (rawArgs.length != params.length)
          throw new GraftSqlException(
            s"macro '${t.text}' expects ${params.length} argument(s), " +
              s"got ${rawArgs.length}")
        val byParam = params.zip(rawArgs).toMap
        val expanded = Vector.newBuilder[Tok]
        expanded += sym("(")
        body.foreach { bt =>
          byParam.get(bt.word) match {
            case Some(arg) if bt.kind == 4 =>
              expanded += sym("("); expanded ++= arg; expanded += sym(")")
            case _ => expanded += bt
          }
        }
        expanded += sym(")")
        toks = toks.take(i) ++ expanded.result() ++ toks.drop(close + 1)
        // re-scan from i: the body may itself call macros
      } else i += 1
    }
    toks
  }

  /** Loud refusals for the DuckDB grammar tail this translator does not
    * cover (reference parser surface:
    * `src/parser/transform/expression`, `.../statement`): each construct
    * would otherwise fall through to a bare Spark ParseException (or,
    * worse, parse with different semantics). The contract is FAIL
    * LOUDLY, NEVER SILENTLY WRONG — every message names the construct
    * and the Spark-side alternative. */
  private def refuseUnsupported(toks: Vector[Tok]): Vector[Tok] = {
    val first = toks.find(!_.isWs).map(_.word).getOrElse("")
    if (first == "summarize")
      throw new GraftSqlException(
        "SUMMARIZE needs the source schema, which string translation cannot " +
          "see — execute it via DuckDialect.run (expands to a one-pass " +
          "per-column aggregate, Summarize.scala), or use describe()/summary() " +
          "on the DataFrame")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // ENUM functions (reference `src/core_functions/scalar/enum/
      // enum_functions.cpp`) operate on DuckDB's ENUM logical type, which
      // Spark (and the parquet fixtures) do not have — refuse with the
      // modeling alternative rather than letting Spark raise a bare
      // "undefined function".
      if (t.kind == 4 && t.word.startsWith("enum_") &&
          { val n = nextIdx(toks, i); n < toks.length && toks(n).is("(") })
        throw new GraftSqlException(
          s"${t.text} is unsupported — Spark has no ENUM type; model enums " +
            "as STRING and use array_position(array('a','b',…), col) for " +
            "codes, or a dimension table for the value set")
      // UNION-type functions (reference `src/function/scalar/union/` —
      // union_value/union_extract/union_tag over DuckDB's tagged-union
      // logical type): Spark has no UNION type; refuse with the modeling
      // alternative (the struct-of-nullable-fields + tag column every
      // Spark schema uses for sum types).
      if (t.kind == 4 && (t.word == "union_value" || t.word == "union_extract" ||
          t.word == "union_tag") &&
          { val n = nextIdx(toks, i); n < toks.length && toks(n).is("(") })
        throw new GraftSqlException(
          s"${t.text} is unsupported — Spark has no UNION (tagged sum) type; " +
            "model it as STRUCT<tag: STRING, <member>: <type> …> with one " +
            "nullable field per member: union_tag(u) → u.tag, " +
            "union_extract(u, 'm') → u.m, union_value(m := x) → " +
            "named_struct('tag', 'm', 'm', x)")
      // POSITIONAL JOIN pairs rows by file/insertion ORDER — a property a
      // distributed scan does not preserve, so a silent translation via
      // row numbers would pair DIFFERENT rows run to run. The DataFrame
      // API form (Joins.positionalJoin, `join_positional`) states its
      // ordering columns explicitly.
      if (t.kind == 4 && t.word == "positional" &&
          { val n = nextIdx(toks, i); n < toks.length && toks(n).word == "join" })
        throw new GraftSqlException(
          "POSITIONAL JOIN is unsupported in SQL — row order is not a stable " +
            "property of a distributed scan; use Joins.positionalJoin with an " +
            "explicit ordering column (join_positional shows the recipe)")
      // COLUMNS(*) / COLUMNS('regex') star expressions (reference
      // `src/parser/transform/expression/transform_columnref.cpp`)
      // expand against the schema at bind time. Both session-aware faces
      // expand them (DuckDialect.run via the fixture catalog; translate
      // via the active session's catalog) — reaching here means neither
      // could resolve a schema.
      if (t.kind == 4 && t.word == "columns" &&
          { val n = nextIdx(toks, i); n < toks.length && toks(n).is("(") })
        throw new GraftSqlException(
          "COLUMNS(...) star expressions need a schema: run through " +
            "DuckDialect.run(spark, dir, sql), or call translate with an " +
            "active session whose catalog resolves the statement's table " +
            "(temp view) — sessionless text translation cannot know the " +
            "matched column set")
      // LIMIT n PERCENT needs the input cardinality — DuckDialect.run
      // strips a trailing depth-0 clause before translation, so any form
      // that reaches here (nested, or translate() called directly) must
      // refuse rather than hand Spark an unparseable `%`.
      if (t.kind == 4 && t.word == "limit") {
        val n1 = nextIdx(toks, i)
        val n2 = if (n1 < toks.length) nextIdx(toks, n1) else toks.length
        if (n1 < toks.length && toks(n1).kind == 5 && n2 < toks.length &&
            (toks(n2).is("%") || toks(n2).word == "percent"))
          throw new GraftSqlException(
            "LIMIT n PERCENT needs the input row count — supported only as " +
              "the statement's OUTERMOST trailing clause via DuckDialect.run " +
              "(count-then-limit), not in subqueries")
      }
      // DML RETURNING is a statement-level face, not a query rewrite: the
      // affected-row set comes from the GraftTable manifest diff, so the
      // SQL spelling lives on DuckDml.execReturning (reference
      // `physical_insert.cpp` RETURNING). translate() alone cannot run
      // the mutation — point at the face that can.
      if (t.kind == 4 && t.word == "returning" &&
          (first == "insert" || first == "update" || first == "delete"))
        throw new GraftSqlException(
          "INSERT/UPDATE/DELETE ... RETURNING is a DML statement — run it " +
            "through DuckDml.execReturning(spark, tables, sql), which " +
            "executes the mutation and returns the affected rows")
      i += 1
    }
    toks
  }

  /** DuckDB struct and map literals → Spark constructors (reference
    * grammar: `src/parser/transform/expression/transform_constant.cpp`
    * struct/map literal rules):
    *
    *   `{'a': e1, 'b': e2}`      → `named_struct('a', e1, 'b', e2)`
    *   `MAP {'k1': v1, 'k2': v2}` → `map('k1', v1, 'k2', v2)`
    *
    * Field access then agrees verbatim on both engines: `s.a` for
    * structs, `m['k']` for maps. Keys must be string literals (DuckDB's
    * own literal form); anything else inside braces is refused loudly.
    * Nested literals rewrite naturally — the loop re-examines inner
    * braces after the outer rewrite. */
  private def rewriteBraces(toks: Vector[Tok]): Vector[Tok] = {
    val out = toks.toBuffer
    var i = 0
    while (i < out.length) {
      if (out(i).is("{")) {
        // matching close brace (nesting over every bracket family)
        var d = 0; var j = i; var close = -1
        while (j < out.length && close < 0) {
          val tj = out(j)
          if (tj.is("{") || tj.is("(") || tj.is("[")) d += 1
          else if (tj.is("}") || tj.is(")") || tj.is("]")) { d -= 1; if (d == 0) close = j }
          j += 1
        }
        if (close < 0 || !out(close).is("}"))
          throw new GraftSqlException("unbalanced { } in SQL")
        // validate + rewrite depth-1 `key : value` items
        var k = i + 1; var depth = 1; var expectKey = true
        while (k < close) {
          val tk = out(k)
          if (tk.is("{") || tk.is("(") || tk.is("[")) depth += 1
          else if (tk.is("}") || tk.is(")") || tk.is("]")) depth -= 1
          else if (depth == 1 && expectKey && !tk.isWs) {
            if (tk.kind != 2)
              throw new GraftSqlException(
                "struct/map literal keys must be string literals, got " +
                  s"`${tk.text}` — write {'key': value}")
            expectKey = false
          } else if (depth == 1 && tk.is(":")) {
            out(k) = sym(",") // key : value → key , value
            // skip the value until the next depth-1 comma
            var v = k + 1; var dv = 1
            while (v < close && !(dv == 1 && out(v).is(","))) {
              if (out(v).is("{") || out(v).is("(") || out(v).is("[")) dv += 1
              else if (out(v).is("}") || out(v).is(")") || out(v).is("]")) dv -= 1
              v += 1
            }
            k = v // lands on the separating comma (or close)
            expectKey = true
          }
          k += 1
        }
        val p = prevIdx(out.toVector, i)
        if (p >= 0 && out(p).word == "map") {
          out(close) = sym(")")
          out(i) = sym("(")
          out(p) = word("map")
        } else {
          out(close) = sym(")")
          out(i) = sym("(")
          out.insert(i, word("named_struct"))
        }
      }
      i += 1
    }
    out.toVector
  }

  /** SQL keywords that can directly precede an expression: a `[` after
    * one of these is a bracket LIST LITERAL (`SELECT [1,2,3]`), never a
    * subscript — identifiers can't be unquoted keywords. */
  private val exprLeadKeywords = Set(
    "select", "where", "when", "then", "else", "and", "or", "not", "in",
    "as", "on", "having", "by", "all", "distinct", "case", "end", "between",
    "like", "ilike", "is", "limit", "offset", "values", "set", "returning",
    "union", "intersect", "except", "array")

  /** Bracket handling, one pass, two behaviors (scope: the TRANSLATE
    * surface only — see DuckFallbackParser for the injected-parser
    * caveat):
    *
    *  - LIST LITERALS — a `[` at expression-lead position (start of
    *    statement, after `(`/`,`/an operator symbol, or after an
    *    expression-leading keyword, incl. the `ARRAY[…]` spelled
    *    constructor) → rewritten to Spark's `array(…)` constructor
    *    (DuckDB `[1,2,3]` and `ARRAY[1,2,3]` are both exactly that,
    *    reference third_party/libpg_query a_expr list rules). Nested
    *    literals rewrite naturally: after the outer `[` becomes
    *    `array(`, an inner `[` sits after `(` or `,` — literal position
    *    again.
    *
    *  - POSITIONAL SUBSCRIPTS — DuckDB subscripts are 1-based (`l[1]` is
    *    the FIRST element; `l[1:2]` slices); Spark's bracket subscript
    *    is 0-based, so a pasted DuckDB subscript would RUN and return
    *    the wrong element with no warning — previously the translator's
    *    only silent-corruption path. Refuse loudly instead, except the
    *    agreeing form: a single string-literal index (`m['key']` map
    *    access — key-based, identical semantics on both engines).
    */
  private def rewriteBrackets(toks: Vector[Tok]): Vector[Tok] = {
    val out = toks.toBuffer
    // index of the `]` matching the `[` at `open`
    def closing(open: Int): Int = {
      var d = 0; var j = open
      while (j < out.length) {
        if (out(j).is("[")) d += 1
        else if (out(j).is("]")) { d -= 1; if (d == 0) return j }
        j += 1
      }
      throw new GraftSqlException("unbalanced [ ] in SQL")
    }
    var i = 0
    while (i < out.length) {
      if (out(i).is("[")) {
        val v = out.toVector
        val p = prevIdx(v, i)
        val isLiteral = p < 0 || out(p).is("(") || out(p).is("[") ||
          out(p).is(",") ||
          (out(p).kind == 6 && !out(p).is(")") && !out(p).is("]")) ||
          exprLeadKeywords(out(p).word)
        val isSubscript = !isLiteral && p >= 0 &&
          (out(p).kind == 3 || out(p).kind == 4 || out(p).is(")") || out(p).is("]"))
        if (isLiteral) {
          val close = closing(i)
          // list COMPREHENSION `[expr FOR x IN list (IF pred)?]` — the
          // literal single-variable form translates structurally
          // (reference src/parser/transform/expression/ parses it into
          // exactly list_transform(list_filter(...)); probed on DuckDB
          // 1.0.0: the IF clause filters FIRST, then the expr maps):
          //   [e FOR x IN l]      → transform(l, x -> e)
          //   [e FOR x IN l IF p] → transform(filter(l, x -> p), x -> e)
          // Nested comprehensions in e/l rewrite naturally on later
          // iterations (the scanner does not advance past the
          // replacement). Non-literal variable forms refuse loudly.
          var d2 = 0; var k = i
          var kFor = -1
          while (k < close && kFor < 0) {
            if (out(k).is("[") || out(k).is("(")) d2 += 1
            else if (out(k).is("]") || out(k).is(")")) d2 -= 1
            else if (d2 == 1 && out(k).word == "for") kFor = k
            k += 1
          }
          if (kFor >= 0) {
            val refusal = new GraftSqlException(
              "only single-variable list comprehensions `[e FOR x IN l (IF p)?]` " +
                "translate — rewrite others as transform(l, x -> e) / filter(l, p)")
            val varIdx = nextIdx(v, kFor)
            if (varIdx >= close || v(varIdx).kind != 4 ||
                exprLeadKeywords(v(varIdx).word)) throw refusal
            val inIdx = nextIdx(v, varIdx)
            if (inIdx >= close || v(inIdx).word != "in") throw refusal
            // depth-1 IF / second FOR between the list expr and `]`
            var d3 = 0; var m = inIdx + 1
            var kIf = -1
            while (m < close) {
              if (v(m).is("[") || v(m).is("(")) d3 += 1
              else if (v(m).is("]") || v(m).is(")")) d3 -= 1
              else if (d3 == 0 && v(m).word == "for") throw refusal
              else if (d3 == 0 && kIf < 0 && v(m).word == "if") kIf = m
              m += 1
            }
            def trimWs(ts: Vector[Tok]): Vector[Tok] =
              ts.dropWhile(_.isWs).reverse.dropWhile(_.isWs).reverse
            val exprToks = trimWs(v.slice(i + 1, kFor))
            val listToks = trimWs(v.slice(inIdx + 1, if (kIf >= 0) kIf else close))
            val varTok = v(varIdx)
            val lambda = Vector(sym(","), ws(" "), varTok, ws(" "),
              sym("->"), ws(" "))
            val repl: Vector[Tok] =
              if (kIf < 0)
                Vector(word("transform"), sym("(")) ++ listToks ++
                  lambda ++ exprToks ++ Vector(sym(")"))
              else {
                val predToks = trimWs(v.slice(kIf + 1, close))
                Vector(word("transform"), sym("("), word("filter"),
                  sym("(")) ++ listToks ++ lambda ++ predToks ++
                  Vector(sym(")")) ++ lambda ++ exprToks ++ Vector(sym(")"))
              }
            out.remove(i, close - i + 1)
            out.insertAll(i, repl)
            // fall through without marking literal parens: the scanner
            // re-examines from i (now `transform`) and will translate any
            // nested brackets inside the spliced expr/list tokens.
          } else {
            out(close) = sym(")")
            if (p >= 0 && out(p).word == "array") {
              out(i) = sym("(")      // ARRAY[…] → array(…): keep the word,
              out(p) = word("array") // normalize case for readability
            } else {
              out(i) = sym("(")
              out.insert(i, word("array"))
            }
            // do NOT advance past i: the inserted tokens shift indices and
            // the next iteration re-examines from the constructor onward.
          }
        } else if (isSubscript) {
          val close = closing(i)
          val inner = v.slice(i + 1, close).filterNot(_.isWs)
          val isMapKey = inner.length == 1 && inner.head.kind == 2
          if (!isMapKey)
            throw new GraftSqlException(
              "DuckDB positional list subscripts are 1-based but Spark's are 0-based; " +
                s"refusing `${render(v.slice(p, close + 1)).trim}` — use element_at(list, n) " +
                "(1-based on Spark too); string-keyed map subscripts pass through")
        }
      }
      i += 1
    }
    out.toVector
  }

  /** `* EXCLUDE (…)` → `* EXCEPT (…)`; DuckDB also allows the
    * single-column paren-less form `* EXCLUDE col` — Spark requires the
    * parens, so they are added. */
  private def rewriteExclude(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      val p = prevIdx(v, i)
      if (v(i).kind == 4 && v(i).word == "exclude" && p >= 0 && v(p).is("*")) {
        val n = nextIdx(v, i)
        if (n < v.length && v(n).is("(")) v = v.updated(i, word("EXCEPT"))
        else if (n < v.length && (v(n).kind == 4 || v(n).kind == 3))
          v = v.take(i) ++ Vector(word("EXCEPT"), sym("("), v(n), sym(")")) ++ v.drop(n + 1)
        else v = v.updated(i, word("EXCEPT"))
      }
      i += 1
    }
    v
  }

  /** `* REPLACE (e1 AS c1, …)` → `* EXCEPT (c1, …), e1 AS c1, …`. */
  private def rewriteReplace(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      val t = v(i)
      val p = prevIdx(v, i)
      if (t.kind == 4 && t.word == "replace" && p >= 0 && v(p).is("*")) {
        val open = nextIdx(v, i)
        if (open >= v.length || !v(open).is("("))
          throw new GraftSqlException("* REPLACE must be followed by (expr AS col, ...)")
        val close = matching(v, open)
        // split items at depth-1 commas
        val items = Vector.newBuilder[Vector[Tok]]
        var d = 0; var s = open + 1; var k = open
        while (k <= close) {
          if (v(k).is("(")) d += 1
          else if (v(k).is(")")) { d -= 1; if (d == 0) { items += v.slice(s, k) } }
          else if (v(k).is(",") && d == 1) { items += v.slice(s, k); s = k + 1 }
          k += 1
        }
        val parsed = items.result().map { item =>
          val asAt = item.lastIndexWhere(x => x.kind == 4 && x.word == "as")
          if (asAt < 0)
            throw new GraftSqlException("* REPLACE items must be `expr AS col`")
          val col = item.drop(asAt + 1).filterNot(_.isWs)
          if (col.length != 1)
            throw new GraftSqlException("* REPLACE target must be a single column name")
          (item.take(asAt), col.head)
        }
        val cols = parsed.map(_._2)
        val repl = Vector.newBuilder[Tok]
        repl += word("EXCEPT"); repl += ws(" "); repl += sym("(")
        cols.zipWithIndex.foreach { case (c, ix) =>
          if (ix > 0) { repl += sym(","); repl += ws(" ") }
          repl += c
        }
        repl += sym(")")
        parsed.foreach { case (expr, c) =>
          repl += sym(","); repl += ws(" ")
          repl ++= expr
          repl += ws(" "); repl += word("AS"); repl += ws(" "); repl += c
        }
        v = v.take(i) ++ repl.result() ++ v.drop(close + 1)
      }
      i += 1
    }
    v
  }

  /** `f(x IGNORE NULLS)` / `f(x RESPECT NULLS)` → `f(x) IGNORE NULLS` —
    * DuckDB puts the null-treatment clause inside the window function's
    * argument list, Spark after it. */
  private def rewriteIgnoreNulls(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      if (v(i).kind == 4 && (v(i).word == "ignore" || v(i).word == "respect")) {
        val n = nextIdx(v, i)
        if (n < v.length && v(n).word == "nulls") {
          val close = nextIdx(v, n)
          if (close < v.length && v(close).is(")")) {
            val kw = if (v(i).word == "ignore") "IGNORE" else "RESPECT"
            v = v.take(i).dropRight(0) ++ v.slice(close, close + 1) ++
              Vector(ws(" "), word(kw), ws(" "), word("NULLS")) ++ v.drop(close + 1)
            // note: tokens between i and close (the removed words + ws) are dropped
          }
        }
      }
      i += 1
    }
    v
  }

  /** `read_parquet('p')` → ``parquet.`p` `` — Spark's direct-path scan
    * keeps pushdown/pruning (same DataSource as the catalog reads). */
  private def rewriteReadParquet(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      if (v(i).kind == 4 && v(i).word == "read_parquet") {
        val open = nextIdx(v, i)
        if (open < v.length && v(open).is("(")) {
          val close = matching(v, open)
          val args = v.slice(open + 1, close).filterNot(_.isWs)
          if (args.length == 1 && args.head.kind == 2) {
            val path = args.head.text.substring(1, args.head.text.length - 1)
            v = v.take(i) ++ Vector(word("parquet"), sym("."), Tok(3, "`" + path + "`")) ++ v.drop(close + 1)
          }
        }
      }
      i += 1
    }
    v
  }

  /** `a ASOF [LEFT] JOIN b ON eq… AND ineq` → `a [LEFT] JOIN LATERAL
    * (SELECT b.* FROM b WHERE eq… AND ineq ORDER BY <right-side expr>
    * DESC|ASC LIMIT 1) b` — Spark 4 decorrelates lateral subqueries
    * with ORDER BY + LIMIT (probed), giving exact as-of semantics: the
    * nearest right row per left row under the inequality.
    *
    * COMPATIBILITY SURFACE, not the scale path: Spark decorrelates this
    * into a domain join — DISTINCT outer order-keys × right side through
    * a BroadcastNestedLoopJoin on the inequality, then a WindowGroupLimit
    * top-1 (verified via executedPlan) — which is O(|distinct keys| ×
    * |right|) when the order key is high-cardinality. `Joins.joinAsof`'s
    * union+window recipe is the plan you want on big inputs (one shuffle,
    * no domain product); this rewrite exists so pasted DuckDB ASOF SQL
    * runs correctly. Contract: exactly one inequality conjunct in ON,
    * with the right table's side qualified by its alias; ASOF RIGHT/FULL
    * are refused (DuckDB supports them; a faithful lateral form needs
    * the mirrored query — use the DataFrame recipe). */
  private def rewriteAsof(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      if (v(i).kind == 4 && v(i).word == "asof") {
        var j = nextIdx(v, i)
        var left = false
        if (j < v.length && (v(j).word == "left" || v(j).word == "inner")) {
          left = v(j).word == "left"; j = nextIdx(v, j)
        } else if (j < v.length && (v(j).word == "right" || v(j).word == "full")) {
          throw new GraftSqlException(
            "ASOF RIGHT/FULL are translated only in the canonical single-join " +
              "shape (AsofRewrite); outside it use the Joins.asofJoinRight / " +
              "asofJoinFull DataFrame recipes")
        }
        if (j >= v.length || v(j).word != "join")
          throw new GraftSqlException("ASOF must be followed by [LEFT|INNER] JOIN")
        // right-side relation: `( … ) [AS] alias` or `name [[AS] alias]`
        var k = nextIdx(v, j)
        val refStart = k
        var alias: Tok = null
        if (v(k).is("(")) {
          k = matching(v, k)
          var a = nextIdx(v, k)
          if (a < v.length && v(a).word == "as") a = nextIdx(v, a)
          if (a >= v.length || v(a).kind != 4)
            throw new GraftSqlException("ASOF JOIN subquery right side needs an alias")
          alias = v(a); k = a
        } else if (v(k).kind == 4) {
          alias = v(k)
          var a = nextIdx(v, k)
          if (a < v.length && v(a).word == "as") {
            a = nextIdx(v, a); alias = v(a); k = a
          } else if (a < v.length && v(a).kind == 4 && v(a).word != "on") {
            alias = v(a); k = a
          }
        } else throw new GraftSqlException("unsupported ASOF JOIN right side")
        val refEnd = k + 1 // exclusive
        val onAt = nextIdx(v, k)
        if (onAt >= v.length || v(onAt).word != "on")
          throw new GraftSqlException("ASOF JOIN requires an ON clause")
        // condition span: to the next depth-0 clause/join keyword, comma,
        // or the `)` closing our enclosing scope
        val term = Set("where", "group", "having", "order", "limit", "offset",
          "union", "intersect", "except", "qualify", "window",
          "join", "inner", "left", "right", "full", "cross", "asof")
        var d = 0; var e = onAt + 1; var stop = -1
        while (e < v.length && stop < 0) {
          val t = v(e)
          if (t.is("(")) d += 1
          else if (t.is(")")) { d -= 1; if (d < 0) stop = e }
          else if (d == 0 && ((t.kind == 4 && term(t.word)) || t.is(","))) stop = e
          if (stop < 0) e += 1
        }
        val condEnd = if (stop < 0) v.length else stop
        val cond = v.slice(onAt + 1, condEnd)
        // locate THE inequality conjunct (split at depth-0 ANDs)
        val conjuncts = {
          val out = Vector.newBuilder[Vector[Tok]]
          var cd = 0; var s = 0
          for (x <- cond.indices) {
            if (cond(x).is("(")) cd += 1
            else if (cond(x).is(")")) cd -= 1
            else if (cd == 0 && cond(x).kind == 4 && cond(x).word == "and") {
              out += cond.slice(s, x); s = x + 1
            }
          }
          out += cond.slice(s, cond.length)
          out.result()
        }
        val ineqOps = Set(">=", "<=", ">", "<")
        def splitIneq(c: Vector[Tok]): Option[(Vector[Tok], String, Vector[Tok])] = {
          var cd = 0
          for (x <- c.indices) {
            if (c(x).is("(")) cd += 1
            else if (c(x).is(")")) cd -= 1
            else if (cd == 0 && c(x).kind == 6 && ineqOps(c(x).text))
              return Some((c.take(x), c(x).text, c.drop(x + 1)))
          }
          None
        }
        val ineqs = conjuncts.flatMap(splitIneq(_).toSeq)
        if (ineqs.length != 1)
          throw new GraftSqlException(
            s"ASOF JOIN ON must contain exactly one inequality conjunct (found ${ineqs.length})")
        val (lhs, op, rhs) = ineqs.head
        def refsAlias(ts: Vector[Tok]): Boolean =
          ts.indices.exists(x => ts(x).kind == 4 && ts(x).word == alias.word &&
            nextIdx(ts, x) < ts.length && ts(nextIdx(ts, x)).is("."))
        val (ord, ordOnLhs) =
          (refsAlias(lhs), refsAlias(rhs)) match {
            case (true, false) => (lhs, true)
            case (false, true) => (rhs, false)
            case _ => throw new GraftSqlException(
              s"ASOF inequality must reference the right table (${alias.text}) on exactly one side, alias-qualified")
          }
        val desc = (ordOnLhs && (op == "<=" || op == "<")) ||
          (!ordOnLhs && (op == ">=" || op == ">"))
        val b = Vector.newBuilder[Tok]
        if (left) { b += word("LEFT"); b += ws(" ") }
        b ++= Seq(word("JOIN"), ws(" "), word("LATERAL"), ws(" "), sym("("),
          word("SELECT"), ws(" "), alias, sym("."), sym("*"), ws(" "),
          word("FROM"), ws(" "))
        b ++= v.slice(refStart, refEnd)
        b += ws(" "); b += word("WHERE"); b += ws(" ")
        b ++= cond
        b ++= Seq(ws(" "), word("ORDER"), ws(" "), word("BY"), ws(" "))
        b ++= ord
        b += ws(" "); b += word(if (desc) "DESC" else "ASC")
        b ++= Seq(ws(" "), word("LIMIT"), ws(" "), Tok(5, "1"), sym(")"), ws(" "), alias)
        v = v.take(i) ++ b.result() ++ v.drop(condEnd)
      }
      i += 1
    }
    v
  }

  /** DuckDB ZIPS multiple `unnest()`s in one select list (reference
    * `src/execution/operator/projection/physical_unnest.cpp`: rows are
    * emitted to the LONGEST list's length, shorter lists padded with
    * NULL; a NULL list pads the other side — all probed on 1.0.0).
    * Spark allows one generator per select list, so the literal
    * multi-unnest form translates to ONE explode over a left-nested
    * zip_with chain with deterministic struct field names:
    *
    *   SELECT k, unnest(x) AS u, unnest(y) AS v FROM t WHERE p
    *   → SELECT k, graft_zip.graft_u0 AS u, graft_zip.graft_u1 AS v
    *     FROM (SELECT *, explode(zip_with(ifnull(x, array()),
    *             ifnull(y, array()), (gx, gy) ->
    *             struct(gx AS graft_u0, gy AS graft_u1))) AS graft_zip
    *           FROM t WHERE p) graft_unnest_zip
    *
    * zip_with pads the shorter side with NULL (≡ DuckDB); ifnull-to-
    * empty keeps a NULL list padding the other side instead of nulling
    * the whole zip. N ≥ 3 lists nest: zip_with(acc, e_k, (gp, gy) ->
    * struct(gp.* re-spelled, gy)) — a NULL pad element's field access
    * yields NULL, preserving the pad.
    *
    * Scope (refuse-loudly elsewhere): each SELECT block's depth-0
    * select list — the statement head and, via recursion, every
    * parenthesized subquery / CTE body; every unnest item must be the literal
    * `unnest(expr) [AS] alias` form WITH an alias (the engines' auto
    * names differ); no DISTINCT quantifier; no depth-0 GROUP/HAVING/
    * WINDOW/QUALIFY tail (their evaluation order vs the zip is not a
    * text-level rewrite). Single-unnest lists pass through untouched
    * (the explode rename covers them). */
  private def rewriteUnnestZip(toks: Vector[Tok]): Vector[Tok] = {
    // recurse into parenthesized blocks first (subqueries, CTE bodies),
    // then rewrite this block's own select list
    val rec = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < toks.length) {
        if (toks(i).is("(")) {
          val close = matching(toks, i)
          out += sym("(")
          out ++= rewriteUnnestZip(toks.slice(i + 1, close))
          out += sym(")")
          i = close + 1
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    rewriteUnnestZipBlock(rec)
  }

  private def rewriteUnnestZipBlock(toks: Vector[Tok]): Vector[Tok] = {
    val first = toks.indexWhere(!_.isWs)
    if (first < 0 || toks(first).word != "select") return toks
    def hasUnnestCall(ts: Vector[Tok]): Boolean =
      ts.indices.exists(k => ts(k).word == "unnest" && {
        val nx = nextIdx(ts, k); nx < ts.length && ts(nx).is("(")
      })
    val fromIdx = firstDepth0(toks, first + 1, Set("from"))
    val listEnd = if (fromIdx < 0) toks.length else fromIdx
    // split the depth-0 select list (parens AND bracket literals nest)
    val items = {
      val b = Vector.newBuilder[Vector[Tok]]
      var d = 0; var s = first + 1; var j = first + 1
      while (j < listEnd) {
        val t = toks(j)
        if (t.is("(") || t.is("[")) d += 1
        else if (t.is(")") || t.is("]")) d -= 1
        else if (d == 0 && t.is(",")) { b += toks.slice(s, j); s = j + 1 }
        j += 1
      }
      b += toks.slice(s, listEnd)
      b.result()
    }
    val bearing = items.count(hasUnnestCall)
    if (bearing < 2) return toks
    def refuse(msg: String): Nothing = throw new GraftSqlException(
      s"zipped multi-unnest: $msg — or explode one arrays_zip of the " +
        "lists on the DataFrame API")
    val afterSel = nextIdx(toks, first)
    if (afterSel < listEnd &&
        (toks(afterSel).word == "distinct" || toks(afterSel).word == "all"))
      refuse("DISTINCT/ALL quantifiers are unsupported with multiple unnests")
    // the literal form: item IS `unnest(expr) [AS] alias`
    final case class U(expr: Vector[Tok], alias: String)
    def unnestOf(item: Vector[Tok]): Option[U] = {
      val iFirst = item.indexWhere(!_.isWs)
      if (iFirst < 0 || item(iFirst).word != "unnest") return None
      val open = nextIdx(item, iFirst)
      if (open >= item.length || !item(open).is("(")) return None
      val close = matching(item, open)
      val after = item.drop(close + 1).filterNot(_.isWs)
      val alias = after.toList match {
        case a :: Nil if a.kind == 3 || a.kind == 4 => a.text
        case a :: b :: Nil if a.word == "as" && (b.kind == 3 || b.kind == 4) =>
          b.text
        case Nil =>
          refuse("alias each unnest(...) (AS name) — the engines' automatic " +
            "column names differ")
        case _ => return None // unnest(..) inside a larger expression
      }
      Some(U(item.slice(open + 1, close), alias))
    }
    val parsed = items.map(i => (i, unnestOf(i)))
    parsed.foreach { case (item, u) =>
      if (u.isEmpty && hasUnnestCall(item))
        refuse(s"item `${render(item).trim}` is not the literal " +
          "`unnest(expr) AS alias` form")
    }
    if (fromIdx >= 0) {
      val badTail = firstDepth0(toks.drop(fromIdx), 0,
        Set("group", "having", "window", "qualify"))
      if (badTail >= 0)
        refuse(s"a depth-0 ${toks.drop(fromIdx)(badTail).text.toUpperCase} " +
          "clause cannot be ordered against the zip at text level")
    }
    // left-nested zip_with chain over the unnest args, in item order
    val exprs = parsed.flatMap(_._2)
      .map(u => s"ifnull((${render(u.expr).trim}), array())")
    var acc = s"zip_with(${exprs(0)}, ${exprs(1)}, (gx, gy) -> " +
      "struct(gx AS graft_u0, gy AS graft_u1))"
    for (k <- 2 until exprs.length) {
      val carry = (0 until k).map(i => s"gp.graft_u$i AS graft_u$i").mkString(", ")
      acc = s"zip_with($acc, ${exprs(k)}, (gp, gy) -> " +
        s"struct($carry, gy AS graft_u$k))"
    }
    var uIdx = -1
    val outer = parsed.map {
      case (_, Some(u)) => uIdx += 1; s"graft_zip.graft_u$uIdx AS ${u.alias}"
      case (item, None) => render(item).trim
    }.mkString(", ")
    val tail =
      if (fromIdx < 0) "" else toks.drop(fromIdx).map(_.text).mkString(" ", "", "")
    val star = if (fromIdx < 0) "" else "*, "
    tokenize(s"SELECT $outer FROM ( SELECT ${star}explode($acc) " +
      s"AS graft_zip$tail ) graft_unnest_zip")
  }

  // ------------------------------------------------- block-scoped rewrites

  /** Depth-0 positions (relative to `toks`) of word `w` in the block. */
  private def depth0Word(toks: Vector[Tok], w: String): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    var d = 0; var i = 0
    while (i < toks.length) {
      if (toks(i).is("(")) d += 1
      else if (toks(i).is(")")) d -= 1
      else if (d == 0 && toks(i).kind == 4 && toks(i).word == w) out += i
      i += 1
    }
    out.result()
  }

  /** First depth-0 occurrence of any of `ws` at or after `from`; -1 if none. */
  private def firstDepth0(toks: Vector[Tok], from: Int, words: Set[String]): Int = {
    var d = 0; var i = 0
    while (i < toks.length) {
      if (toks(i).is("(")) d += 1
      else if (toks(i).is(")")) d -= 1
      else if (i >= from && d == 0 && toks(i).kind == 4 && words(toks(i).word)) return i
      i += 1
    }
    -1
  }

  /** QUALIFY → subquery + WHERE over a projected predicate column. */
  private def rewriteQualify(block: Vector[Tok]): Vector[Tok] = {
    val qAt = firstDepth0(block, 0, Set("qualify"))
    if (qAt < 0) return block
    // QUALIFY binds to ITS set-operation branch: rewrite from the LAST
    // depth-0 SELECT before it, so earlier UNION/INTERSECT/EXCEPT
    // branches pass through untouched in the prefix.
    val selAt = depth0Word(block, "select").filter(_ < qAt).lastOption.getOrElse(-1)
    if (selAt < 0)
      throw new GraftSqlException("QUALIFY outside a SELECT block")
    val afterSel = nextIdx(block, selAt)
    // QUALIFY evaluates BEFORE DISTINCT in DuckDB (probed on 1.0.0:
    // `SELECT DISTINCT g FROM t QUALIFY row_number() OVER (...) = 3`
    // keeps a group whose third row exists only pre-dedup), so the
    // rewrite computes the helper predicate in a NON-distinct subquery
    // and applies DISTINCT in the outer projection (r16 verdict item 3).
    val isDistinct =
      afterSel < block.length && block(afterSel).word == "distinct" &&
        // DISTINCT ON is a different construct (rewriteDistinctOn)
        !(nextIdx(block, afterSel) < block.length &&
          block(nextIdx(block, afterSel)).word == "on")
    val fromAt = firstDepth0(block, selAt, Set("from"))
    if (fromAt < 0 || fromAt > qAt)
      throw new GraftSqlException("QUALIFY requires a FROM clause")
    val groupAt = firstDepth0(block, fromAt, Set("group"))
    if (groupAt >= 0 && groupAt < qAt) {
      val after = nextIdx(block, nextIdx(block, groupAt)) // GROUP BY <tok>
      if (after < block.length && block(after).word == "all")
        throw new GraftSqlException(
          "QUALIFY with GROUP BY ALL: the REFERENCE refuses this too " +
            "(DuckDB 1.0.0 binder: 'Combining QUALIFY with GROUP BY ALL " +
            "is not supported yet') — spell the GROUP BY keys explicitly")
    }
    val tailAt = {
      // set operations end the QUALIFY branch too — the predicate must
      // not swallow a following UNION/INTERSECT/EXCEPT branch
      val t = firstDepth0(block, qAt,
        Set("order", "limit", "offset", "union", "intersect", "except"))
      if (t < 0) block.length else t
    }
    // select list WITHOUT the distinct keyword (it moves to the outer
    // projection; also keeps alias-inlining below clean)
    val head = block.slice(if (isDistinct) afterSel + 1 else selAt + 1, fromAt)
    val mid = block.slice(fromAt, qAt)          // FROM … WHERE … GROUP … HAVING
    val pred = {
      // The dominant DuckDB idiom references a select-list alias
      // (`… row_number() OVER (…) AS rn … QUALIFY rn = 1`). Spark's
      // lateral column alias resolution does not reach window-expression
      // aliases, so inline each alias's defining expression into the
      // predicate before projecting it. One level: aliases defined in
      // terms of OTHER select aliases stay unresolved (Spark then reports
      // the unresolved column, which is loud, not silent).
      val items = {
        val out = Vector.newBuilder[Vector[Tok]]
        var d = 0; var s = 0
        for (x <- head.indices) {
          if (head(x).is("(")) d += 1
          else if (head(x).is(")")) d -= 1
          else if (d == 0 && head(x).is(",")) { out += head.slice(s, x); s = x + 1 }
        }
        out += head.slice(s, head.length)
        out.result()
      }
      val aliasDef: Map[String, Vector[Tok]] = items.flatMap { item =>
        var d = 0; var asAt = -1
        for (x <- item.indices) {
          if (item(x).is("(")) d += 1
          else if (item(x).is(")")) d -= 1
          else if (d == 0 && item(x).kind == 4 && item(x).word == "as") asAt = x
        }
        if (asAt < 0) None
        else item.drop(asAt + 1).filterNot(_.isWs) match {
          case Vector(a) if a.kind == 4 => Some(a.word -> item.take(asAt))
          case Vector(a) if a.kind == 3 =>
            Some(a.text.substring(1, a.text.length - 1).toLowerCase -> item.take(asAt))
          case _ => None
        }
      }.toMap
      val raw = block.slice(qAt + 1, tailAt)
      if (aliasDef.isEmpty) raw
      else {
        val b2 = Vector.newBuilder[Tok]
        for (x <- raw.indices) {
          val t = raw(x)
          val name =
            if (t.kind == 4) t.word
            else if (t.kind == 3) t.text.substring(1, t.text.length - 1).toLowerCase
            else ""
          val prev = prevIdx(raw, x)
          val nxt = nextIdx(raw, x)
          val isColRef = name.nonEmpty && aliasDef.contains(name) &&
            !(prev >= 0 && raw(prev).is(".")) &&
            !(nxt < raw.length && (raw(nxt).is("(") || raw(nxt).is(".")))
          if (isColRef) { b2 += sym("("); b2 ++= aliasDef(name); b2 += sym(")") }
          else b2 += t
        }
        b2.result()
      }
    }
    val tail = block.slice(tailAt, block.length)
    val prefix = block.take(selAt)              // e.g. WITH … AS (…) before main SELECT
    val b = Vector.newBuilder[Tok]
    b ++= prefix
    b += word("SELECT")
    if (isDistinct) { b += ws(" "); b += word("DISTINCT") }
    b ++= Seq(ws(" "), sym("*"), ws(" "), word("EXCEPT"),
      sym("("), word("__graft_q"), sym(")"), ws(" "), word("FROM"), ws(" "), sym("("),
      word("SELECT"), ws(" "))
    // the inner subquery is NON-distinct even when the original was —
    // QUALIFY's windows must see pre-dedup rows (probed; see above)
    b ++= head
    b ++= Seq(sym(","), ws(" "), sym("("))
    b ++= pred
    b ++= Seq(sym(")"), ws(" "), word("AS"), ws(" "), word("__graft_q"), ws(" "))
    b ++= mid
    b ++= Seq(sym(")"), ws(" "), word("graft_qualify"), ws(" "),
      word("WHERE"), ws(" "), word("__graft_q"), ws(" "))
    b ++= tail
    b.result()
  }

  /** DISTINCT ON (…) → row_number() = 1 over the DISTINCT ON partition,
    * ordered by the query's ORDER BY (which also fixes WHICH row
    * survives — exactly DuckDB's rule, reference
    * `src/parser/transform/statement/transform_select_node.cpp`). */
  private def rewriteDistinctOn(block: Vector[Tok]): Vector[Tok] = {
    val selAt = firstDepth0(block, 0, Set("select"))
    if (selAt < 0) return block
    val dAt = nextIdx(block, selAt)
    if (dAt >= block.length || block(dAt).word != "distinct") return block
    val onAt = nextIdx(block, dAt)
    if (onAt >= block.length || block(onAt).word != "on") return block
    val open = nextIdx(block, onAt)
    if (open >= block.length || !block(open).is("("))
      throw new GraftSqlException("DISTINCT ON must be followed by (exprs)")
    val close = matching(block, open)
    val keys = block.slice(open + 1, close)
    val fromAt = firstDepth0(block, close, Set("from"))
    if (fromAt < 0) throw new GraftSqlException("DISTINCT ON requires a FROM clause")
    val orderAt = firstDepth0(block, fromAt, Set("order"))
    if (orderAt < 0)
      throw new GraftSqlException(
        "DISTINCT ON without ORDER BY keeps an arbitrary row (nondeterministic); add ORDER BY")
    val byAt = nextIdx(block, orderAt)
    val limitAt = {
      val t = firstDepth0(block, byAt, Set("limit", "offset"))
      if (t < 0) block.length else t
    }
    val selListRaw = block.slice(close + 1, fromAt)
    // `DISTINCT ON (k) *` — a bare star would re-expose the helper row
    // number from the subquery; exclude it explicitly.
    val selList: Vector[Tok] =
      if (selListRaw.filterNot(_.isWs).map(_.text) == Vector("*"))
        Vector(sym("*"), ws(" "), word("EXCEPT"), sym("("),
          word("__graft_rn"), sym(")"), ws(" "))
      else selListRaw
    val mid = block.slice(fromAt, orderAt)      // FROM … WHERE …
    val order = block.slice(byAt + 1, limitAt)  // order keys
    val limitTail = block.slice(limitAt, block.length)
    val prefix = block.take(selAt)
    val b = Vector.newBuilder[Tok]
    b ++= prefix
    b ++= Seq(word("SELECT"), ws(" "))
    b ++= selList
    b ++= Seq(word("FROM"), ws(" "), sym("("), word("SELECT"), ws(" "), sym("*"),
      sym(","), ws(" "), word("row_number"), sym("("), sym(")"), ws(" "),
      word("OVER"), ws(" "), sym("("), word("PARTITION"), ws(" "), word("BY"), ws(" "))
    b ++= keys
    b ++= Seq(ws(" "), word("ORDER"), ws(" "), word("BY"), ws(" "))
    b ++= order
    b ++= Seq(sym(")"), ws(" "), word("AS"), ws(" "), word("__graft_rn"), ws(" "))
    b ++= mid
    b ++= Seq(sym(")"), ws(" "), word("graft_don"), ws(" "), word("WHERE"), ws(" "),
      word("__graft_rn"), ws(" "), sym("="), ws(" "), Tok(5, "1"), ws(" "),
      word("ORDER"), ws(" "), word("BY"), ws(" "))
    b ++= order
    b += ws(" ")
    b ++= limitTail
    b.result()
  }

  /** Recursively rewrite parenthesized subregions (innermost first), then
    * apply the block-scoped passes to this block's depth-0 clauses. */
  /** DuckDB `UNION [ALL] BY NAME` → name-aligned Spark UNION (reference
    * grammar: `src/parser/transform/statement/transform_select_node.cpp`,
    * the setop BY NAME flag). DuckDB semantics: the output schema is the
    * first branch's columns followed by names only later branches add, in
    * first-appearance order; a branch missing a name contributes NULL for
    * it. The rewrite wraps each branch in a subquery and projects the
    * merged name list (`NULL AS c` where absent), turning Spark's
    * positional UNION into the name-correct one.
    *
    * Token-level translation can only know names the SQL text exposes, so
    * every select item must carry a determinable name: a bare (possibly
    * qualified) column reference, an `AS` alias, or an unambiguous
    * implicit alias. `SELECT *` branches and unaliased expressions are
    * refused loudly. Mixed ALL/DISTINCT chains and chains mixing BY NAME
    * with positional set ops are refused (left-assoc grouping would need
    * a full parser to get right). */
  /** DuckDB's integer/temporal series table functions → Spark
    * equivalents with matching VALUES and matching COLUMN NAME:
    *   - `generate_series(a, b[, s])` (bounds INCLUSIVE) in a FROM
    *     position → `(SELECT explode(sequence(a, b[, s])) AS
    *     generate_series)` — Spark's sequence() is inclusive too, and
    *     takes timestamp bounds with INTERVAL steps just like the
    *     original; in a select-list position → `explode(sequence(...))`
    *     (alias explicitly — DuckDB's default column name
    *     "generate_series" has no Spark analog).
    *   - `range(a, b[, s])` table function (end-EXCLUSIVE, matching
    *     Spark's range) in a FROM position → `(SELECT id AS range FROM
    *     range(a, b[, s]))` — value-identical, and the projection
    *     restores DuckDB's "range" column name. Window `RANGE BETWEEN`
    *     and a column named range are untouched (no `(` follows). */
  /** Is position `i` a FROM-clause (table) position? Scans BACKWARD at
    * the same paren depth for the nearest clause keyword: `from`/`join`
    * → table position; `select`/`where`/`on`/… or an enclosing `(`
    * (function-arg or subquery-start) → expression position. This is
    * what makes a comma disambiguate correctly: `FROM a, f(...)` is a
    * from-list comma (nearest kw FROM) while `SELECT x, f(...)` is a
    * select-list comma (nearest kw SELECT) — the round-11 advisory's
    * counterexample `SELECT x, generate_series(1,3) FROM t` previously
    * mis-rewrote into a scalar subquery Spark rejects. */
  private def inFromClause(v: Vector[Tok], i: Int): Boolean = {
    var k = prevIdx(v, i)
    var depth = 0
    while (k >= 0) {
      val t = v(k)
      if (t.is(")")) depth += 1
      else if (t.is("(")) {
        if (depth == 0) return false
        depth -= 1
      } else if (depth == 0 && t.kind == 4) {
        t.word match {
          case "from" | "join" | "lateral" => return true
          case "select" | "where" | "group" | "having" | "qualify" |
               "window" | "order" | "limit" | "offset" | "on" | "when" |
               "set" | "values" | "case" | "returning" => return false
          case _ =>
        }
      }
      k -= 1
    }
    false
  }

  private def rewriteSeriesFns(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      val w = v(i).word
      if (w == "generate_series" || w == "range") {
        val open = nextIdx(v, i)
        if (open < v.length && v(open).is("(")) {
          val inFrom = inFromClause(v, i)
          val close = matching(v, open)
          val args = v.slice(open + 1, close)
          if (w == "generate_series") {
            val core = Vector(word("explode"), sym("("), word("sequence"),
              sym("(")) ++ args ++ Vector(sym(")"), sym(")"))
            val repl =
              if (inFrom)
                Vector(sym("("), word("SELECT"), ws(" ")) ++ core ++
                  Vector(ws(" "), word("AS"), ws(" "),
                    word("generate_series"), sym(")"))
              else core
            v = v.take(i) ++ repl ++ v.drop(close + 1)
            i += repl.length - 1 // skip the replacement — it re-contains the name
          } else if (inFrom) { // range(...) as a table function only
            val repl = Vector(sym("("), word("SELECT"), ws(" "), word("id"),
              ws(" "), word("AS"), ws(" "), word("range"), ws(" "),
              word("FROM"), ws(" "), word("range"), sym("(")) ++ args ++
              Vector(sym(")"), sym(")"))
            v = v.take(i) ++ repl ++ v.drop(close + 1)
            i += repl.length - 1 // skip — the replacement embeds `FROM range(`
          }
        }
      }
      i += 1
    }
    v
  }

  /** Glob pattern WITH character classes → Java regex body: `*` → `.*`,
    * `?` → `.`, `[…]` / `[!…]` → a regex class (`!` → `^`); everything
    * else regex-quoted char-by-char. The class scan mirrors the
    * reference's bracket loop (like.cpp glob path) exactly: after the
    * optional `!`, a `]` in FIRST position is an ordinary member (so it
    * can even start a range, `[]-a]`); members are consumed as
    * `x-y` ranges or single characters, and — crucially — a `-` whose
    * range endpoint is `]` CONSUMES that bracket (`[a-]` never finds its
    * closing bracket in the reference and matches nothing), which this
    * translation surfaces as a loud unterminated-class refusal rather
    * than a silent Java-regex reinterpretation. Members are emitted
    * escaped, so Java class metachars (`&&` intersection, `^`, `[`,
    * `\`) stay the literal characters the reference matches. Token text
    * is DuckDB-convention (single backslashes) — [[renderFinal]] doubles
    * them for Spark's parser. */
  private[sql] def globClassToRegex(body: String): String = {
    val out = new StringBuilder
    var i = 0
    def quote(c: Char): String =
      if ("\\^$.|?*+()[]{}".contains(c)) "\\" + c else c.toString
    // inside a [...] class: escape everything Java gives meaning to
    def quoteInClass(c: Char): String =
      if ("\\^$.|?*+()[]{}&-".contains(c)) "\\" + c else c.toString
    def unterminated(): Nothing =
      throw new GraftSqlException(
        s"GLOB pattern has an unterminated character class: '$body' — " +
          "the reference matches nothing for this pattern (like.cpp " +
          "requires a closing ']' not consumed as a range endpoint)")
    while (i < body.length) {
      body(i) match {
        case '*' => out ++= ".*"; i += 1
        case '?' => out ++= "."; i += 1
        case '[' =>
          i += 1
          out += '['
          if (i < body.length && body(i) == '!') { out += '^'; i += 1 }
          val start = i
          var closed = false
          while (i < body.length && !closed) {
            val c = body(i)
            if (c == ']' && i > start) { closed = true; i += 1 }
            else if (i + 1 >= body.length) unterminated() // last char, no ']'
            else if (body(i + 1) == '-') {
              // range x-y; y may be ']' (consumed AS the endpoint —
              // reference pidx += 3 skips it, leaving the class open)
              if (i + 2 >= body.length) unterminated()
              out ++= quoteInClass(c) + "-" + quoteInClass(body(i + 2))
              i += 3
            } else { out ++= quoteInClass(c); i += 1 }
          }
          if (!closed) unterminated()
          out += ']'
        case c => out ++= quote(c); i += 1
      }
    }
    out.toString
  }

  /** `x GLOB 'pat'` → `x LIKE '<converted>'` (`*` → `%`, `?` → `_`,
    * literal `%`/`_` escaped with backslash — Spark LIKE's default
    * escape; probed: GLOB's `%` is a literal), or — when the pattern
    * carries `[…]` character classes — `x RLIKE '^(?s:<regex>)$'` via
    * [[globClassToRegex]]. `x SIMILAR TO 'p'` →
    * `x RLIKE '^(?:p)$'` — DuckDB's SIMILAR TO is a fully-anchored
    * regex (probed: `'widget' SIMILAR TO 'wid'` is FALSE). NOT forms
    * compose untouched (`NOT LIKE` / `NOT RLIKE`). Only string-literal
    * patterns translate (conversion needs the text); non-literal
    * patterns and backslash escapes refuse loudly. `glob(` as a
    * file-list table function is left for the engine to reject. */
  private def rewriteGlobSimilar(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      if (v(i).word == "glob") {
        // Infix-operator position only: the token BEFORE must be an
        // expression terminator (identifier, quoted identifier, literal,
        // `)`) or NOT. A standalone identifier actually NAMED glob
        // (`SELECT glob FROM t`) is valid SQL and stays untouched
        // (round-11 advisory: the bare-word match rejected it).
        val pb = prevIdx(v, i)
        val infix = pb >= 0 && (v(pb).kind == 2 || v(pb).kind == 3 ||
          v(pb).kind == 5 || v(pb).is(")") || v(pb).word == "not" ||
          (v(pb).kind == 4 && !Set("select", "from", "where", "and", "or",
            "by", "as", "on", "join", "when", "then", "else",
            "distinct", "all").contains(v(pb).word)))
        val n = nextIdx(v, i)
        if (!infix) { /* column/alias named glob — leave untouched */ }
        else if (n < v.length && v(n).is("(")) { /* table function — skip */ }
        else if (n >= v.length || v(n).kind != 2)
          throw new GraftSqlException(
            "GLOB needs a string-literal pattern to translate — use LIKE or regexp_like")
        else {
          val body = v(n).text.drop(1).dropRight(1)
          if (body.contains('\\'))
            throw new GraftSqlException(
              "GLOB backslash escapes are unsupported — use regexp_like")
          if (body.exists(c => c == '[' || c == ']')) {
            // Character classes ([abc], [a-z], [!abc]) are beyond LIKE —
            // translate the WHOLE glob to an anchored regex instead
            // (reference src/function/scalar/string/like.cpp glob path:
            // full-string match, `!` negates, `]` first in a class is
            // literal). RLIKE is substring-search in Spark, hence the
            // ^(?s:…)$ anchor; (?s) so `*`/`?` cross newlines like glob.
            // \z (not $) anchors: Java's $ also matches before a single
            // trailing newline, while the reference glob requires full
            // consumption (like.cpp: sidx == slen). Single backslash in
            // the token — renderFinal doubles it for Spark's parser.
            v = v.take(i) ++ Vector(word("RLIKE"), ws(" "),
              Tok(2, s"'^(?s:${globClassToRegex(body)})\\z'")) ++ v.drop(n + 1)
            i += 2
          } else {
            val conv = body.flatMap {
              case '*' => "%"
              case '?' => "_"
              case '%' => "\\%"
              case '_' => "\\_"
              case c => c.toString
            }
            v = v.take(i) ++ Vector(word("LIKE"), ws(" "), Tok(2, s"'$conv'")) ++
              v.drop(n + 1)
            i += 2
          }
        }
      } else if (v(i).word == "similar") {
        val n = nextIdx(v, i)
        if (n < v.length && v(n).word == "to") {
          val p = nextIdx(v, n)
          if (p >= v.length || v(p).kind != 2)
            throw new GraftSqlException(
              "SIMILAR TO needs a string-literal pattern to translate — " +
                "use RLIKE with explicit ^…$ anchors")
          val body = v(p).text.drop(1).dropRight(1)
          // \z, not $: DuckDB's SIMILAR TO is a FULL match (probed), and
          // Java's $ would also accept a trailing newline.
          v = v.take(i) ++
            Vector(word("RLIKE"), ws(" "), Tok(2, s"'^(?:$body)\\z'")) ++
            v.drop(p + 1)
          i += 2
        }
      }
      i += 1
    }
    v
  }

  /** `USING SAMPLE n[% | PERCENT | ROWS]` (DuckDB's FROM-clause sampling
    * modifier) → Spark `TABLESAMPLE (...)` in the same position; a bare
    * count means ROWS in DuckDB. Method/seed forms — `(system, 42)`,
    * `reservoir(10%)` — REFUSE loudly: the engines' sampling algebras
    * differ (reservoir vs bernoulli), so a silent translation would
    * change the sample distribution; the pointer names the Spark-side
    * alternatives. Counts are comparable (n ROWS is exact on both,
    * 100% is total), membership is not — same contract as
    * `shape_sample`. */
  private def rewriteUsingSample(toks: Vector[Tok]): Vector[Tok] = {
    var v = toks
    var i = 0
    while (i < v.length) {
      if (v(i).word == "using") {
        val s = nextIdx(v, i)
        if (s < v.length && v(s).word == "sample") {
          var n = nextIdx(v, s)
          // Function form `USING SAMPLE bernoulli(10%)`: Spark's PERCENT
          // TABLESAMPLE IS Bernoulli row sampling (each row kept i.i.d.
          // with probability p — probed both engines), so this method
          // translates faithfully at the distribution level; reservoir/
          // system keep refusing (fixed-size draw / block sampling have
          // no Spark SQL analog — membership SEMANTICS differ, not just
          // the RNG).
          var seedTok: Option[Tok] = None
          var fnFormClose = -1
          if (n < v.length && v(n).word == "bernoulli") {
            val open = nextIdx(v, n)
            if (open >= v.length || !v(open).is("("))
              throw new GraftSqlException(
                "USING SAMPLE bernoulli needs a (n%) argument")
            fnFormClose = matching(v, open)
            n = nextIdx(v, open)
          }
          if (n >= v.length || v(n).kind != 5)
            throw new GraftSqlException(
              "USING SAMPLE: only numeric and bernoulli forms translate (n%, n PERCENT, " +
                "n ROWS, bernoulli(n%), n% (bernoulli[, seed]), n ROWS (reservoir[, seed])) " +
                "— percent-reservoir/system sampling differs per engine; " +
                "use TABLESAMPLE … REPEATABLE or Shaping.sample")
          val after = nextIdx(v, n)
          val (unit, endIdx0) =
            if (after < v.length && v(after).is("%")) ("PERCENT", after)
            else if (after < v.length && v(after).word == "percent") ("PERCENT", after)
            else if (after < v.length && v(after).word == "rows") ("ROWS", after)
            else ("ROWS", n)
          var endIdx = if (fnFormClose >= 0) fnFormClose else endIdx0
          if (fnFormClose >= 0 && unit != "PERCENT")
            throw new GraftSqlException(
              "USING SAMPLE bernoulli translates only the n% form")
          val tail = nextIdx(v, endIdx)
          var handledReservoir = false
          if (fnFormClose < 0 && tail < v.length && v(tail).is("(")) {
            // method clause `n% (method[, seed])` / `n ROWS (reservoir
            // [, seed])`: bernoulli translates (seed → REPEATABLE);
            // ROWS-form reservoir translates to the distributed
            // reservoir equivalent (ORDER BY rand(seed) LIMIT n — the
            // Sampling.reservoir plan: every row draws a seeded uniform
            // key, the k smallest win, TakeOrderedAndProject at any
            // scale; deterministic per seed). Everything else refuses.
            val close = matching(v, tail)
            val inner = v.slice(tail + 1, close).filterNot(_.isWs)
            val isBern = inner.headOption.exists(_.word == "bernoulli")
            val isRes = inner.headOption.exists(_.word == "reservoir")
            val seedOk = inner.length == 1 ||
              (inner.length == 3 && inner(1).is(",") && inner(2).kind == 5)
            if (isRes && unit == "ROWS" && seedOk) {
              v = rewriteReservoirRows(v, i, n,
                if (inner.length == 3) Some(inner(2)) else None, close)
              handledReservoir = true
            } else {
              if (!isBern || unit != "PERCENT" || !seedOk)
                throw new GraftSqlException(
                  "USING SAMPLE with a method clause translates only `n% (bernoulli[, seed])` " +
                    "and `n ROWS (reservoir[, seed])` — percent-reservoir/system " +
                    "differ per engine; use TABLESAMPLE … REPEATABLE or Shaping.sample")
              if (inner.length == 3) seedTok = Some(inner(2))
              endIdx = close
            }
          }
          if (!handledReservoir) {
            // Spark's grammar puts TABLESAMPLE BEFORE the table alias
            // (relationPrimary: table temporalClause? sample? tableAlias),
            // so `FROM orders o USING SAMPLE 5` must become
            // `FROM orders TABLESAMPLE (5 ROWS) o` — emitting it at the
            // USING position fails Spark's parse (round-11 advisory).
            // Detect a trailing alias: prev token is a plain identifier
            // whose own predecessor is a table-ref end (identifier, quoted
            // ident, `)`) or AS; insert before the alias (and before AS).
            val insertAt = {
              val p = prevIdx(v, i)
              if (p >= 0 && v(p).kind == 4 &&
                  !Set("from", "join", "lateral").contains(v(p).word)) {
                val pp = prevIdx(v, p)
                if (pp >= 0 && v(pp).word == "as") pp
                else if (pp >= 0 && (v(pp).kind == 3 || v(pp).is(")") ||
                  (v(pp).kind == 4 &&
                    !Set("from", "join", "lateral").contains(v(pp).word)))) p
                else i
              } else i
            }
            val sampleToks = Vector(word("TABLESAMPLE"), ws(" "), sym("("),
              v(n), ws(" "), word(unit), sym(")")) ++
              seedTok.toVector.flatMap(t => Vector(ws(" "), word("REPEATABLE"),
                ws(" "), sym("("), t, sym(")"))) ++ Vector(ws(" "))
            v =
              if (insertAt == i)
                v.take(i) ++ sampleToks.dropRight(1) ++ v.drop(endIdx + 1)
              else
                v.take(insertAt) ++ sampleToks ++
                  v.slice(insertAt, i) ++ v.drop(endIdx + 1)
          }
        }
      }
      i += 1
    }
    v
  }

  /** `FROM <table> [AS] [alias] USING SAMPLE n ROWS (reservoir[, seed])`
    * → `FROM ( SELECT * FROM <table> ORDER BY rand(seed) LIMIT n )
    * <alias>` — the distributed reservoir draw ([[
    * graft.operators.Sampling.reservoir]]: seeded uniform key per row,
    * k smallest win; plans as TakeOrderedAndProject, deterministic per
    * seed). Membership semantics match DuckDB's reservoir (an exact-size
    * uniform draw without replacement); the PRNG streams differ per
    * engine, so seeded runs agree on SIZE and SOURCE-MEMBERSHIP, not on
    * the chosen rows — same contract as shape_sample. Only plain
    * (possibly dotted/quoted) table refs translate; subquery sources
    * refuse with the API pointer. */
  private def rewriteReservoirRows(v: Vector[Tok], usingIdx: Int, nIdx: Int,
      seed: Option[Tok], closeIdx: Int): Vector[Tok] = {
    def isIdent(t: Tok) = t.kind == 3 || t.kind == 4
    def refuse(): Nothing = throw new GraftSqlException(
      "USING SAMPLE … ROWS (reservoir[, seed]) translates only over a plain " +
        "table reference — for subquery sources use Sampling.reservoir on " +
        "the DataFrame API")
    // scan back: [alias] then the dotted table chain
    var p = prevIdx(v, usingIdx)
    if (p < 0 || !isIdent(v(p)) ||
        Set("from", "join", "lateral").contains(v(p).word)) refuse()
    def chainStart(end: Int): Int = {
      var st = end
      var q = prevIdx(v, st)
      while (q >= 0 && v(q).is(".")) {
        val q2 = prevIdx(v, q)
        if (q2 < 0 || !isIdent(v(q2))) refuse()
        st = q2
        q = prevIdx(v, st)
      }
      st
    }
    val c1End = p
    val c1Start = chainStart(c1End)
    val before1 = prevIdx(v, c1Start)
    // decide: c1 is the table (no alias), or c1 is the alias of a table
    // chain further left (with optional AS)
    val (tabStart, tabEnd, aliasTok) =
      if (before1 >= 0 && v(before1).word == "as") {
        if (c1Start != c1End) refuse() // alias must be a single ident
        val tEnd = prevIdx(v, before1)
        if (tEnd < 0 || !isIdent(v(tEnd))) refuse()
        (chainStart(tEnd), tEnd, v(c1End))
      } else if (before1 >= 0 && isIdent(v(before1)) &&
          !Set("from", "join", "lateral").contains(v(before1).word)) {
        if (c1Start != c1End) refuse()
        (chainStart(before1), before1, v(c1End))
      } else if (before1 >= 0 &&
          (v(before1).word == "from" || v(before1).word == "join" ||
            v(before1).is(",") || v(before1).word == "lateral")) {
        (c1Start, c1End, v(c1End)) // bare table: alias = last segment
      } else refuse()
    val tableToks = v.slice(tabStart, tabEnd + 1)
    val randArg = seed.map(_.text).getOrElse("")
    val sub = tokenize(s"( SELECT * FROM ${render(tableToks)} " +
      s"ORDER BY rand($randArg) LIMIT ${v(nIdx).text} ) ") :+ aliasTok
    v.take(tabStart) ++ sub ++ v.drop(closeIdx + 1)
  }

  /** DuckDB FROM-first queries → standard SELECT form. The reference
    * accepts `FROM tbl`, `FROM tbl SELECT cols WHERE …` (libpg_query
    * grammar extension; probed on DuckDB 1.0.0: the OPTIONAL select
    * clause sits BETWEEN the from-clause and WHERE — `FROM t WHERE p
    * SELECT c` is a parse error there too). Missing select clause →
    * `SELECT *`. Applied at every query-start position — statement
    * head, right after `(` (CTE bodies, subqueries), right after a
    * set-op keyword (+ its ALL/DISTINCT/BY NAME tail), and right after
    * a `WITH name AS (…)` block's closing paren — so `WITH c AS (FROM
    * t) FROM c SELECT …` composes. Runs to fixpoint, outermost-first. */
  private[sql] def rewriteFromFirst(toks: Vector[Tok]): Vector[Tok] = {
    val clauseKw = Set("select", "where", "group", "having", "qualify",
      "window", "order", "limit", "offset", "union", "intersect", "except")
    val setOps = Set("union", "intersect", "except")
    def isQueryStart(v: Vector[Tok], i: Int): Boolean = {
      val p1 = prevIdx(v, i)
      if (p1 < 0) return true
      if (v(p1).is("(")) return true
      if (v(p1).is(")")) {
        // a ')' opens a query position only when it closes a CTE body:
        // scan back to the matching '(' and require the word before it
        // to be AS (`WITH name AS ( … ) FROM …`); `SELECT f(x) FROM …`
        // has an identifier there instead.
        var d = 0; var k = p1
        while (k >= 0) {
          if (v(k).is(")")) d += 1
          else if (v(k).is("(")) { d -= 1; if (d == 0) {
            val pp = prevIdx(v, k)
            return pp >= 0 && v(pp).word == "as"
          } }
          k -= 1
        }
        return false
      }
      val w1 = v(p1).word
      if (setOps(w1)) return true
      // `CREATE TABLE t AS FROM x` / `WITH c AS materialized-free body`:
      // a bare AS directly before FROM can only open a query body (an
      // expression alias can't be the reserved word FROM)
      if (w1 == "as") return true
      val p2 = prevIdx(v, p1)
      if ((w1 == "all" || w1 == "distinct") && p2 >= 0 && setOps(v(p2).word))
        return true
      if (w1 == "name" && p2 >= 0 && v(p2).word == "by") {
        val p3 = prevIdx(v, p2)
        if (p3 >= 0 && setOps(v(p3).word)) return true
      }
      false
    }
    var v = toks
    var guard = 0
    var changed = true
    while (changed && guard < 100) {
      changed = false; guard += 1
      var i = 0
      while (i < v.length && !changed) {
        if (v(i).kind == 4 && v(i).word == "from" && isQueryStart(v, i)) {
          // scope: up to the ')' closing the current depth, or stream end
          var scopeEnd = v.length
          var d = 0; var k = i
          while (k < scopeEnd) {
            if (v(k).is("(")) d += 1
            else if (v(k).is(")")) { if (d == 0) scopeEnd = k else d -= 1 }
            k += 1
          }
          // from-clause ends at the first depth-0 clause keyword in scope
          var j = i + 1; d = 0; var fromEnd = scopeEnd
          while (j < scopeEnd && fromEnd == scopeEnd) {
            if (v(j).is("(")) d += 1
            else if (v(j).is(")")) d -= 1
            else if (d == 0 && clauseKw(v(j).word)) fromEnd = j
            j += 1
          }
          if (fromEnd < scopeEnd && v(fromEnd).word == "select") {
            // select-list ends at the next depth-0 clause keyword
            var m = fromEnd + 1; d = 0; var listEnd = scopeEnd
            while (m < scopeEnd && listEnd == scopeEnd) {
              if (v(m).is("(")) d += 1
              else if (v(m).is(")")) d -= 1
              else if (d == 0 && clauseKw(v(m).word)) listEnd = m
              m += 1
            }
            v = v.take(i) ++ (v.slice(fromEnd, listEnd) :+ ws(" ")) ++
              v.slice(i, fromEnd) ++ v.slice(listEnd, v.length)
          } else {
            v = v.take(i) ++
              Vector(word("SELECT"), ws(" "), sym("*"), ws(" ")) ++ v.drop(i)
          }
          changed = true
        }
        i += 1
      }
    }
    v
  }

  private def rewriteSetOpByName(toks: Vector[Tok]): Vector[Tok] = {
    // recurse into parenthesized sub-blocks first (subqueries, CTE bodies)
    val rec = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < toks.length) {
        if (toks(i).is("(")) {
          val close = matching(toks, i)
          out += sym("(")
          out ++= rewriteSetOpByName(toks.slice(i + 1, close))
          out += sym(")")
          i = close + 1
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    // depth-0 `union|intersect|except [all] by name` spans [start, end]
    final case class ByNameOp(start: Int, end: Int, all: Boolean, kind: String)
    val opsB = Vector.newBuilder[ByNameOp]
    var d = 0; var i = 0
    while (i < rec.length) {
      val t = rec(i)
      if (t.is("(")) d += 1
      else if (t.is(")")) d -= 1
      else if (d == 0 && (t.word == "union" || t.word == "intersect" ||
          t.word == "except")) {
        var j = nextIdx(rec, i)
        val all = j < rec.length && rec(j).word == "all"
        if (all) j = nextIdx(rec, j)
        if (j < rec.length && rec(j).word == "by") {
          val k = nextIdx(rec, j)
          if (k < rec.length && rec(k).word == "name")
            opsB += ByNameOp(i, k, all, t.word)
        }
      }
      i += 1
    }
    val ops = opsB.result()
    if (ops.isEmpty) return rec
    val opName = ops.head.kind.toUpperCase + " BY NAME"
    def refuse(msg: String): Nothing = throw new GraftSqlException(
      s"$opName: $msg — or align the columns on the DataFrame API " +
        "(unionByName / intersect / except after a name-ordered select)")
    // chains mixing BY NAME with positional set ops: refuse
    val opIdx = ops.flatMap(o => o.start to o.end).toSet
    d = 0; i = 0
    while (i < rec.length) {
      val t = rec(i)
      if (t.is("(")) d += 1
      else if (t.is(")")) d -= 1
      else if (d == 0 && !opIdx(i) &&
          (t.word == "union" || t.word == "intersect" || t.word == "except"))
        refuse("mixing BY NAME with positional set operations in one chain " +
          "is unsupported")
      i += 1
    }
    // a leading WITH clause scopes over the whole set op — keep it outside
    val idx0 = rec.indexWhere(!_.isWs)
    var bodyStart = 0
    if (idx0 >= 0 && rec(idx0).word == "with") {
      val sel = firstDepth0(rec, idx0 + 1, Set("select"))
      if (sel < 0) refuse("could not find the main SELECT after WITH")
      bodyStart = sel
    }
    // split branches; peel trailing depth-0 ORDER BY / LIMIT / OFFSET off
    // the last branch (they bind to the whole set op)
    val bounds = (bodyStart +: ops.map(_.end + 1)).zip(
      ops.map(_.start) :+ rec.length)
    var branches = bounds.map { case (s, e) => rec.slice(s, e) }
    val lastB = branches.last
    val tailAt = firstDepth0(lastB, 0, Set("order", "limit", "offset"))
    val tailToks =
      if (tailAt < 0) Vector.empty[Tok] else lastB.slice(tailAt, lastB.length)
    if (tailAt >= 0) branches = branches.init :+ lastB.slice(0, tailAt)

    def stripOuterParens(b: Vector[Tok]): Vector[Tok] = {
      val nb = b.dropWhile(_.isWs).reverse.dropWhile(_.isWs).reverse
      if (nb.nonEmpty && nb.head.is("(") && matching(nb, 0) == nb.length - 1)
        stripOuterParens(nb.slice(1, nb.length - 1))
      else nb
    }
    // words that cannot precede an implicit alias (they are operators /
    // clause keywords, not the tail of a finished expression)
    val noAliasAfter = Set("and", "or", "not", "is", "in", "like", "ilike",
      "between", "then", "else", "when", "case", "distinct", "all", "over",
      "escape", "collate", "from", "select", "as")
    // (lowercase key, emit text) of one select item; refuses when the
    // name is not determinable from the text
    def itemName(item: Vector[Tok]): (String, String) = {
      val nonWs = item.filterNot(_.isWs)
      if (nonWs.isEmpty) refuse("empty select item")
      var dd = 0
      nonWs.foreach { t =>
        if (t.is("(")) dd += 1 else if (t.is(")")) dd -= 1
        else if (dd == 0 && t.is("*"))
          refuse("`SELECT *` branches are unsupported (the translator " +
            "cannot know the column names) — list the columns explicitly")
      }
      def nameOf(t: Tok): (String, String) =
        if (t.kind == 3) {
          val inner = t.text.substring(1, t.text.length - 1)
          (inner.toLowerCase, s"`$inner`")
        } else (t.word, t.text)
      val asPos = depth0Word(item, "as")
      if (asPos.nonEmpty) {
        val n = nextIdx(item, asPos.last)
        if (n < item.length && (item(n).kind == 3 || item(n).kind == 4))
          return nameOf(item(n))
        refuse("AS must be followed by an identifier")
      }
      // bare (possibly qualified) reference: ident (. ident)*
      val bareRef = nonWs.zipWithIndex.forall { case (t, j) =>
        if (j % 2 == 0) t.kind == 3 || t.kind == 4 else t.is(".")
      } && nonWs.length % 2 == 1
      if (bareRef) return nameOf(nonWs.last)
      // implicit alias: `expr name` where the token before `name` ends an
      // expression (ident, literal, `)`/`]`) and is not an operator word
      val last = nonWs.last
      if (nonWs.length >= 2 && (last.kind == 3 || last.kind == 4)) {
        val p = nonWs(nonWs.length - 2)
        val endsExpr = p.is(")") || p.is("]") || p.kind == 2 || p.kind == 5 ||
          ((p.kind == 3 || p.kind == 4) && !noAliasAfter(p.word))
        if (endsExpr && !noAliasAfter(last.word)) return nameOf(last)
      }
      refuse(s"cannot determine the output name of select item " +
        s"`${render(item).trim}` — add an AS alias on every expression")
    }
    val branchNames: Vector[Vector[(String, String)]] = branches.map { b0 =>
      val b = stripOuterParens(b0)
      val selAt = b.indexWhere(!_.isWs)
      if (selAt < 0 || b(selAt).word != "select")
        refuse("every branch must be a SELECT")
      var listFrom = nextIdx(b, selAt)
      if (listFrom < b.length &&
          (b(listFrom).word == "distinct" || b(listFrom).word == "all"))
        listFrom = nextIdx(b, listFrom)
      val listEndRaw = firstDepth0(b, listFrom, Set("from", "where", "group",
        "order", "having", "limit", "qualify", "window"))
      val listEnd = if (listEndRaw < 0) b.length else listEndRaw
      // split the select list on depth-0 commas
      val items = Vector.newBuilder[Vector[Tok]]
      var dd = 0; var s = listFrom; var j = listFrom
      while (j < listEnd) {
        val t = b(j)
        if (t.is("(") || t.is("[")) dd += 1
        else if (t.is(")") || t.is("]")) dd -= 1
        else if (dd == 0 && t.is(",")) { items += b.slice(s, j); s = j + 1 }
        j += 1
      }
      items += b.slice(s, listEnd)
      items.result().map(itemName)
    }
    // Precedence-aware tree emission (the libpg_query grammar the
    // reference parses with: INTERSECT binds tighter than UNION/EXCEPT,
    // all three left-associative; each op carries its own ALL/DISTINCT).
    // Every node's SQL emits exactly `names` in order; a parent aligns
    // each operand to ITS OWN merged order with a wrapping SELECT.
    // UNION BY NAME NULL-fills columns missing from an operand;
    // INTERSECT/EXCEPT BY NAME compare whole rows, where a NULL-filled
    // column would silently turn "match by name" into "never match" —
    // those nodes require the same column SET on both operands and only
    // re-ALIGN the order.
    case class Node(names: Vector[(String, String)], sql: String)
    def aligned(names: Vector[(String, String)],
        target: Vector[(String, String)], sql: String): String = {
      val have = names.map(_._1).toSet
      val list = target.map { case (lc, txt) =>
        if (have(lc)) txt else s"NULL AS $txt"
      }.mkString(", ")
      s"SELECT $list FROM ( $sql )"
    }
    def combine(l: Node, r: Node, kind: String, all: Boolean): Node = {
      val target =
        if (kind == "union") {
          val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
          (l.names ++ r.names).foreach { case (lc, txt) =>
            if (!m.contains(lc)) m(lc) = txt }
          m.toVector
        } else {
          if (l.names.map(_._1).toSet != r.names.map(_._1).toSet)
            refuse(s"${kind.toUpperCase} BY NAME operands must have the " +
              s"same column set (got ${l.names.map(_._1).sorted.mkString("{", ",", "}")}" +
              s" vs ${r.names.map(_._1).sorted.mkString("{", ",", "}")}) — " +
              "only the column ORDER is aligned by name")
          l.names
        }
      val sep = " " + kind.toUpperCase + (if (all) " ALL " else " ")
      Node(target,
        aligned(l.names, target, l.sql) + sep + aligned(r.names, target, r.sql))
    }
    val leaves = branches.zip(branchNames).map { case (b, names) =>
      Node(names, render(b).trim) }
    // fold: INTERSECT combines into the previous term immediately (binds
    // tighter); UNION/EXCEPT defer to a left-assoc pass over the terms
    val terms = scala.collection.mutable.ArrayBuffer(leaves.head)
    val outer = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    ops.zip(leaves.tail).foreach { case (op, leafR) =>
      if (op.kind == "intersect")
        terms(terms.length - 1) = combine(terms.last, leafR, op.kind, op.all)
      else { outer += ((op.kind, op.all)); terms += leafR }
    }
    val root = outer.zip(terms.tail).foldLeft(terms.head) {
      case (acc, ((kind, all), r)) => combine(acc, r, kind, all) }
    tokenize(render(rec.slice(0, bodyStart)) + root.sql +
      " " + render(tailToks))
  }

  private def rewriteBlocks(toks: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < toks.length) {
      if (toks(i).is("(")) {
        val close = matching(toks, i)
        out += sym("(")
        out ++= rewriteBlocks(toks.slice(i + 1, close))
        out += sym(")")
        i = close + 1
      } else {
        out += toks(i)
        i += 1
      }
    }
    rewriteDistinctOn(rewriteQualify(out.result()))
  }

  /** DuckDB double-quoted identifiers → Spark backticks. In DuckDB `"x"`
    * is ALWAYS an identifier (strings are single-quoted, reference
    * tokenizer: third_party/libpg_query scan rules), while Spark's
    * default parser reads double quotes as string literals — so `AS
    * "min"` would either fail to parse or silently become a literal.
    * Unconditional conversion is therefore safe and required. `""`
    * un-escapes to `"`; embedded backticks escape as ```` `` ````. */
  private def rewriteQuotedIdents(toks: Vector[Tok]): Vector[Tok] =
    toks.map { t =>
      if (t.kind == 3 && t.text.length >= 2 && t.text.head == '"') {
        val inner = t.text.substring(1, t.text.length - 1)
          .replace("\"\"", "\"").replace("`", "``")
        Tok(3, s"`$inner`")
      } else t
    }

  // --------------------------------------------------------------- public

  /** DuckDB SQL → Spark SQL. Deterministic, token-level, literal-safe. */
  def translate(duckSql: String): String = {
    // Statement-head UNPIVOT is a pure text rewrite (explicit ON list, no
    // schema discovery) — route it here so the session fallback parser
    // rescues it like any other parse-level dialect; PIVOT/SUMMARIZE/
    // DESCRIBE stay session-only in [[run]] (their expansion needs the
    // source schema).
    if (tokenize(duckSql).find(!_.isWs).exists(_.word == "unpivot"))
      return UnpivotStatement.spell(duckSql)
    // COLUMNS(*) / COLUMNS('regex') star expansion is schema-bound; when
    // an ACTIVE session can resolve the statement's table (temp view /
    // catalog table), expand here so `translate` alone behaves like the
    // session-aware `run` path (round-13 verdict: one entry point
    // accepted what the other refused). Truly sessionless or
    // unresolvable-table calls fall through to refuseUnsupported's loud
    // refusal below.
    val toks0 = tokenize(duckSql)
    val hasColumnsCall = toks0.indices.exists(i =>
      toks0(i).word == "columns" && {
        val n = nextIdx(toks0, i); n < toks0.length && toks0(n).is("(")
      })
    if (hasColumnsCall) {
      val expanded = org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(s => ColumnsStar.maybeExpandSession(s, duckSql))
      expanded match {
        case Some(e) => return translate(e)
        case None => ()
      }
    }
    var toks = toks0
    toks = rewriteMacros(toks)
    toks = rewriteFromFirst(toks)
    toks = rewriteUnnestZip(toks)
    toks = rewriteUsingSample(toks)
    toks = rewriteSeriesFns(toks)
    toks = rewriteGlobSimilar(toks)
    toks = refuseUnsupported(toks)
    toks = rewriteSetOpByName(toks)
    toks = rewriteBraces(toks)
    toks = rewriteBrackets(toks)
    toks = rewriteIntDiv(toks)
    toks = rewriteListFns(toks)
    toks = rewriteFunctions(toks)
    toks = rewriteStrftime(toks)
    toks = rewriteExclude(toks)
    toks = rewriteReplace(toks)
    toks = rewriteReadParquet(toks)
    toks = rewriteIgnoreNulls(toks)
    toks = rewriteAsof(toks)
    toks = rewriteBlocks(toks)
    toks = rewriteQuotedIdents(toks)
    toks = rewriteAttachedRefs(toks)
    renderFinal(toks)
  }

  /** A trailing depth-0 `LIMIT <n> PERCENT` / `LIMIT <n>%` clause →
    * (statement without the clause, percent). Execution needs a count —
    * [[run]] handles it; nested occurrences refuse in [[translate]]. */
  private[sql] def splitLimitPercent(duckSql: String): Option[(String, Double)] = {
    val toks = tokenize(duckSql)
    val nw = toks.zipWithIndex.filterNot(_._1.isWs)
    if (nw.length < 3) return None
    val last = nw.last._1
    if (!(last.is("%") || last.word == "percent")) return None
    val num = nw(nw.length - 2)._1
    val (lim, limIdx) = nw(nw.length - 3)
    if (num.kind != 5 || lim.word != "limit") return None
    var d = 0
    toks.take(limIdx).foreach { t =>
      if (t.is("(")) d += 1 else if (t.is(")")) d -= 1
    }
    if (d != 0) return None
    Some((render(toks.take(limIdx)), num.text.toDouble))
  }

  /** Translate and run against the fixture catalog at `dir`. Statements
    * whose expansion needs the source schema or cardinality (SUMMARIZE,
    * PIVOT, a trailing LIMIT n PERCENT) are handled here rather than in
    * [[translate]]: they only resolve once a session can see the
    * relation. */
  def run(spark: SparkSession, dir: String, duckSql: String): DataFrame = {
    val head = tokenize(duckSql).find(!_.isWs).map(_.word).getOrElse("")
    if (head == "summarize") Summarize.run(spark, dir, duckSql)
    else if (head == "describe") Describe.run(spark, dir, duckSql)
    else if (head == "pivot") PivotStatement.run(spark, dir, duckSql)
    else if (head == "unpivot") UnpivotStatement.run(spark, dir, duckSql)
    else if (head == "execute")
      // EXECUTE name(args) — bind the stored PREPARE text (DuckDml holds
      // the registry; PREPARE itself is a DuckDml.exec statement) and run
      // the bound SQL through the normal translation path
      run(spark, dir, DuckDml.resolveExecute(duckSql).get)
    // schema-aware ASOF scale rewrite: the canonical single-join shape
    // reroutes through Joins.asofJoin (union+window — one shuffle, no
    // domain product); anything else falls through to the faithful
    // lateral translation below. Measured: ~160 s → ~2 s per ASOF query
    // at sf0.1.
    else (if (tokenize(duckSql).exists(t => t.kind == 4 && t.word == "asof"))
      AsofRewrite.maybeRun(spark, dir, duckSql) else None) match {
      case Some(asofFast) => asofFast
      case None => ColumnsStar.maybeExpand(spark, dir, duckSql) match {
      // schema-aware COLUMNS(*) / COLUMNS('regex') star expansion, then
      // re-enter run() on the expanded text (which has no COLUMNS left)
      case Some(expanded) => run(spark, dir, expanded)
      case None => splitLimitPercent(duckSql) match {
      case Some((inner, pct)) =>
        val df = Tables.sql(spark, dir, translate(inner))
        // the reference truncates the DOUBLE percent*count
        // (`physical_limit_percent.cpp:119`); limit is Int-typed in Spark
        val k = math.min(math.max((pct / 100.0 * df.count()).toLong, 0L),
          Int.MaxValue.toLong).toInt
        df.limit(k)
      case None => Tables.sql(spark, dir, translate(duckSql))
      }
    }
    }
  }
}
