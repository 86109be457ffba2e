package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import DuckDialect.{GraftSqlException, Tok}

/** DuckDB `UNPIVOT` statement front-end (reference:
  * `src/parser/transform/statement/transform_pivot_stmt.cpp` — DuckDB
  * parses UNPIVOT into the same pivot-statement node with a direction
  * flag; grammar `UNPIVOT <source> ON <col>, … INTO NAME <n> VALUE <v>`).
  *
  * Unlike PIVOT, the expansion needs NO schema discovery — the ON list
  * is explicit — so the translation is a pure text rewrite onto Spark's
  * native UNPIVOT clause:
  *
  *   UNPIVOT src ON a, b INTO NAME m VALUE v
  *     →  SELECT * FROM (src) graft_unpivot_src UNPIVOT (v FOR m IN (a, b))
  *
  * Both engines exclude NULL-valued cells by default (probed: a NULL
  * measure column produces no row on either side) and emit the same
  * column order (pass-through columns, then NAME, then VALUE).
  *
  * Refused loudly: `ON col AS 'alias'` (probed on DuckDB 1.0 — an alias
  * silently CHANGES which columns unpivot, keeping un-aliased siblings
  * as pass-through, so a faithful rewrite would need DuckDB's exact
  * bug-for-bug column partition), `ON COLUMNS(...)` star forms, and
  * multi-column VALUE lists (DuckDB stacks N columns per row; Spark's
  * IN-list groups differ in naming). */
object UnpivotStatement {

  def run(spark: SparkSession, dir: String, stmt: String): DataFrame =
    Tables.sql(spark, dir, spell(stmt))

  /** The schema-free text rewrite alone — also the path
    * `DuckDialect.translate` (hence the session fallback parser) takes
    * for statement-head UNPIVOT, which needs no session at all. */
  def spell(stmt: String): String = {
    val toks = DuckDialect.tokenize(stmt).filterNot(t => t.kind == 1)
    def refuse(msg: String): Nothing = throw new GraftSqlException(
      s"UNPIVOT: $msg — or use Dataset.unpivot(ids, values, variableColumnName, valueColumnName)")
    val nw = toks.filterNot(_.isWs)
    require(nw.nonEmpty && nw.head.word == "unpivot", s"not an UNPIVOT statement: $stmt")
    var i = 1
    def word(j: Int): String = if (j < nw.length) nw(j).word else ""
    def identText(t: Tok): String =
      if (t.kind == 3) t.text.substring(1, t.text.length - 1) else t.text
    // source: bare table name or parenthesized subquery (same contract
    // as PivotStatement)
    val srcSql: String =
      if (nw(i).is("(")) {
        var d = 0; val sb = new StringBuilder; var done = false
        while (i < nw.length && !done) {
          if (nw(i).is("(")) d += 1 else if (nw(i).is(")")) d -= 1
          if (d == 0) done = true
          else if (!(d == 1 && nw(i).is("("))) { sb.append(nw(i).text); sb.append(' ') }
          i += 1
        }
        sb.toString
      } else if (nw(i).kind == 3 || nw(i).kind == 4) {
        val n = identText(nw(i)); i += 1; s"SELECT * FROM $n"
      } else refuse("source must be a table name or a parenthesized query")
    if (word(i) != "on") refuse("expected ON <column list>")
    i += 1
    val cols = Seq.newBuilder[String]
    var expectIdent = true
    while (i < nw.length && word(i) != "into") {
      if (expectIdent) {
        if (word(i) == "columns")
          refuse("ON COLUMNS(...) star forms are unsupported — list the columns")
        if (nw(i).kind != 3 && nw(i).kind != 4)
          refuse("ON must list plain columns")
        cols += identText(nw(i)); expectIdent = false
      } else {
        if (word(i) == "as")
          refuse("ON ... AS aliases are unsupported (DuckDB silently keeps " +
            "un-aliased siblings as pass-through columns when any alias is present)")
        if (!nw(i).is(",")) refuse(s"unexpected token in ON list: ${nw(i).text}")
        expectIdent = true
      }
      i += 1
    }
    val onCols = cols.result()
    if (onCols.isEmpty) refuse("ON list is empty")
    if (word(i) != "into" || word(i + 1) != "name")
      refuse("expected INTO NAME <column> VALUE <column>")
    i += 2
    if (i >= nw.length || (nw(i).kind != 3 && nw(i).kind != 4))
      refuse("NAME must be a single identifier")
    val nameCol = identText(nw(i)); i += 1
    if (word(i) != "value") refuse("expected VALUE <column>")
    i += 1
    if (i >= nw.length || (nw(i).kind != 3 && nw(i).kind != 4))
      refuse("VALUE must be a single identifier")
    val valueCol = identText(nw(i)); i += 1
    if (i < nw.length && nw(i).is(","))
      refuse("multi-column VALUE lists are unsupported (per-row column " +
        "stacking has no Spark UNPIVOT equivalent)")
    if (i < nw.length) refuse(s"unexpected trailing tokens: ${nw(i).text}")
    s"""SELECT * FROM (${DuckDialect.translate(srcSql)}) graft_unpivot_src
       |UNPIVOT (`$valueCol` FOR `$nameCol` IN (${onCols.map(c => s"`$c`").mkString(", ")}))""".stripMargin
  }
}
