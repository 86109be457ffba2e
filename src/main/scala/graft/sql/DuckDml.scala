package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import graft.sources.GraftTable
import DuckDialect.{GraftSqlException, Tok, tokenize}

/** SQL front-end for the DML surface: routes `INSERT INTO` / `DELETE
  * FROM` / `UPDATE … SET` statement STRINGS to the corresponding
  * `GraftTable` operations, so the write-path statements a DuckDB user
  * pastes work too (reference `src/execution/operator/persistent/
  * physical_{insert,delete,update}.cpp`; the read-side dialect is
  * `DuckDialect`).
  *
  * `tables` maps statement-level table names to GraftTable roots — the
  * catalog seam. The source query of an INSERT runs through
  * `DuckDialect.translate`, so dialect SQL works there as well;
  * DELETE/UPDATE predicates and assignment expressions are Spark
  * `expr()` strings after the same token-level function renames.
  *
  * Unsupported statements (MERGE strings, multi-table UPDATE, RETURNING)
  * throw `GraftSqlException` — the DataFrame API (`GraftTable.merge`)
  * covers MERGE.
  */
object DuckDml {

  private def words(toks: Vector[Tok]): Vector[Tok] = toks.filterNot(_.isWs)

  /** Execute one DML statement; returns the table root it mutated. */
  def exec(spark: SparkSession, tables: Map[String, String], sql: String): String = {
    val toks = words(tokenize(sql.stripSuffix(";")))
    def w(i: Int): String = if (i < toks.length) toks(i).word else ""
    def root(name: Tok): String = tables.getOrElse(name.text.toLowerCase,
      throw new GraftSqlException(
        s"unknown table '${name.text}' — register its GraftTable root in the catalog map"))
    def sourceQuery(fromTok: Int): DataFrame = {
      val src = DuckDialect.translate(rest(sql, toks, fromTok))
      tables.get("__dir") match {
        case Some(dir) => graft.Tables.sql(spark, dir, src)
        case None => spark.sql(src)
      }
    }
    w(0) match {
      case "create" =>
        // CREATE TABLE <name> AS <query> — materializes version 1 at the
        // catalog root registered for <name>
        if (w(1) != "table") throw new GraftSqlException("CREATE must be CREATE TABLE")
        val r = root(toks(2))
        if (w(3) != "as")
          throw new GraftSqlException(
            "only CREATE TABLE … AS SELECT is supported (schema-only CREATE needs a typed API: GraftTable.create)")
        GraftTable.create(spark, r, sourceQuery(4))
        r
      case "insert" =>
        if (w(1) != "into") throw new GraftSqlException("INSERT must be INSERT INTO")
        val r = root(toks(2))
        var i = 3
        var cols: Seq[String] = Nil
        if (i < toks.length && toks(i).is("(")) {
          // column list: words until the matching )
          val end = toks.indexWhere(_.is(")"), i)
          cols = toks.slice(i + 1, end).filter(_.kind == 4).map(_.text)
          i = end + 1
        }
        // remainder is the source query (VALUES … or SELECT …),
        // dialect-translated; fixture views are registered only when the
        // caller provides the reserved "__dir" catalog key
        val df0 = sourceQuery(i)
        // SQL INSERT is positional: with no column list the source maps
        // to the full table schema in order; with one, to those columns —
        // and unlisted table columns are NULL-filled (SQL semantics).
        // The list is validated (a typo must be loud, not a silent NULL)
        // and canonicalized case-insensitively (SQL identifiers are).
        val schema = GraftTable.schemaOf(r)
        val canon = schema.fieldNames.map(f => f.toLowerCase -> f).toMap
        val target =
          if (cols.isEmpty) schema.fieldNames.toSeq
          else cols.map(c => canon.getOrElse(c.toLowerCase,
            throw new GraftSqlException(
              s"unknown column '$c' in INSERT column list (table has ${schema.fieldNames.mkString(", ")})")))
        if (df0.columns.length != target.length)
          throw new GraftSqlException(
            s"INSERT arity mismatch: ${df0.columns.length} source columns for ${target.length} target columns")
        val named = df0.toDF(target: _*)
        val filled = schema.fieldNames.filterNot(target.contains)
          .foldLeft(named)((d, c) => d.withColumn(c,
            org.apache.spark.sql.functions.lit(null)
              .cast(schema(c).dataType)))
        GraftTable.insert(spark, r, filled)
        r
      case "delete" =>
        if (w(1) != "from") throw new GraftSqlException("DELETE must be DELETE FROM")
        val r = root(toks(2))
        if (w(3) != "where")
          throw new GraftSqlException("DELETE without WHERE is refused; use WHERE true to empty a table")
        GraftTable.delete(spark, r, expr(DuckDialect.translate(rest(sql, toks, 4))))
        r
      case "update" =>
        val r = root(toks(1))
        if (w(2) != "set") throw new GraftSqlException("UPDATE must be UPDATE <table> SET")
        // assignments: depth-0 comma-separated `col = expr`, up to WHERE
        val full = tokenize(sql.stripSuffix(";"))
        val setAt = indexOfWord(full, "set")
        val whereAt = indexOfWord(full, "where")
        val assignSpan = full.slice(setAt + 1, if (whereAt < 0) full.length else whereAt)
        // SET targets canonicalize case-insensitively through the table
        // schema, same as the INSERT column list (SQL identifiers are
        // case-insensitive; GraftTable.update requires exact field names)
        val schema = GraftTable.schemaOf(r)
        val canon = schema.fieldNames.map(f => f.toLowerCase -> f).toMap
        val assigns = splitTop(assignSpan, ",").map { item =>
          val eq = topIndexOf(item, "=")
          if (eq < 0) throw new GraftSqlException("UPDATE SET items must be col = expr")
          val colName = item.take(eq).filterNot(_.isWs) match {
            case Vector(t) if t.kind == 4 || t.kind == 3 => t.text.stripPrefix("\"").stripSuffix("\"")
            case _ => throw new GraftSqlException("UPDATE SET target must be a single column")
          }
          val target = canon.getOrElse(colName.toLowerCase,
            throw new GraftSqlException(
              s"unknown column '$colName' in UPDATE SET (table has ${schema.fieldNames.mkString(", ")})"))
          target -> expr(DuckDialect.translate(
            item.drop(eq + 1).map(_.text).mkString))
        }.toMap
        val pred =
          if (whereAt < 0) expr("true")
          else expr(DuckDialect.translate(
            full.drop(whereAt + 1).map(_.text).mkString))
        GraftTable.update(spark, r, pred, assigns)
        r
      case other =>
        throw new GraftSqlException(
          s"unsupported DML statement '$other' — supported: INSERT INTO, DELETE FROM, UPDATE … SET")
    }
  }

  /** Original-text remainder starting at non-ws token index `i`. */
  private def rest(sql: String, toks: Vector[Tok], i: Int): String = {
    val target = toks(i)
    // find the i-th non-ws token's position in the raw token stream, then
    // re-render from there
    val full = tokenize(sql.stripSuffix(";"))
    var seen = 0; var j = 0
    while (j < full.length) {
      if (!full(j).isWs) {
        if (seen == i) return full.drop(j).map(_.text).mkString
        seen += 1
      }
      j += 1
    }
    throw new GraftSqlException(s"statement ended before expected token ${target.text}")
  }

  private def indexOfWord(toks: Vector[Tok], word: String): Int = {
    var d = 0; var i = 0
    while (i < toks.length) {
      if (toks(i).is("(")) d += 1
      else if (toks(i).is(")")) d -= 1
      else if (d == 0 && toks(i).kind == 4 && toks(i).word == word) return i
      i += 1
    }
    -1
  }

  private def topIndexOf(toks: Vector[Tok], sym: String): Int = {
    var d = 0; var i = 0
    while (i < toks.length) {
      if (toks(i).is("(")) d += 1
      else if (toks(i).is(")")) d -= 1
      else if (d == 0 && toks(i).is(sym)) return i
      i += 1
    }
    -1
  }

  private def splitTop(toks: Vector[Tok], sep: String): Vector[Vector[Tok]] = {
    val out = Vector.newBuilder[Vector[Tok]]
    var d = 0; var s = 0
    toks.indices.foreach { i =>
      if (toks(i).is("(")) d += 1
      else if (toks(i).is(")")) d -= 1
      else if (d == 0 && toks(i).is(sep)) { out += toks.slice(s, i); s = i + 1 }
    }
    out += toks.slice(s, toks.length)
    out.result()
  }
}
