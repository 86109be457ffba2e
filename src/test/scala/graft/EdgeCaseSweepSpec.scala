package graft

/** Adversarial-input sweep over the ENTIRE query surface — the Spark
  * analog of the reference's sqllogictest corpus habit of probing every
  * operator against degenerate relations (reference `test/sql/` carries
  * 2,446 `.test` files whose most common fixtures are empty tables,
  * single-row tables, and all-NULL groups).
  *
  * Every `SparkEntry.queries` entry must EXECUTE (plan + run to
  * completion) against:
  *   - an EMPTY corpus: every fixture table present with its real schema
  *     but zero rows — exercises empty-input paths through joins, aggs,
  *     windows, dedup blocking, ANN codebooks, recursive CTE seeds;
  *   - a ONE-ROW corpus: each table exactly one row — exercises
  *     single-row windows/frames, self-joins that find no partner,
  *     percentiles over one value, LSH banding of one document.
  *
  * The assertion is "runs and returns a well-formed result", not a value
  * check (values on degenerate corpora are pinned by the DuckDB oracle
  * for the oracled entries at the driver gate; here we hunt crashes:
  * head-of-empty, division by zero, index-out-of-bounds in driver-side
  * envelopes).
  */
class EdgeCaseSweepSpec extends SparkSpec {

  /** Empty + one-row fixture dirs derived once from the sf0.001 schemas
    * (via Tables.t so the events TIMESTAMP(NANOS) quirk is normalized
    * exactly as the engine reads it). Fresh temp paths per run keep the
    * Tables schema-cache invariant (never rewrite a cached path). */
  private lazy val dirs: (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_edge_").toString
    val (e, o, c) = (s"$base/empty", s"$base/onerow", s"$base/constant")
    Tables.names.foreach { n =>
      val src = Tables.t(spark, sf(), n)
      src.limit(0).coalesce(1).write.mode("overwrite").parquet(s"$e/$n.parquet")
      val one = src.limit(1)
      one.coalesce(1).write.mode("overwrite").parquet(s"$o/$n.parquet")
      // CONSTANT corpus: the same row 8 times — every PAYLOAD value a
      // duplicate, every grouping key a tie. Exercises all-duplicate
      // dedup, single-cluster funnels, 100%-contamination splits,
      // all-peer window frames, and degenerate-variance statistics (the
      // sqllogictest habit the empty/one-row fixtures don't reach:
      // n > 1 with zero diversity). The table's ROW-IDENTITY column
      // stays a valid key (base + 0..7): no real fixture can violate
      // the key contract, and duplicating e.g. event_id would turn the
      // event graph into a 7-fold self-loop multigraph whose 5-hop path
      // enumeration (tb_connected_chain) is combinatorially large BY
      // SEMANTICS — any engine asked for it must materialize ~8^6 rows
      // per chain, which is an OOM in a test harness, not a finding.
      val eight = Seq.fill(8)(one).reduce(_ union _)
      val constant = EdgeCaseSweepSpec.rowIdentity.get(n) match {
        case Some(k) =>
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.{col, lit, row_number}
          eight.withColumn(k,
            (col(k) + row_number().over(Window.orderBy(lit(1))) - 1)
              .cast(src.schema(k).dataType))
        case None => eight
      }
      constant.coalesce(1).write.mode("overwrite").parquet(s"$c/$n.parquet")
    }
    (e, o, c)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name on empty corpus") {
      val rows = fn(spark, dirs._1).collect()
      assert(rows != null)
    }
    test(s"$name on one-row corpus") {
      val rows = fn(spark, dirs._2).collect()
      assert(rows != null)
    }
    test(s"$name on constant corpus (8 identical rows)") {
      try assert(fn(spark, dirs._3).collect() != null)
      catch {
        // the one acceptable outcome besides a result: the engine's own
        // TYPED loud refusal — merging a source with duplicate keys is
        // ambiguous by contract (GraftTable.merge documents the
        // dedupe-first recipe), and a constant corpus is all duplicates
        case e: IllegalArgumentException
          if String.valueOf(e.getMessage).contains(
            "MERGE source has duplicate keys") => ()
      }
    }
  }
}

object EdgeCaseSweepSpec {
  /** Per-table row-identity column (the fixtures' key contract —
    * TESTDATA.md): kept unique in the constant corpus. lineitem's key is
    * composite (l_orderkey, l_linenumber); uniquifying the line number
    * yields the sharpest degenerate case ("one order, 8 identical lines"). */
  val rowIdentity: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_linenumber", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")
}
