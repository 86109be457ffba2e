package graft.sql

import graft.SparkSpec

/** The reference's JOB/IMDB corpus executed verbatim over the synthetic
  * coverage-dense fixture (scripts/stage_imdb.py). The DuckDB oracle
  * gate is the value check for all 113 (imdb_q01a..q33c); this spec
  * pins the harness and the generator's CORE INVARIANT — that the
  * hardest conjunctive chains are non-empty, so the gate compares real
  * values rather than trivially-agreeing NULLs. */
class JobVerbatimSpec extends SparkSpec {

  test("all 113 reference query ids are discovered") {
    assert(JobVerbatim.queryIds.length === 113)
    assert(JobVerbatim.queryIds.head === "01a")
    assert(JobVerbatim.queryIds.last === "33c")
    assert(JobVerbatim.queries.size === 113 &&
      JobVerbatim.oracle.size === 113)
  }

  test("query texts load verbatim: semicolon stripped, body unmodified") {
    val ref = new String(java.nio.file.Files.readAllBytes(java.nio.file
      .Paths.get(JobVerbatim.queriesDir, "19d.sql")), "UTF-8")
      .trim.stripSuffix(";")
    assert(JobVerbatim.queryText("19d") === ref,
      "19d is BASELINE.md's headline query — must run unmodified")
  }

  test("hard conjunctive chains return single fully-non-NULL rows") {
    // the generator's golden-person/curated-title layer exists exactly
    // for these: 29a (17-table Shrek-2 voice chain), 08b (anime
    // actress), 07b (1980-84 Volker-Boehm biography), 33b ([nl]
    // tv-series link with a <3.0-rated 2007 peer), 20b (Downey as
    // Tony Stark / Iron Man)
    Seq("29a", "08b", "07b", "33b", "20b", "19d").foreach { id =>
      val rows = JobVerbatim.run(spark, id).collect()
      assert(rows.length === 1, s"$id: JOB queries are global MINs")
      assert(rows(0).toSeq.forall(_ != null),
        s"$id returned NULL min(s) — the coverage layer regressed")
    }
  }

  test("oracle texts bind all 21 tables to the fixture parquet") {
    val o = JobVerbatim.oracleText("01a")
    JobVerbatim.tables.foreach(t =>
      assert(o.contains(s"$t AS (SELECT * FROM read_parquet")))
    assert(o.contains("imdb/title.parquet"))
  }
}
