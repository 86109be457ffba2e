package graft

/** Dev tool (r17): break a verbatim gate entry's wall time into
  * register-views / translate / analyze / execute, to aim optimization at
  * the real cost. Run:
  * `sbt "runMain graft.VerbatimProf imdb 01a 08a" ` or
  * `sbt "runMain graft.VerbatimProf tpcds 1 14 88"`. */
object VerbatimProf {
  def main(args: Array[String]): Unit = {
    val suite = args.head
    val ids = args.tail.toSeq
    val spark = EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    def ms(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    // one warm pass so JVM/codegen are hot, as in the mid-gate regime
    ids.foreach { id =>
      val n = if (suite == "imdb") s"imdb_q$id" else f"tpcds_q${id.toInt}%02d"
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .write.format("noop").mode("overwrite").save()
    }
    for (_ <- 1 to 3; id <- ids) {
      var df: org.apache.spark.sql.DataFrame = null
      var sql: String = null
      val (reg, trans, analyze, exec) = suite match {
        case "imdb" =>
          val r = ms(graft.sql.JobVerbatim.tables.foreach(t =>
            Tables.registerView(spark, t,
              Tables.t(spark, graft.sql.JobVerbatim.fixtureRoot, t))))
          val t = ms { sql = graft.sql.DuckDialect.translate(
            graft.sql.JobVerbatim.queryText(id)) }
          val a = ms { df = spark.sql(sql) }
          val e = ms(df.write.format("noop").mode("overwrite").save())
          (r, t, a, e)
        case _ =>
          val n = id.toInt
          val fixDir = s"${graft.sql.TpcdsVerbatim.fixtureRoot}/sf0.01"
          val r = ms(graft.sql.TpcdsVerbatim.tables.foreach(t =>
            Tables.registerView(spark, t, Tables.t(spark, fixDir, t))))
          val t = ms { sql = graft.sql.DuckDialect.translate(
            graft.sql.TpcdsVerbatim.queryText(n)) }
          val a = ms { df = spark.sql(sql) }
          val e = ms(df.write.format("noop").mode("overwrite").save())
          (r, t, a, e)
      }
      System.err.println(
        s"[prof] $suite $id register=${reg}ms translate=${trans}ms " +
          s"analyze=${analyze}ms execute=${exec}ms")
    }
    spark.stop()
  }
}
