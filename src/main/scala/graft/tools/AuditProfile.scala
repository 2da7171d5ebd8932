package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiler for the x26 merge branches: times each store's
  * merge path in isolation (count_before ⨯ count_after over the real
  * pin stores) so a regression in the compaction audit can be
  * attributed to ONE merge path instead of re-measuring the 8-way
  * union. Not part of the driver contract.
  */
object AuditProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(appName = "graft-audit-profile")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.{Curriculum, Dedup, Privacy}
    import graft.queries.Pipeline
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Dedup.unpersistAll()
    }
    time("prebuild") { Pipeline.prebuildModels(spark, dir) }
    val stores = Pipeline.x25StoresShared(spark, dir)
    val drop = Pipeline.pinDropShared(spark, dir)
    def count2(b: org.apache.spark.sql.DataFrame,
        a: org.apache.spark.sql.DataFrame): Unit =
      b.agg(count(lit(1))).crossJoin(a.agg(count(lit(1))))
        .write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { pass =>
      time(s"span#$pass") { count2(stores("span_index"),
        Dedup.spanIndexMerge(stores("span_index"), drop, n = 8)) }
      time(s"charspan#$pass") { count2(stores("charspan_index"),
        Dedup.spanIndexCharsMerge(stores("charspan_index"), drop, n = 40)) }
      time(s"postings#$pass") { count2(stores("tfidf_postings"),
        Dedup.postingsMerge(stores("tfidf_postings"), drop)) }
      time(s"mh#$pass") { count2(stores("mh_index"),
        Dedup.minhashIndexMerge(stores("mh_index"), drop)) }
      time(s"prefix#$pass") { count2(stores("prefix_index"),
        Dedup.prefixIndexMerge(stores("prefix_index"), drop)) }
      time(s"secrets#$pass") { count2(stores("secrets_index"),
        Privacy.secretIndexMerge(stores("secrets_index"), drop)) }
      time(s"components#$pass") { count2(stores("components"),
        Dedup.componentsIndexMerge(stores("components"), drop,
          basePostings = Some(Pipeline.pinCompPostingsShared(spark, dir)),
          baseDf = Some(Pipeline.pinCompDfShared(spark, dir)))) }
      time(s"compDelete#$pass") {
        val rev = Pipeline.x25StoresShared(spark, dir)("components")
          .filter(col("dst").isNull && col("doc_id") % 10 === 1)
          .select(col("doc_id"))
        count2(stores("components"),
          Dedup.componentsIndexDelete(stores("components"), rev))
      }
      time(s"curriculum#$pass") { count2(Pipeline.curriculumOlderShared(spark, dir),
        Curriculum.curriculumIndexMerge(Pipeline.curriculumOlderShared(spark, dir),
          Pipeline.curriculumDropShared(spark, dir))) }
    }
    spark.stop()
  }
}
