package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiler for the x26 merge branches: times each store's
  * merge path in isolation (count_before ⨯ count_after over the real
  * pin stores) so a regression in the compaction audit can be
  * attributed to ONE merge path instead of re-measuring the 8-way
  * union. Not part of the driver contract.
  *
  * r19: also times the FULL x26 statement per lap (wall + process-CPU
  * + GC — the bench's three-signal read) across `passes` steady laps
  * (arg 1, default 3), so a steady-channel inversion like r18's
  * driver-side 25.4 s (vs 9.7 s first pass, 6.9 s builder steady) is
  * attributable from a committed profile: flat CPU across laps with
  * inflated wall ⇒ box contention; growing CPU ⇒ recompute in one of
  * the branch timings below.
  */
object AuditProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(appName = "graft-audit-profile")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    import graft.operators.{Curriculum, Dedup, Privacy}
    import graft.queries.Pipeline
    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def cpuNow(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
    def gcNow(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ >= 0).sum
    }
    def time(name: String)(body: => Unit): Unit = {
      val c0 = cpuNow(); val g0 = gcNow()
      val t0 = System.nanoTime()
      body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu ${(cpuNow() - c0) / 1e9}%8.2f s  gc ${(gcNow() - g0) / 1e3}%6.2f s")
      Dedup.unpersistAll()
    }
    time("prebuild") { Pipeline.prebuildModels(spark, dir) }
    // the full statement, steady: lap 1 is the first pass (scan/codegen
    // first-touch), laps 2..n are the steady channel
    val x26 = graft.SparkEntry.queries("x26_compaction_audit")
    (1 to passes).foreach { lap =>
      time(s"x26_full#$lap") {
        x26(spark, dir).write.format("noop").mode("overwrite").save()
      }
    }
    val stores = Pipeline.x25StoresShared(spark, dir)
    val drop = Pipeline.pinDropShared(spark, dir)
    def count2(b: org.apache.spark.sql.DataFrame,
        a: org.apache.spark.sql.DataFrame): Unit =
      b.agg(count(lit(1))).crossJoin(a.agg(count(lit(1))))
        .write.format("noop").mode("overwrite").save()
    (1 to passes).foreach { pass =>
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
