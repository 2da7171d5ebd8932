package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Interleaved A/B probe: plain vs bucketed corpus scan feeding the
  * same tokenize+cover pipeline shape, N alternating reps in ONE JVM so
  * JIT/box noise hits both sides equally. Diagnostic only.
  */
object ScanAB {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-scanab")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def pipe(d: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val toks = d.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      val g = toks.filter(size(col("toks")) >= 8)
        .select(col("doc_id"), posexplode(
          graft.functions.TextFunctions.wordShingles(col("toks"), 8)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"),
          xxhash64(col("col")).as("gh"))
      val covers = g.filter(col("gh") % 7 === 0)
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + 7)).as("i"))
        .groupBy(col("doc_id")).agg(collect_set(col("i")).as("cov"))
      toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), size(col("toks")).as("n"),
          size(filter(col("toks"), (_, i) => !coalesce(
            array_contains(col("cov"), i + 1), lit(false)))).as("k"))
    }
    val plain = Tables.load(spark, dir, "documents")
    val bkt = graft.queries.Pipeline.bucketedDocsShared(spark, dir)
    def run(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      pipe(d).write.format("noop").mode("overwrite").save()
      println(f"[scanab] $tag wall ${(System.nanoTime() - t0) / 1e9}%6.2f " +
        f"cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%6.2f")
    }
    run("warm-plain", plain); run("warm-bkt", bkt)
    (1 to reps).foreach { _ => run("plain", plain); run("bkt  ", bkt) }
    spark.stop()
  }
}
