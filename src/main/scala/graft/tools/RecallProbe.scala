package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scratch probe (not part of the library surface): measures whether the
  * LSH pipelines' verified pair sets EQUAL the exact-predicate pair sets at
  * the driver's gate scale factor — the condition for the d3p/d5p
  * full-equality oracles — and how close the nearest non-pairs sit to the
  * thresholds (float-boundary risk for the DuckDB recompute).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.build(appName = "graft-recall-probe")
    import spark.implicits._

    // ---- d3: minhash LSH vs exact Jaccard >= 0.8 on 3-shingle sets ------
    val docs = Tables.load(spark, sfDir, "documents")
    val flagged3 = Dedup.minhashLshPairs(docs).distinct().as[(Long, Long)]
      .collect().toSet
    val sh = docs.select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(3)).as("hs"))
      .withColumn("n", size(col("hs"))).filter(col("n") > 0)
      .persist()
    val l = sh.toDF("i", "si", "ni")
    val r = sh.toDF("j", "sj", "nj")
    val exactJac = l.join(r, col("i") < col("j"))
      .withColumn("inter",
        call_function("graft_intersect_size", col("si"), col("sj")).cast("double"))
      .withColumn("uni", col("ni") + col("nj") - col("inter"))
      .withColumn("jac", col("inter") / col("uni"))
    val exact3 = exactJac.filter(col("jac") >= 0.8)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    val nearMiss3 = exactJac.filter(col("jac") >= 0.75 && col("jac") < 0.85)
      .count()
    println(s"[d3] flagged=${flagged3.size} exact=${exact3.size} " +
      s"missed=${(exact3 -- flagged3).size} spurious=${(flagged3 -- exact3).size} " +
      s"jac_in_[0.75,0.85)=$nearMiss3")

    // ---- d4: simhash banding vs exact hamming <= 3 ----------------------
    val sigs = docs.select(col("doc_id"),
      call_function("graft_simhash", col("text")).as("sig")).persist()
    val flagged4 = Dedup.simhashPairsFromSig(sigs).distinct().as[(Long, Long)]
      .collect().toSet
    val sl = sigs.toDF("i", "si")
    val sr = sigs.toDF("j", "sj")
    val exact4 = sl.join(sr, col("i") < col("j"))
      .filter(bit_count(col("si").bitwiseXOR(col("sj"))) <= 3)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    println(s"[d4] flagged=${flagged4.size} exact=${exact4.size} " +
      s"missed=${(exact4 -- flagged4).size} spurious=${(flagged4 -- exact4).size}")

    // ---- d5: embedding LSH vs exact cosine >= 0.95 ----------------------
    val embs = Tables.load(spark, sfDir, "embeddings")
    val flagged5 = Dedup.embeddingCosinePairs(embs).distinct().as[(Long, Long)]
      .collect().toSet
    val v = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v")).persist()
    val vl = v.toDF("i", "vi")
    val vr = v.toDF("j", "vj")
    val cos = vl.join(vr, col("i") < col("j"))
      .withColumn("c", graft.operators.Similarity.cosine(col("vi"), col("vj")))
    val exact5 = cos.filter(col("c") >= 0.95)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    val nearMiss5 = cos.filter(col("c") >= 0.94 && col("c") < 0.96).count()
    val maxBelow = cos.filter(col("c") < 0.95).agg(max(col("c"))).as[Double].head()
    println(s"[d5] flagged=${flagged5.size} exact=${exact5.size} " +
      s"missed=${(exact5 -- flagged5).size} spurious=${(flagged5 -- exact5).size} " +
      s"cos_in_[0.94,0.96)=$nearMiss5 max_below_thresh=$maxBelow")

    Dedup.unpersistAll()
    spark.stop()
  }
}
