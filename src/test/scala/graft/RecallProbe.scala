package graft

import org.apache.spark.sql.functions._

/** Dev probe: measure trained/sampled IVF recall vs brute force at a
  * given sf dir (run via Test/runMain graft.RecallProbe <dir>). Used to
  * pick the recall floor the q_sim_topk_ivf_trained gate pins. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Engine.session()
    val emb = graft.sources.Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(graft.ops.SimSearch.cosineTopK(emb))
    val trained = pairs(graft.ops.SimSearch.trainedIvfQ(spark, dir))
    val sampled = pairs(graft.ops.SimSearch.ivfTopK(emb))
    println(s"RECALL brute=${brute.size} trained=${(trained & brute).size.toDouble / brute.size} " +
      s"sampled=${(sampled & brute).size.toDouble / brute.size}")
    spark.stop()
  }
}
