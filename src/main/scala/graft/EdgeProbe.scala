package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: edge counts + distributed-round counts of the x16/x26
  * component inputs at a given scale (sizes the driver union-find heap
  * gate against real blow-up corpora). */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = s"emb:$d"
    val emb = operators.SimilarityOps.checkedEmbeddings(spark, d)
    val nBits = operators.SimilarityOps.scaledLshBits(
      operators.SimilarityOps.cachedCount(key, emb))
    val e = operators.SimilarityOps.cachedBucketedFrame(key, emb, nBits,
      Seq(42L), operators.SimilarityOps.EmbeddingDim)
    val pairs = operators.TextOps.semanticPairs(e, 0.25)
    println(s"[edgeprobe] x26 edges at $d = ${pairs.count()}")
    val lex = operators.TextOps.cachedVerifiedPairs(spark, d, 16, 4, 0.5)
    println(s"[edgeprobe] x16 edges at $d = ${lex.count()}")
    spark.stop()
  }
}
