package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine

/** Phase timing for the xb_ivfpq_recall_fullsf gate: where do its
  * ~5 s go at sf0.1 (2000×64-dim vectors — data is trivial, so the
  * wall is job-count × job floor and plan/codegen time)? */
object IvfPqGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm footers
    val qs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 20)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val truth = time("truth plan+exec") {
        graft.operators.Similarity.bruteForceTopKL2(
          corpus, "vec_id", "embedding", qs, "qid", "qvec", k = 5)
          .select(col("qid"), col("vec_id")).collect()
      }
      val cents = time("trainIvfCentroids") {
        graft.operators.Similarity.trainIvfCentroids(
          corpus, "embedding", 16, 2, seed = 42L)
      }
      val cb = time("trainPqCodebooks") {
        graft.operators.Similarity.trainPqCodebooks(
          corpus, "embedding", 8, 64, seed = 42L)
      }
      val approx = time("ivfPqTopK plan+exec") {
        graft.operators.Similarity.ivfPqTopK(
          corpus, "vec_id", "embedding", qs, "qid", "qvec",
          k = 5, c = 16, nprobe = 8, m = 8, ks = 64, rerank = 200,
          spill = 2).select(col("qid"), col("vec_id")).collect()
      }
      println(s"[probe] truth=${truth.length} approx=${approx.length}")
    }
    spark.stop()
  }
}
