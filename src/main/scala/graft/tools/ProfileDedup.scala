package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Dedup

/** Scratch profiling main: where does dedup_minhash time go? */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingles count") {
      d.select(Dedup.wordShingles(col("text"), 3).as("sh")).agg(sum(size(col("sh")))).collect()
    }
    time("signature count") {
      d.select(Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), 16).as("s"))
        .agg(sum(size(col("s")))).collect()
    }
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text")
    val n = time("lsh pairs count") { pairs.count() }
    println(s"[profile] candidate pairs: $n")
    time("full dedup count") { Dedup.minhashDedup(d, "doc_id", "text", threshold = 0.7).count() }
    time("simhash pairs count") { Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3).count() }
    spark.stop()
  }
}
