package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = table("embeddings")
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))

  test("brute force top-k: self-similarity ranks first when query in corpus") {
    val all = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .filter($"qid" < 3)
    val r = Similarity.bruteForceTopK(emb, "vec_id", "embedding", all, "qid", "qvec", 1)
      .collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1),
      "nearest neighbor of a vector must be itself"))
  }

  test("brute force top-k returns exactly k rows per query, ranked") {
    val r = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
    val counts = r.groupBy($"qid").count().collect()
    assert(counts.forall(_.getLong(1) === 5))
    // cosine non-increasing within each query
    val rows = r.orderBy($"qid", $"rk").collect()
    rows.grouped(5).foreach { g =>
      val cs = g.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k recall@5 >= 0.5 vs brute force") {
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // synthetic embeddings are near-random (median pairwise cosine ~0),
    // so recall needs multi-probe: planes=6, tables=8, Hamming-1 probing
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5,
        planes = 6, tables = 8, probes = 1)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("int8 quantization: error bounded by scale/2, top-k recall@5 >= 0.9") {
    val q = emb.select($"vec_id", Similarity.quantizeInt8($"embedding").as("q"), $"embedding")
    // per-component reconstruction error <= scale/2 (+ eps for fp)
    val violations = q.select(
      aggregate(
        zip_with(Similarity.dequantizeInt8($"q"), $"embedding",
          (a, b) => abs(a - b.cast("double"))),
        lit(0.0), (acc, e) => greatest(acc, e)).as("err"),
      $"q.scale".as("s"))
      .filter($"err" > $"s" / 2 + 1e-9).count()
    assert(violations === 0L, "reconstruction error exceeded scale/2")

    // ranking survives quantization: top-5 over dequantized vectors
    val dq = q.select($"vec_id", Similarity.dequantizeInt8($"q").as("embedding"))
      .filter($"vec_id" >= 10)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.bruteForceTopK(dq, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall too low: $recall")
  }

  test("IVF top-k: scaled-copy queries find their originals at rank 1") {
    // a scaled copy keeps every centroid cosine, so it lands in the
    // same cell as its original and scores cosine 1.0 with it —
    // deterministic recall 1 at any nprobe >= 1
    val planted = corpus.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 1000000).as("qid"),
        transform($"embedding", x => x * lit(2.0f)).as("qvec"))
    val r = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        planted, "qid", "qvec", k = 1, c = 8, nprobe = 1)
      .collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getLong(1) === row.getLong(0) - 1000000,
      s"expected original of ${row.getLong(0)}, got ${row.getLong(1)}"))
  }

  test("IVF top-k recall@5 >= 0.5 vs brute force at nprobe = c/2") {
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5,
        c = 16, nprobe = 8)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("LSH bucketing is deterministic across invocations") {
    val b1 = Similarity.withLshBucket(emb, "embedding", 8, 42L)
      .select($"vec_id", $"__bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = Similarity.withLshBucket(emb, "embedding", 8, 42L)
      .select($"vec_id", $"__bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 === b2)
  }

  test("k-means: well-separated direction clusters are recovered exactly") {
    // 3 orthogonal-ish base directions, 20 jittered members each —
    // Lloyd must put every member with its base direction's group
    val base = Seq(
      Array.tabulate(8)(j => if (j < 3) 1.0f else 0.0f),
      Array.tabulate(8)(j => if (j >= 3 && j < 6) 1.0f else 0.0f),
      Array.tabulate(8)(j => if (j >= 6) 1.0f else 0.0f))
    val rows = for (c <- 0 until 3; m <- 0 until 20) yield {
      val jitter = Array.tabulate(8)(j => ((c * 31 + m * 17 + j * 7) % 13) / 130.0f)
      (c * 100L + m, base(c).zip(jitter).map { case (b, e) => b + e })
    }
    val df = rows.toDF("id", "vec").repartition(1)
    val assigned = Similarity.kMeans(df, "id", "vec", k = 3, iters = 4)
      .select($"id", $"cell").collect().map(r => (r.getLong(0), r.getInt(1)))
    val byTrueCluster = assigned.groupBy(_._1 / 100).map { case (c, xs) => c -> xs.map(_._2).toSet }
    assert(byTrueCluster.values.forall(_.size == 1), s"split cluster: $byTrueCluster")
    assert(byTrueCluster.values.flatten.toSet.size == 3, s"merged clusters: $byTrueCluster")
  }

  test("k-means assignment is norm-invariant: scaled copies share a cell") {
    val cents = Similarity.kMeansTrain(emb, "embedding", k = 8, iters = 2)
    val doubled = emb.select($"vec_id",
      transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val a = Similarity.kMeansAssign(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Similarity.kMeansAssign(doubled, "vec_id", "embedding", cents)
      .select($"vec_id", $"cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
  }

  test("PQ codes are within [0, ks) and encoding is deterministic") {
    val cb = Similarity.trainPqCodebooks(emb, "embedding", m = 4, ks = 16)
    assert(cb.length === 4 && cb.forall(_.length === 16))
    val e1 = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 16)))
    val e2 = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1 === e2)
  }

  test("PQ ADC distance equals the reconstructed-centroid L2 (local recompute)") {
    // ADC sums per-subspace squared distances to the ASSIGNED centroid;
    // that is exactly l2(query, reconstruction-from-codebook) — verify
    // the expression pipeline against a driver-local recompute
    // train on the SAME frame pqTopK trains on (corpus) — same
    // deterministic sample, same codebooks
    val cb = Similarity.trainPqCodebooks(corpus, "embedding", m = 4, ks = 16)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = queries.limit(2).collect()
      .map(r => r.getLong(0) -> vecs(r.getLong(0)))
    val got = Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries.limit(2), "qid", "qvec", k = 3, m = 4, ks = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dsub = cb(0)(0).length
    got.foreach { case ((qid, cid), adc) =>
      val qv = q.find(_._1 == qid).get._2
      val recon = codes(cid).zipWithIndex.flatMap { case (c, s) => cb(s)(c) }
      val exp = math.sqrt(qv.indices.map { j =>
        val d = qv(j) - recon(j); d * d
      }.sum)
      assert(math.abs(adc - exp) < 1e-6, s"ADC mismatch for ($qid,$cid): $adc vs $exp")
    }
  }

  test("PQ top-k recall@5 >= 0.5 vs exact L2 brute force") {
    import graft.functions.VectorFunctions._
    val exact = corpus.crossJoin(broadcast(queries))
      .select($"qid", $"vec_id", l2_distance($"embedding", $"qvec").as("d"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")))
      .filter($"rk" <= 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-random 64-dim embeddings need a fine product grid: m=16
    // subspaces of 4 dims, 32 centroids each (32^16 cells)
    val approx = Similarity.pqTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5,
        m = 16, ks = 32)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall too low: $recall")
  }

  test("IVF-PQ composed index: recall@5 >= 0.5 vs exact, exactly k ranked rows") {
    import graft.functions.VectorFunctions._
    val exact = corpus.crossJoin(broadcast(queries))
      .select($"qid", $"vec_id", l2_distance($"embedding", $"qvec").as("d"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")))
      .filter($"rk" <= 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, c = 8, nprobe = 6, m = 8, ks = 32, rerank = 100)
      .collect()
    // shape: k rows per query, ranks 1..k, exact l2 carried
    assert(rows.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getLong(3)).sorted.toSeq == (1L to 5L) })
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall too low: $recall")
  }
}
