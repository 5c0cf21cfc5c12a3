package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.grafttest.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorIndex}

/** The persisted IVF-PQ index: build-once/query-many semantics, frozen-
  * model append maintenance, spill dedup, and the zero-training-jobs
  * claim the whole component exists for. */
class VectorIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = table("embeddings")
  private lazy val corpus = emb.filter($"vec_id" >= 10)
    .select($"vec_id", $"embedding")
  private lazy val queries = emb.filter($"vec_id" < 10)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))

  /** A path that does NOT exist yet (build refuses to clobber). */
  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_vix_$tag").toFile
    d.delete()
    d.getAbsolutePath
  }

  /** Exact job count for `body`: listener + ordered-bus flush. */
  private def countJobs(body: => Unit): Int = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { body; ListenerBridge.waitUntilEmpty(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("build → full-probe topK equals brute-force L2 exactly (model round-trip + spill dedup)") {
    val path = freshPath("exact")
    val n = VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 16, m = 8, ks = 64, spill = 2)
    assert(n === corpus.count(), "build must return corpus rows indexed, not spill-multiplied codes rows")
    // nprobe = c probes every cell and rerank >= corpus keeps the whole
    // shortlist, so the persisted path (model JSON round-trip, codes
    // table, ADC, exact rerank) must reproduce brute force bit-exactly
    val got = VectorIndex.topK(spark, path, corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nprobe = 16, rerank = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = Similarity.bruteForceTopKL2(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("spill=2 leaves no duplicate (qid, vec_id) pairs and exactly k rows per query") {
    val path = freshPath("dedup")
    VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 2)
    val r = VectorIndex.topK(spark, path, corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, nprobe = 4, rerank = 100)
    assert(r.groupBy($"qid", $"vec_id").count().filter($"count" > 1).isEmpty)
    val perQ = r.groupBy($"qid").count().collect()
    assert(perQ.length === 10 && perQ.forall(_.getLong(1) === 5))
  }

  test("partial-probe recall@5 >= 0.85 vs L2 ground truth (spill=2 recall lever)") {
    val path = freshPath("recall")
    VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 16, m = 8, ks = 64, spill = 2)
    val truth = Similarity.bruteForceTopKL2(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorIndex.topK(spark, path, corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nprobe = 8, rerank = 200)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(approx).size.toDouble / truth.size
    assert(recall >= 0.85, s"recall@5 $recall below 0.85")
  }

  test("append: frozen-model encode, returns input rows, appended vectors queryable") {
    val path = freshPath("append")
    val partA = corpus.filter($"vec_id" < 400)
    val partB = corpus.filter($"vec_id" >= 400)
    VectorIndex.build(partA, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 2)
    val modelBefore = VectorIndex.load(spark, path)
    val appended = VectorIndex.append(partB, "vec_id", "embedding", path)
    assert(appended === partB.count(), "append must return the input rows appended")
    // the model is FROZEN by append — byte-identical centroids/codebooks
    val modelAfter = VectorIndex.load(spark, path)
    assert(modelAfter.centroids.map(_.toSeq).toSeq === modelBefore.centroids.map(_.toSeq).toSeq)
    // a query equal to an appended vector must now find it at rank 1, l2=0
    val probe = partB.limit(1).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probeId = probe.head().getLong(0)
    val hit = VectorIndex.topK(spark, path, corpus, "vec_id", "embedding",
        probe, "qid", "qvec", k = 1, nprobe = 8, rerank = 50)
      .head()
    assert(hit.getLong(1) === probeId && hit.getDouble(2) === 0.0)
  }

  test("load runs ZERO Spark jobs — repeat queries pay no training work") {
    val path = freshPath("zerojobs")
    VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 1)
    val jobs = countJobs { VectorIndex.load(spark, path) }
    assert(jobs === 0, s"load launched $jobs Spark jobs; must be driver-only")
  }

  test("repeat topK job count is flat (no per-query retraining), below the retraining path's") {
    val path = freshPath("flat")
    VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 1)
    def q() = countJobs {
      VectorIndex.topK(spark, path, corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nprobe = 4, rerank = 100).collect()
    }
    val first = q(); val second = q()
    assert(second === first, s"second query ran $second jobs vs first $first — training leaked into query")
    // the whole point of persistence: the per-call job count must be
    // strictly below the train-per-query path on the same parameters
    val retrain = countJobs {
      Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, c = 8, nprobe = 4, m = 8, ks = 16,
        rerank = 100).collect()
    }
    assert(second < retrain,
      s"persisted query ($second jobs) should launch fewer jobs than per-query retraining ($retrain)")
  }

  test("build refuses to clobber; crash-mid-build (no model) leaves no readable index") {
    val path = freshPath("occ")
    VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 1)
    intercept[IllegalArgumentException] {
      VectorIndex.build(corpus, "vec_id", "embedding", path,
        c = 8, m = 8, ks = 16, spill = 1)
    }
    // simulate a crash between codes write and model publish: the model
    // file is the commit record — without it the index must be unreadable
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_model.json"), false)
    intercept[java.io.FileNotFoundException] { VectorIndex.load(spark, path) }
    // recovery = rebuild: overwrite-mode codes write + fresh model publish
    val n = VectorIndex.build(corpus, "vec_id", "embedding", path,
      c = 8, m = 8, ks = 16, spill = 1)
    assert(n === corpus.count())
  }
}
