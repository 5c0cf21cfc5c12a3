package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = table("documents")
    .select($"doc_id", $"text".cast("binary").as("payload"))

  test("decodeImages attaches metadata struct per row, partition-parallel") {
    val out = Multimodal.decodeImages(docs, "payload")
    assert(out.count() === docs.count())
    val m = out.select($"meta.width", $"meta.height", $"meta.channels", $"meta.format").head
    assert(m.getInt(0) >= 64 && m.getInt(1) >= 64 && m.getInt(2) === 3)
    assert(Set("png", "jpeg").contains(m.getString(3)))
  }

  test("decode is deterministic (stub derives from payload bytes)") {
    val a = Multimodal.decodeImages(docs, "payload").select($"doc_id", $"meta.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Multimodal.decodeImages(docs, "payload").select($"doc_id", $"meta.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
  }

  test("resize emits scale factors") {
    val out = Multimodal.resizeMeta(Multimodal.decodeImages(docs, "payload"), "meta", 224, 224)
    val r = out.select($"resized.width", $"resized.scale_x").head
    assert(r.getInt(0) === 224)
    assert(r.getDouble(1) > 0)
  }

  test("frame sampling explodes n_frames rows and prunes the binary column") {
    val frames = Multimodal.sampleFrames(docs, "doc_id", "payload")
    val perDoc = frames.groupBy($"doc_id").agg(count(lit(1)).as("n"), max($"n_frames").as("nf"))
    assert(perDoc.filter($"n" =!= $"nf").count() === 0)
    // binary column must not survive into the exploded plan output
    assert(!frames.columns.contains("payload"))
  }

  test("feature extraction emits fixed-width deterministic vectors") {
    val f = Multimodal.extractFeatures(docs, "payload", dims = 8)
    val v = f.select($"features").head.getSeq[Double](0)
    assert(v.length === 8)
    assert(v.forall(x => x >= 0.0 && x < 1.0))
  }
}
