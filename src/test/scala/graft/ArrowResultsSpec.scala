package graft

import java.io.ByteArrayInputStream

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.functions._

import graft.sources.ArrowResults

/** Arrow result surface: executor-side batch serialization, lossless
  * round trip, and a self-describing IPC stream that a VANILLA
  * arrow-vector reader (no Spark involved) can consume — the
  * interop property a Flight client relies on.
  */
class ArrowResultsSpec extends SparkSuite {

  test("record-batch round trip is lossless (all column types)") {
    val src = table("nation").orderBy("n_nationkey")
    val batches = ArrowResults.resultBatches(src).collect()
    assert(batches.nonEmpty && batches.forall(_.nonEmpty))
    val back = ArrowResults.fromBatches(spark, src.schema, batches.iterator)
    assert(back.schema === src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq === src.collect().toSeq)
  }

  test("timestamps survive the round trip exactly") {
    val src = table("events")
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id")).limit(100)
    val batches = ArrowResults.resultBatches(src).collect()
    val back = ArrowResults.fromBatches(spark, src.schema, batches.iterator)
    assert(back.orderBy("event_id").collect().toSeq === src.collect().toSeq)
  }

  test("IPC stream is readable by a plain arrow-vector ArrowStreamReader") {
    val src = table("region").select(col("r_regionkey"), col("r_name"))
    val bytes = ArrowResults.ipcStream(src)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() === 2)
      assert(root.getSchema.getFields.get(0).getName === "r_regionkey")
      var rows = 0L
      while (reader.loadNextBatch()) rows += root.getRowCount
      assert(rows === src.count())
    } finally { reader.close(); alloc.close() }
  }

  test("empty result produces a valid (zero-batch) round trip") {
    val src = table("nation").where(lit(false))
    val batches = ArrowResults.resultBatches(src).collect()
    val back = ArrowResults.fromBatches(spark, src.schema, batches.iterator)
    assert(back.count() === 0L)
  }
}
