package graft.tools

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

/** Dump a REAL Paimon table's manifest records (the reference ships a
  * paimon-0.4-written fixture in its paimon-reader tests) to pin the
  * manifest schema + BinaryRow partition encoding for PaimonRead's
  * foreign-table path. */
object PaimonFixtureProbe {
  def main(args: Array[String]): Unit = {
    val table = args.headOption.getOrElse(
      "src/test/resources/fixtures/test_paimon_reader/paimon_test.db/" +
        "spark_sql_created_hive_catalog_paimon_partitioned")
    def dump(path: String): Unit = {
      println(s"== $path")
      val in = new java.io.FileInputStream(path)
      val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try {
        while (s.hasNext) {
          val r = s.next()
          println(r)
          r.getSchema.getFields.forEach { f =>
            val v = r.get(f.name)
            v match {
              case bb: java.nio.ByteBuffer =>
                val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
                println(s"  ${f.name} bytes[${arr.length}] = " +
                  arr.map(b => f"$b%02x").mkString(" "))
              case rec: GenericRecord =>
                rec.getSchema.getFields.forEach { g =>
                  rec.get(g.name) match {
                    case bb: java.nio.ByteBuffer =>
                      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
                      println(s"  ${f.name}.${g.name} bytes[${arr.length}] = " +
                        arr.map(b => f"$b%02x").mkString(" "))
                    case other => println(s"  ${f.name}.${g.name} = $other")
                  }
                }
              case _ =>
            }
          }
        }
      } finally s.close()
    }
    val mdir = new java.io.File(s"$table/manifest")
    mdir.listFiles().sortBy(_.getName).foreach(f => dump(f.getPath))
  }
}
