package graft.tools

import graft.SparkSpec
import graft.sources.SeriesStore
import java.nio.file.Files

class ToolsSpec extends SparkSpec {
  import spark.implicits._

  test("dump/load round-trip preserves keys and documents (S12)") {
    val rootA = Files.createTempDirectory("graft-tools-a").toString
    val rootB = Files.createTempDirectory("graft-tools-b").toString
    val a = new SeriesStore(spark, rootA)
    a.create("db")
    val docs = (0 until 5).map(i =>
      ((1346189000L + i * 10) * 1000000000L + 123456789L, s"""{"i": $i}"""))
    a.storeBatch("db", docs.toDF("ts", "doc"))

    val dumpFile = Files.createTempFile("graft-dump", ".jsonl").toString
    Dump.main(Array(rootA, "db", dumpFile))
    val lines = Files.readAllLines(java.nio.file.Paths.get(dumpFile))
    assert(lines.size == 5)
    assert(lines.get(0).startsWith("""{"2012-08-28T21:23:20.123456789Z": """))

    // full load
    Load.main(Array(rootB, "db2", dumpFile))
    val b = new SeriesStore(spark, rootB)
    assert(b.info("db2").docCount == 5)
    assert(b.get("db2", "2012-08-28T21:23:40.123456789Z").contains("""{"i":2}"""))

    // -min filter skips older keys
    Load.main(Array(rootB, "db3", dumpFile, "2012-08-28T21:23:40Z"))
    assert(b.info("db3").docCount == 3)
  }
}
