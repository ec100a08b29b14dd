package graft.tools

import graft.functions.JsonPointersExpr
import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/**
 * CLI equivalents of the reference's `tools/` directory (SURVEY §2.1
 * S12): dump = `tools/dump` (JSON-lines per database), load =
 * `tools/load` (replay a dump, optional `-min` ts filter), compact =
 * `tools/compact`, info = `tools/serieslyinfo`. All are thin wrappers
 * over the store API the batch gates verify — run via
 * `runMain graft.tools.<Tool> <store-root> <db> [...]`.
 */
private object ToolSession {
  def spark(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** `Dump <root> <db> [outFile]` — stream the database as JSON lines
 * (`{"<canonical key>": <doc>}` per line, ts-ascending). */
object Dump {
  def main(args: Array[String]): Unit = {
    val store = new SeriesStore(ToolSession.spark(), args(0))
    val lines = store.dump(args(1))
    if (args.length > 2) {
      val w = Files.newBufferedWriter(Paths.get(args(2)))
      try lines.foreach { l => w.write(l); w.newLine() } finally w.close()
    } else lines.foreach(println)
  }
}

/** `Load <root> <db> <dumpFile> [minTs]` — replay a dump; lines with
 * keys below `minTs` are skipped (the reference's `-min` flag). Docs
 * land in batched writes (the reference replays one HTTP PUT per
 * line; a batch append is the same visible end state). */
object Load {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.spark()
    val store = new SeriesStore(spark, args(0))
    store.create(args(1))
    val minNs = if (args.length > 3)
      graft.timelib.TimeLib.parseTime(args(3)).getOrElse(Long.MinValue)
    else Long.MinValue
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val lines = Files.lines(Paths.get(args(2)))
    var n = 0L
    try {
      // bounded driver memory: batches of 100k docs, not the whole file
      lines.iterator().asScala
        .filter(_.nonEmpty)
        .flatMap { line =>
          val node = JsonPointersExpr.mapper.readTree(line)
          val names = node.fieldNames()
          if (!names.hasNext) None
          else {
            val key = names.next()
            val ns = graft.timelib.TimeLib.parseKey(key)
            if (ns >= minNs && ns >= 0) Some((ns, node.get(key).toString)) else None
          }
        }
        .grouped(100000)
        .foreach { batch =>
          store.storeBatch(args(1), batch.toDF("ts", "doc"))
          n += batch.size
        }
    } finally lines.close()
    println(s"loaded $n documents into ${args(1)}")
  }
}

/** `Compact <root> <db>` — physically drop overwritten versions and
 * merge small files. */
object Compact {
  def main(args: Array[String]): Unit =
    new SeriesStore(ToolSession.spark(), args(0)).compact(args(1))
}

/** `Info <root> [db...]` — print `{doc_count, space_used, last_seq}`
 * per database (all databases when none named). */
object Info {
  def main(args: Array[String]): Unit = {
    val store = new SeriesStore(ToolSession.spark(), args(0))
    val dbs = if (args.length > 1) args.drop(1).toSeq else store.list()
    dbs.foreach { db =>
      val i = store.info(db)
      println(s"""$db: {"doc_count":${i.docCount},"space_used":${i.spaceUsed},"last_seq":${i.lastSeq}}""")
    }
  }
}
