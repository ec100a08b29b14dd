package graft.http

import graft.SparkSpec
import graft.operators.SeriesEngine.SeriesQuery
import graft.sources.SeriesStore

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Drives the memcached-binary ingest with raw protocol frames
 * (reference: mcserver.go; opcodes incl. the bucket extensions). */
class SeriesMcSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val store = new SeriesStore(spark,
    Files.createTempDirectory("graft-mc").toString)
  private lazy val mc = new SeriesMc(store)
  private lazy val port = mc.start()

  private def request(out: DataOutputStream, opcode: Int, key: String,
      value: String = "", opaque: Int = 7): Unit = {
    val k = key.getBytes(UTF_8)
    val v = value.getBytes(UTF_8)
    out.writeByte(SeriesMc.ReqMagic)
    out.writeByte(opcode)
    out.writeShort(k.length)
    out.writeByte(0); out.writeByte(0); out.writeShort(0)
    out.writeInt(k.length + v.length)
    out.writeInt(opaque)
    out.writeLong(0L)
    out.write(k); out.write(v)
    out.flush()
  }

  private def response(in: DataInputStream): (Int, Int, String) = {
    assert(in.readUnsignedByte() == SeriesMc.ResMagic)
    val opcode = in.readUnsignedByte()
    in.readUnsignedShort(); in.readUnsignedByte(); in.readUnsignedByte()
    val status = in.readUnsignedShort()
    val bodyLen = in.readInt()
    in.readInt(); in.readLong()
    val body = new Array[Byte](bodyLen)
    in.readFully(body)
    (opcode, status, new String(body, UTF_8))
  }

  test("SELECT_BUCKET + SETQ stream + NOOP lands one batched write (S4)") {
    val sock = new Socket("127.0.0.1", port)
    val out = new DataOutputStream(sock.getOutputStream)
    val in = new DataInputStream(sock.getInputStream)

    request(out, SeriesMc.CreateBucket, "mcdb")
    assert(response(in)._2 == SeriesMc.Status.OK)
    request(out, SeriesMc.SelectBucket, "mcdb")
    assert(response(in)._2 == SeriesMc.Status.OK)

    // quiet sets: no responses expected
    request(out, SeriesMc.SetQ, "2012-08-28T21:24:00Z", """{"v": 1}""")
    request(out, SeriesMc.SetQ, "2012-08-28T21:24:10Z", """{"v": 2}""")
    // non-quiet set flushes the batch and acks
    request(out, SeriesMc.Set, "2012-08-28T21:24:20Z", """{"v": 3}""")
    assert(response(in)._2 == SeriesMc.Status.OK)

    assert(store.info("mcdb").docCount == 3)
    val rows = store.query("mcdb", SeriesQuery(60000, Seq("/v"), Seq("sum"),
      names = Seq("s"))).collect()
    assert(rows.head.getDouble(1) == 6.0)

    // bad key and bad JSON are rejected with protocol statuses
    request(out, SeriesMc.Set, "not-a-time", """{"v": 1}""")
    assert(response(in)._2 == SeriesMc.Status.Einval)
    request(out, SeriesMc.Set, "2012-08-28T21:24:30Z", "nope")
    assert(response(in)._2 == SeriesMc.Status.NotStored)

    // unknown command
    request(out, 0x42, "")
    assert(response(in)._2 == SeriesMc.Status.UnknownCommand)

    request(out, SeriesMc.ListBuckets, "")
    val (_, st, body) = response(in)
    assert(st == SeriesMc.Status.OK && body == "mcdb")
    sock.close()
  }

  test("SELECT_BUCKET flushes pending quiet sets to the PREVIOUS bucket") {
    val sock = new Socket("127.0.0.1", port)
    val out = new DataOutputStream(sock.getOutputStream)
    val in = new DataInputStream(sock.getInputStream)
    request(out, SeriesMc.CreateBucket, "a"); response(in)
    request(out, SeriesMc.CreateBucket, "b"); response(in)
    request(out, SeriesMc.SelectBucket, "a"); response(in)
    request(out, SeriesMc.SetQ, "2012-08-28T21:24:00Z", """{"in": "a"}""")
    // switching buckets mid-stream must not carry the pending doc over
    request(out, SeriesMc.SelectBucket, "b"); response(in)
    request(out, SeriesMc.Set, "2012-08-28T21:25:00Z", """{"in": "b"}""")
    response(in)
    sock.close()
    assert(store.info("a").docCount == 1)
    assert(store.info("b").docCount == 1)
    assert(store.get("a", "2012-08-28T21:24:00Z").contains("""{"in": "a"}"""))
    assert(store.get("b", "2012-08-28T21:25:00Z").contains("""{"in": "b"}"""))
  }

  override def afterAll(): Unit = mc.stop()
}
