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

  test("result-cache transport: GET miss, SETQ store, GET hit (cache.go)") {
    // a seriesly-style caching client: GET a content-derived key
    // before computing, SETQ the result after (cache.go:86-136). Keys
    // carry '#', which no timestamp document key can, so the routing
    // needs no new opcodes.
    val cache = new graft.sources.QueryCache(store)
    val mcc = new SeriesMc(store, cache = Some(cache))
    val cport = mcc.start()
    val sock = new Socket("127.0.0.1", cport)
    val out = new DataOutputStream(sock.getOutputStream)
    val in = new DataInputStream(sock.getInputStream)
    try {
      val key = "db#1346189040000#12345678901234567890"
      request(out, SeriesMc.Get, key)
      assert(response(in)._2 == SeriesMc.Status.KeyNotFound)
      // a quiet GET miss is silent: only the trailing noop acks
      request(out, SeriesMc.GetQ, key)
      request(out, SeriesMc.Noop, "")
      assert(response(in)._1 == SeriesMc.Noop)

      request(out, SeriesMc.SetQ, key, """{"v":[1,2]}""") // quiet, no ack
      request(out, SeriesMc.Get, key)
      val (op, st, body) = response(in)
      assert(op == SeriesMc.Get && st == SeriesMc.Status.OK)
      assert(body.length >= 4 && body.drop(4) == """{"v":[1,2]}""", // 4 flag bytes
        s"unexpected GET body: $body")

      // the wire surface and the in-process HTTP cache are ONE cache
      assert(cache.getRaw(key).contains("""{"v":[1,2]}"""))
      cache.putRaw("other#k#1", "xyz")
      request(out, SeriesMc.Get, "other#k#1")
      assert(response(in)._3.drop(4) == "xyz")
    } finally { sock.close(); mcc.stop() }
  }

  override def afterAll(): Unit = mc.stop()
}
