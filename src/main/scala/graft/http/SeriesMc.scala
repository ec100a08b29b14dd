package graft.http

import graft.sources.SeriesStore
import graft.timelib.TimeLib

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/**
 * Memcached-binary-protocol ingest (the reference's second wire
 * protocol, mcserver.go:25-89): `SELECT_BUCKET` picks the database,
 * `SET`/`SETQ` store a document at key = parsed ts (or now when the
 * key is empty), the bucket-admin opcodes map to create/drop/list.
 *
 * Quiet SETs buffer per connection and land as ONE batched write when
 * a non-quiet op (SET/NOOP) forces a flush or the connection closes —
 * the socket-level analog of the reference's write-behind queue
 * (database.go:175-254): acks never wait on per-doc durability, and
 * the fast path for bulk loads is a SETQ stream + trailing NOOP.
 *
 * With a `cache`, this server also speaks the reference's RESULT-
 * CACHE transport (cache.go:54-155): a seriesly-style client GETs a
 * content-derived `db#bucket#hash` key before computing and SETQs
 * the result after. Routing is by connection state: SET/SETQ on a
 * connection with NO selected bucket and a `#`-bearing key is a
 * cache store (timestamp document keys can never contain `#`); GET/
 * GETQ always address the cache. Entries share the in-process
 * [[graft.sources.QueryCache]] the HTTP facade reads through. */
class SeriesMc(store: SeriesStore, port: Int = 0,
    cache: Option[graft.sources.QueryCache] = None) {
  import SeriesMc._

  private val server = new ServerSocket(port)
  @volatile private var running = true

  def start(): Int = {
    val t = new Thread(() => acceptLoop(), "graft-mc-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; server.close() }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s), "graft-mc-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception if !running => () case _: Exception => () }
    }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    var db: String = ""
    val pending = ArrayBuffer.empty[(Long, String)]

    def flush(): Unit = if (pending.nonEmpty) {
      val spark = store.session
      import spark.implicits._
      store.storeBatch(db, pending.toSeq.toDF("ts", "doc"))
      pending.clear()
    }

    try {
      while (true) {
        val magic = in.readUnsignedByte()
        if (magic != ReqMagic) throw new EOFException("bad magic")
        val opcode = in.readUnsignedByte()
        val keyLen = in.readUnsignedShort()
        val extLen = in.readUnsignedByte()
        in.readUnsignedByte() // datatype
        in.readUnsignedShort() // vbucket
        val bodyLen = in.readInt()
        val opaque = in.readInt()
        in.readLong() // cas
        val body = new Array[Byte](bodyLen)
        in.readFully(body)
        val key = new String(body, extLen, keyLen, UTF_8)
        val value = new String(body, extLen + keyLen, bodyLen - extLen - keyLen, UTF_8)

        opcode match {
          case SelectBucket =>
            flush() // pending quiet sets belong to the PREVIOUS bucket
            db = key
            respond(out, opcode, opaque, Status.OK)
          case CreateBucket =>
            flush()
            store.create(key); respond(out, opcode, opaque, Status.OK)
          case DeleteBucket =>
            flush()
            if (store.exists(key)) { store.drop(key); respond(out, opcode, opaque, Status.OK) }
            else respond(out, opcode, opaque, Status.KeyNotFound)
          case ListBuckets =>
            respond(out, opcode, opaque, Status.OK,
              store.list().mkString(",").getBytes(UTF_8))
          case Get | GetQ => cache match {
            case Some(c) => c.getRaw(key) match {
              case Some(v) => respondGet(out, opcode, opaque, v.getBytes(UTF_8))
              case None =>
                // quiet GET misses are silent by protocol contract
                if (opcode == Get) respond(out, opcode, opaque, Status.KeyNotFound)
            }
            case None => respond(out, opcode, opaque, Status.UnknownCommand)
          }
          case Set | SetQ if db.isEmpty && cache.isDefined && key.contains('#') =>
            // result-cache store from a seriesly-style client (the
            // reference always SETQs results, cache.go:127-136)
            cache.get.putRaw(key, value)
            if (opcode == Set) respond(out, opcode, opaque, Status.OK)
          case Set | SetQ =>
            val ns =
              if (key.isEmpty) Some(System.currentTimeMillis() * 1000000L)
              else TimeLib.parseTime(key)
            if (db.isEmpty) // no SELECT_BUCKET yet: refuse rather than buffer
              respond(out, opcode, opaque, Status.Einval, "no bucket selected".getBytes(UTF_8))
            else if (ns.isEmpty)
              respond(out, opcode, opaque, Status.Einval, "Invalid key".getBytes(UTF_8))
            else if (!SeriesStore.validJson(value))
              respond(out, opcode, opaque, Status.NotStored, "invalid JSON".getBytes(UTF_8))
            else {
              pending += ((ns.get, value))
              if (opcode == Set)

                try { flush(); respond(out, opcode, opaque, Status.OK) }
                catch { case e: Exception =>
                  pending.clear()
                  respond(out, opcode, opaque, Status.NotStored,
                    String.valueOf(e.getMessage).getBytes(UTF_8))
                }
            }
          case Noop =>
            try { flush(); respond(out, opcode, opaque, Status.OK) }
            catch { case e: Exception =>
              pending.clear()
              respond(out, opcode, opaque, Status.NotStored,
                String.valueOf(e.getMessage).getBytes(UTF_8))
            }
          case _ =>
            respond(out, opcode, opaque, Status.UnknownCommand)
        }
      }
    } catch { case _: Exception => () }
    finally {
      // quiet sets already implied success; a failed final flush is the
      // one loss window the protocol allows — surface it in the log
      try flush() catch { case e: Exception =>
        System.err.println(s"[graft-mc] final flush of ${pending.size} pending " +
          s"docs to '$db' failed: ${e.getMessage}")
      }
      try sock.close() catch { case _: Exception => () }
    }
  }

  /** GET success response: 4-byte flags extras (zero) + body, per the
   * memcached binary protocol. */
  private def respondGet(out: DataOutputStream, opcode: Int, opaque: Int,
      body: Array[Byte]): Unit = {
    out.writeByte(ResMagic)
    out.writeByte(opcode)
    out.writeShort(0) // key length
    out.writeByte(4) // extras length (flags)
    out.writeByte(0) // datatype
    out.writeShort(Status.OK)
    out.writeInt(4 + body.length)
    out.writeInt(opaque)
    out.writeLong(0L) // cas
    out.writeInt(0) // flags
    out.write(body)
    out.flush()
  }

  private def respond(out: DataOutputStream, opcode: Int, opaque: Int,
      status: Int, body: Array[Byte] = Array.empty): Unit = {
    out.writeByte(ResMagic)
    out.writeByte(opcode)
    out.writeShort(0) // key length
    out.writeByte(0) // extras length
    out.writeByte(0) // datatype
    out.writeShort(status)
    out.writeInt(body.length)
    out.writeInt(opaque)
    out.writeLong(0L) // cas
    out.write(body)
    out.flush()
  }
}

object SeriesMc {
  val ReqMagic = 0x80
  val ResMagic = 0x81

  // standard opcodes + the reference's bucket-admin extensions
  // (mcserver.go:15-20)
  val Get = 0x00
  val Set = 0x01
  val GetQ = 0x09
  val SetQ = 0x11
  val Noop = 0x0a
  val CreateBucket = 0x85
  val DeleteBucket = 0x86
  val ListBuckets = 0x87
  val SelectBucket = 0x89

  object Status {
    val OK = 0x0000
    val KeyNotFound = 0x0001
    val Einval = 0x0004
    val NotStored = 0x0005
    val UnknownCommand = 0x0081
  }
}
