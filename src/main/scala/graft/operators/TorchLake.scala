package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PyTorch checkpoint extraction (the `torch.save` zipfile layout:
  * a ZIP containing `<root>/data.pkl` — a pickle-protocol-2 object
  * graph — plus `<root>/data/<key>` raw storages and
  * `<root>/version`). THE model-hub artifact format: a curation
  * pipeline over scraped checkpoints must read tensor catalogs
  * without ever executing pickle, which is exactly what this walk
  * does — a restricted STRUCTURAL interpreter of the published
  * pickle opcode set (the `pickletools` table) over a CLOSED global
  * whitelist. Nothing is ever executed: unknown opcodes, unknown
  * globals, or any stack-discipline violation reject the file, so
  * the classic pickle-RCE surface is absent by construction.
  *
  * Closed subset (strict — reject, never guess):
  *  - container: the ZIP walk is [[ZipLake.parseZip]] (CRC-verified);
  *    entries must share one nonempty root dir; `data.pkl` and
  *    `version` (ASCII `3`) mandatory; storages live at
  *    `<root>/data/<decimal-key>`;
  *  - pickle: protocol 2; opcodes PROTO MARK STOP NONE NEWTRUE
  *    NEWFALSE BININT{,1,2} LONG1 BINUNICODE EMPTY_{DICT,TUPLE,LIST}
  *    TUPLE{,1,2,3} BINPUT/LONG_BINPUT BINGET/LONG_BINGET GLOBAL
  *    BINPERSID REDUCE SETITEM(S); globals limited to
  *    `collections.OrderedDict`, `torch._utils._rebuild_tensor_v2`,
  *    `torch.FloatStorage`; persistent ids must be the documented
  *    `('storage', FloatStorage, key, location, numel)` 5-tuple;
  *    ops/stack/memo/string caps against crafted bombs;
  *  - the object must be an OrderedDict[str → tensor]; tensors must
  *    be CONTIGUOUS views (stride k = Π dims>k), dims ≤ 8 each
  *    ≤ 2^20, element count ≤ 2^22, `0 ≤ offset` and
  *    `offset + nelem ≤ storage numel`; every storage entry must be
  *    exactly `4·numel` bytes (f32), be referenced by ≥ 1 tensor,
  *    and decode to finite floats.
  *
  * Emits one row per tensor with `value_sum` over the tensor's OWN
  * view window (shared storages sum per view), so content — not
  * just the catalog — is hash-gated. One blob = one task-local walk.
  */
object TorchLake {

  private object Fail extends scala.util.control.ControlThrowable

  // ------------------------------------------------------------------
  // restricted pickle VM

  private sealed trait P
  private case object PMark extends P
  private case object PNone extends P
  private final case class PBool(v: Boolean) extends P
  private final case class PInt(v: Long) extends P
  private final case class PStr(s: String) extends P
  private final case class PTuple(items: Vector[P]) extends P
  private final case class PList(items: Vector[P]) extends P
  private final case class PDict(
      m: scala.collection.mutable.LinkedHashMap[String, P]) extends P
  private final case class PGlobal(mod: String, name: String) extends P
  private final case class PStorage(key: String, numel: Long) extends P
  private[graft] final case class PTensor(
      key: String, numel: Long, off: Long, shape: Vector[Long],
      requiresGrad: Boolean)

  private final case class PTensorV(t: PTensor) extends P

  private val Whitelist = Set(
    ("collections", "OrderedDict"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch", "FloatStorage"))

  /** Interpret data.pkl; returns the state dict in insertion order. */
  private def runPickle(b: Array[Byte]): Seq[(String, PTensor)] = {
    if (b.length < 3) throw Fail
    var p = 0
    def u8(): Int = {
      if (p >= b.length) throw Fail
      val v = b(p) & 0xff; p += 1; v
    }
    def i32le(): Long = {
      if (p + 4 > b.length) throw Fail
      val v = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      p += 4
      v
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[P]
    val memo = scala.collection.mutable.HashMap.empty[Long, P]
    def push(v: P): Unit = {
      if (stack.length > 10000) throw Fail
      stack += v
    }
    def pop(): P = {
      if (stack.isEmpty) throw Fail
      stack.remove(stack.length - 1)
    }
    def popToMark(): Vector[P] = {
      val i = stack.lastIndexOf(PMark)
      if (i < 0) throw Fail
      val items = stack.slice(i + 1, stack.length).toVector
      stack.remove(i, stack.length - i)
      items
    }

    if (u8() != 0x80 || u8() != 2) throw Fail // PROTO 2 mandatory
    var ops = 0
    var done = false
    var result: P = PNone
    while (!done) {
      ops += 1
      if (ops > 100000) throw Fail
      (u8(): @annotation.switch) match {
        case 0x28 => push(PMark) // MARK
        case 0x2e => // STOP
          result = pop()
          if (stack.nonEmpty) throw Fail
          done = true
        case 0x4e => push(PNone) // NONE
        case 0x88 => push(PBool(true)) // NEWTRUE
        case 0x89 => push(PBool(false)) // NEWFALSE
        case 0x4b => push(PInt(u8().toLong)) // BININT1
        case 0x4d => push(PInt((u8() | (u8() << 8)).toLong)) // BININT2
        case 0x4a => push(PInt(i32le().toInt.toLong)) // BININT (signed)
        case 0x8a => // LONG1: n-byte little-endian two's complement
          val n = u8()
          if (n > 8 || p + n > b.length) throw Fail
          var v = 0L
          if (n > 0) {
            v = if ((b(p + n - 1) & 0x80) != 0) -1L else 0L // sign-extend
            var j = n - 1
            while (j >= 0) { v = (v << 8) | (b(p + j) & 0xffL); j -= 1 }
          }
          p += n
          push(PInt(v))
        case 0x58 => // BINUNICODE
          val n = i32le()
          if (n > (1 << 16) || p + n > b.length) throw Fail
          val dec = StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          val s =
            try dec.decode(
              java.nio.ByteBuffer.wrap(b, p, n.toInt)).toString
            catch {
              case _: java.nio.charset.CharacterCodingException => throw Fail
            }
          if (s.exists(_ < 0x20)) throw Fail
          p += n.toInt
          push(PStr(s))
        case 0x7d => // EMPTY_DICT
          push(PDict(scala.collection.mutable.LinkedHashMap.empty))
        case 0x29 => push(PTuple(Vector.empty)) // EMPTY_TUPLE
        case 0x5d => push(PList(Vector.empty)) // EMPTY_LIST
        case 0x74 => push(PTuple(popToMark())) // TUPLE
        case 0x85 => val a = pop(); push(PTuple(Vector(a))) // TUPLE1
        case 0x86 => // TUPLE2
          val b2 = pop(); val a = pop(); push(PTuple(Vector(a, b2)))
        case 0x87 => // TUPLE3
          val c3 = pop(); val b2 = pop(); val a = pop()
          push(PTuple(Vector(a, b2, c3)))
        case 0x71 => // BINPUT
          if (memo.size > 10000 || stack.isEmpty) throw Fail
          memo(u8().toLong) = stack.last
        case 0x72 => // LONG_BINPUT
          if (memo.size > 10000 || stack.isEmpty) throw Fail
          memo(i32le()) = stack.last
        case 0x68 => push(memo.getOrElse(u8().toLong, throw Fail)) // BINGET
        case 0x6a => push(memo.getOrElse(i32le(), throw Fail)) // LONG_BINGET
        case 0x63 => // GLOBAL: two newline-terminated ASCII lines
          def line(): String = {
            val st = p
            while (p < b.length && b(p) != '\n') {
              val x = b(p) & 0xff
              if (x < 0x20 || x > 0x7e) throw Fail
              p += 1
            }
            if (p >= b.length || p - st > 128) throw Fail
            val s = new String(b, st, p - st, StandardCharsets.US_ASCII)
            p += 1
            s
          }
          val mod = line(); val name = line()
          if (!Whitelist((mod, name))) throw Fail // closed world
          push(PGlobal(mod, name))
        case 0x51 => // BINPERSID
          pop() match {
            case PTuple(Vector(PStr("storage"),
                PGlobal("torch", "FloatStorage"), PStr(key), PStr(_),
                PInt(numel))) =>
              if (key.isEmpty || !key.forall(_.isDigit) || key.length > 8)
                throw Fail
              if (numel < 0 || numel > (1L << 22)) throw Fail
              push(PStorage(key, numel))
            case _ => throw Fail // undocumented persistent-id shape
          }
        case 0x52 => // REDUCE
          val args = pop() match {
            case t: PTuple => t
            case _ => throw Fail
          }
          pop() match {
            case PGlobal("collections", "OrderedDict") =>
              // OrderedDict() or OrderedDict([])
              args.items match {
                case Vector() | Vector(PList(Vector())) =>
                  push(PDict(scala.collection.mutable.LinkedHashMap.empty))
                case _ => throw Fail
              }
            case PGlobal("torch._utils", "_rebuild_tensor_v2") =>
              args.items match {
                case Vector(PStorage(key, numel), PInt(off),
                    PTuple(shape), PTuple(stride), PBool(rg), _: PDict) =>
                  val dims = shape.map {
                    case PInt(d) if d >= 1 && d <= (1L << 20) => d
                    case _ => throw Fail
                  }
                  if (dims.length > 8) throw Fail
                  var nelem = 1L
                  dims.foreach { d =>
                    nelem *= d
                    if (nelem > (1L << 22)) throw Fail
                  }
                  // contiguous-view law: stride k = prod(dims > k)
                  val want = dims.scanRight(1L)(_ * _).tail
                  val got = stride.map {
                    case PInt(s) if s >= 0 => s
                    case _ => throw Fail
                  }
                  if (got != want) throw Fail
                  if (off < 0 || off + nelem > numel) throw Fail
                  push(PTensorV(PTensor(key, numel, off, dims, rg)))
                case _ => throw Fail
              }
            case _ => throw Fail
          }
        case 0x75 => // SETITEMS
          val items = popToMark()
          if (items.length % 2 != 0) throw Fail
          pop() match {
            case d: PDict =>
              items.grouped(2).foreach {
                case Vector(PStr(k), v) =>
                  if (d.m.contains(k)) throw Fail
                  d.m(k) = v
                case _ => throw Fail
              }
              push(d)
            case _ => throw Fail
          }
        case 0x73 => // SETITEM
          val v = pop()
          val k = pop()
          (k, pop()) match {
            case (PStr(ks), d: PDict) =>
              if (d.m.contains(ks)) throw Fail
              d.m(ks) = v
              push(d)
            case _ => throw Fail
          }
        case _ => throw Fail // anything else: out of subset
      }
    }
    result match {
      case PDict(m) =>
        if (m.isEmpty) throw Fail
        m.toSeq.map {
          case (k, PTensorV(t)) =>
            if (k.isEmpty) throw Fail
            (k, t)
          case _ => throw Fail // non-tensor values: out of subset
        }
      case _ => throw Fail
    }
  }

  private[graft] final case class TorchCkpt(
      version: Int, nStorages: Int, tensors: Seq[(String, PTensor, Double)])

  /** Walk one checkpoint; None on any container/pickle/view lie. */
  private[graft] def parseCheckpoint(raw: Array[Byte]): Option[TorchCkpt] = {
    try {
      val entries = ZipLake.parseZip(raw).getOrElse(throw Fail)
      if (entries.isEmpty) throw Fail
      val roots = entries.map { e =>
        val i = e.name.indexOf('/')
        if (i <= 0) throw Fail
        e.name.substring(0, i)
      }.distinct
      val root = roots match {
        case Seq(r) => r
        case _ => throw Fail // one root dir per checkpoint
      }
      val byName = entries.map(e => e.name -> e).toMap
      if (byName.size != entries.length) throw Fail // duplicate names
      val pkl = byName.getOrElse(s"$root/data.pkl", throw Fail)
      val ver = byName.getOrElse(s"$root/version", throw Fail)
      val verStr = new String(ver.payload, StandardCharsets.US_ASCII).trim
      if (verStr != "3") throw Fail // the torch zipfile version this walk pins
      val storages = entries.flatMap { e =>
        val pfx = s"$root/data/"
        if (e.name.startsWith(pfx)) {
          val key = e.name.substring(pfx.length)
          if (key.isEmpty || !key.forall(_.isDigit)) throw Fail
          Some(key -> e.payload)
        } else if (e.name == s"$root/data.pkl" || e.name == s"$root/version")
          None
        else throw Fail // unexpected entry
      }.toMap

      val dict = runPickle(pkl.payload)
      val used = scala.collection.mutable.HashSet.empty[String]
      val tensors = dict.map { case (name, t) =>
        val bytes = storages.getOrElse(t.key, throw Fail)
        if (bytes.length.toLong != 4L * t.numel) throw Fail // f32 law
        used += t.key
        var sum = 0.0
        var j = 0L
        val nelem = t.shape.product max 1L
        var o = (t.off * 4).toInt
        while (j < nelem) {
          val bits = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
          val v = java.lang.Float.intBitsToFloat(bits)
          if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
            throw Fail
          sum += v
          o += 4; j += 1
        }
        (name, t, sum)
      }
      if (used != storages.keySet) throw Fail // orphan storages
      Some(TorchCkpt(3, storages.size, tensors))
    } catch { case Fail => None }
  }

  /** One row per tensor; an invalid checkpoint yields one flagged row. */
  def extractCheckpoint(df: DataFrame, idCol: String, binCol: String)
    : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tidx", IntegerType, true),
      StructField("tname", StringType, true),
      StructField("skey", StringType, true),
      StructField("numel", LongType, true),
      StructField("n_dims", IntegerType, true),
      StructField("nelem", LongType, true),
      StructField("off", LongType, true),
      StructField("rg", BooleanType, true),
      StructField("value_sum", DoubleType, true),
      StructField("n_storages", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseCheckpoint(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(c) =>
            c.tensors.zipWithIndex.map { case ((name, t, sum), i) =>
              Row(id, i, name, t.key, t.numel, t.shape.length,
                t.shape.product max 1L, t.off, t.requiresGrad, sum,
                c.nStorages, true)
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def str(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    Array[Byte](0x58) ++ le32(b.length.toLong) ++ b
  }
  private def int(v: Long): Array[Byte] = {
    require(v >= Int.MinValue && v <= Int.MaxValue)
    Array[Byte](0x4a) ++ le32(v & 0xffffffffL)
  }
  private def global(mod: String, name: String): Array[Byte] =
    Array[Byte](0x63) ++ (mod + "\n" + name + "\n")
      .getBytes(StandardCharsets.US_ASCII)
  private def tup(items: Array[Byte]*): Array[Byte] =
    Array[Byte](0x28) ++ items.flatten ++ Array[Byte](0x74)

  /** The exact opcode stream torch-style state dicts reduce to in
    * this subset (PROTO 2, OrderedDict via REDUCE, _rebuild_tensor_v2
    * with a BINPERSID storage, SETITEMS, STOP). */
  private[graft] def encPickle(
      tensors: Seq[(String, String, Long, Long, Seq[Long], Boolean)])
    : Array[Byte] = {
    // (name, key, numel, off, shape, requiresGrad)
    val head: Array[Byte] =
      Array[Byte](0x80.toByte, 2) ++
        global("collections", "OrderedDict") ++
        Array[Byte](0x29, 0x52, 0x71, 0, 0x28) // (), REDUCE, BINPUT 0, MARK
    val body = tensors.flatMap { case (name, key, numel, off, shape, rg) =>
      val strides = shape.scanRight(1L)(_ * _).tail
      str(name) ++
        global("torch._utils", "_rebuild_tensor_v2") ++
        tup(
          tup(str("storage") ++ global("torch", "FloatStorage") ++
            str(key) ++ str("cpu") ++ int(numel)) ++ Array[Byte](0x51),
          int(off),
          tup(shape.map(int).flatten.toArray),
          tup(strides.map(int).flatten.toArray),
          Array[Byte](if (rg) 0x88.toByte else 0x89.toByte),
          global("collections", "OrderedDict") ++
            Array[Byte](0x29, 0x52)) ++
        Array[Byte](0x52)
    }.toArray
    head ++ body ++ Array[Byte](0x75, 0x2e) // SETITEMS, STOP
  }

  private def zip(entries: Seq[(String, Array[Byte])],
      zip64: Boolean = false): Array[Byte] = {
    // real >4 GiB checkpoints are ZIP64 containers; the fixture marks
    // some SMALL ones ZIP64 (sentinel extras + EOCD64) the way some
    // writers do, so the walk's ZIP64 path is exercised end to end
    if (zip64)
      ZipLake.writeZip64(entries.map { case (n, d) => (n, d, false) })
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (name, data) =>
        z.putNextEntry(new java.util.zip.ZipEntry(name))
        z.write(data)
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
  }

  private[graft] def fixtureVal(i: Int, t: Int, j: Long): Int =
    ((i * 31 + t * 17 + j.toInt * 7) % 200) - 100

  /** Fixture law (replayed closed-form by the oracle): file i holds
    * 2+i%3 tensors; tensor t has 1+(i+t)%3 dims with d0=2+(i+t)%3,
    * d1=1+t%3, d2=2; every third (i+t) is a VIEW at offset 2 into a
    * storage 4 elements larger; storage j-th float is
    * (i·31+t·17+j·7)%200−100; requires_grad=(i+t)%2==0. */
  def torchFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nt = 2 + i % 3
      val metas = (0 until nt).map { t =>
        val nd = 1 + (i + t) % 3
        val shape = Seq(2L + (i + t) % 3, 1L + t % 3, 2L).take(nd)
        val nelem = shape.product
        val (off, pad) = if ((i + t) % 3 == 0) (2L, 4L) else (0L, 0L)
        (s"layer.$t.weight", t.toString, nelem + pad, off, shape,
          (i + t) % 2 == 0)
      }
      val pkl = encPickle(metas)
      val storageEntries = metas.map { case (_, key, numel, _, _, _) =>
        val t = key.toInt
        val data = (0L until numel).flatMap { j =>
          le32(java.lang.Float.floatToIntBits(
            fixtureVal(i, t, j).toFloat) & 0xffffffffL)
        }.toArray
        (s"archive/data/$key", data)
      }
      val blob = zip(Seq(("archive/data.pkl", pkl)) ++ storageEntries ++
        Seq(("archive/version", "3\n".getBytes(StandardCharsets.US_ASCII))),
        zip64 = i % 3 == 1)
      Row(i.toLong, blob)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
