package graft

import graft.operators.OggLake
import graft.operators.OggLake.EncPage

/** Ogg framing: CRC pin against the RFC vector structure, page/state
  * strictness matrix, packet assembly across pages and lacing
  * boundaries, ident decodes, fixture replay, fuzz sweeps. */
class OggLakeSpec extends SparkSpec {

  private def onePage(body: Array[Byte], laces: Seq[Int],
      serial: Long = 7, bos: Boolean = true, eos: Boolean = true,
      seq: Long = 0, cont: Boolean = false,
      granule: Long = 0): Array[Byte] =
    OggLake.writePage(EncPage(serial, seq, granule, bos, eos, cont,
      laces, body))

  private def opusFile(ch: Int = 1, preSkip: Int = 100,
      rate: Long = 48000L, serial: Long = 7): Array[Byte] = {
    val ident = OggLake.opusHead(ch, preSkip, rate)
    val pkt = Array.tabulate(40)(_.toByte)
    onePage(ident, OggLake.packetLaces(ident), serial, bos = true,
      eos = false) ++
      onePage(pkt, OggLake.packetLaces(pkt), serial, bos = false,
        eos = true, seq = 1, granule = 960)
  }

  test("the page CRC is the RFC's forward CRC-32 (structural pin)") {
    // forward (non-reflected) CRC with poly 0x04c11db7, zero init and
    // zero final XOR: CRC of a single zero byte is 0 and of 0x80 is
    // the polynomial itself shifted into view — hand-derivable pins
    // that kill the reflected (zlib) variant and any init/xor slip
    assert(OggLake.pageCrc(Array[Byte](0), 0, 1) == 0)
    assert(OggLake.pageCrc(Array[Byte](0, 0, 0, 0), 0, 4) == 0)
    // one set bit at the very top: after 8 shifts the register holds
    // poly-feedback of 0x80 << 24; computed independently here by the
    // bitwise definition
    var r = 0x80 << 24
    (0 until 8).foreach { _ =>
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
    }
    assert(OggLake.pageCrc(Array[Byte](0x80.toByte), 0, 1) == r)
    // and a real page round-trips through the verifier
    assert(OggLake.parseOgg(opusFile()).nonEmpty)
  }

  test("packet assembly: lacing boundaries and page-spanning packets") {
    val serial = 5L
    // a packet of exactly 255 bytes: laces [255, 0]
    val p255 = Array.tabulate(255)(_.toByte)
    val f1 = onePage(OggLake.opusHead(1, 0, 48000),
      OggLake.packetLaces(OggLake.opusHead(1, 0, 48000)), serial,
      bos = true, eos = false) ++
      onePage(p255, OggLake.packetLaces(p255), serial, bos = false,
        eos = true, seq = 1)
    val m1 = OggLake.parseOgg(f1)
    assert(m1.nonEmpty && m1.get(0).nPackets == 2)
    // the same packet split across two pages via continuation
    val f2 = onePage(OggLake.opusHead(1, 0, 48000),
      OggLake.packetLaces(OggLake.opusHead(1, 0, 48000)), serial,
      bos = true, eos = false) ++
      onePage(p255, Seq(255), serial, bos = false, eos = false,
        seq = 1, granule = -1) ++
      onePage(Array.emptyByteArray, Seq(0), serial, bos = false,
        eos = true, seq = 2, cont = true)
    val m2 = OggLake.parseOgg(f2)
    assert(m2.nonEmpty && m2.get(0).nPackets == 2, "spanning packet")
    // two packets on one page
    val a = Array.tabulate(10)(_.toByte)
    val b = Array.tabulate(20)(i => (i + 50).toByte)
    val f3 = onePage(OggLake.opusHead(1, 0, 48000),
      OggLake.packetLaces(OggLake.opusHead(1, 0, 48000)), serial,
      bos = true, eos = false) ++
      onePage(a ++ b, Seq(10, 20), serial, bos = false, eos = true,
        seq = 1)
    assert(OggLake.parseOgg(f3).get(0).nPackets == 3)
  }

  test("ident decodes: opus facts, vorbis facts, honest other") {
    val op = OggLake.parseOgg(opusFile(ch = 2, preSkip = 312,
      rate = 24000L)).get
    assert(op.length == 1)
    assert(op(0).codec == "opus" && op(0).channels.contains(2) &&
      op(0).sampleRate.contains(24000L) && op(0).preSkip.contains(312))
    val vi = OggLake.vorbisIdent(2, 44100L)
    val vf = onePage(vi, OggLake.packetLaces(vi), 9, bos = true,
      eos = false) ++
      onePage(Array[Byte](1, 2, 3), Seq(3), 9, bos = false, eos = true,
        seq = 1)
    val vm = OggLake.parseOgg(vf).get
    assert(vm(0).codec == "vorbis" && vm(0).channels.contains(2) &&
      vm(0).sampleRate.contains(44100L) && vm(0).preSkip.isEmpty)
    val other = Array[Byte]('h', 'e', 'l', 'l', 'o')
    val of = onePage(other, Seq(5), 11, bos = true, eos = false) ++
      onePage(Array[Byte](9), Seq(1), 11, bos = false, eos = true,
        seq = 1)
    val om = OggLake.parseOgg(of).get
    assert(om(0).codec == "other" && om(0).channels.isEmpty &&
      om(0).sampleRate.isEmpty)
  }

  test("strictness: every framing or state lie rejects") {
    val good = opusFile()
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "capture flip" -> mut(c => c(0) = 'X'.toByte),
      "version nonzero" -> mut(c => c(4) = 1),
      "reserved flag bits" -> mut(c => c(5) = (c(5) | 0x10).toByte),
      "CRC flip" -> mut(c => c(22) = (c(22) ^ 1).toByte),
      "body corruption breaks CRC" ->
        mut(c => c(c.length - 1) = (c(c.length - 1) ^ 1).toByte),
      "truncated page" -> good.dropRight(3),
      "trailing garbage" -> (good ++ Array[Byte]('O', 'g', 'g')))
    cases.foreach { case (name, bts) =>
      assert(OggLake.parseOgg(bts).isEmpty, name)
    }
    assert(OggLake.parseOgg(good).nonEmpty, "control")
    assert(OggLake.parseOgg(null).isEmpty)
    assert(OggLake.parseOgg(Array.emptyByteArray).isEmpty)
    // state-machine lies, rebuilt page by page
    val ident = OggLake.opusHead(1, 0, 48000)
    val il = OggLake.packetLaces(ident)
    val pkt = Array[Byte](1, 2, 3)
    def pages(ps: Array[Byte]*): Array[Byte] = ps.flatten.toArray
    val lies = Seq(
      "no BOS on first page" -> pages(
        onePage(ident, il, 7, bos = false, eos = true)),
      "BOS again mid-stream" -> pages(
        onePage(ident, il, 7, bos = true, eos = false),
        onePage(pkt, Seq(3), 7, bos = true, eos = true, seq = 1)),
      "lost page (seq gap)" -> pages(
        onePage(ident, il, 7, bos = true, eos = false),
        onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 2)),
      "page after EOS" -> pages(
        onePage(ident, il, 7, bos = true, eos = true),
        onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 1)),
      "missing EOS" -> pages(
        onePage(ident, il, 7, bos = true, eos = false)),
      "continuation with no open packet" -> pages(
        onePage(ident, il, 7, bos = true, eos = false),
        onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 1,
          cont = true)),
      "open packet not continued" -> pages(
        onePage(ident, il, 7, bos = true, eos = false),
        onePage(Array.tabulate(255)(_.toByte), Seq(255), 7, bos = false,
          eos = false, seq = 1),
        onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 2)),
      "unterminated packet at EOS" -> pages(
        onePage(ident, il, 7, bos = true, eos = false),
        onePage(Array.tabulate(255)(_.toByte), Seq(255), 7, bos = false,
          eos = true, seq = 1)),
      "opus ident with version 2" -> {
        val bad = OggLake.opusHead(1, 0, 48000)
        bad(8) = 2
        pages(onePage(bad, OggLake.packetLaces(bad), 7, bos = true,
          eos = false),
          onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 1))
      },
      "vorbis ident without framing bit" -> {
        val bad = OggLake.vorbisIdent(2, 44100L)
        bad(29) = 0
        pages(onePage(bad, OggLake.packetLaces(bad), 7, bos = true,
          eos = false),
          onePage(pkt, Seq(3), 7, bos = false, eos = true, seq = 1))
      })
    lies.foreach { case (name, bts) =>
      assert(OggLake.parseOgg(bts).isEmpty, name)
    }
  }

  test("multiplexed streams census in BOS order") {
    val a = opusFile(serial = 40) // complete stream, serial 40
    // interleave: A-bos, B-bos, A-eos, B-eos
    val ai = OggLake.opusHead(1, 0, 48000)
    val bi = OggLake.vorbisIdent(2, 44100)
    val pkt = Array[Byte](5, 6)
    val inter = Seq(
      onePage(ai, OggLake.packetLaces(ai), 40, bos = true, eos = false),
      onePage(bi, OggLake.packetLaces(bi), 41, bos = true, eos = false),
      onePage(pkt, Seq(2), 40, bos = false, eos = true, seq = 1,
        granule = 10),
      onePage(pkt, Seq(2), 41, bos = false, eos = true, seq = 1,
        granule = 20)).flatten.toArray
    val m = OggLake.parseOgg(inter).get
    assert(m.length == 2)
    assert(m(0).serial == 40 && m(0).codec == "opus" &&
      m(0).lastGranule == 10)
    assert(m(1).serial == 41 && m(1).codec == "vorbis" &&
      m(1).lastGranule == 20)
    assert(OggLake.parseOgg(a).get.length == 1)
  }

  test("comment headers: layout laws and strictness") {
    def opusWithTags(tags: Array[Byte]): Array[Byte] = {
      val ident = OggLake.opusHead(1, 0, 48000)
      onePage(ident, OggLake.packetLaces(ident), 7, bos = true,
        eos = false) ++
        onePage(tags, OggLake.packetLaces(tags), 7, bos = false,
          eos = false, seq = 1) ++
        onePage(Array[Byte](1), Seq(1), 7, bos = false, eos = true,
          seq = 2)
    }
    val good = opusWithTags(OggLake.opusTagsPacket("vend",
      Seq("TITLE=t=x", "lang=", "A-key=v")))
    val m = OggLake.parseOggTags(good).get
    assert(m.length == 1 && m(0).vendor == "vend")
    val cs = m(0).comments
    assert(cs.length == 3)
    assert(cs(0).key == "TITLE" && cs(0).value == "t=x",
      "split at the FIRST '='")
    assert(cs(1).key == "lang" && cs(1).value == "", "empty value legal")
    assert(cs(2).key == "A-key", "case and punctuation preserved")
    // vorbis form round-trips with its framing bit
    val vident = OggLake.vorbisIdent(2, 44100)
    val vtags = OggLake.vorbisCommentPacket("vv", Seq("K=1"))
    val vf = onePage(vident, OggLake.packetLaces(vident), 9, bos = true,
      eos = false) ++
      onePage(vtags, OggLake.packetLaces(vtags), 9, bos = false,
        eos = false, seq = 1) ++
      onePage(Array[Byte](1), Seq(1), 9, bos = false, eos = true, seq = 2)
    val vm = OggLake.parseOggTags(vf).get
    assert(vm(0).codec == "vorbis" && vm(0).vendor == "vv" &&
      vm(0).comments(0).key == "K")
    // strictness: each lie rejects
    val lies = Seq(
      "no '=' in comment" -> OggLake.opusTagsPacket("v", Seq("NOEQ")),
      "empty key" -> OggLake.opusTagsPacket("v", Seq("=val")),
      "key with '~' is out of 0x20-0x7d" ->
        OggLake.opusTagsPacket("v", Seq("K~=v")),
      "trailing bytes after the list" ->
        (OggLake.opusTagsPacket("v", Seq("K=v")) ++ Array[Byte](0)),
      "second packet not OpusTags" ->
        Array.tabulate(12)(_.toByte))
    lies.foreach { case (name, tags) =>
      assert(OggLake.parseOggTags(opusWithTags(tags)).isEmpty, name)
    }
    // a vorbis comment header without the framing bit rejects
    val badV = vtags.clone(); badV(badV.length - 1) = 0
    val badVf = onePage(vident, OggLake.packetLaces(vident), 9,
      bos = true, eos = false) ++
      onePage(badV, OggLake.packetLaces(badV), 9, bos = false,
        eos = false, seq = 1) ++
      onePage(Array[Byte](1), Seq(1), 9, bos = false, eos = true, seq = 2)
    assert(OggLake.parseOggTags(badVf).isEmpty, "framing bit")
    // parseOgg (the catalog walk) still accepts all of the lying
    // files above structurally — the tag layer is a separate gate
    assert(OggLake.parseOgg(good).nonEmpty)
  }

  test("tags fixture + tagsOgg: comment grain matches the laws") {
    val fx = OggLake.oggTagsFixture(spark, 10)
    val rows = OggLake.tagsOgg(fx, "id", "media")
      .orderBy("id", "stream", "seq").collect()
    val expect = (0 until 10).map(i =>
      (1 + i % 3) + (if (i % 2 == 1) 1 else 0)).sum
    assert(rows.length == expect)
    assert(rows.forall(_.getBoolean(9)), "all valid")
    // file 0: i%5=0 → empty value at seq 0; even → é suffix elsewhere
    val f0 = rows.filter(_.getLong(0) == 0L)
    assert(f0.length == 1 && f0(0).getString(6) == "Title" &&
      f0(0).getString(7) == "TITLE" && f0(0).getString(8) == "")
    // file 3: odd → vorbis stream present with the LANGUAGE law
    val f3 = rows.filter(r => r.getLong(0) == 3L && r.getInt(1) == 1)
    assert(f3.length == 1 && f3(0).getString(3) == "vorbis" &&
      f3(0).getString(6) == "LANGUAGE" && f3(0).getString(8) == "l3")
    // file 2 seq 1: '=' embedded in the value, é suffix
    val f2 = rows.filter(r => r.getLong(0) == 2L && r.getInt(5) == 1)
    assert(f2.length == 1 && f2(0).getString(8) == "v5=xé")
  }

  test("byte-flip + truncation sweeps never throw") {
    val fx = OggLake.oggFixture(spark, 8).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- fx.take(3); i <- src.indices by 2; bit <- Seq(1)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      OggLake.parseOgg(c).foreach { ss => assert(ss.nonEmpty) }
    }
    val s0 = fx.head
    (0 until s0.length).foreach(n => OggLake.parseOgg(s0.take(n)))
  }

  test("fixture + catalogOgg: stream grain matches the laws") {
    val fx = OggLake.oggFixture(spark, 12)
    val rows = OggLake.catalogOgg(fx, "id", "media")
      .orderBy("id", "stream").collect()
    val expect = (0 until 12).map(i =>
      1 + (i % 2) + (if (i % 5 == 0) 1 else 0)).sum
    assert(rows.length == expect)
    assert(rows.forall(_.getBoolean(10)), "all valid")
    // file 1: opus + vorbis; file 0: opus + other
    val f0 = rows.filter(_.getLong(0) == 0L)
    assert(f0.map(_.getString(3)).toSeq == Seq("opus", "other"))
    val f1 = rows.filter(_.getLong(0) == 1L)
    assert(f1.map(_.getString(3)).toSeq == Seq("opus", "vorbis"))
    val op1 = f1.head
    assert(op1.getInt(4) == 2 && op1.getLong(5) == 48000L &&
      op1.getInt(6) == 313) // channels 1+1, pre-skip 312+1
    assert(op1.getInt(7) == 4, "i%3=1: the spanning layout has 4 pages")
    assert(op1.getInt(8) == 5 && op1.getLong(9) == 960L * 4)
  }

  test("Opus TOC census: fixture law, duration cross-check") {
    val fx = OggLake.opusTocFixture(spark, 12)
    val rows = OggLake.extractOpusToc(fx, "id", "media")
      .orderBy("id", "stream").collect()
    assert(rows.length == 12 && rows.forall(_.getBoolean(10)))
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val na = 2 + i % 3
      assert(r.getInt(4) == na, s"id=$i n_audio")
      var total = 0L
      for (j <- 0 until na) {
        val code = j % 4
        val cfg = if (code == 3) 16 + (i + j) % 4 else (i + j) % 32
        val frames = code match {
          case 0 => 1
          case 3 => 1 + (i + j) % 3
          case _ => 2
        }
        total += frames.toLong * OggLake.opusCfgSamples(cfg)
      }
      assert(r.getLong(5) == total, s"id=$i toc_samples")
      assert(r.getLong(9) == i % 3, s"id=$i trim")
    }
  }

  test("Opus TOC strictness: every framing lie rejects") {
    // one audio packet, crafted by hand; granule must satisfy the
    // trim law against the packet's TOC duration
    def mk(toc: Int, body: Array[Byte], granule: Long,
        preSkip: Int = 100): Array[Byte] = {
      val ident = OggLake.opusHead(1, preSkip, 48000L)
      val tags = OggLake.opusTagsPacket("v", Seq("a=b"))
      val pkt = toc.toByte +: body
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(OggLake.writePage(EncPage(7L, 0, 0, bos = true,
        eos = false, cont = false, OggLake.packetLaces(ident), ident)))
      bos.write(OggLake.writePage(EncPage(7L, 1, 0, bos = false,
        eos = false, cont = false, OggLake.packetLaces(tags), tags)))
      bos.write(OggLake.writePage(EncPage(7L, 2, granule, bos = false,
        eos = true, cont = false, OggLake.packetLaces(pkt), pkt)))
      bos.toByteArray
    }
    // control: config 16 (CELT 2.5 ms = 120 samples), code 0
    val c16 = 16 << 3
    assert(OggLake.parseOpusToc(mk(c16, Array[Byte](1), 220L)).nonEmpty)
    val cases = Seq(
      // code 1 with an odd body (len-1 = 2 ok) vs EVEN body (parity lie)
      "code1 parity" -> mk(c16 | 1, Array[Byte](1), 340L),
      // code 3 with M = 0
      "code3 zero count" -> mk(c16 | 3, Array[Byte](0x40), 220L),
      // code 3 blowing the 120 ms law: config 3 (SILK 60 ms) M = 3
      "120ms law" -> mk((3 << 3) | 3, Array[Byte](3), 100L + 3 * 2880L),
      // trim >= last packet duration
      "overtrim" -> mk(c16, Array[Byte](1), 100L),
      // negative trim (granule larger than the packets explain)
      "negative trim" -> mk(c16, Array[Byte](1), 500L),
      // second packet is not OpusTags
      "missing tags" -> {
        val ident = OggLake.opusHead(1, 100, 48000L)
        val pkt = Array[Byte]((c16 & 0xff).toByte, 1)
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(OggLake.writePage(EncPage(7L, 0, 0, bos = true,
          eos = false, cont = false, OggLake.packetLaces(ident), ident)))
        bos.write(OggLake.writePage(EncPage(7L, 1, 220L, bos = false,
          eos = true, cont = false, OggLake.packetLaces(pkt), pkt)))
        bos.toByteArray
      })
    cases.foreach { case (name, b) =>
      assert(OggLake.parseOpusToc(b).isEmpty, name)
    }
    // code-1 parity CONTROL: even payload splits into two frames
    assert(OggLake.parseOpusToc(
      mk(c16 | 1, Array[Byte](1, 2), 340L)).nonEmpty, "code1 control")
    // a vorbis stream is out of this census's scope
    assert(OggLake.parseOpusToc(
      OggLake.oggFixture(spark, 2).collect()(1).getAs[Array[Byte]](1))
      .isEmpty, "non-opus stream")
    assert(OggLake.parseOpusToc(null).isEmpty)
  }
}
