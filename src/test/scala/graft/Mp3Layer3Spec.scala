package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** MPEG-1 Layer III payload decode (q188): Huffman-table structural
  * gates, an INDEPENDENT law replay of the fixture (the same laws the
  * DuckDB oracle runs), bit-reservoir exercise, the corruption /
  * legality matrix, and the exact BigInt fourth-root requantizer
  * property for quarter exponents the fixture never hits. */
class Mp3Layer3Spec extends SparkSpec {

  test("huffman resource: complete prefix codes, encode/decode roundtrip") {
    val tabs = Multimodal.mp3HuffTables
    // the set the provenance note declares: spec-unused 4/14 and
    // transcription-failed 12/13 absent; everything else present,
    // including all sixteen linbits/ESC ids
    assert(tabs.keySet ==
      (Set(1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 15, 32) ++ (16 to 31)))
    tabs.values.foreach { t =>
      assert(t.complete, s"table ${t.id} incomplete")
      // Kraft sum exactly 1 — recomputed here from the encode map
      val kraft = t.keys.map { k =>
        BigDecimal(1) / BigDecimal(BigInt(1) << t.encodeBits(k)._1)
      }.sum
      assert(kraft == BigDecimal(1), s"table ${t.id} kraft $kraft")
      // expected alphabet size
      val expect = if (t.quad) 16 else t.maxVal * t.maxVal
      assert(t.keys.size == expect, s"table ${t.id} size")
    }
  }

  test("ESC families: 17-23 share table 16's codewords, 25-31 table 24's") {
    val tabs = Multimodal.mp3HuffTables
    // per-id linbits — ISO/IEC 11172-3 Table 3-B.7's ESC structure
    val linbits = Map(16 -> 1, 17 -> 2, 18 -> 3, 19 -> 4, 20 -> 6,
      21 -> 8, 22 -> 10, 23 -> 13, 24 -> 4, 25 -> 5, 26 -> 6, 27 -> 7,
      28 -> 8, 29 -> 9, 30 -> 11, 31 -> 13)
    for ((id, lb) <- linbits) assert(tabs(id).linbits == lb, s"linbits $id")
    for (id <- 17 to 23; k <- tabs(16).keys)
      assert(tabs(id).encodeBits(k) == tabs(16).encodeBits(k), s"t$id key $k")
    for (id <- 25 to 31; k <- tabs(24).keys)
      assert(tabs(id).encodeBits(k) == tabs(24).encodeBits(k), s"t$id key $k")
    // non-ESC big-value tables carry no linbits
    for (id <- Seq(1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 15))
      assert(tabs(id).linbits == 0, s"linbits $id")
  }

  test("fixture decode matches the independent law replay (the oracle's laws)") {
    val n = 12
    val got = Multimodal.decodeMp3L3(
      Multimodal.mp3L3Fixture(spark, n), "id", "media").orderBy("id").collect()
    val slen = Array((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
      (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))
    for (r <- 0 until n) {
      val rateIdx = r % 3
      val rate = Array(44100, 48000, 32000)(rateIdx)
      val mono = (r / 3) % 3 == 0
      val ch = if (mono) 1 else 2
      val nf = 2 + r % 3
      val s12 = Array(74, 72, 82)(rateIdx)
      var sum = 0L; var hsum = 0L; var nDec = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      for (f <- 0 until nf; c <- 0 until ch) {
        // raw scalefactor law, both granules (needed for scfsi sharing)
        val ss = (r + f + c) % 2
        def sfRaw(g: Int, grp: Int): Int = {
          val scomp = (r + 2 * f + 3 * g + 5 * c) % 16
          val (sl1, sl2) = slen(scomp)
          val sl = if (grp < 2) sl1 else sl2
          val base = r + 2 * f + 3 * g + 5 * c + 7 * grp
          if (ss == 1) base % (1 << sl)
          else if (sl == 0) 0
          else 2 * (base % (1 << (sl - 1)))
        }
        val nsc = (r + 3 * f + 5 * c) % 16
        for (g <- 0 until 2) {
          val gg = 210 + 4 * ((r + f + 2 * g + 3 * c) % 4)
          val pf = if (ss == 0) 0 else (r + f + g + c) % 2
          def sfEff(grp: Int): Int =
            if (g == 1 && ((nsc >> (3 - grp)) & 1) == 1) sfRaw(0, grp)
            else sfRaw(g, grp)
          val t0 = 1 + (r + f + g + c) % 3
          val mx0 = if (t0 == 1) 2 else 3
          for (p <- 0 until (s12 + 14)) {
            val (m0, negKey) =
              if (p < 24)
                ((r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0, r + f + g + c + p)
              else if (p < 36)
                ((r * 11 + f * 3 + g * 7 + c * 5 + p) % 4, r + f + g + c + p)
              else if (p < s12) (0, 0)
              else if (p == s12) (1 + (r + f + g + c) % 3, r + f + g + c)
              else if (p == s12 + 1)
                (1 + (r + f + g + c + 1) % 3, r + f + g + c + 1)
              else ((r + 3 * f + 5 * g + 7 * c + (p - s12 - 2)) % 2,
                r + f + g + c + (p - s12 - 2))
            val grp = if (p < 24) 0 else if (p < 36) 1 else 2
            val e4 = (gg - 210) -
              (2 + 2 * ss) * (sfEff(grp) + (if (p >= s12) pf else 0))
            val e = (3 * e4 + 60) / 4
            assert((3 * e4 + 60) % 4 == 0, "fixture must stay in mod-4 regime")
            val m4 = m0.toLong * m0 * m0 * m0
            val qa =
              if (e >= 0) m4 << e
              else {
                val b = BigInt(1) << -e
                val a = BigInt(m4)
                val fq = a / b
                val rp = a - fq * b
                (fq + (if (2 * rp > b) 1 else if (2 * rp == b && fq.testBit(0)) 1
                       else 0)).toLong
              }
            val sgn = if (m0 != 0 && negKey % 2 == 1) -1 else 1
            val q = sgn * qa
            sum += q; hsum += sgn * m0; nDec += 1
            mn = math.min(mn, q); mx = math.max(mx, q)
          }
        }
      }
      val row = got(r)
      assert(row.getAs[Boolean]("valid"), s"id $r invalid")
      assert(row.getAs[Int]("sample_rate") == rate, s"rate id $r")
      assert(row.getAs[Int]("channels") == ch, s"ch id $r")
      assert(row.getAs[Int]("n_frames") == nf, s"nf id $r")
      assert(row.getAs[Long]("total_samples") == nf.toLong * 1152 * ch)
      assert(row.getAs[Long]("n_decoded") == nDec, s"nDec id $r")
      assert(row.getAs[Long]("huff_sum") == hsum, s"hsum id $r")
      assert(row.getAs[Long]("value_sum") == sum, s"vsum id $r")
      assert(row.getAs[Long]("min_sample") == mn, s"min id $r")
      assert(row.getAs[Long]("max_sample") == mx, s"max id $r")
    }
  }

  test("bit reservoir: fixture streams carry nonzero main_data_begin frames") {
    // law: mdb(f) = (r + 11f) % 200 unless (r+f) % 3 == 0 or f == 0;
    // r = 1, f = 1 -> 12 bytes back into frame 0's slot
    val b = Multimodal.mp3L3Fixture(spark, 2).orderBy("id").collect()(1)
      .getAs[Array[Byte]]("media")
    assert(Multimodal.parseMp3L3(b).exists(_.nFrames == 3))
    // and the q93 header walk agrees on the frame structure
    assert(Multimodal.parseMp3(b).exists(_._3 == 3))
  }

  test("corruption / legality matrix") {
    def fix(r: Int): Array[Byte] =
      Multimodal.mp3L3Fixture(spark, r + 1).orderBy("id").collect()(r)
        .getAs[Array[Byte]]("media")
    val protStream = fix(0)   // even id: CRC-protected
    val freeStream = fix(1)   // odd id: unprotected, stereo
    assert(Multimodal.parseMp3L3(protStream).isDefined)
    assert(Multimodal.parseMp3L3(freeStream).isDefined)
    // bad CRC (bytes 4-5 on protected frames)
    val badCrc = protStream.clone(); badCrc(4) = (badCrc(4) ^ 0x40).toByte
    assert(Multimodal.parseMp3L3(badCrc).isEmpty)
    // joint stereo (mode 01) out of scope
    val joint = freeStream.clone()
    joint(3) = ((joint(3) & 0x3f) | 0x40).toByte
    assert(Multimodal.parseMp3L3(joint).isEmpty)
    // truncation never lands the walk on the buffer end
    for (cut <- 1 to 8)
      assert(Multimodal.parseMp3L3(
        java.util.Arrays.copyOf(freeStream, freeStream.length - cut)).isEmpty)
    // reserved bitrate / rate indices
    val brBad = freeStream.clone(); brBad(2) = (brBad(2) | 0xf0).toByte
    assert(Multimodal.parseMp3L3(brBad).isEmpty)
    val srBad = freeStream.clone(); srBad(2) = (srBad(2) | 0x0c).toByte
    assert(Multimodal.parseMp3L3(srBad).isEmpty)
    // window_switching_flag = 1 (short/mixed blocks): rejected, not
    // guessed. Unprotected mono: side info starts at byte 4;
    // main_data_begin(9) + private(5) + scfsi(4) + p23(12) + bv(9) +
    // gg(8) + scomp(4) = 51 bits, so wsf is bit 51 of the side info —
    // byte 4+6, mask 0x10.
    val mono = fix(9) // r=9: mono ((9/3)%3==0), odd -> unprotected
    assert((mono(1) & 1) == 1 && ((mono(3) & 0xff) >> 6) == 3)
    val short = mono.clone(); short(10) = (short(10) | 0x10).toByte
    assert(Multimodal.parseMp3L3(short).isEmpty)
    // layer discrimination both ways
    val mp2 = Multimodal.encodeMp2(10, 1, 3, 1, protect = false,
      pad = _ => 0, allocIdx = (_, _, _) => 0, scfsi = (_, _, _) => 0,
      scf = (_, _, _, _) => 0, code = (_, _, _, _, _) => 0)
    assert(Multimodal.parseMp3L3(mp2).isEmpty)
    assert(Multimodal.parseMp2(freeStream).isEmpty)
    // the zero-payload header-walk fixture (q93) is NOT a valid
    // payload stream: side info declares part2_3_length 0 with
    // big_values 0 on every granule — actually legal (silent), so it
    // must PARSE as a silent stream
    val silent = Multimodal.encodeMp3(9, 0, 3)
    val sOut = Multimodal.parseMp3L3(silent)
    assert(sOut.isDefined && sOut.get.nDecoded == 0L)
  }

  test("unsupported Huffman table ids reject, never guess") {
    // encoder refuses absent ids, so splice the id into real bytes:
    // unprotected mono side info starts at file byte 4; granule 0's
    // table_select(0) is side-info bits 52..56 (after mdb 9 + private
    // 5 + scfsi 4 + p23 12 + bv 9 + gg 8 + scomp 4 + wsf 1). Bits
    // 52..55 are the low nibble of file byte 10, bit 56 the MSB of
    // byte 11. Splice in id 12 (01100) — transcription-failed, absent
    // from the resource (id 7 went real this round and no longer
    // rejects).
    val mono = Multimodal.mp3L3Fixture(spark, 10).orderBy("id").collect()(9)
      .getAs[Array[Byte]]("media")
    assert((mono(1) & 1) == 1 && ((mono(3) & 0xff) >> 6) == 3)
    val spliced = mono.clone()
    spliced(10) = ((spliced(10) & 0xf0) | 0x06).toByte
    spliced(11) = (spliced(11) & 0x7f).toByte
    assert(Multimodal.parseMp3L3(spliced).isEmpty)
  }

  test("ID3 wrapping: decode is tag-invariant; malformed tags reject") {
    val rows = Multimodal.mp3L3Id3Fixture(spark, 6).orderBy("id").collect()
    // id 0: v2 + v1 (even, ≡0 mod 3); id 5: neither (odd, ≡2 mod 3)
    val wrapped = rows(0).getAs[Array[Byte]]("media")
    assert(wrapped(0) == 'I' && wrapped(1) == 'D' && wrapped(2) == '3')
    assert(wrapped(wrapped.length - 128) == 'T')
    val bare = rows(5).getAs[Array[Byte]]("media")
    assert((bare(0) & 0xff) == 0xff)
    val d = Multimodal.parseMp3L3(wrapped)
    assert(d.isDefined && d.get.nFrames == 2)
    // tag-invariance: strip the v2 prefix + v1 trailer by the tag's
    // own size field and decode the bare audio to the same result
    val size = ((wrapped(6) & 0x7f) << 21) | ((wrapped(7) & 0x7f) << 14) |
      ((wrapped(8) & 0x7f) << 7) | (wrapped(9) & 0x7f)
    val audio = java.util.Arrays.copyOfRange(
      wrapped, 10 + size, wrapped.length - 128)
    assert(Multimodal.parseMp3L3(audio) == d)
    // malformed syncsafe (high bit set) rejects
    val badSs = wrapped.clone(); badSs(6) = (badSs(6) | 0x80).toByte
    assert(Multimodal.parseMp3L3(badSs).isEmpty)
    // tag size past the blob rejects
    val huge = wrapped.clone(); huge(6) = 0x7f.toByte; huge(7) = 0x7f.toByte
    assert(Multimodal.parseMp3L3(huge).isEmpty)
    // major version out of range rejects
    val badVer = wrapped.clone(); badVer(3) = 9
    assert(Multimodal.parseMp3L3(badVer).isEmpty)
    // a 'TAG' block NOT exactly 128 bytes from the end is not a
    // trailer — the frame walk then fails on the trailing bytes
    assert(Multimodal.parseMp3L3(
      wrapped ++ Array[Byte]('x')).isEmpty)
  }

  test("requantizer: exact fourth-root RHE for every quarter exponent") {
    // Property: q = mp3CubeQ15(is, e4) is THE round-half-even of
    // (is^4 * 2^((3*e4+60)/4)) for ALL e4, including the fractional-
    // exponent regime the fixture's laws exclude. Verified purely on
    // integers: x >= q+1/2 <=> 16*num >= (2q+1)^4*den.
    for (is <- 1 to 40; e4 <- -80 to 30) {
      val q = BigInt(Multimodal.mp3CubeQ15(is, e4))
      val t = 3 * e4 + 60
      // cube-domain x = is^4 * 2^(t/4), so x^4 * den = is^16 * 2^t
      val n4 = BigInt(is).pow(16)
      val num4 = if (t >= 0) n4 << t else n4
      val den4 = if (t >= 0) BigInt(1) else BigInt(1) << -t
      val hi = (2 * q + 1).pow(4) * den4
      val lo = if (q > 0) (2 * q - 1).pow(4) * den4 else BigInt(-1)
      val mid = num4 << 4
      assert(hi >= mid, s"is=$is e4=$e4 q=$q rounds low")
      assert(lo <= mid, s"is=$is e4=$e4 q=$q rounds high")
      if (hi == mid) assert(q.testBit(0) == false, s"tie-up parity is=$is e4=$e4")
      if (lo == mid) assert(q.testBit(0) == false, s"tie-down parity is=$is e4=$e4")
      // loose IEEE sanity (the BigInt inequalities above are the real
      // gate; pow products drift a few ulps at large magnitudes)
      val dq = math.pow(is.toDouble, 4.0) *
        math.pow(2.0, 3.0 * e4 / 4.0) * 32768.0
      assert(math.abs(q.toDouble - dq) <= math.max(1.0, math.abs(dq) * 1e-9),
        s"double cross-check is=$is e4=$e4 q=$q dq=$dq")
    }
  }

  test("silent stream: zero big_values and count1 is valid with n_decoded 0") {
    val b = Multimodal.encodeMp3L3(14, 0, mono = true, nFrames = 2,
      protect = true, pad = _ => 0, mdbTarget = _ => 0,
      scfsiN = (_, _) => 0,
      gr = (_, _, _) => Multimodal.Mp3GrSpec(210, 0, 0, 0, 0, (0, 0, 0),
        5, 7, 0, _ => 0, _ => 0, 0))
    val out = Multimodal.parseMp3L3(b)
    assert(out.isDefined)
    assert(out.get.nDecoded == 0L && out.get.totalSamples == 2304L &&
      out.get.valueSum == 0L)
  }
}
