package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Randomized encode→decode property for the Layer III payload
  * decoder (q188): 60 seeded random streams over the WHOLE parameter
  * space the fixed fixture laws cannot cover jointly — including
  * big_values runs that reach REGION 2 (the fixture stops in region
  * 1), random region0/1 counts, all scalefac_compress values, random
  * scfsi nibbles, random reservoir targets and mixed count1 tables —
  * checked against an independent reference computation (its own
  * band mapping, scfsi expansion and BigInt fourth-root
  * round-half-even, written separately from the decoder). */
class Mp3L3PropertySpec extends AnyFunSuite {

  private val bounds = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
      134, 162, 196, 238, 288, 342, 418, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
      128, 156, 190, 230, 276, 330, 384, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
      156, 194, 240, 296, 364, 448, 550, 576))
  private val pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)
  private val slen = Array((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1),
    (1, 2), (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
    (4, 2), (4, 3))
  private def grp(band: Int): Int =
    if (band < 6) 0 else if (band < 11) 1 else if (band < 16) 2 else 3
  private def tabMax(id: Int): Int = id match {
    case 1 => 1
    case 2 | 3 => 2
    case 5 | 6 => 3
    case _ => fail(s"unexpected table $id")
  }

  /** Independent RHE of (m^4 · 2^(t/4)): integer sqrt-of-sqrt floor
    * plus half-point comparison — not the decoder's code path. */
  private def refQ(m: Int, e4: Int): Long = {
    if (m == 0) return 0L
    val t = 3 * e4 + 60
    val n0 = BigInt(m).pow(16)
    val num = if (t >= 0) n0 << t else n0
    val den = if (t >= 0) BigInt(1) else BigInt(1) << -t
    var q = BigInt((num / den).bigInteger.sqrt().sqrt())
    while ((q + 1).pow(4) * den <= num) q += 1
    while (q > 0 && q.pow(4) * den > num) q -= 1
    val hi = num << 4
    val lo = (2 * q + 1).pow(4) * den
    (if (hi > lo) q + 1
     else if (hi < lo) q
     else if (q.testBit(0)) q + 1 else q).toLong
  }

  test("60 random streams: decode equals the independent reference") {
    val rnd = new scala.util.Random(881203)
    for (trial <- 0 until 60) {
      val rateIdx = rnd.nextInt(3)
      val mono = rnd.nextBoolean()
      val ch = if (mono) 1 else 2
      val nf = 1 + rnd.nextInt(3)
      val protect = rnd.nextBoolean()
      val bnd = bounds(rateIdx)
      // per (f, g, c) random granule specs, retained for the reference
      final case class G(
          gg: Int, scomp: Int, pf: Int, ss: Int, c1t: Int,
          t0: Int, t1: Int, t2: Int, r0c: Int, r1c: Int, bv: Int,
          sf: Array[Int], vals: Array[Int], nc1: Int)
      val specs = Array.tabulate(nf, 2, ch) { (f, g, c) =>
        val scomp = rnd.nextInt(16)
        val (sl1, sl2) = slen(scomp)
        val r0c = 2 + rnd.nextInt(6)
        val r1c = 2 + rnd.nextInt(6)
        val t0 = 1 + rnd.nextInt(3)
        val t1 = Array(2, 3, 5, 6)(rnd.nextInt(4))
        val t2 = Array(1, 2, 3, 5, 6)(rnd.nextInt(5))
        // pairs may run past region 1 into region 2 (beyond the
        // fixture's reach); cap so count1 still fits under 576
        val bv = rnd.nextInt(130)
        val nc1 = rnd.nextInt(5)
        val r0End = bnd(math.min(r0c + 1, 22))
        val r1End = bnd(math.min(r0c + 1 + r1c + 1, 22))
        def tabAt(p: Int): Int =
          if (p < r0End) t0 else if (p < r1End) t1 else t2
        val vals = Array.tabulate(2 * bv + 4 * nc1) { p =>
          val cap = if (p < 2 * bv) tabMax(tabAt(p)) else 1
          val m = rnd.nextInt(cap + 1)
          if (m != 0 && rnd.nextBoolean()) -m else m
        }
        val sf = Array.tabulate(21) { band =>
          val sl = if (band < 11) sl1 else sl2
          if (sl == 0) 0 else rnd.nextInt(1 << sl)
        }
        G(190 + rnd.nextInt(60), scomp, rnd.nextInt(2), rnd.nextInt(2),
          rnd.nextInt(2), t0, t1, t2, r0c, r1c, bv, sf, vals, nc1)
      }
      val scfsiN = Array.tabulate(nf, ch)((_, _) => rnd.nextInt(16))
      val mdb = Array.tabulate(nf)(f => if (f == 0) 0 else rnd.nextInt(180))
      val blob = Multimodal.encodeMp3L3(14, rateIdx, mono, nf, protect,
        pad = f => f % 2,
        mdbTarget = f => mdb(f),
        scfsiN = (f, c) => scfsiN(f)(c),
        gr = (f, g, c) => {
          val s = specs(f)(g)(c)
          Multimodal.Mp3GrSpec(s.gg, s.scomp, s.pf, s.ss, s.c1t,
            (s.t0, s.t1, s.t2), s.r0c, s.r1c, s.bv,
            band => s.sf(band),
            p => s.vals(p),
            s.nc1)
        })
      // ---- independent reference ----
      var hsum = 0L; var vsum = 0L; var nDec = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      for (f <- 0 until nf; c <- 0 until ch; g <- 0 until 2) {
        val s = specs(f)(g)(c)
        def sfEff(band: Int): Int =
          if (g == 1 && ((scfsiN(f)(c) >> (3 - grp(band))) & 1) == 1)
            specs(f)(0)(c).sf(band)
          else s.sf(band)
        var band = 0
        for (p <- 0 until (2 * s.bv + 4 * s.nc1)) {
          while (band < 21 && p >= bnd(band + 1)) band += 1
          val v = s.vals(p)
          val e4 = (s.gg - 210) - (2 + 2 * s.ss) *
            (sfEff(band) + (if (s.pf == 1) pretab(band) else 0))
          val qa = refQ(math.abs(v), e4)
          val q = if (v < 0) -qa else qa
          hsum += v; vsum += q; nDec += 1
          mn = math.min(mn, q); mx = math.max(mx, q)
        }
      }
      if (nDec == 0) { mn = 0; mx = 0 }
      val got = Multimodal.parseMp3L3(blob)
      assert(got.isDefined, s"trial $trial must parse")
      val d = got.get
      assert(d.nFrames == nf && d.channels == ch, s"trial $trial")
      assert(d.nDecoded == nDec, s"trial $trial nDec")
      assert(d.huffSum == hsum, s"trial $trial hsum")
      assert(d.valueSum == vsum, s"trial $trial vsum")
      assert(d.mn == mn && d.mx == mx, s"trial $trial min/max")
    }
  }

  test("40 random streams over the new big-value + ESC/linbits ids") {
    // Same protocol as above, but region tables draw from the ids
    // transcribed this round: region0 7/8/9, region1 10/11/15,
    // region2 one of the sixteen linbits/ESC ids — with magnitudes
    // crossing the escape boundary both ways (sub-15 direct, exactly
    // 15 with a zero residual, and 15 + residual).
    val linbits = Map(16 -> 1, 17 -> 2, 18 -> 3, 19 -> 4, 20 -> 6,
      21 -> 8, 22 -> 10, 23 -> 13, 24 -> 4, 25 -> 5, 26 -> 6, 27 -> 7,
      28 -> 8, 29 -> 9, 30 -> 11, 31 -> 13)
    val rnd = new scala.util.Random(442199)
    for (trial <- 0 until 40) {
      val rateIdx = rnd.nextInt(3)
      val mono = rnd.nextBoolean()
      val ch = if (mono) 1 else 2
      val nf = 1 + rnd.nextInt(3)
      val protect = rnd.nextBoolean()
      val bnd = bounds(rateIdx)
      final case class G(
          gg: Int, scomp: Int, pf: Int, ss: Int, c1t: Int,
          t0: Int, t1: Int, t2: Int, r0c: Int, r1c: Int, bv: Int,
          sf: Array[Int], vals: Array[Int], nc1: Int)
      val specs = Array.tabulate(nf, 2, ch) { (f, g, c) =>
        val scomp = rnd.nextInt(16)
        val (sl1, sl2) = slen(scomp)
        val r0c = 2 + rnd.nextInt(6)
        val r1c = 2 + rnd.nextInt(6)
        val t0 = Seq(7, 8, 9)(rnd.nextInt(3))
        val t1 = Seq(10, 11, 15)(rnd.nextInt(3))
        val t2 = 16 + rnd.nextInt(16)
        // worst-case ESC pair is hlen<=13 + 2x13 linbits + 2 signs =
        // 41 bits; bound bv so part2_3_length stays under 4096 and a
        // frame's four (stereo) sections fit its slot bytes
        val bv = rnd.nextInt(if (mono) 70 else 35)
        val nc1 = rnd.nextInt(5)
        val r0End = bnd(math.min(r0c + 1, 22))
        val r1End = bnd(math.min(r0c + 1 + r1c + 1, 22))
        def capAt(p: Int): Int =
          if (p < r0End) 5
          else if (p < r1End) (if (t1 == 15) 15 else 7)
          else 15 + math.min((1 << linbits(t2)) - 1, 185)
        val vals = Array.tabulate(2 * bv + 4 * nc1) { p =>
          val cap = if (p < 2 * bv) capAt(p) else 1
          val m = rnd.nextInt(cap + 1)
          if (m != 0 && rnd.nextBoolean()) -m else m
        }
        val sf = Array.tabulate(21) { band =>
          val sl = if (band < 11) sl1 else sl2
          if (sl == 0) 0 else rnd.nextInt(1 << sl)
        }
        G(180 + rnd.nextInt(36), scomp, rnd.nextInt(2), rnd.nextInt(2),
          rnd.nextInt(2), t0, t1, t2, r0c, r1c, bv, sf, vals, nc1)
      }
      val scfsiN = Array.tabulate(nf, ch)((_, _) => rnd.nextInt(16))
      val mdb = Array.tabulate(nf)(f => if (f == 0) 0 else rnd.nextInt(180))
      val blob = Multimodal.encodeMp3L3(14, rateIdx, mono, nf, protect,
        pad = f => f % 2,
        mdbTarget = f => mdb(f),
        scfsiN = (f, c) => scfsiN(f)(c),
        gr = (f, g, c) => {
          val s = specs(f)(g)(c)
          Multimodal.Mp3GrSpec(s.gg, s.scomp, s.pf, s.ss, s.c1t,
            (s.t0, s.t1, s.t2), s.r0c, s.r1c, s.bv,
            band => s.sf(band),
            p => s.vals(p),
            s.nc1)
        })
      // ---- independent reference (same as the small-table test) ----
      var hsum = 0L; var vsum = 0L; var nDec = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      for (f <- 0 until nf; c <- 0 until ch; g <- 0 until 2) {
        val s = specs(f)(g)(c)
        def sfEff(band: Int): Int =
          if (g == 1 && ((scfsiN(f)(c) >> (3 - grp(band))) & 1) == 1)
            specs(f)(0)(c).sf(band)
          else s.sf(band)
        var band = 0
        for (p <- 0 until (2 * s.bv + 4 * s.nc1)) {
          while (band < 21 && p >= bnd(band + 1)) band += 1
          val v = s.vals(p)
          val e4 = (s.gg - 210) - (2 + 2 * s.ss) *
            (sfEff(band) + (if (s.pf == 1) pretab(band) else 0))
          val qa = refQ(math.abs(v), e4)
          val q = if (v < 0) -qa else qa
          hsum += v; vsum += q; nDec += 1
          mn = math.min(mn, q); mx = math.max(mx, q)
        }
      }
      if (nDec == 0) { mn = 0; mx = 0 }
      val got = Multimodal.parseMp3L3(blob)
      assert(got.isDefined, s"esc trial $trial must parse")
      val d = got.get
      assert(d.nFrames == nf && d.channels == ch, s"esc trial $trial")
      assert(d.nDecoded == nDec, s"esc trial $trial nDec")
      assert(d.huffSum == hsum, s"esc trial $trial hsum")
      assert(d.valueSum == vsum, s"esc trial $trial vsum")
      assert(d.mn == mn && d.mx == mx, s"esc trial $trial min/max")
    }
  }
}
