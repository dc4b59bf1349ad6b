package graft

import graft.operators.MidiLake

/** SMF walk: fixture-law equality (running status exercised on every
  * file), header/chunk/VLQ/meta strictness over hand-built tracks,
  * byte-flip + truncation sweeps. */
class MidiLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = MidiLake.extractMidi(
      MidiLake.midiFixture(spark, 12), "id", "media")
      .orderBy("id", "trk").collect()
    assert(out.forall(_.getBoolean(11)))
    var k = 0
    (0 until 12).foreach { i =>
      (0 until 1 + i % 3).foreach { t =>
        val r = out(k); k += 1
        val ne = 3 + (i + t) % 4
        assert(r.getLong(0) == i && r.getInt(1) == t)
        assert(r.getString(2) == s"trk-$t")
        assert(r.getInt(3) == 1 && r.getInt(4) == 96 * (1 + i % 4))
        assert(r.getInt(5) == 1 + (if (t == 0) 1 else 0) + 2 * ne + 1)
        assert(r.getLong(6) == (0 until ne).map(j => 3 + j % 8 + j % 5).sum)
        assert(r.getInt(7) == ne)
        assert(r.getLong(8) == (0 until ne).map(j => 60 + (i + j) % 12).sum)
        assert(r.getLong(9) == (0 until ne).map(j => 64 + j % 32).sum)
        if (t == 0) assert(r.getInt(10) == 500000 + i * 1000)
        else assert(r.isNullAt(10))
      }
    }
    assert(k == out.length)
  }

  // ------------------------------------------------------------------
  // hand-built streams

  private def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)
  private def smf(fmt: Int, division: Int,
      tracks: Seq[Array[Byte]]): Array[Byte] =
    "MThd".getBytes("US-ASCII") ++ be(6, 4) ++ be(fmt.toLong, 2) ++
      be(tracks.length.toLong, 2) ++ be(division.toLong, 2) ++
      tracks.flatMap(t => "MTrk".getBytes("US-ASCII") ++
        be(t.length.toLong, 4) ++ t)
  private val eot = Array[Byte](0, 0xff.toByte, 0x2f.toByte, 0)
  private def on(ch: Int, key: Int, vel: Int): Array[Byte] =
    Array[Byte](0, (0x90 | ch).toByte, key.toByte, vel.toByte)

  test("hand-built stream strictness: every lie rejects") {
    val good = smf(0, 96, Seq(on(0, 60, 100) ++ eot))
    assert(MidiLake.parseMidi(good).nonEmpty)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> ("MThx".getBytes("US-ASCII") ++ good.drop(4)),
      "header length 7" -> (good.take(4) ++ be(7, 4) ++ good.drop(8)),
      "format 2" -> smf(2, 96, Seq(on(0, 60, 100) ++ eot)),
      "format 0 with two tracks" ->
        smf(0, 96, Seq(on(0, 60, 100) ++ eot, on(1, 61, 90) ++ eot)),
      "SMPTE division" -> smf(0, 0x8000 | 96, Seq(on(0, 60, 100) ++ eot)),
      "division 0" -> smf(0, 0, Seq(on(0, 60, 100) ++ eot)),
      "no end-of-track" -> smf(0, 96, Seq(on(0, 60, 100))),
      "events after end-of-track" ->
        smf(0, 96, Seq(on(0, 60, 100) ++ eot ++ on(0, 61, 90))),
      "end-of-track with payload" -> smf(0, 96, Seq(on(0, 60, 100) ++
        Array[Byte](0, 0xff.toByte, 0x2f.toByte, 1, 7))),
      "data byte with no prior status" -> smf(0, 96,
        Seq(Array[Byte](0, 60, 100) ++ eot)),
      "meta cancels running status" -> smf(0, 96,
        Seq(on(0, 60, 100) ++
          Array[Byte](0, 0xff.toByte, 0x06.toByte, 1, 'm'.toByte) ++
          Array[Byte](0, 61, 90) ++ eot)),
      "data byte above 0x7f" -> smf(0, 96,
        Seq(Array[Byte](0, 0x90.toByte, 60, 0x90.toByte) ++ eot)),
      "SysEx out of subset" -> smf(0, 96,
        Seq(Array[Byte](0, 0xf0.toByte, 2, 1, 0xf7.toByte) ++ eot)),
      "unknown meta type" -> smf(0, 96,
        Seq(Array[Byte](0, 0xff.toByte, 0x7f.toByte, 1, 7) ++ eot)),
      "tempo meta of length 2" -> smf(0, 96,
        Seq(Array[Byte](0, 0xff.toByte, 0x51.toByte, 2, 1, 1) ++ eot)),
      "tempo 0" -> smf(0, 96,
        Seq(Array[Byte](0, 0xff.toByte, 0x51.toByte, 3, 0, 0, 0) ++ eot)),
      "non-printable track name" -> smf(0, 96,
        Seq(Array[Byte](0, 0xff.toByte, 0x03.toByte, 1, 7) ++ eot)),
      "overlong VLQ (0x80 prefix)" -> smf(0, 96,
        Seq(Array[Byte](0x80.toByte, 0) ++ on(0, 60, 100).drop(1) ++ eot)),
      "five-byte VLQ" -> smf(0, 96,
        Seq(Array[Byte](0x81.toByte, 0x80.toByte, 0x80.toByte,
          0x80.toByte, 0) ++ on(0, 60, 100).drop(1) ++ eot)),
      "track length lie (chunk under-runs file)" ->
        (good ++ Array[Byte](7)),
      "truncated track" -> good.dropRight(2),
      "second chunk not MTrk" -> (smf(1, 96, Seq(on(0, 60, 100) ++ eot))
        .patch(14, "MTrx".getBytes("US-ASCII"), 4)))
    cases.foreach { case (name, b) =>
      assert(MidiLake.parseMidi(b).isEmpty, name)
    }
    assert(MidiLake.parseMidi(null).isEmpty)

    // running status ACROSS a NoteOn works when no meta intervenes
    val run = smf(0, 96, Seq(
      on(0, 60, 100) ++ Array[Byte](0, 61, 90) ++ eot))
    val f = MidiLake.parseMidi(run).get
    assert(f.tracks.head.nNotes == 2 &&
      f.tracks.head.noteSum == 121 && f.tracks.head.velSum == 190)
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = MidiLake.midiFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      MidiLake.parseMidi(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => MidiLake.parseMidi(s0.take(n)))
  }
}
