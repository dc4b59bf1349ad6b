package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Standard MIDI File extraction (the MMA SMF specification — the
  * symbolic-music side of an audio corpus: scores, ringtones, game
  * assets). A real event-stream decoder: big-endian chunk walk,
  * variable-length-quantity delta times, RUNNING STATUS (the stateful
  * compression real files rely on), and the meta-event layer.
  *
  * Closed subset (strict — reject, never guess):
  *  - header: `MThd` length 6, format 0/1 (format 0 ⇒ exactly one
  *    track), 1 ≤ ntrks ≤ 64, metrical division only (ticks/quarter,
  *    top bit 0 — SMPTE framing is out of subset);
  *  - tracks: `MTrk` chunks tiling the file exactly; inside, VLQ
  *    deltas ≤ 4 bytes (0x0FFFFFFF cap, no overlong zero-prefix);
  *    channel messages 0x8n-0xEn with 7-bit data bytes, running
  *    status honored for channel messages only (a data byte with no
  *    prior status rejects);
  *  - meta events: tempo 0x51 (len 3, > 0), time signature 0x58
  *    (len 4), track name 0x03 (printable ASCII ≤ 64), marker 0x06,
  *    end-of-track 0x2F (len 0) EXACTLY once, as the last event, at
  *    the exact chunk end; other meta types and SysEx (0xF0/0xF7)
  *    are out of subset.
  *
  * Emits one row per track (event/tick/note/velocity censuses, last
  * tempo, name) so both the event walk and the running-status state
  * machine are hash-gated. One blob = one task-local walk. */
object MidiLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class MidiTrack(
      nEvents: Int, totalTicks: Long, nNotes: Int, noteSum: Long,
      velSum: Long, tempoUs: Option[Int], name: Option[String])
  private[graft] final case class MidiFile(
      fmt: Int, division: Int, tracks: Seq[MidiTrack])

  private final class Cur(val b: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = {
      if (p >= end) throw Fail
      val v = b(p) & 0xff; p += 1; v
    }
    def be(n: Int): Long = {
      if (p + n > end) throw Fail
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += n
      v
    }
  }

  /** SMF VLQ: ≤ 4 bytes, MSB-first 7-bit groups; overlong (leading
    * 0x80 continuation of a zero prefix) rejects. */
  private def vlq(c: Cur): Long = {
    var v = 0L
    var i = 0
    var more = true
    var first = true
    while (more) {
      if (i == 4) throw Fail
      val x = c.u8()
      if (first && x == 0x80) throw Fail // overlong zero prefix
      first = false
      v = (v << 7) | (x & 0x7f)
      more = (x & 0x80) != 0
      i += 1
    }
    v
  }

  private def trackChunk(b: Array[Byte], from: Int, to: Int): MidiTrack = {
    val c = new Cur(b, from, to)
    var nEvents = 0
    var ticks = 0L
    var nNotes = 0
    var noteSum = 0L
    var velSum = 0L
    var tempo: Option[Int] = None
    var name: Option[String] = None
    var running = -1 // last channel status, -1 = none
    var ended = false
    while (!ended) {
      ticks += vlq(c)
      val first = c.u8()
      if (first == 0xff) { // meta
        val mtype = c.u8()
        val len = vlq(c)
        if (len > 1024) throw Fail
        mtype match {
          case 0x2f =>
            if (len != 0) throw Fail
            if (c.p != to) throw Fail // must close the chunk exactly
            ended = true
          case 0x51 =>
            if (len != 3) throw Fail
            val t = c.be(3)
            if (t <= 0) throw Fail
            tempo = Some(t.toInt)
          case 0x58 =>
            if (len != 4) throw Fail
            c.be(4)
          case 0x03 | 0x06 =>
            if (len > 64) throw Fail
            val s = new Array[Byte](len.toInt)
            var i = 0
            while (i < len) { s(i) = c.u8().toByte; i += 1 }
            if (s.exists(x => x < 0x20 || x > 0x7e)) throw Fail
            if (mtype == 0x03) name = Some(
              new String(s, StandardCharsets.US_ASCII))
          case _ => throw Fail // other meta types: out of subset
        }
        running = -1 // meta events cancel running status per spec
        nEvents += 1
      } else if (first == 0xf0 || first == 0xf7) {
        throw Fail // SysEx: out of subset
      } else {
        // channel message, possibly via running status
        val (status, d0) =
          if ((first & 0x80) != 0) (first, c.u8())
          else {
            if (running < 0) throw Fail // data byte without a status
            (running, first)
          }
        running = status
        if (d0 > 0x7f) throw Fail
        val kind = status >> 4
        val nData = kind match {
          case 0x8 | 0x9 | 0xa | 0xb | 0xe => 2
          case 0xc | 0xd => 1
          case _ => throw Fail
        }
        val d1 = if (nData == 2) {
          val v = c.u8()
          if (v > 0x7f) throw Fail
          v
        } else 0
        if (kind == 0x9 && d1 > 0) { // NoteOn with velocity
          nNotes += 1
          noteSum += d0
          velSum += d1
        }
        nEvents += 1
      }
    }
    MidiTrack(nEvents, ticks, nNotes, noteSum, velSum, tempo, name)
  }

  /** Walk one SMF; None on any spec or subset violation. */
  private[graft] def parseMidi(raw: Array[Byte]): Option[MidiFile] = {
    if (raw == null || raw.length < 14) return None
    try {
      if (raw(0) != 'M' || raw(1) != 'T' || raw(2) != 'h' || raw(3) != 'd')
        return None
      val c = new Cur(raw, 4, raw.length)
      if (c.be(4) != 6) throw Fail
      val fmt = c.be(2).toInt
      if (fmt != 0 && fmt != 1) throw Fail
      val ntrks = c.be(2).toInt
      if (ntrks < 1 || ntrks > 64) throw Fail
      if (fmt == 0 && ntrks != 1) throw Fail
      val division = c.be(2).toInt
      if ((division & 0x8000) != 0 || division == 0) throw Fail // SMPTE out
      val tracks = (0 until ntrks).map { _ =>
        if (c.p + 8 > raw.length) throw Fail
        if (raw(c.p) != 'M' || raw(c.p + 1) != 'T' ||
            raw(c.p + 2) != 'r' || raw(c.p + 3) != 'k') throw Fail
        c.p += 4
        val len = c.be(4)
        if (len < 4 || c.p + len > raw.length) throw Fail
        val t = trackChunk(raw, c.p, c.p + len.toInt)
        c.p += len.toInt
        t
      }
      if (c.p != raw.length) throw Fail // chunks tile the file exactly
      Some(MidiFile(fmt, division, tracks))
    } catch { case Fail => None }
  }

  /** One row per track; an invalid file yields one flagged row. */
  def extractMidi(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("trk", IntegerType, true),
      StructField("name", StringType, true),
      StructField("fmt", IntegerType, true),
      StructField("division", IntegerType, true),
      StructField("n_events", IntegerType, true),
      StructField("total_ticks", LongType, true),
      StructField("n_notes", IntegerType, true),
      StructField("note_sum", LongType, true),
      StructField("vel_sum", LongType, true),
      StructField("tempo_us", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseMidi(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(f) =>
            f.tracks.zipWithIndex.map { case (t, i) =>
              Row(id, i, t.name.orNull, f.fmt, f.division, t.nEvents,
                t.totalTicks, t.nNotes, t.noteSum, t.velSum,
                t.tempoUs.map(Int.box).orNull, true)
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

  private def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)

  private[graft] def encVlq(v: Long): Array[Byte] = {
    require(v >= 0 && v <= 0x0fffffffL)
    val groups = scala.collection.mutable.ArrayBuffer((v & 0x7f).toByte)
    var x = v >> 7
    while (x != 0) { groups.prepend(((x & 0x7f) | 0x80).toByte); x >>= 7 }
    groups.toArray
  }

  /** Fixture law (replayed closed-form by the oracle): file i is
    * format 1 with 1+i%3 tracks, division 96·(1+i%4); track t opens
    * with its name meta "trk-{t}" (+ the tempo meta 500000+i·1000 on
    * track 0 only), then 3+(i+t)%4 NoteOn/NoteOff pairs on channel
    * t%16 — key 60+(i+j)%12, velocity 64+j%32, deltas 1+j%8 and
    * 2+j%5, NoteOff carried as NoteOn-velocity-0 so every event
    * after the first rides RUNNING STATUS — and closes with
    * end-of-track. */
  def midiFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ntrks = 1 + i % 3
      val division = 96 * (1 + i % 4)
      val chunks = (0 until ntrks).map { t =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
        def emit(bs: Array[Byte]): Unit = buf ++= bs
        // name meta
        emit(encVlq(0))
        val nm = s"trk-$t".getBytes(StandardCharsets.US_ASCII)
        emit(Array(0xff.toByte, 0x03.toByte) ++ encVlq(nm.length.toLong) ++ nm)
        if (t == 0) {
          emit(encVlq(0))
          emit(Array(0xff.toByte, 0x51.toByte, 0x03.toByte) ++
            be(500000L + i * 1000L, 3))
        }
        // NoteOff carried as NoteOn-velocity-0 (common practice), so
        // the whole note stream shares status 0x9n and every event
        // after the first rides RUNNING STATUS — the state machine is
        // exercised on every fixture file
        val ne = 3 + (i + t) % 4
        val ch = t % 16
        var statusSent = false
        (0 until ne).foreach { j =>
          val key = 60 + (i + j) % 12
          val vel = 64 + j % 32
          emit(encVlq((1 + j % 8).toLong))
          if (statusSent) emit(Array(key.toByte, vel.toByte))
          else {
            emit(Array((0x90 | ch).toByte, key.toByte, vel.toByte))
            statusSent = true
          }
          emit(encVlq((2 + j % 5).toLong))
          emit(Array(key.toByte, 0.toByte)) // running-status NoteOff
        }
        emit(encVlq(0))
        emit(Array(0xff.toByte, 0x2f.toByte, 0x00.toByte))
        "MTrk".getBytes(StandardCharsets.US_ASCII) ++
          be(buf.length.toLong, 4) ++ buf.toArray
      }
      val header = "MThd".getBytes(StandardCharsets.US_ASCII) ++
        be(6, 4) ++ be(1, 2) ++ be(ntrks.toLong, 2) ++ be(division.toLong, 2)
      Row(i.toLong, header ++ chunks.flatten.toArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
