package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ID3v2 tag extraction + tagged-MP3 catalog (the id3.org informal
  * standard, v2.3.0/v2.4.0 — how MP3s actually arrive in a media
  * corpus: a metadata tag prepended to the audio stream). Composes
  * with [[Multimodal.parseMp3]]: the tag walk accounts for every
  * byte of the tag, then the REMAINDER must be a valid MPEG-1
  * Layer III stream — a file whose audio doesn't parse is flagged
  * whole, tags notwithstanding:
  *
  *  - header: `ID3`, major 3 or 4 (others reject), revision 0,
  *    flags 0 (unsynchronisation/extended header/footer are OUT of
  *    subset — reject, never guess), syncsafe tag size;
  *  - frames: 4-char `T***` text frames (TXXX's key/value layout is
  *    out of subset) with v2.3 plain-BE vs v2.4 SYNCSAFE frame sizes
  *    — the versioned size law is the classic interop bug, here
  *    verified per version; flag bytes must be zero; duplicate
  *    frame IDs reject; a zero byte where a frame ID should be
  *    starts the padding, which must be all zeros to the tag end;
  *  - text payloads: encoding byte 0 = ISO-8859-1 (C0 controls
  *    reject), 1 = UTF-16 with mandatory BOM (both endians), 3 =
  *    UTF-8 (v2.4 only — its appearance in a v2.3 tag rejects);
  *    encoding 2 (BOM-less UTF-16BE) is out of subset; one optional
  *    trailing NUL terminator is stripped, embedded NULs (the
  *    v2.4 multi-value convention) reject;
  *  - projection: TIT2/TPE1/TALB/TCON strings, TYER (v2.3) or TDRC
  *    (v2.4) as a strict 4-digit year, TRCK as strict digits.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object Id3Lake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class Id3Tag(
      ver: Int, title: Option[String], artist: Option[String],
      album: Option[String], year: Option[Int], track: Option[Int],
      genre: Option[String], nFrames: Int, padBytes: Int)

  private def syncsafe(b: Array[Byte], o: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) {
      val x = b(o + i) & 0xff
      if ((x & 0x80) != 0) throw Fail
      v = (v << 7) | x
      i += 1
    }
    v
  }

  private def decodeText(ver: Int, payload: Array[Byte]): String = {
    if (payload.length < 1) throw Fail
    val enc = payload(0) & 0xff
    var body = java.util.Arrays.copyOfRange(payload, 1, payload.length)
    enc match {
      case 0 =>
        if (body.nonEmpty && body.last == 0)
          body = java.util.Arrays.copyOf(body, body.length - 1)
        val sb = new StringBuilder
        body.foreach { x =>
          val c = x & 0xff
          if (c < 0x20) throw Fail // controls (and embedded NULs)
          sb.append(c.toChar) // ISO-8859-1: byte == code point
        }
        sb.toString
      case 1 =>
        if (body.length < 2 || body.length % 2 != 0) throw Fail
        if (body.length >= 2 && body(body.length - 2) == 0 &&
            body(body.length - 1) == 0)
          body = java.util.Arrays.copyOf(body, body.length - 2)
        if (body.length < 2) throw Fail
        val cs =
          if ((body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
            StandardCharsets.UTF_16LE
          else if ((body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
            StandardCharsets.UTF_16BE
          else throw Fail // BOM is mandatory for encoding 1
        val dec = cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val s =
          try dec.decode(java.nio.ByteBuffer.wrap(body, 2, body.length - 2))
            .toString
          catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
        if (s.isEmpty || s.exists(_ < 0x20)) throw Fail
        s
      case 3 =>
        if (ver != 4) throw Fail // UTF-8 is a v2.4 encoding
        if (body.nonEmpty && body.last == 0)
          body = java.util.Arrays.copyOf(body, body.length - 1)
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val s =
          try dec.decode(java.nio.ByteBuffer.wrap(body)).toString
          catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
        if (s.isEmpty || s.exists(_ < 0x20)) throw Fail
        s
      case _ => throw Fail // 2 (BOM-less UTF-16BE) and beyond: out of subset
    }
  }

  /** Walk one tagged file; None on any tag or audio violation. */
  private[graft] def parseTagged(raw: Array[Byte])
    : Option[(Id3Tag, (Int, Int, Int))] = {
    if (raw == null || raw.length < 10) return None
    try {
      if (raw(0) != 'I' || raw(1) != 'D' || raw(2) != '3') return None
      val ver = raw(3) & 0xff
      if (ver != 3 && ver != 4) return None
      if ((raw(4) & 0xff) != 0) return None // revision
      if ((raw(5) & 0xff) != 0) return None // unsync/ext/footer: out of subset
      val size = syncsafe(raw, 6)
      val tagEnd = 10 + size
      if (tagEnd > raw.length) return None

      var p = 10
      var nFrames = 0
      var pad = 0
      val seen = scala.collection.mutable.HashSet.empty[String]
      var title, artist, album, genre: Option[String] = None
      var year, track: Option[Int] = None
      var inFrames = true
      while (inFrames) {
        if (p == tagEnd) inFrames = false
        else if (raw(p) == 0) { // padding to the tag end, all zeros
          var q = p
          while (q < tagEnd) {
            if (raw(q) != 0) throw Fail
            q += 1
          }
          pad = tagEnd - p
          p = tagEnd
          inFrames = false
        } else {
          if (p + 10 > tagEnd) throw Fail
          val fid = new String(raw, p, 4, "ISO-8859-1")
          if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
            throw Fail
          if (fid.charAt(0) != 'T' || fid == "TXXX") throw Fail // closed subset
          if (!seen.add(fid)) throw Fail // duplicate frame
          val fsize =
            if (ver == 4) syncsafe(raw, p + 4)
            else ((raw(p + 4) & 0xff) << 24) | ((raw(p + 5) & 0xff) << 16) |
              ((raw(p + 6) & 0xff) << 8) | (raw(p + 7) & 0xff)
          if (fsize <= 0 || p + 10 + fsize > tagEnd) throw Fail
          if (raw(p + 8) != 0 || raw(p + 9) != 0) throw Fail // frame flags
          val payload = java.util.Arrays.copyOfRange(raw, p + 10,
            p + 10 + fsize)
          val text = decodeText(ver, payload)
          fid match {
            case "TIT2" => title = Some(text)
            case "TPE1" => artist = Some(text)
            case "TALB" => album = Some(text)
            case "TCON" => genre = Some(text)
            case "TYER" if ver == 3 =>
              if (!text.matches("\\d{4}")) throw Fail
              year = Some(text.toInt)
            case "TDRC" if ver == 4 =>
              if (!text.matches("\\d{4}")) throw Fail
              year = Some(text.toInt)
            case "TYER" | "TDRC" => throw Fail // wrong version's year frame
            case "TRCK" =>
              if (!text.matches("\\d{1,3}")) throw Fail
              track = Some(text.toInt)
            case _ => () // other text frames: decoded (validated), unprojected
          }
          nFrames += 1
          p += 10 + fsize
        }
      }
      if (nFrames == 0) throw Fail // an empty tag is not a tag
      val audio = java.util.Arrays.copyOfRange(raw, tagEnd, raw.length)
      val meta = Multimodal.parseMp3(audio).getOrElse(throw Fail)
      Some((Id3Tag(ver, title, artist, album, year, track, genre,
        nFrames, pad), meta))
    } catch { case Fail => None }
  }

  /** One row per tagged file: tag projection + audio-stream census. */
  def extractTagged(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("ver", IntegerType, true),
      StructField("title", StringType, true),
      StructField("artist", StringType, true),
      StructField("album", StringType, true),
      StructField("year", IntegerType, true),
      StructField("track", IntegerType, true),
      StructField("genre", StringType, true),
      StructField("n_tag_frames", IntegerType, true),
      StructField("pad_bytes", IntegerType, true),
      StructField("sample_rate", IntegerType, true),
      StructField("bitrate_kbps", IntegerType, true),
      StructField("n_audio_frames", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseTagged(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((t, (sr, br, nf))) =>
            Row(id, t.ver, t.title.orNull, t.artist.orNull, t.album.orNull,
              t.year.map(Int.box).orNull, t.track.map(Int.box).orNull,
              t.genre.orNull, t.nFrames, t.padBytes, sr, br, nf, true)
          case None =>
            Row(id, null, null, null, null, null, null, null, null, null,
              null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  private def ssEnc(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  private[graft] def encFrame(ver: Int, fid: String, enc: Int,
      text: String, trailingNul: Boolean): Array[Byte] = {
    val body: Array[Byte] = enc match {
      case 0 => text.getBytes("ISO-8859-1") ++
        (if (trailingNul) Array[Byte](0) else Array[Byte]())
      case 1 =>
        // BOM alternates on the text hash for both-endian coverage
        val le = text.hashCode % 2 == 0
        val bom: Array[Byte] =
          if (le) Array(0xff.toByte, 0xfe.toByte)
          else Array(0xfe.toByte, 0xff.toByte)
        bom ++ text.getBytes(if (le) "UTF-16LE" else "UTF-16BE") ++
          (if (trailingNul) Array[Byte](0, 0) else Array[Byte]())
      case 3 => text.getBytes("UTF-8") ++
        (if (trailingNul) Array[Byte](0) else Array[Byte]())
    }
    val payload = Array(enc.toByte) ++ body
    val size =
      if (ver == 4) ssEnc(payload.length)
      else Array((payload.length >> 24).toByte, (payload.length >> 16).toByte,
        (payload.length >> 8).toByte, payload.length.toByte)
    fid.getBytes("ISO-8859-1") ++ size ++ Array[Byte](0, 0) ++ payload
  }

  /** Fixture: even ids are v2.3 (plain-BE frame sizes, TYER,
    * encodings 0/1), odd ids v2.4 (syncsafe sizes, TDRC, encodings
    * 0/1/3); titles carry a Latin-1-and-UTF-16-and-UTF-8-reachable
    * `ü`; trailing NUL terminators on every third frame; i%64 bytes
    * of padding; audio is the [[Multimodal.encodeMp3]] CBR stream. */
  def taggedMp3Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ver = if (i % 2 == 0) 3 else 4
      def enc(k: Int): Int =
        if (ver == 3) (i + k) % 2
        else Seq(0, 1, 3)((i + k) % 3)
      val frames = Seq(
        ("TIT2", s"Song $i ü${(i * 3) % 10}"),
        ("TPE1", s"Artist ${i % 7}"),
        ("TALB", s"Al ${i % 5}"),
        (if (ver == 3) "TYER" else "TDRC", (1990 + i % 30).toString),
        ("TRCK", (1 + i % 12).toString),
        ("TCON", s"Genre${i % 4}"))
      val frameBytes = frames.zipWithIndex.map { case ((fid, tx), k) =>
        encFrame(ver, fid, enc(k), tx, trailingNul = (i + k) % 3 == 0)
      }
      val body = frameBytes.reduce(_ ++ _) ++ new Array[Byte](i % 64)
      val header = "ID3".getBytes("ISO-8859-1") ++
        Array(ver.toByte, 0.toByte, 0.toByte) ++ ssEnc(body.length)
      val audio = Multimodal.encodeMp3(1 + i % 14, i % 3, 10 + i % 30)
      Row(i.toLong, header ++ body ++ audio)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
