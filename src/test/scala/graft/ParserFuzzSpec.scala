package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Adversarial-bytes gate for every binary parser: on a 100 TB
  * corpus the decode operators run inside `mapPartitions` over
  * untrusted blobs, where an uncaught exception does not mark one
  * row invalid — it kills the task, and with it the job. Every
  * parser must therefore REJECT (return None), never THROW, on:
  *
  *  1. null input (a nullable binary column),
  *  2. arbitrary random bytes (seeded, reproducible),
  *  3. random bytes behind each format's real magic (forces the
  *     walk past the cheap guard into the structural parser),
  *  4. every single-byte corruption of a valid stream (stride-1
  *     sweep — the Multimodal specs sweep coarser strides for
  *     value assertions; this sweep only asserts no-throw),
  *  5. every truncation length of a valid stream.
  *
  * Purely JVM-side (no SparkSession) — the parsers are plain
  * functions, which is exactly why this gate can afford to be
  * exhaustive. */
class ParserFuzzSpec extends AnyFunSuite {

  private type Parser = Array[Byte] => Any

  private val parsers: Seq[(String, Parser)] = Seq(
    "parseWav" -> (b => Multimodal.parseWav(b)),
    "parseMp3" -> (b => Multimodal.parseMp3(b)),
    "parseMp1" -> (b => Multimodal.parseMp1(b)),
    "parseMp2" -> (b => Multimodal.parseMp2(b)),
    "parseMp3L3" -> (b => Multimodal.parseMp3L3(b)),
    "parseFlac" -> (b => Multimodal.parseFlac(b)),
    "parseFlacPcm" -> (b => Multimodal.parseFlacPcm(b)),
    "parseMp4" -> (b => Multimodal.parseMp4(b)),
    "parseGif" -> (b => Multimodal.parseGif(b)),
    "parseAvi" -> (b => Multimodal.parseAvi(b)),
    "parseAviRle8" -> (b => Multimodal.parseAviRle8(b)),
    "parseDHash" -> (b => Multimodal.parseDHash(b)),
    "parseExif" -> (b => graft.operators.ExifLake.parseExif(b)),
    "decompressShard" -> (b =>
      graft.operators.CompressedLake.decompress(b, 1 << 20)),
    "parseWarc" -> (b => graft.operators.Warc.parseArchive(b)),
    // the lake family: every task-local byte walk the corpus
    // ingestion layer runs, under the same no-throw contract
    "parseZip" -> (b => graft.operators.ZipLake.parseZip(b)),
    "parseTar" -> (b => graft.operators.TarLake.parseTar(b)),
    "parseEml" -> (b => graft.operators.MimeLake.parseEml(b)),
    "parseSubs" -> (b => graft.operators.SubLake.parseSubs(b)),
    "parseSitemap" -> (b => graft.operators.XmlLake.parseSitemap(b)),
    "parseFeed" -> (b => graft.operators.XmlLake.parseFeed(b)),
    "parseTfRecord" -> (b => graft.operators.TfRecordLake.parseTfRecord(b)),
    "parseExample" -> (b =>
      if (b == null) None else graft.operators.TfRecordLake.parseExample(b)),
    "parseEpub" -> (b => graft.operators.EpubLake.parseEpub(b)),
    "parseDump" -> (b => graft.operators.WikiLake.parseDump(b)),
    "parsePdf" -> (b => graft.operators.PdfLake.parsePdf(b)),
    "parseMd" -> (b => graft.operators.MarkdownLake.parseMd(b)),
    "parsePatch" -> (b => graft.operators.DiffLake.parsePatch(b)),
    "parseTex" -> (b => graft.operators.LatexLake.parseTex(b)),
    "parseTagged" -> (b => graft.operators.Id3Lake.parseTagged(b)),
    "parseDocx" -> (b => graft.operators.DocxLake.parseDocx(b)),
    "parseXlsx" -> (b => graft.operators.XlsxLake.parseXlsx(b)),
    "parseBio" -> (b => graft.operators.BioLake.parseBio(b)),
    "parsePo" -> (b => graft.operators.PoLake.parsePo(b)),
    "parseTmx" -> (b => graft.operators.TmxLake.parseTmx(b)),
    "parseIcs" -> (b => graft.operators.IcsLake.parseIcs(b)),
    "routeDoc" -> (b => graft.operators.DocCatalog.route(b)),
    "parseSqlDump" -> (b => graft.operators.SqlDumpLake.parseDump(b)),
    "parseGguf" -> (b => graft.operators.GgufLake.parseGguf(b)),
    "parseAvro" -> (b => graft.operators.AvroLake.parseAvro(b)),
    "parseSqlite" -> (b => graft.operators.SqliteLake.parseSqlite(b)),
    "parseCheckpoint" -> (b => graft.operators.TorchLake.parseCheckpoint(b)),
    "parseMsgpack" -> (b => graft.operators.MsgpackLake.parseMsgpack(b)),
    "parseMidi" -> (b => graft.operators.MidiLake.parseMidi(b)),
    "parseBmp" -> (b => graft.operators.BmpLake.parseBmp(b)),
    "parseRtf" -> (b => graft.operators.RtfLake.parseRtf(b)),
    "parseProto" -> (b => graft.operators.ProtoLake.parseProto(b)),
    "parseToml" -> (b => graft.operators.TomlLake.parseToml(b)),
    "parseDocker" -> (b => graft.operators.DockerLake.parseDocker(b)),
    "frontMatterToml" -> (b => graft.operators.TomlLake.frontMatterToml(b)),
    "parseOnnx" -> (b => graft.operators.OnnxLake.parseOnnx(b)),
    "parseVp8l" -> (b => graft.operators.WebpLake.parseVp8l(b)),
    "parseTiff" -> (b => graft.operators.TiffLake.parseTiff(b)),
    "parseTiffPages" -> (b => graft.operators.TiffLake.parseTiffPages(b)),
    "parseParquetMeta" -> (b =>
      graft.operators.ParquetLake.parseParquetMeta(b)),
    "parseOgg" -> (b => graft.operators.OggLake.parseOgg(b)),
    "parseOggTags" -> (b => graft.operators.OggLake.parseOggTags(b)),
    "parseEbml" -> (b => graft.operators.EbmlLake.parseEbml(b)),
    "parseArrow" -> (b => graft.operators.ArrowLake.parseArrow(b)),
    "routeMedia" -> (b => graft.operators.MediaCatalog.route(b)),
    "parseYaml" -> (b => graft.operators.YamlLake.parseYaml(b)),
    "parseYamlDocs" -> (b => graft.operators.YamlLake.parseYamlDocs(b)),
    "frontMatter" -> (b => graft.operators.YamlLake.frontMatter(b)),
    "webpCensus" -> (b => graft.operators.WebpLake.webpCensus(b)),
    "parseArrowStream" -> (b =>
      graft.operators.ArrowLake.parseArrowStream(b)))

  private val magics: Seq[(String, Array[Byte])] = Seq(
    "wav" -> ("RIFF\u0000\u0000\u0000\u0000WAVE").getBytes("ISO-8859-1"),
    "mp3" -> Array(0xff.toByte, 0xfa.toByte),
    "mp1" -> Array(0xff.toByte, 0xfe.toByte),
    "mp2" -> Array(0xff.toByte, 0xfc.toByte),
    "flac" -> "fLaC".getBytes("ASCII"),
    "mp4" -> Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),
    "gif" -> "GIF89a".getBytes("ASCII"),
    "avi" -> ("RIFF\u0000\u0000\u0000\u0000AVI ").getBytes("ISO-8859-1"),
    "warc" -> "WARC/1.0\r\n".getBytes("ISO-8859-1"),
    "warcgz" -> Array(0x1f.toByte, 0x8b.toByte, 8.toByte, 0.toByte),
    "zip" -> "PK\u0003\u0004".getBytes("ISO-8859-1"),
    "pdf" -> "%PDF-1.7\n".getBytes("ISO-8859-1"),
    "xml" -> "<?xml version=\"1.0\"?>".getBytes("ISO-8859-1"),
    "id3" -> "ID3\u0003\u0000\u0000".getBytes("ISO-8859-1"),
    "latex" -> "\\documentclass{article}".getBytes("ISO-8859-1"),
    "fasta" -> ">r1\n".getBytes("ISO-8859-1"),
    "fastq" -> "@r1\n".getBytes("ISO-8859-1"),
    "ics" -> "BEGIN:VCALENDAR\r\nVERSION:2.0\r\n".getBytes("ISO-8859-1"),
    "mdfm" -> "---\ntitle: t\n---\n".getBytes("ISO-8859-1"),
    "po" -> "msgid \"\"\nmsgstr \"\"\n".getBytes("ISO-8859-1"),
    "gitdiff" -> "diff --git a/x b/x\n".getBytes("ISO-8859-1"),
    "zstd" -> Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte),
    "lz4" -> Array(0x04.toByte, 0x22.toByte, 0x4d.toByte, 0x18.toByte),
    "bzip2" -> "BZh9".getBytes("ISO-8859-1"),
    "xz" -> Array(0xfd.toByte, '7'.toByte, 'z'.toByte, 'X'.toByte,
      'Z'.toByte, 0.toByte),
    // JPEG SOI (reaches parseExif's marker walk — the r13 ADVICE gap)
    // and both bare-TIFF byte-order marks (reach the IFD walker)
    "jpeg" -> Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte),
    "tiff-ii" -> Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0),
    "tiff-mm" -> Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8),
    "gguf" -> ("GGUF\u0003\u0000\u0000\u0000").getBytes("ISO-8859-1"),
    "avro" -> ("Obj".getBytes("ISO-8859-1") ++ Array[Byte](1)),
    "sqlite" -> ("SQLite format 3".getBytes("ISO-8859-1") ++
      Array[Byte](0)),
    "msgpack" -> Array(0x85.toByte, 0xa2.toByte, 'i'.toByte, 'd'.toByte),
    "midi" -> ("MThd".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 6, 0, 1)),
    "bmp" -> "BM".getBytes("ISO-8859-1"),
    "rtf" -> "{\\rtf1\\ansi ".getBytes("ISO-8859-1"),
    "toml" -> "title = \"x\"\n[srv]\n".getBytes("ISO-8859-1"),
    "par1" -> "PAR1".getBytes("ISO-8859-1"),
    // version byte 0 appended so the fuzz reaches past the magic
    "oggs" -> ("OggS".getBytes("ISO-8859-1") ++ Array[Byte](0)),
    "ebml" -> Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte),
    "arrow" -> ("ARROW1".getBytes("ISO-8859-1") ++ Array[Byte](0, 0)),
    // a YAML mapping prefix so the fuzz reaches the indent walker
    "yaml" -> "title: x\nmeta:\n  a: 1\n".getBytes("ISO-8859-1"),
    // a Dockerfile prefix so the fuzz reaches the logical-line walk
    // (and the exec-form / --from grammars behind it)
    "dockerfile" -> "FROM a AS s\nCMD [\"".getBytes("ISO-8859-1"),
    // an anchor/merge prefix so the fuzz reaches the alias machinery
    "yaml-anchor" -> "d: &d\n  a: 1\nu:\n  <<: *".getBytes("ISO-8859-1"),
    // the stream-form continuation marker reaches the .arrows walk
    "arrows" -> Array[Byte](-1, -1, -1, -1),
    // lossy-WebP chunk headers reach the census's VP8/VP8X walks
    "webp-vp8" -> ("RIFF".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0) ++ "WEBPVP8 ".getBytes("ISO-8859-1")),
    "webp-vp8x" -> ("RIFF".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0) ++ "WEBPVP8X".getBytes("ISO-8859-1")))

  private def noThrow(label: String, p: Parser, b: Array[Byte]): Unit =
    try { p(b); () } catch {
      case e: Throwable =>
        fail(s"$label threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
          s"on ${if (b == null) "null" else s"${b.length} bytes"}")
    }

  test("null input rejects, never throws") {
    parsers.foreach { case (name, p) => noThrow(s"$name(null)", p, null) }
  }

  test("random bytes reject, never throw") {
    val rnd = new scala.util.Random(20741)
    (0 until 500).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(b)
      parsers.foreach { case (name, p) => noThrow(s"$name rnd#$i", p, b) }
    }
  }

  test("random bytes behind each real magic reject, never throw") {
    val rnd = new scala.util.Random(20742)
    (0 until 500).foreach { i =>
      magics.foreach { case (m, magic) =>
        val tail = new Array[Byte](rnd.nextInt(1024))
        rnd.nextBytes(tail)
        val b = magic ++ tail
        parsers.foreach { case (name, p) =>
          noThrow(s"$name magic=$m rnd#$i", p, b) }
      }
    }
  }

  private def validStreams: Seq[(String, Array[Byte])] = Seq(
    "wav" -> Multimodal.encodeWav(32000, 2,
      Array.tabulate(600)(i => (i * 7 - 2000).toShort)),
    "mp3" -> Multimodal.encodeMp3(9, 0, 5),
    "mp1" -> Multimodal.encodeMp1(14, 0, 0, 2, protect = true,
      pad = _ % 2, alloc = (_, sb, _) => if (sb % 3 == 0) 2 + sb % 14 else 0,
      scf = (f, sb, c) => (sb * 3 + c * 7 + f) % 63,
      code = (f, g, sb, c) => f + g * 3 + sb * 5 + c),
    "mp2" -> Multimodal.encodeMp2(14, 0, 0, 2, protect = true,
      pad = _ % 2,
      allocIdx = (_, sb, _) => if (sb % 4 == 0) 1 + sb % 3 else 0,
      scfsi = (_, sb, c) => (sb + c) % 4,
      scf = (f, p, sb, c) => (sb * 3 + c * 7 + f + p) % 63,
      code = (f, g, k, sb, c) => 0),
    "mp3l3" -> Multimodal.encodeMp3L3(8, 0, mono = true, nFrames = 2,
      protect = true, pad = _ % 2, mdbTarget = f => if (f == 0) 0 else 9,
      scfsiN = (f, _) => (f * 5) % 16,
      gr = (f, g, _) => Multimodal.Mp3GrSpec(
        globalGain = 210 + 4 * ((f + g) % 4), scalefacCompress = 9,
        preflag = 0, scalefacScale = 1, count1Table = g % 2,
        tableSelect = (3, 5, 1), region0Count = 5, region1Count = 7,
        bigValues = 38, // 44.1 kHz: band-12 start 74 → pairs through 75
        sf = b => (b + f + g) % 4,
        value = p =>
          if (p < 24) (if ((p + f) % 3 == 0) -(p % 3) else p % 3)
          else if (p < 36) (p + g) % 4 * (if (p % 2 == 0) 1 else -1)
          else if (p < 74) 0
          else if (p <= 75) 2
          else (p + f) % 2,
        nCount1 = 3)),
    "flac-const" -> Multimodal.encodeFlac(9, 2, 16, 3, 7L),
    "flac-pred" -> Multimodal.encodeFlacPred(8, 2, 5, 3L),
    "flac-lpc" -> Multimodal.encodeFlacLpc(10, 1, 5, 9L),
    "flac-stereo" -> Multimodal.encodeFlacStereo(9, 5, 4L),
    "mp4" -> Multimodal.encodeMp4(44100, 2, 88200L),
    "gif" -> Multimodal.encodeGif(8, 6,
      Seq(Array.fill(48)(17.toByte), Array.fill(48)(99.toByte)), Seq(7, 9)),
    "avi" -> Multimodal.encodeAvi(12, 8, Seq(10, 200, 77), 15),
    "zstd-shard" -> graft.operators.CompressedLake.compress("zstd",
      ("s1 s2 s3 " * 30).getBytes("UTF-8")),
    "xz-shard" -> graft.operators.CompressedLake.compress("xz",
      ("s4 s5 " * 20).getBytes("UTF-8")),
    "exif-jpeg" -> graft.operators.ExifLake.buildExifJpeg(
      Multimodal.encodeJpegGray(8, 6, 40), le = true,
      "Mk", "Md", 3, "2024:01:02 03:04:05", 1, 250, 640, 480, 50, 10,
      "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100)),
    "exif-tiff" -> graft.operators.ExifLake.buildExifTiff(le = false,
      "Mk", "Md", 3, "2024:01:02 03:04:05", 1, 250, 640, 480, 50, 10,
      "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100)),
    "dhash-png" -> Multimodal.encodeDHashPng(
      (x, y) => (x * 5 + y * 3) % 3 != 0, 2),
    "avi-rle8" -> {
      import Multimodal.Rle8Op._
      Multimodal.encodeAviRle8(8, 3, i => (i, (2 * i) % 256, (3 * i) % 256),
        Seq(
          Seq(Run(8, 1), Eol, Run(3, 2), Abs(Seq(4, 5, 6)), Run(2, 2),
            Eol, Run(8, 3)),
          Seq(Delta(0, 1), Run(8, 9)),
          Seq(Delta(2, 2), Run(6, 7))), 12)
    },
    "warc" -> {
      import graft.operators.Warc
      Warc.gzipMember(Warc.recordBytes("conversion",
        "https://example.com/0/0", "2024-01-01T00:00:00Z",
        "<urn:uuid:0-0>", "w1 w2 w3"), fname = Some("r.warc")) ++
        Warc.recordBytes("metadata", "", "2024-01-01T00:00:01Z",
          "<urn:uuid:0-1>", "w4 w5")
    },
    // three entries hit all three ZIP64 sentinel shapes (sizes / lho /
    // all+disk)
    "zip64" -> graft.operators.ZipLake.writeZip64(Seq(
      ("a.txt", "q1 q2 9".getBytes("UTF-8"), false),
      ("b.txt", "q3 4".getBytes("UTF-8"), true),
      ("c.txt", "q5".getBytes("UTF-8"), false)),
      sentinelEocd = true, comment = "c"),
    "onnx" -> graft.operators.OnnxLake.encModel(8L, Seq(("", 17L)), "g",
      Seq(graft.operators.OnnxLake.encTensor("w", Seq(2L, 2L),
        Seq(1f, -2f, 3f, 4f), packedDims = true))),
    "webp" -> graft.operators.Multimodal.encodeDHashWebp(
      (x, y) => (x * 5 + y * 3) % 3 != 0, 2),
    "arrow-dict-lz4" -> {
      import graft.operators.ArrowLake
      ArrowLake.encodeArrowExt(
        Seq(ArrowLake.FixField("d", nullable = false, "dict", 16,
          Some((1L, 16))),
          ArrowLake.FixField("x", nullable = false, "int", 64)),
        Seq(Map("d" -> Array(0L, 1L, 1L), "x" -> Array(7L, 8L, 9L))),
        Seq(3), Map(1L -> Seq("aa", "b")), comp = 0)
    },
    "tiff-g4" -> graft.operators.TiffLake.encodeTiff(
      Array.tabulate(18 * 17)(i =>
        if ((i * 7) % 11 < 4) 0xff000000 else 0xffffffff), 18, 17,
      graft.operators.TiffLake.TiffOpts(photometric = 0,
        bitsPerSample = 1, compression = 4, tileWidth = 16,
        tileLength = 16, eofb = true)),
    "tiff-mh1d" -> graft.operators.TiffLake.encodeTiff(
      Array.tabulate(18 * 9)(i =>
        if ((i * 5) % 9 < 3) 0xff000000 else 0xffffffff), 18, 9,
      graft.operators.TiffLake.TiffOpts(photometric = 0,
        bitsPerSample = 1, compression = 2, rowsPerStrip = 4)))

  test("every single-byte corruption of a valid stream never throws") {
    validStreams.foreach { case (sname, v) =>
      var pos = 0
      while (pos < v.length) {
        val c = v.clone(); c(pos) = (c(pos) ^ 0x55).toByte
        parsers.foreach { case (name, p) =>
          noThrow(s"$name($sname flip@$pos)", p, c) }
        pos += 1
      }
    }
  }

  test("every truncation of a valid stream never throws") {
    validStreams.foreach { case (sname, v) =>
      var len = 0
      while (len < v.length) {
        val c = java.util.Arrays.copyOf(v, len)
        parsers.foreach { case (name, p) =>
          noThrow(s"$name($sname cut@$len)", p, c) }
        len += 1
      }
    }
  }
}
