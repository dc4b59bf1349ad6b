package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ExtQueries4.{DHashN, MdN}

/** Lake-census queries (q203+): the model/data-interchange, config
  * and media container walks — SafeTensors/NPY/GGUF/Avro/SQLite/
  * torch/MessagePack/MIDI/protobuf/ONNX/Arrow catalogs, BMP/WebP/
  * TIFF pixel decodes, parquet footer+page censuses, Ogg/EBML
  * containers, TOML/YAML/CSV config lakes and the mixed-media
  * catalog. Split out of [[ExtQueries4]] in round 17 with identical
  * registration shape. Same contract as [[ExtQueries]]: every query
  * ends in ORDER BY over a unique key prefix, column names match the
  * oracle SQL exactly, and every value that decides or appears in a
  * row is integer-exact cross-engine (no doubles in any output).
  */
object ExtQueries5 {

  // ---------------------------------------------------------------
  // q203 — SAFETENSORS shard catalog: the Hugging Face weight/dataset
  // exchange format (8-byte LE header length + JSON tensor map +
  // contiguous data buffer the offsets must tile exactly). PURE
  // CATALYST extraction (TensorLake) — from_json over map/struct
  // schemas, dynamic substr on the binary, window functions for the
  // tiling validation, md5(hex(bytes)) as the content pin — no
  // custom parser, no UDF (the ipynb architecture, not the byte-walk
  // one). The oracle replays tensor names/dtypes/shapes/offsets AND
  // the md5 of every tensor's bytes from the closed-form byte law —
  // any slip in the header-length decode, JSON projection, offset
  // tiling or buffer slicing changes a digest and fails the hash
  // gate. ANSI-overflow strictness (crafted shapes/offsets) is
  // spec-gated in TensorLakeSpec.
  private val SafeTN = 40

  def q203(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TensorLake.safetensorsFixture(s, SafeTN)
    graft.operators.TensorLake.extractSafetensors(fx, "id", "media")
      .select(col("id"), col("name"), col("dtype"), col("rank"),
        col("n_elems"), col("byte_len"), col("begin"), col("end_off"),
        col("digest"), col("meta"), col("valid"))
      .orderBy("id", "name")
  }

  val q203Sql: String =
    s"""WITH base AS (
         SELECT id, 3 + id % 4 AS t FROM range(0, $SafeTN) r(id)),
       ks AS (
         SELECT id, unnest([k for k in range(0, t)]) AS k FROM base),
       spec AS (
         SELECT id, k,
           ['F32','F16','BF16','I64','U8'][1 + (id + k) % 5] AS dtype,
           [4,2,2,8,1][1 + (id + k) % 5] AS sz,
           1 + (id + k) % 3 AS rank,
           [1 + (id + 2 * k + 3 * i) % 4
            for i in range(0, 1 + (id + k) % 3)] AS dims
         FROM ks),
       sized AS (
         SELECT *, CAST(list_product(dims) AS BIGINT) AS n_elems,
           CAST(list_product(dims) * sz AS BIGINT) AS byte_len
         FROM spec),
       offs AS (
         SELECT *,
           CAST(coalesce(SUM(byte_len) OVER (PARTITION BY id ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS begin
         FROM sized)
       SELECT id, 't' || k AS name, dtype,
         CAST(rank AS INT) AS rank, n_elems, byte_len, begin,
         begin + byte_len AS end_off,
         md5(array_to_string(
           [upper(lpad(format('{:x}', (id*7 + k*11 + j*13) % 256), 2, '0'))
            for j in range(0, byte_len)], '')) AS digest,
         CASE WHEN id % 3 = 0 THEN 'src=fixture;v=' || id ELSE '' END AS meta,
         true AS valid
       FROM offs
       ORDER BY id, name"""

  // ---------------------------------------------------------------
  // q204 — NPY array catalog: the NumPy v1.0 format (magic + version,
  // u16-LE header length, Python-dict-literal header, raw array
  // bytes). Pure Catalyst like q203: the dict literal is parsed with
  // regexp_extract (descr / fortran_order / shape incl. the rank-0
  // scalar `()`), the exact size law 10 + hlen + n_elems·width ==
  // blob length gates validity, md5(hex(bytes)) pins content.
  private val NpyN = 40

  def q204(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TensorLake.npyFixture(s, NpyN)
    graft.operators.TensorLake.extractNpy(fx, "id", "media")
      .select(col("id"), col("descr"), col("fortran_order"), col("rank"),
        col("n_elems"), col("byte_len"), col("digest"), col("valid"))
      .orderBy("id")
  }

  val q204Sql: String =
    s"""WITH base AS (
         SELECT id,
           ['<f4','<i8','|u1','<f8','<i2'][1 + id % 5] AS descr,
           [4,8,1,8,2][1 + id % 5] AS width,
           id % 7 = 0 AS fortran_order,
           id % 4 AS rank,
           [1 + (id + 3 * i) % 5 for i in range(0, id % 4)] AS dims
         FROM range(0, $NpyN) r(id)),
       sized AS (
         SELECT *,
           CAST(CASE WHEN rank = 0 THEN 1
                ELSE list_product(dims) END AS BIGINT) AS n_elems
         FROM base)
       SELECT id, descr, fortran_order, CAST(rank AS INT) AS rank,
         n_elems, CAST(n_elems * width AS BIGINT) AS byte_len,
         md5(array_to_string(
           [upper(lpad(format('{:x}', (id*5 + j*17) % 256), 2, '0'))
            for j in range(0, n_elems * width)], '')) AS digest,
         true AS valid
       FROM sized
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q205 — GGUF model-container catalog (ggml/llama.cpp exchange
  // format, version 3): the third tensor-container lake next to
  // SafeTensors (q203) and NPY (q204). 40 files with per-file
  // alignment 8·2^(i%4), 6 typed metadata kvs (u32/string/bool/f32/
  // string-array incl. general.alignment + general.name), 2+i%3
  // tensors alternating F32/F16 with 1-2 dims; value_sum decodes
  // EVERY sample (halves exactly), offsets are the aligned
  // contiguous law the parser enforces. Subset strictness (type
  // tags, alignment power-of-two, offset tiling, file-end law,
  // Inf/NaN) is spec-gated in GgufLakeSpec.
  private val GgufN = 40

  def q205(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.GgufLake.ggufFixture(s, GgufN)
    graft.operators.GgufLake.extractGguf(fx, "id", "media")
      .select(col("id"), col("tidx"), col("name"), col("dtype"),
        col("n_dims"), col("numel"), col("off"), col("value_sum"),
        col("n_kv"), col("align"), col("model_name"), col("valid"))
      .orderBy("id", "tidx")
  }

  val q205Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nt,
           CAST(8 * (1 << CAST(r % 4 AS INT)) AS INT) AS al
         FROM range(0, $GgufN) t(r)),
       tens AS (
         SELECT id, al, CAST(unnest(range(0, nt)) AS INT) AS tidx
         FROM base),
       d AS (
         SELECT id, al, tidx,
           CAST(1 + (id + tidx) % 2 AS INT) AS n_dims,
           3 + (id + tidx) % 4 AS d0,
           2 + tidx % 3 AS d1,
           CASE WHEN (id + tidx) % 2 = 0 THEN 'F32' ELSE 'F16' END AS dtype
         FROM tens),
       e AS (
         SELECT *,
           CAST(CASE WHEN n_dims = 1 THEN d0 ELSE d0 * d1 END AS BIGINT)
             AS numel,
           CASE WHEN dtype = 'F32' THEN 4 ELSE 2 END AS esz
         FROM d),
       f AS (
         SELECT *,
           CAST(COALESCE(SUM(((numel * esz + al - 1) // al) * al) OVER (
             PARTITION BY id ORDER BY tidx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS off
         FROM e)
       SELECT id, tidx, 'blk.' || tidx || '.w' AS name, dtype, n_dims,
         numel, off,
         CAST(list_sum([(id * 37 + tidx * 11 + j * 3) % 100 - 50
           for j in range(0, numel)]) AS DOUBLE) AS value_sum,
         CAST(6 AS INT) AS n_kv, al AS align,
         'model-' || id % 7 AS model_name, true AS valid
       FROM f ORDER BY id, tidx"""

  // ---------------------------------------------------------------
  // q206 — Avro object-container catalog (Apache Avro 1.11 "Object
  // Container Files"): 40 containers, codec alternating null/raw-
  // deflate on file parity, 2 data blocks of 2+(i+b)%3 records each,
  // a 5-primitive record schema (long/string/int/double/boolean)
  // parsed from avro.schema by a strict JSON walk. One row per
  // (record, field) — zigzag varints, UTF-8 strings, LE doubles and
  // booleans are all individually hash-gated. Header-map/sync/block-
  // tiling strictness is spec-gated in AvroLakeSpec.
  private val AvroN = 40

  def q206(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.AvroLake.avroFixture(s, AvroN)
    graft.operators.AvroLake.extractAvro(fx, "id", "media")
      .select(col("id"), col("blk"), col("rec"), col("fld"),
        col("fname"), col("ftype"), col("lval"), col("sval"),
        col("dval"), col("codec"), col("rec_name"), col("valid"))
      .orderBy("id", "blk", "rec", "fld")
  }

  val q206Sql: String =
    s"""WITH base AS (SELECT r AS id FROM range(0, $AvroN) t(r)),
       blocks AS (
         SELECT id, CAST(unnest([0, 1]) AS INT) AS blk FROM base),
       recs AS (
         SELECT id, blk,
           CAST(unnest(range(0, 2 + (id + blk) % 3)) AS INT) AS rec
         FROM blocks),
       g AS (
         SELECT id, blk, rec,
           CASE WHEN blk = 0 THEN rec ELSE 2 + id % 3 + rec END AS g
         FROM recs),
       cells AS (
         SELECT id, blk, rec, g,
           CAST(unnest([0, 1, 2, 3, 4]) AS INT) AS fld
         FROM g)
       SELECT id, blk, rec, fld,
         ['k', 'name', 'n', 'price', 'flag'][fld + 1] AS fname,
         ['long', 'string', 'int', 'double', 'boolean'][fld + 1] AS ftype,
         CAST(CASE WHEN fld = 0 THEN id * 1000 + g * 7 - 500
              WHEN fld = 2 THEN (id * 3 + g) % 100 - 50
              WHEN fld = 4 THEN CASE WHEN (id + g) % 2 = 0 THEN 1 ELSE 0 END
              END AS BIGINT) AS lval,
         CASE WHEN fld = 1 THEN 'rec-' || (id + g) % 9 END AS sval,
         CAST(CASE WHEN fld = 3 THEN ((id * 13 + g * 7) % 1000) / 4.0 END
           AS DOUBLE) AS dval,
         CASE WHEN id % 2 = 0 THEN 'null' ELSE 'deflate' END AS codec,
         'Doc' AS rec_name, true AS valid
       FROM cells ORDER BY id, blk, rec, fld"""

  // ---------------------------------------------------------------
  // q207 — SQLite database-file catalog (the sqlite.org file format
  // — app data / browser profiles / mobile dumps in a scraped
  // corpus): 40 databases with page size 512·2^(i%4), a real 4-page
  // layout (sqlite_master leaf on page 1 → `docs` interior root →
  // two leaves), rowids split across the interior boundary, and a
  // serial-size-sweeping int column (const-0/1, i8..i64 classes all
  // exercised by the ·10^k law). One row per (table row, column).
  // Header/B-tree/record strictness is spec-gated in SqliteLakeSpec.
  private val SqliteN = 40

  def q207(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.SqliteLake.sqliteFixture(s, SqliteN)
    graft.operators.SqliteLake.extractSqlite(fx, "id", "media")
      .select(col("id"), col("tbl"), col("rid"), col("col"),
        col("kind"), col("lval"), col("sval"), col("dval"),
        col("page_size"), col("n_pages"), col("valid"))
      .orderBy("id", "rid", "col")
  }

  val q207Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nra, 2 + (r + 1) % 3 AS nrb,
           CAST(512 * (1 << CAST(r % 4 AS INT)) AS INT) AS ps
         FROM range(0, $SqliteN) t(r)),
       recs AS (
         SELECT id, ps,
           CAST(unnest(range(1, nra + nrb + 1)) AS BIGINT) AS rid
         FROM base),
       cells AS (
         SELECT id, ps, rid, rid - 1 AS g,
           CAST(unnest([0, 1, 2, 3]) AS INT) AS col
         FROM recs)
       SELECT id, 'docs' AS tbl, rid, col,
         CASE col WHEN 0 THEN 'int' WHEN 1 THEN 'text' WHEN 2 THEN 'real'
           ELSE CASE WHEN (id + g) % 3 = 0 THEN 'null' ELSE 'int' END
           END AS kind,
         CAST(CASE WHEN col = 0 THEN
                ((id * 37 + g * 11) % 90 - 45) *
                [1, 100, 10000, 1000000, 100000000, 1000000000000,
                 10000000000000000][CAST(g % 7 AS INT) + 1]
              WHEN col = 3 AND (id + g) % 3 <> 0 THEN g % 2
              END AS BIGINT) AS lval,
         CASE WHEN col = 1 THEN 'doc-' || (id + g) % 9 END AS sval,
         CAST(CASE WHEN col = 2 THEN ((id * 13 + g * 7) % 1000) / 4.0 END
           AS DOUBLE) AS dval,
         ps AS page_size, CAST(4 AS INT) AS n_pages, true AS valid
       FROM cells ORDER BY id, rid, col"""

  // ---------------------------------------------------------------
  // q208 — PyTorch checkpoint catalog (the torch.save zipfile layout
  // — scraped model-hub artifacts): 40 checkpoints, 2+i%3 tensors of
  // 1-3 dims, every third tensor a strided VIEW at offset 2 into a
  // larger storage; data.pkl is interpreted by a restricted pickle-
  // protocol-2 VM over a closed global whitelist — nothing executes,
  // unknown opcodes/globals reject. value_sum decodes each tensor's
  // own f32 window, so content is hash-gated alongside the catalog.
  // VM/container strictness is spec-gated in TorchLakeSpec.
  private val TorchN = 40

  def q208(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TorchLake.torchFixture(s, TorchN)
    graft.operators.TorchLake.extractCheckpoint(fx, "id", "media")
      .select(col("id"), col("tidx"), col("tname"), col("skey"),
        col("numel"), col("n_dims"), col("nelem"), col("off"),
        col("rg"), col("value_sum"), col("n_storages"), col("valid"))
      .orderBy("id", "tidx")
  }

  val q208Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nt FROM range(0, $TorchN) t(r)),
       tens AS (
         SELECT id, nt, CAST(unnest(range(0, nt)) AS INT) AS tidx
         FROM base),
       d AS (
         SELECT id, nt, tidx,
           CAST(1 + (id + tidx) % 3 AS INT) AS nd,
           2 + (id + tidx) % 3 AS d0, 1 + tidx % 3 AS d1,
           CASE WHEN (id + tidx) % 3 = 0 THEN 2 ELSE 0 END AS off,
           CASE WHEN (id + tidx) % 3 = 0 THEN 4 ELSE 0 END AS pad
         FROM tens),
       e AS (
         SELECT *,
           CAST(d0 * (CASE WHEN nd >= 2 THEN d1 ELSE 1 END)
             * (CASE WHEN nd >= 3 THEN 2 ELSE 1 END) AS BIGINT) AS nelem
         FROM d)
       SELECT id, tidx, 'layer.' || tidx || '.weight' AS tname,
         CAST(tidx AS VARCHAR) AS skey,
         CAST(nelem + pad AS BIGINT) AS numel, nd AS n_dims, nelem,
         CAST(off AS BIGINT) AS off,
         (id + tidx) % 2 = 0 AS rg,
         CAST(list_sum([(id * 31 + tidx * 17 + j * 7) % 200 - 100
           for j in range(off, off + nelem)]) AS DOUBLE) AS value_sum,
         CAST(nt AS INT) AS n_storages, true AS valid
       FROM e ORDER BY id, tidx"""

  // ---------------------------------------------------------------
  // q209 — MessagePack record shards (msgpack.org spec — the binary
  // JSONL of log pipelines): 40 shards of 3+i%4 concatenated map
  // records with a size-sweeping signed int (every int family down
  // to fixint), strings, a big-endian float64, bools, flat string
  // arrays and an optional nil key (map size varies 5/6). CANONICAL
  // minimal encoding is enforced — a widened int family rejects.
  // Strictness is spec-gated in MsgpackLakeSpec.
  private val MsgpackN = 40

  def q209(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MsgpackLake.msgpackFixture(s, MsgpackN)
    graft.operators.MsgpackLake.extractMsgpack(fx, "id", "media")
      .select(col("id"), col("rec"), col("kidx"), col("key"),
        col("kind"), col("lval"), col("sval"), col("dval"),
        col("n_keys"), col("valid"))
      .orderBy("id", "rec", "kidx")
  }

  val q209Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 3 + x % 4 AS nr FROM range(0, $MsgpackN) t(x)),
       recs AS (
         SELECT id, CAST(unnest(range(0, nr)) AS INT) AS rec FROM base),
       r2 AS (SELECT id, rec, (id + rec) % 3 = 0 AS has_nil FROM recs),
       ks AS (
         SELECT id, rec, has_nil,
           CAST(unnest(CASE WHEN has_nil THEN [0, 1, 2, 3, 4, 5]
             ELSE [0, 1, 2, 3, 4] END) AS INT) AS kidx
         FROM r2)
       SELECT id, rec, kidx,
         ['id', 'text', 'score', 'ok', 'tags', 'n'][kidx + 1] AS key,
         CASE kidx WHEN 0 THEN 'int' WHEN 1 THEN 'str' WHEN 2 THEN 'float'
           WHEN 3 THEN 'bool' WHEN 4 THEN 'arr' ELSE 'nil' END AS kind,
         CAST(CASE WHEN kidx = 0 THEN
             (id * 100 + rec + 1)
             * [1, 1000, 100000000, 10000000000000]
               [CAST(rec % 4 AS INT) + 1]
             * (CASE WHEN (id + rec) % 5 = 0 THEN -1 ELSE 1 END)
           WHEN kidx = 3 THEN CASE WHEN (id + rec) % 2 = 0 THEN 1 ELSE 0 END
           WHEN kidx = 4 THEN rec % 3 END AS BIGINT) AS lval,
         CASE WHEN kidx = 1 THEN 'doc ' || (id + rec) % 7 || ' body'
           -- DuckDB's array_to_string([]) is NULL; the engine's
           -- mkString is '' — pin the empty-array case explicitly
           WHEN kidx = 4 THEN COALESCE(array_to_string(
             ['t' || (id + j) % 5 for j in range(0, rec % 3)], '|'), '')
           END AS sval,
         CAST(CASE WHEN kidx = 2 THEN ((id * 13 + rec * 7) % 1000) / 4.0
           END AS DOUBLE) AS dval,
         CAST(CASE WHEN has_nil THEN 6 ELSE 5 END AS INT) AS n_keys,
         true AS valid
       FROM ks ORDER BY id, rec, kidx"""

  // ---------------------------------------------------------------
  // q210 — Standard MIDI File catalog (MMA SMF spec — the symbolic-
  // music side of an audio corpus): 40 format-1 files of 1+i%3
  // tracks; NoteOffs ride as NoteOn-velocity-0 so every event after
  // a track's first exercises the RUNNING-STATUS state machine; name
  // and tempo metas, VLQ deltas, per-track event/tick/note/velocity
  // censuses. Chunk/VLQ/meta strictness is spec-gated in
  // MidiLakeSpec.
  private val MidiN = 40

  def q210(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MidiLake.midiFixture(s, MidiN)
    graft.operators.MidiLake.extractMidi(fx, "id", "media")
      .select(col("id"), col("trk"), col("name"), col("fmt"),
        col("division"), col("n_events"), col("total_ticks"),
        col("n_notes"), col("note_sum"), col("vel_sum"),
        col("tempo_us"), col("valid"))
      .orderBy("id", "trk")
  }

  val q210Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 1 + x % 3 AS nt,
           CAST(96 * (1 + x % 4) AS INT) AS division
         FROM range(0, $MidiN) t(x)),
       trks AS (
         SELECT id, division,
           CAST(unnest(range(0, nt)) AS INT) AS trk
         FROM base),
       d AS (SELECT *, 3 + (id + trk) % 4 AS ne FROM trks)
       SELECT id, trk, 'trk-' || trk AS name, CAST(1 AS INT) AS fmt,
         division,
         CAST(1 + (CASE WHEN trk = 0 THEN 1 ELSE 0 END) + 2 * ne + 1
           AS INT) AS n_events,
         CAST(list_sum([3 + j % 8 + j % 5 for j in range(0, ne)])
           AS BIGINT) AS total_ticks,
         CAST(ne AS INT) AS n_notes,
         CAST(list_sum([60 + (id + j) % 12 for j in range(0, ne)])
           AS BIGINT) AS note_sum,
         CAST(list_sum([64 + j % 32 for j in range(0, ne)])
           AS BIGINT) AS vel_sum,
         CAST(CASE WHEN trk = 0 THEN 500000 + id * 1000 END AS INT)
           AS tempo_us,
         true AS valid
       FROM d ORDER BY id, trk"""

  // ---------------------------------------------------------------
  // q211 — BMP image decode (BITMAPINFOHEADER — scanned documents /
  // legacy dumps): 40 bitmaps alternating 8-bpp palette and 24-bpp
  // BGR, every third file TOP-DOWN (negative height); row0_sum pins
  // the orientation decode (a flipped reader keeps pixel_sum but
  // breaks the top row). Strictness is spec-gated in BmpLakeSpec.
  private val BmpN = 40

  def q211(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.BmpLake.bmpFixture(s, BmpN)
    graft.operators.BmpLake.extractBmp(fx, "id", "media")
      .select(col("id"), col("width"), col("height"), col("topdown"),
        col("bpp"), col("nc"), col("pixel_sum"), col("row0_sum"),
        col("valid"))
      .orderBy("id")
  }

  val q211Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 3 + x % 5 AS w, 2 + x % 4 AS h,
           CASE WHEN x % 2 = 0 THEN 8 ELSE 24 END AS bpp,
           x % 3 = 0 AS topdown,
           CASE WHEN x % 2 = 0 THEN 64 + 64 * (x % 3) ELSE 0 END AS nc
         FROM range(0, $BmpN) t(x))
       SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         topdown, CAST(bpp AS INT) AS bpp, CAST(nc AS INT) AS nc,
         CAST(CASE WHEN bpp = 8 THEN
             list_sum([list_sum([(((xx + yy * w + id) % nc) * 3) % 256
               + (((xx + yy * w + id) % nc) * 5) % 256
               + (((xx + yy * w + id) % nc) * 7) % 256
               for xx in range(0, w)]) for yy in range(0, h)])
           ELSE
             list_sum([list_sum([(id + 3 * xx + 7 * yy) % 256
               + (2 * id + 5 * xx + 11 * yy) % 256
               + (3 * id + 7 * xx + 13 * yy) % 256
               for xx in range(0, w)]) for yy in range(0, h)])
           END AS BIGINT) AS pixel_sum,
         CAST(CASE WHEN bpp = 8 THEN
             list_sum([(((xx + id) % nc) * 3) % 256
               + (((xx + id) % nc) * 5) % 256
               + (((xx + id) % nc) * 7) % 256 for xx in range(0, w)])
           ELSE
             list_sum([(id + 3 * xx) % 256 + (2 * id + 5 * xx) % 256
               + (3 * id + 7 * xx) % 256 for xx in range(0, w)])
           END AS BIGINT) AS row0_sum,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q212 — FORMAT-INVARIANT image near-dup: q190's corpus routed
  // across THREE containers — PNG / 24-bpp BMP / VP8L WebP (the
  // spec-written decoder; ImageIO has no WebP support) — by
  // (id + id/3) % 3, a routing chosen so the law's Hamming-0 pairs
  // ALWAYS land in two different containers (see dhashMixedFixture).
  // The bit laws are q190's exactly, so the correct pair set is
  // IDENTICAL to q190's oracle. A decoder whose BMP path flips rows,
  // swaps channels, or whose VP8L path mis-inverts a transform
  // changes fingerprints and fails the hash gate. Same decode-once +
  // shared-banded-blocking shape as q190.
  def q212(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.dhashMixedFixture(s, DHashN)
    val fps = graft.operators.Multimodal.imageDHash(fx, "id", "media")
      .where(col("valid"))
      .select(col("id"), col("dhash").as("simhash"))
      .localCheckpoint()
    graft.operators.Dedup.simhashNearDup(fps, maxDist = 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .orderBy("a", "b")
  }

  val q212Sql: String = ExtQueries4.q190Sql // same laws ⇒ same pair set

  // ---------------------------------------------------------------
  // q213 — RTF text extraction (legacy-document long tail): 40
  // documents of 2+i%3 paragraphs, each exercising the two laws
  // naive strippers get wrong — destination groups (a fonttbl and a
  // \*-escaped generator group contribute NO text) and the \uN
  // escape with the \ucN fallback-skip convention (even paragraphs
  // swallow one fallback char at uc=1, odd ones run at uc=0) — plus
  // Latin-1 \'hh escapes and brace literals. The text column
  // hash-gates the full render. Strictness is spec-gated in
  // RtfLakeSpec.
  private val RtfN = 40

  def q213(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.RtfLake.rtfFixture(s, RtfN)
    graft.operators.RtfLake.extractRtf(fx, "id", "media")
      .select(col("id"), col("text"), col("n_pars"), col("n_groups"),
        col("n_unicode"), col("valid"))
      .orderBy("id")
  }

  val q213Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 2 + x % 3 AS np FROM range(0, $RtfN) t(x))
       SELECT id,
         array_to_string(['Seg ' || (id + k) % 10
           || ' é' || (id * 3 + k) % 10
           || ' ué {x} tail' || (id * 7 + k) % 10 || chr(10)
           for k in range(0, np)], '') AS text,
         CAST(np AS INT) AS n_pars,
         CAST(3 + np AS INT) AS n_groups,
         CAST(np AS INT) AS n_unicode,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q214 — schema-less protobuf wire census (corpus forensics over
  // blobs whose .proto is lost — the complement of q170's schema-
  // bound tf.Example decode): 40 messages with a size-sweeping
  // varint (1-7 bytes via a ·2^(4k) law), printable text, fixed32/
  // fixed64, and repeated non-printable LEN payloads censused by
  // byte sum. Minimal-varint/group-reject/exact-tiling strictness is
  // spec-gated in ProtoLakeSpec.
  private val ProtoN = 40

  def q214(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ProtoLake.protoFixture(s, ProtoN)
    graft.operators.ProtoLake.extractProto(fx, "id", "media")
      .select(col("id"), col("seq"), col("fno"), col("wire"),
        col("lval"), col("len"), col("sval"), col("valid"))
      .orderBy("id", "seq")
  }

  val q214Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 4 + x % 3 AS nf FROM range(0, $ProtoN) t(x)),
       fields AS (
         SELECT id, CAST(unnest(range(0, nf)) AS INT) AS seq FROM base)
       SELECT id, seq,
         CAST(CASE seq WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3
           WHEN 3 THEN 4 ELSE 5 END AS INT) AS fno,
         CAST(CASE seq WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 5
           WHEN 3 THEN 1 ELSE 2 END AS INT) AS wire,
         CAST(CASE WHEN seq = 0 THEN (id * 97 + 13)
             * (CAST(1 AS BIGINT) << CAST(4 * (id % 8) AS INT))
           WHEN seq = 2 THEN id * 1000 + 7
           WHEN seq = 3 THEN id * 1000000000 + 3
           WHEN seq >= 4 THEN list_sum(
             [128 + (id + (seq - 4) + k) % 64
              for k in range(0, 3 + (seq - 4))])
           END AS BIGINT) AS lval,
         CAST(CASE WHEN seq = 1 THEN 10 WHEN seq >= 4 THEN 3 + (seq - 4)
           END AS BIGINT) AS len,
         CASE WHEN seq = 1 THEN 'msg ' || id % 7 || ' of ' || id % 5
           END AS sval,
         true AS valid
       FROM fields ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q215 — mixed-format TENSOR catalog (magic sniff + dispatch over
  // GGUF / SafeTensors / NPY / PyTorch-zip / ONNX — the model-hub
  // twin of the q186 document catalog and the q154 audio catalog):
  // 10 files per format interleaved as id = 5m+f so every partition
  // carries every format; all five unified onto one (fmt, seq, name,
  // n_elems, sig) schema where sig is still a CONTENT pin (md5
  // digests / integer-exact decoded value sums). The oracle is the
  // UNION of all five family laws — routing or extraction drift in
  // any branch fails the hash gate.
  private val TCatPerFmt = 10

  def q215(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TensorCatalog.tensorCatalogFixture(s, TCatPerFmt)
    graft.operators.TensorCatalog.catalogTensors(fx, "id", "media")
      .select(col("id"), col("fmt"), col("seq"), col("name"),
        col("n_elems"), col("sig"), col("valid"))
      .orderBy("id", "seq")
  }

  val q215Sql: String =
    s"""WITH ms AS (SELECT m FROM range(0, $TCatPerFmt) t(m)),
       -- f=0: GGUF (q205 laws)
       gg0 AS (
         SELECT m, CAST(unnest(range(0, 2 + m % 3)) AS INT) AS t FROM ms),
       gg1 AS (
         SELECT m, t, CAST(1 + (m + t) % 2 AS INT) AS nd,
           3 + (m + t) % 4 AS d0, 2 + t % 3 AS d1
         FROM gg0),
       gg AS (
         SELECT 5 * m AS id, 'gguf' AS fmt, t AS seq,
           'blk.' || t || '.w' AS name,
           CAST(CASE WHEN nd = 1 THEN d0 ELSE d0 * d1 END AS BIGINT)
             AS n_elems,
           CAST(CAST(list_sum([(m * 37 + t * 11 + j * 3) % 100 - 50
             for j in range(0, CASE WHEN nd = 1 THEN d0 ELSE d0 * d1 END)])
             AS BIGINT) AS VARCHAR) AS sig,
           true AS valid
         FROM gg1),
       -- f=1: SafeTensors (q203 laws)
       st0 AS (
         SELECT m, CAST(unnest(range(0, 3 + m % 4)) AS INT) AS k FROM ms),
       st1 AS (
         SELECT m, k,
           [4, 2, 2, 8, 1][1 + CAST((m + k) % 5 AS INT)] AS sz,
           [1 + (m + 2 * k + 3 * i) % 4
            for i in range(0, 1 + (m + k) % 3)] AS dims
         FROM st0),
       st AS (
         SELECT 5 * m + 1 AS id, 'safetensors' AS fmt, k AS seq,
           't' || k AS name,
           CAST(list_product(dims) AS BIGINT) AS n_elems,
           md5(array_to_string(
             [upper(lpad(format('{:x}', (m * 7 + k * 11 + j * 13) % 256),
                2, '0'))
              for j in range(0,
                CAST(list_product(dims) * sz AS BIGINT))], '')) AS sig,
           true AS valid
         FROM st1),
       -- f=2: NPY (q204 laws)
       np0 AS (
         SELECT m, m % 4 AS rank,
           [4, 8, 1, 8, 2][1 + CAST(m % 5 AS INT)] AS width,
           [1 + (m + 3 * i) % 5 for i in range(0, m % 4)] AS dims
         FROM ms),
       np AS (
         SELECT 5 * m + 2 AS id, 'npy' AS fmt, CAST(0 AS INT) AS seq,
           '' AS name,
           CAST(CASE WHEN rank = 0 THEN 1 ELSE list_product(dims) END
             AS BIGINT) AS n_elems,
           md5(array_to_string(
             [upper(lpad(format('{:x}', (m * 5 + j * 17) % 256), 2, '0'))
              for j in range(0, CAST(
                (CASE WHEN rank = 0 THEN 1 ELSE list_product(dims) END)
                  * width AS BIGINT))], '')) AS sig,
           true AS valid
         FROM np0),
       -- f=3: torch checkpoints (q208 laws)
       th0 AS (
         SELECT m, CAST(unnest(range(0, 2 + m % 3)) AS INT) AS t FROM ms),
       th1 AS (
         SELECT m, t, CAST(1 + (m + t) % 3 AS INT) AS nd,
           2 + (m + t) % 3 AS d0, 1 + t % 3 AS d1,
           CASE WHEN (m + t) % 3 = 0 THEN 2 ELSE 0 END AS off
         FROM th0),
       th2 AS (
         SELECT *,
           CAST(d0 * (CASE WHEN nd >= 2 THEN d1 ELSE 1 END)
             * (CASE WHEN nd >= 3 THEN 2 ELSE 1 END) AS BIGINT) AS nelem
         FROM th1),
       th AS (
         SELECT 5 * m + 3 AS id, 'torch' AS fmt, t AS seq,
           'layer.' || t || '.weight' AS name, nelem AS n_elems,
           CAST(CAST(list_sum([(m * 31 + t * 17 + j * 7) % 200 - 100
             for j in range(off, off + nelem)]) AS BIGINT) AS VARCHAR)
             AS sig,
           true AS valid
         FROM th2),
       -- f=4: ONNX (q217 laws)
       ox0 AS (
         SELECT m, CAST(unnest(range(0, 2 + m % 3)) AS INT) AS t FROM ms),
       ox1 AS (
         SELECT m, t, CAST(1 + (m + t) % 3 AS INT) AS nd,
           2 + (m + t) % 3 AS d0, 1 + t % 3 AS d1
         FROM ox0),
       ox2 AS (
         SELECT *,
           CAST(d0 * (CASE WHEN nd >= 2 THEN d1 ELSE 1 END)
             * (CASE WHEN nd >= 3 THEN 2 ELSE 1 END) AS BIGINT) AS nelem
         FROM ox1),
       ox AS (
         SELECT 5 * m + 4 AS id, 'onnx' AS fmt, t AS seq,
           'w.' || t AS name, nelem AS n_elems,
           CAST(CAST(list_sum([(m * 29 + t * 13 + j * 5) % 256 - 128
             for j in range(0, nelem)]) AS BIGINT) AS VARCHAR) AS sig,
           true AS valid
         FROM ox2)
       SELECT id, fmt, seq, name, n_elems, sig, valid FROM (
         SELECT * FROM gg UNION ALL SELECT * FROM st
         UNION ALL SELECT * FROM np UNION ALL SELECT * FROM th
         UNION ALL SELECT * FROM ox)
       ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q216 — TOML configuration extraction (the config layer of code
  // corpora — Cargo.toml/pyproject.toml): 40 documents with basic
  // strings (incl. a \\u00E9 escape), LITERAL strings whose
  // backslash is data, the no-leading-zero integer law, signed ints,
  // exact ×100 floats, integer arrays (some empty), per-table key
  // scoping and inline comments. One row per key in appearance
  // order. Lexical strictness is spec-gated in TomlLakeSpec.
  private val TomlN = 40

  def q216(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TomlLake.tomlFixture(s, TomlN)
    graft.operators.TomlLake.extractToml(fx, "id", "media")
      .select(col("id"), col("seq"), col("tbl"), col("key"),
        col("kind"), col("lval"), col("sval"), col("fx100"),
        col("arr_n"), col("valid"))
      .orderBy("id", "seq")
  }

  val q216Sql: String =
    s"""WITH base AS (
         SELECT x AS id, 1 + x % 2 AS nt FROM range(0, $TomlN) t(x)),
       rws AS (
         SELECT id, nt, CAST(unnest(range(0, 5 + 3 * nt)) AS INT) AS seq
         FROM base),
       d AS (
         SELECT id, seq,
           CASE WHEN seq >= 5 THEN (seq - 5) // 3 END AS t,
           CASE WHEN seq >= 5 THEN (seq - 5) % 3 END AS kpos
         FROM rws)
       SELECT id, seq,
         CASE WHEN seq < 5 THEN '' ELSE 'srv' || t END AS tbl,
         CASE seq WHEN 0 THEN 'title' WHEN 1 THEN 'port'
           WHEN 2 THEN 'debug' WHEN 3 THEN 'ratio' WHEN 4 THEN 'delta'
           ELSE ['host', 'workers', 'weights'][CAST(kpos AS INT) + 1]
           END AS key,
         CASE seq WHEN 0 THEN 'str' WHEN 1 THEN 'int' WHEN 2 THEN 'bool'
           WHEN 3 THEN 'float' WHEN 4 THEN 'int'
           ELSE ['str', 'int', 'arr'][CAST(kpos AS INT) + 1] END AS kind,
         CAST(CASE WHEN seq = 1 THEN 8000 + id
           WHEN seq = 2 THEN CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END
           WHEN seq = 4 THEN (CASE WHEN id % 2 = 0 THEN 1 ELSE -1 END)
             * ((id * 3) % 1000)
           WHEN seq >= 5 AND kpos = 1 THEN 1 + (id + t) % 8
           WHEN seq >= 5 AND kpos = 2 THEN COALESCE(list_sum(
             [(id * 5 + t + j) % 100 for j in range(0, (id + t) % 4)]), 0)
           END AS BIGINT) AS lval,
         CASE WHEN seq = 0 THEN 'cfg é' || id % 7
           WHEN seq >= 5 AND kpos = 0 THEN 'h' || (id + t) || '\\example'
           END AS sval,
         CAST(CASE WHEN seq = 3 THEN ((id * 13) % 90 + 1) * 100
           + (id * 7) % 100 END AS BIGINT) AS fx100,
         CAST(CASE WHEN seq >= 5 AND kpos = 2 THEN (id + t) % 4 END
           AS INT) AS arr_n,
         true AS valid
       FROM d ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q217 — ONNX model-container extraction (onnx.proto, proto3 —
  // the fourth weight format a hub crawl yields next to GGUF/
  // SafeTensors/Torch): 40 models, each a schema-bound ModelProto
  // walk — ir_version + opset_import validated, node/input/output
  // payloads skipped by LEN framing, initializer TensorProtos
  // decoded exactly (dims PACKED for even i+t and unpacked for odd —
  // same decode either way; float32 raw_data little-endian; value
  // sums hash-gate content). Unknown fields, float_data, external
  // data and non-FLOAT dtypes reject. Wire strictness (minimal
  // varints, exact tiling) is spec-gated in OnnxLakeSpec.
  private val OnnxN = 40

  def q217(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.OnnxLake.onnxFixture(s, OnnxN)
    graft.operators.OnnxLake.extractOnnx(fx, "id", "media")
      .select(col("id"), col("tidx"), col("tname"), col("n_dims"),
        col("nelem"), col("value_sum"), col("ir"), col("n_opsets"),
        col("gname"), col("valid"))
      .orderBy("id", "tidx")
  }

  val q217Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nt FROM range(0, $OnnxN) t(r)),
       tens AS (
         SELECT id, CAST(unnest(range(0, nt)) AS INT) AS tidx FROM base),
       d AS (
         SELECT id, tidx, CAST(1 + (id + tidx) % 3 AS INT) AS nd,
           2 + (id + tidx) % 3 AS d0, 1 + tidx % 3 AS d1
         FROM tens),
       e AS (
         SELECT *,
           CAST(d0 * (CASE WHEN nd >= 2 THEN d1 ELSE 1 END)
             * (CASE WHEN nd >= 3 THEN 2 ELSE 1 END) AS BIGINT) AS nelem
         FROM d)
       SELECT id, tidx, 'w.' || tidx AS tname, nd AS n_dims, nelem,
         CAST(list_sum([(id * 29 + tidx * 13 + j * 5) % 256 - 128
           for j in range(0, nelem)]) AS DOUBLE) AS value_sum,
         CAST(7 + id % 3 AS BIGINT) AS ir,
         CAST(1 + id % 2 AS INT) AS n_opsets,
         'g' || id AS gname, true AS valid
       FROM e ORDER BY id, tidx"""

  // ---------------------------------------------------------------
  // q218 — WebP VP8L lossless decode (WebP dominates modern web image
  // corpora): 40 files, ONE pixel law (the q190 dHash law image at
  // scale 1+i%3) behind SIX wire variants routed by i%6 — plain
  // literals, subtract-green, a sweeping predictor mode, palette with
  // sub-byte bundling, color cache + row-copy LZ77, and all three
  // pixel-value transforms stacked — so the oracle is wire-blind and
  // any slip in a transform inverse, the canonical Huffman layer, the
  // cache hash or the LZ77 copy changes gray_sum/n_colors/dhash and
  // fails the hash gate. Codec strictness (hand-computed bit vector,
  // corruption matrix, round-trip sweeps) is spec-gated in
  // WebpLakeSpec; the shared-grid fingerprint ties this decoder into
  // the q190/q212 near-dup family.
  private val WebpN = 40

  def q218(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.WebpLake.webpFixture(s, WebpN)
    graft.operators.WebpLake.extractWebp(fx, "id", "media")
      .select(col("id"), col("width"), col("height"), col("gray_sum"),
        col("n_colors"), col("dhash"), col("valid"))
      .orderBy("id")
  }

  val q218Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS s, r // 3 AS g, r % 3 AS m,
                (r // 3) - ((r // 3) % 2) AS geff
         FROM range(0, $WebpN) t(r)),
       grid AS (
         SELECT id, s, y, x,
           100 + COALESCE(list_sum([
             CASE WHEN (y * 8 + x2) < 63 AND
               ((CASE WHEN (geff * 5 + (y * 8 + x2) * 3) % 7 < 3
                 THEN 1 ELSE 0 END +
                 CASE WHEN m = 1 AND ((y * 8 + x2) = (3 * g) % 63 OR
                        (y * 8 + x2) = (3 * g + 21) % 63) THEN 1
                      WHEN m = 2 AND (y * 8 + x2) = (3 * g + 7) % 63 THEN 1
                      ELSE 0 END) % 2) = 1
             THEN 1 + (x2 + y) % 3 ELSE 0 END
             for x2 in range(0, x)]), 0) AS v
         FROM base,
           unnest([yy for yy in range(0, 8)]) u(y),
           unnest([xx for xx in range(0, 9)]) w(x)),
       stats AS (
         SELECT id, s, CAST(s * s * SUM(v) AS BIGINT) AS gray_sum,
           CAST(COUNT(DISTINCT v) AS INT) AS n_colors
         FROM grid GROUP BY id, s),
       bitv AS (
         SELECT id, k,
           (CASE WHEN (geff * 5 + k * 3) % 7 < 3 THEN 1 ELSE 0 END +
            CASE WHEN m = 1 AND (k = (3 * g) % 63 OR k = (3 * g + 21) % 63)
                   THEN 1
                 WHEN m = 2 AND k = (3 * g + 7) % 63 THEN 1
                 ELSE 0 END) % 2 AS b
         FROM base, unnest([k for k in range(0, 63)]) u(k)),
       fps AS (
         SELECT id, CAST(sum(CASE WHEN b = 1
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS fp
         FROM bitv GROUP BY id)
       SELECT st.id, CAST(9 * st.s AS INT) AS width,
         CAST(8 * st.s AS INT) AS height, st.gray_sum, st.n_colors,
         f.fp AS dhash, true AS valid
       FROM stats st JOIN fps f ON st.id = f.id
       ORDER BY st.id"""

  // ---------------------------------------------------------------
  // q219 — MPEG-1 Layer III INTENSITY STEREO: mode-1 streams whose
  // frames alternate mode_extension 1 (intensity only) and 3
  // (intensity + MS) — the remaining joint-stereo legality surface.
  // In Layer III the stereo tools change only RECONSTRUCTION
  // semantics, never bitstream syntax, so the decode emits the
  // transmitted channels' requantized spectra exactly as q199 does
  // (same audio laws, same value CTEs — the fixture shares
  // mp3L3JointFixture); is_ratio = tan(is_pos·π/12) re-scaling is
  // irrational and stays outside exact-decode scope with the MS
  // butterfly and the IMDCT (Multimodal.scala block comment).
  // ms_frames counts ext&2 frames, is_frames counts ext&1 frames.
  private val Mp3IsN = 42

  def q219(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3IsFixture(s, Mp3IsN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("ms_frames"),
        col("is_frames"), col("valid"))
      .orderBy("id")
  }

  val q219Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf
         FROM range(0, $Mp3IsN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (SELECT *, unnest([0, 1]) AS c FROM frows),
       gc AS (SELECT r, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS (
         SELECT r, f, c, g,
           15 - 3 * ((r + f + g + c) % 4) AS e,
           CASE WHEN 1 + (r + f + g + c) % 3 = 1 THEN 2 ELSE 3 END AS mx0
         FROM gc),
       prows AS (SELECT *, unnest([p for p in range(0, 52)]) AS p FROM gc2),
       vals AS (
         SELECT r, e,
           CASE WHEN p < 24 THEN (r*7 + f*5 + g*3 + c*9 + p) % mx0
                WHEN p < 40 THEN (r*11 + f*3 + g*7 + c*5 + p) % 4
                ELSE (r + 3*f + 5*g + 7*c + (p - 40)) % 2 END AS m,
           (r + f + g + c + p) % 2 AS neg
         FROM prows),
       qv AS (
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
             (CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)) AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM vals)
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(2 AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 2304 AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample,
         CAST((nf + base.r % 2) // 2 AS INT) AS ms_frames,
         CAST(nf AS INT) AS is_frames,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q220 — MPEG-1 Layer I INTENSITY STEREO decode: mode-1 streams
  // with mode_extension r%4 (bound = 4·(ext+1) ∈ {4,8,12,16}). In
  // Layers I/II the joint region carries ONE shared sample stream
  // requantized per channel through each channel's OWN scalefactor —
  // the scaling IS the intensity reconstruction, so the decode stays
  // integer-exact (§2.4.2.4). The oracle replays the shared-code rule
  // (cc = 0 above the bound) against per-channel scalefactors — an
  // implementation that read per-channel codes in the joint region
  // or shared the scalefactors would shift value_sum and fail the
  // hash gate. Strictness is spec-gated in MultimodalSpec.
  private val Mp1IsN = 42

  def q220(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp1IsFixture(s, Mp1IsN)
    graft.operators.Multimodal.decodeMp1(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("value_sum"), col("min_sample"),
        col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q220Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           416 + 32 * (r % 2) AS kbps,
           2 + r % 4 AS nf, 5 + r % 4 AS na,
           4 * (r % 4 + 1) AS bound
         FROM range(0, $Mp1IsN) t(r)),
       jrow AS (
         SELECT r, rate, kbps, nf, na, bound,
                unnest([j for j in range(0, na)]) AS j FROM base),
       sbnb AS (
         SELECT r, nf, bound, j, (r + 3 * j) % 32 AS sb,
                2 + (3 * r + 5 * j) % 14 AS nb FROM jrow),
       frow AS (SELECT *, unnest([f for f in range(0, nf)]) AS f FROM sbnb),
       crow AS (SELECT *, unnest([0, 1]) AS c FROM frow),
       grow AS (SELECT *, unnest([g for g in range(0, 12)]) AS g FROM crow),
       samp AS (
         SELECT r, nb, (r + sb + 7 * c + 2 * f) % 21 AS e,
           (r * 13 + f * 3 + g * 7 + sb * 5 +
            (CASE WHEN sb < bound THEN c ELSE 0 END) * 11) % (1 << nb)
             AS code
         FROM grow),
       ab AS (
         SELECT r,
           CAST(2 * code - (1 << nb) + 2 AS BIGINT)
             * (CAST(1 AS BIGINT) << (36 - e)) AS a,
           ((CAST(1 AS BIGINT) << nb) - 1) * (CAST(1 AS BIGINT) << 20) AS b
         FROM samp),
       qv AS ( -- exact round-half-even of a/b: floor quotient + tie parity
         SELECT r, fq + CASE WHEN 2 * rp > b THEN 1
                             WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                             ELSE 0 END AS q
         FROM (SELECT r, b, ((a % b) + b) % b AS rp,
                      (a - (((a % b) + b) % b)) // b AS fq FROM ab))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(2 AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 768 AS BIGINT) AS total_samples,
         CAST(nf * 24 * na AS BIGINT) AS n_decoded,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS INT) AS vmin, CAST(max(q) AS INT) AS vmax
         FROM qv GROUP BY r) s ON base.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q221 — MPEG-1 Layer II INTENSITY STEREO decode: the Layer II
  // twin of q220 — shared allocation AND shared (possibly grouped)
  // code stream above the bound, per-channel scfsi/scalefactors, all
  // through the exact rational requantizer. The oracle replays the
  // shared-code rule against the full scfsi part-sharing matrix.
  private val Mp2IsN = 42

  def q221(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp2IsFixture(s, Mp2IsN)
    graft.operators.Multimodal.decodeMp2(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("value_sum"), col("min_sample"),
        col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q221Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           2 + r % 3 AS nf, 4 + r % 4 AS na,
           4 * (r % 4 + 1) AS bound
         FROM range(0, $Mp2IsN) t(r)),
       base2 AS (
         SELECT *, 384 AS kbps,
                CASE WHEN rate = 48000 THEN 27 ELSE 30 END AS sbl
         FROM base),
       jrow AS (
         SELECT r, nf, sbl, bound,
                unnest([j for j in range(0, na)]) AS j FROM base2),
       sbrow AS (SELECT r, nf, bound, j, (r + 7 * j) % sbl AS sb FROM jrow),
       nlrow AS ( -- Table 3-B.2a/b class rows (B.2b = B.2a + tail rows)
         SELECT r, nf, bound, j, sb,
           (CASE WHEN sb < 3 THEN [3,7,15,31,63,127,255,511,1023,
                                   2047,4095,8191,16383,32767,65535]
                 WHEN sb < 11 THEN [3,5,7,9,15,31,63,127,255,511,
                                    1023,2047,4095,8191,65535]
                 WHEN sb < 23 THEN [3,5,7,9,15,31,65535]
                 ELSE [3,5,65535] END)
           [1 + (3 * r + 5 * j) % (CASE WHEN sb < 11 THEN 15
                WHEN sb < 23 THEN 7 ELSE 3 END)] AS nlev
         FROM sbrow),
       nbrow AS (
         SELECT *,
           CASE nlev WHEN 3 THEN 2 WHEN 5 THEN 3 WHEN 9 THEN 4
             WHEN 7 THEN 3 WHEN 15 THEN 4 WHEN 31 THEN 5 WHEN 63 THEN 6
             WHEN 127 THEN 7 WHEN 255 THEN 8 WHEN 511 THEN 9
             WHEN 1023 THEN 10 WHEN 2047 THEN 11 WHEN 4095 THEN 12
             WHEN 8191 THEN 13 WHEN 16383 THEN 14 WHEN 32767 THEN 15
             ELSE 16 END AS nb,
           CASE nlev WHEN 3 THEN 2 WHEN 5 THEN 4 WHEN 9 THEN 8
             ELSE 2 END AS madd
         FROM nlrow),
       crow AS (SELECT *, unnest([0, 1]) AS c FROM nbrow),
       scfr AS (SELECT *, (r + 2 * j + c) % 4 AS scfsi FROM crow),
       frow AS (SELECT *, unnest([f for f in range(0, nf)]) AS f FROM scfr),
       grow AS (SELECT *, unnest([g for g in range(0, 12)]) AS g FROM frow),
       erow AS ( -- scfsi part sharing: 0=(0,1,2) 1=(0,0,2) 2=(0,0,0) 3=(0,1,1)
         SELECT *, (r + sb + 7 * c + f + 2 *
           (CASE scfsi WHEN 0 THEN g // 4
                 WHEN 1 THEN (CASE WHEN g // 4 = 2 THEN 2 ELSE 0 END)
                 WHEN 2 THEN 0
                 ELSE (CASE WHEN g // 4 = 0 THEN 0 ELSE 1 END) END)) % 21 AS e
         FROM grow),
       krow AS (SELECT *, unnest([k for k in range(0, 3)]) AS k FROM erow),
       ab AS (
         SELECT r,
           CAST(2 * ((r * 13 + f * 3 + g * 7 + k * 17 + sb * 5 +
                      (CASE WHEN sb < bound THEN c ELSE 0 END) * 11)
                     % nlev) - (1 << nb) + madd AS BIGINT)
             * (CAST(1 AS BIGINT) << (36 - e)) AS a,
           CAST(nlev AS BIGINT) * (CAST(1 AS BIGINT) << 20) AS b
         FROM krow),
       qv AS ( -- exact round-half-even of a/b: floor quotient + tie parity
         SELECT r, fq + CASE WHEN 2 * rp > b THEN 1
                             WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                             ELSE 0 END AS q
         FROM (SELECT r, b, ((a % b) + b) % b AS rp,
                      (a - (((a % b) + b) % b)) // b AS fq FROM ab))
       SELECT base2.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(2 AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 2304 AS BIGINT) AS total_samples,
         CAST(nf * na * 72 AS BIGINT) AS n_decoded,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base2 JOIN (
         SELECT r, CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS INT) AS vmin, CAST(max(q) AS INT) AS vmax
         FROM qv GROUP BY r) s ON base2.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q222 — TIFF pixel decode (scanned-document/scientific imaging
  // corpora; the pixel half of the TIFF surface — ExifLake walks the
  // metadata half): 40 files, one pixel law per depth class (the
  // q190 dHash law image at scale 1+i%3; its BILEVEL rendering for
  // the scanned-document variants) behind SIXTEEN wire variants
  // routed by i%16 — both endians, photometric 0/1/2/3, compression
  // none/LZW/PackBits/CCITT-G4/CCITT-MH-1D/CCITT-G3-1D (both
  // T4Options EOL modes)/CCITT-G3-2D (K=4), single/multi-strip +
  // tiled
  // layouts, both predictors, 8-bit and 1-bit depths — so the pixel
  // columns are wire-blind within each class and the wire columns
  // (n_strips = segment count, compression) are closed-form in id.
  // Any slip in endianness, strip/tile assembly, PackBits framing,
  // the LZW early-change widths, the predictor, the G4 reference-
  // line coding or a photometric mapping changes
  // gray_sum/n_colors/dhash and fails the hash gate. Codec
  // strictness (corruption matrix, LZW width-boundary round-trip,
  // G4 alphabet laws, spec laws) is gated in TiffLakeSpec/G4Spec;
  // the shared-grid fingerprint ties the decoder into the
  // q190/q212/q223 near-dup family.
  private val TiffN = 40

  def q222(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TiffLake.tiffFixture(s, TiffN)
    graft.operators.TiffLake.extractTiff(fx, "id", "media")
      .select(col("id"), col("width"), col("height"), col("n_strips"),
        col("compression"), col("gray_sum"), col("n_colors"),
        col("dhash"), col("valid"))
      .orderBy("id")
  }

  val q222Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS s, r // 3 AS g, r % 3 AS m,
                (r // 3) - ((r // 3) % 2) AS geff, r % 16 AS v
         FROM range(0, $TiffN) t(r)),
       wire AS (
         SELECT id, s, v,
           CASE WHEN v IN (10, 11) THEN
             ((9 * s + 15) // 16) * ((8 * s + 15) // 16)
           ELSE (8 * s
             + CASE v WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 5 THEN 5
                 WHEN 6 THEN 4 WHEN 8 THEN 3 WHEN 12 THEN 4
                 WHEN 13 THEN 2 WHEN 14 THEN 5
                 ELSE 8 * s END - 1)
             // CASE v WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 5 THEN 5
                 WHEN 6 THEN 4 WHEN 8 THEN 3 WHEN 12 THEN 4
                 WHEN 13 THEN 2 WHEN 14 THEN 5
                 ELSE 8 * s END
           END AS nsegs,
           CASE v WHEN 1 THEN 32773 WHEN 7 THEN 32773
                WHEN 3 THEN 5 WHEN 6 THEN 5 WHEN 10 THEN 5
                WHEN 9 THEN 4 WHEN 11 THEN 4 WHEN 12 THEN 2
                WHEN 13 THEN 3 WHEN 14 THEN 3 WHEN 15 THEN 3
                ELSE 1 END AS comp
         FROM base),
       grid AS (
         SELECT id, s, y, x,
           100 + COALESCE(list_sum([
             CASE WHEN (y * 8 + x2) < 63 AND
               ((CASE WHEN (geff * 5 + (y * 8 + x2) * 3) % 7 < 3
                 THEN 1 ELSE 0 END +
                 CASE WHEN m = 1 AND ((y * 8 + x2) = (3 * g) % 63 OR
                        (y * 8 + x2) = (3 * g + 21) % 63) THEN 1
                      WHEN m = 2 AND (y * 8 + x2) = (3 * g + 7) % 63 THEN 1
                      ELSE 0 END) % 2) = 1
             THEN 1 + (x2 + y) % 3 ELSE 0 END
             for x2 in range(0, x)]), 0) AS v
         FROM base,
           unnest([yy for yy in range(0, 8)]) u(y),
           unnest([xx for xx in range(0, 9)]) w(x)),
       stats AS (
         SELECT id, s, CAST(s * s * SUM(v) AS BIGINT) AS gray_sum,
           CAST(COUNT(DISTINCT v) AS INT) AS n_colors
         FROM grid GROUP BY id, s),
       bitv AS (
         SELECT id, k,
           (CASE WHEN (geff * 5 + k * 3) % 7 < 3 THEN 1 ELSE 0 END +
            CASE WHEN m = 1 AND (k = (3 * g) % 63 OR k = (3 * g + 21) % 63)
                   THEN 1
                 WHEN m = 2 AND k = (3 * g + 7) % 63 THEN 1
                 ELSE 0 END) % 2 AS b
         FROM base, unnest([k for k in range(0, 63)]) u(k)),
       fps AS (
         SELECT id, CAST(sum(CASE WHEN b = 1
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS fp
         FROM bitv GROUP BY id),
       bcell AS (
         SELECT id, y, x,
           CASE WHEN (y * 8 + x) < 63 AND
             ((CASE WHEN (geff * 5 + (y * 8 + x) * 3) % 7 < 3
                THEN 1 ELSE 0 END +
               CASE WHEN m = 1 AND ((y * 8 + x) = (3 * g) % 63 OR
                      (y * 8 + x) = (3 * g + 21) % 63) THEN 1
                    WHEN m = 2 AND (y * 8 + x) = (3 * g + 7) % 63 THEN 1
                    ELSE 0 END) % 2) = 1
           THEN 1 ELSE 0 END AS b
         FROM base,
           unnest([yy for yy in range(0, 8)]) u(y),
           unnest([xx for xx in range(0, 9)]) w(x)),
       bsum AS (
         SELECT id, CAST(SUM(1 - b) AS BIGINT) AS nwhite
         FROM bcell GROUP BY id),
       bfp AS (
         SELECT c1.id, CAST(COALESCE(SUM(CASE WHEN c1.b = 1 AND c2.b = 0
             THEN (CAST(1 AS BIGINT) << (c1.y * 8 + c1.x)) END), 0)
             AS BIGINT) AS fp
         FROM bcell c1 JOIN bcell c2
           ON c1.id = c2.id AND c1.y = c2.y AND c2.x = c1.x + 1
         WHERE c1.x < 8
         GROUP BY c1.id)
       SELECT st.id, CAST(9 * st.s AS INT) AS width,
         CAST(8 * st.s AS INT) AS height,
         CAST(w.nsegs AS INT) AS n_strips,
         CAST(w.comp AS INT) AS compression,
         CASE WHEN w.v IN (8, 9, 11, 12, 13, 14, 15)
           THEN CAST(255 * st.s * st.s * bs.nwhite AS BIGINT)
           ELSE st.gray_sum END AS gray_sum,
         CAST(CASE WHEN w.v IN (8, 9, 11, 12, 13, 14, 15) THEN 2 ELSE st.n_colors END
           AS INT) AS n_colors,
         CASE WHEN w.v IN (8, 9, 11, 12, 13, 14, 15) THEN bf.fp ELSE f.fp END AS dhash,
         true AS valid
       FROM stats st JOIN fps f ON st.id = f.id
       JOIN bsum bs ON st.id = bs.id
       JOIN bfp bf ON st.id = bf.id
         JOIN wire w ON st.id = w.id
       ORDER BY st.id"""

  // ---------------------------------------------------------------
  // q223 — FOUR-container format-invariant image near-dup: q190's
  // corpus routed across PNG / 24-bpp BMP / VP8L WebP / baseline
  // TIFF (big-endian LZW + predictor, multi-strip) by
  // (id%6 + id/6) % 4 — a routing under which the law's Hamming-0
  // pairs (6k, 6k+3) land at routes k%4 vs (k+3)%4, provably always
  // different, so every exact-duplicate pair crosses formats. The
  // bit laws are q190's exactly, so the correct pair set is
  // IDENTICAL to q190's oracle; a decoder whose TIFF path drops a
  // strip, mis-widths the LZW stream or skips the predictor changes
  // fingerprints and fails the hash gate. Same decode-once +
  // shared-banded-blocking shape as q190/q212.
  def q223(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.dhashMixed4Fixture(s, DHashN)
    val fps = graft.operators.Multimodal.imageDHash(fx, "id", "media")
      .where(col("valid"))
      .select(col("id"), col("dhash").as("simhash"))
      .localCheckpoint()
    graft.operators.Dedup.simhashNearDup(fps, maxDist = 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .orderBy("a", "b")
  }

  val q223Sql: String = ExtQueries4.q190Sql // same laws ⇒ same pair set

  // ---------------------------------------------------------------
  // q224 — parquet FOOTER census (byte-level corpus forensics over
  // the engine's own storage format): a spec-written Thrift Compact
  // Protocol walk of FileMetaData — no parquet library, no data-page
  // reads — yielding per-(file, row-group, column-chunk) physical
  // type, codec, value counts, sizes, dictionary presence and writer
  // identity. 40 files whose footers interleave known-but-skipped
  // fields (key-value metadata i%4=0, column orders i%5=0, per-chunk
  // statistics i%3=0) between the extracted ones, so the oracle gate
  // spans the forward-compatibility skipper, the zigzag varints, the
  // field-delta decoding, the schema-tree validation and every
  // cross-field law (Σ rg rows = file rows, chunks per rg = leaves,
  // page offsets inside the data region, dict before data).
  // Real-writer conformance (parquet-cpp-arrow test tables) is
  // spec-gated in ParquetLakeSpec.
  private val PqMetaN = 40

  def q224(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ParquetLake.parquetMetaFixture(s, PqMetaN)
    graft.operators.ParquetLake.extractParquetMeta(fx, "id", "media")
      .select(col("id"), col("version"), col("created_by"),
        col("n_schema"), col("n_leaves"), col("num_rows"),
        col("n_row_groups"), col("rg"), col("rg_rows"), col("rg_bytes"),
        col("col"), col("col_path"), col("ptype"), col("codec"),
        col("n_values"), col("total_compressed"),
        col("total_uncompressed"), col("has_dict"), col("valid"))
      .orderBy("id", "rg", "col")
  }

  val q224Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 2 AS version, 2 + r % 3 AS L,
                100 + 10 * r AS R, 1 + r % 2 AS G
         FROM range(0, $PqMetaN) t(r)),
       rgs AS (
         SELECT *, CAST(unnest(range(0, G)) AS INT) AS rg FROM base),
       rg2 AS (
         SELECT *, CASE WHEN G = 1 THEN R
                        WHEN rg = 0 THEN 60 + 5 * id
                        ELSE 40 + 5 * id END AS rg_rows
         FROM rgs),
       chunks AS (
         SELECT *, CAST(unnest(range(0, L)) AS INT) AS c FROM rg2),
       laws AS (
         SELECT *, 500 + 13 * id + 11 * c + 5 * rg AS tc FROM chunks)
       SELECT id, CAST(version AS INT) AS version,
         'graft-parquet ' || (id % 5) AS created_by,
         CAST(L + 1 AS INT) AS n_schema, CAST(L AS INT) AS n_leaves,
         CAST(R AS BIGINT) AS num_rows, CAST(G AS INT) AS n_row_groups,
         rg, CAST(rg_rows AS BIGINT) AS rg_rows,
         CAST(list_sum([500 + 13 * id + 11 * cc + 5 * rg + 200 + id
           for cc in range(0, L)]) AS BIGINT) AS rg_bytes,
         c AS col, 'c' || c AS col_path,
         CAST(CASE (id + c) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
              ELSE 6 END AS INT) AS ptype,
         CAST(CASE (id + 2 * c + 3 * rg) % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
              ELSE 6 END AS INT) AS codec,
         CAST(rg_rows AS BIGINT) AS n_values,
         CAST(tc AS BIGINT) AS total_compressed,
         CAST(tc + 200 + id AS BIGINT) AS total_uncompressed,
         (id + c) % 2 = 0 AS has_dict,
         true AS valid
       FROM laws ORDER BY id, rg, col"""

  // ---------------------------------------------------------------
  // q225 — Ogg container catalog (RFC 3533 framing + RFC 7845 Opus /
  // Vorbis I ident layouts): modern audio corpora are Ogg-heavy and
  // the curation layer needs per-stream codec/channels/rate/packet
  // censuses without decoding audio. Every page CRC is VERIFIED
  // (forward CRC-32, the RFC polynomial), pages must tile the file,
  // per-serial sequence/BOS/EOS/continuation state machines are
  // strict. 40 files: an Opus stream always (with a 510-byte
  // k·255-boundary packet on i%3=0 and a >255-byte packet SPANNING
  // pages via a continuation on i%3=1), a multiplexed Vorbis stream
  // on odd i, and an unrecognized-ident stream on i%5=0 censused
  // honestly as codec='other' with null audio facts. Strictness
  // (CRC flip, lost page, BOS/EOS/continuation lies) is spec-gated
  // in OggLakeSpec.
  private val OggN = 40

  def q225(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.OggLake.oggFixture(s, OggN)
    graft.operators.OggLake.catalogOgg(fx, "id", "media")
      .select(col("id"), col("stream"), col("serial"), col("codec"),
        col("channels"), col("sample_rate"), col("pre_skip"),
        col("n_pages"), col("n_packets"), col("last_granule"),
        col("valid"))
      .orderBy("id", "stream")
  }

  val q225Sql: String =
    s"""WITH base AS (SELECT r AS id FROM range(0, $OggN) t(r)),
       rows_a AS (
         SELECT id, 0 AS stream, 1000 + id AS serial, 'opus' AS codec,
           1 + id % 2 AS channels, 48000 AS sample_rate,
           312 + id AS pre_skip,
           CASE WHEN id % 3 = 1 THEN 4 ELSE 2 END AS n_pages,
           4 + id % 3 AS n_packets,
           960 * (3 + id % 3) AS last_granule
         FROM base),
       rows_b AS (
         SELECT id, 1 AS stream, 2000 + id AS serial, 'vorbis' AS codec,
           2 AS channels,
           CASE WHEN id % 4 = 1 THEN 44100 ELSE 48000 END AS sample_rate,
           CAST(NULL AS INT) AS pre_skip, 2 AS n_pages, 2 AS n_packets,
           128 AS last_granule
         FROM base WHERE id % 2 = 1),
       rows_c AS (
         SELECT id, 1 + id % 2 AS stream, 3000 + id AS serial,
           'other' AS codec, CAST(NULL AS INT) AS channels,
           CAST(NULL AS BIGINT) AS sample_rate,
           CAST(NULL AS INT) AS pre_skip, 2 AS n_pages, 2 AS n_packets,
           777 AS last_granule
         FROM base WHERE id % 5 = 0),
       u AS (SELECT * FROM rows_a UNION ALL SELECT * FROM rows_b
             UNION ALL SELECT * FROM rows_c)
       SELECT id, CAST(stream AS INT) AS stream,
         CAST(serial AS BIGINT) AS serial, codec,
         CAST(channels AS INT) AS channels,
         CAST(sample_rate AS BIGINT) AS sample_rate,
         CAST(pre_skip AS INT) AS pre_skip,
         CAST(n_pages AS INT) AS n_pages,
         CAST(n_packets AS INT) AS n_packets,
         CAST(last_granule AS BIGINT) AS last_granule,
         true AS valid
       FROM u ORDER BY id, stream"""

  // ---------------------------------------------------------------
  // q226 — EBML/Matroska container catalog (RFC 8794 + the Matroska
  // element registry): WebM dominates scraped web video, and the
  // curation layer needs per-track codec/dimensions/channels/rate,
  // duration and cluster censuses without touching a codec. Strict
  // VINT parsing (IDs keep the marker, sizes strip it, unknown-size
  // rejects), exact parent tiling, unknown elements skipped by size
  // (EBML's forward-compat design), Duration as float32 OR float64
  // (both exact for the integer-valued law), TimestampScale default
  // exercised by absence. 40 files, 1+i%3 tracks alternating video/
  // audio, planted Void elements, multi-cluster bodies censused by
  // count and byte size. Strictness (tiling lies, unknown-size,
  // mixed track planes) is spec-gated in EbmlLakeSpec.
  private val EbmlN = 40

  def q226(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.EbmlLake.ebmlFixture(s, EbmlN)
    graft.operators.EbmlLake.catalogEbml(fx, "id", "media")
      .select(col("id"), col("doctype"), col("doctype_version"),
        col("timestamp_scale"), col("duration"), col("muxing_app"),
        col("n_tracks"), col("track"), col("track_number"),
        col("track_type"), col("codec_id"), col("pix_w"), col("pix_h"),
        col("channels"), col("sample_hz"), col("n_clusters"),
        col("cluster_bytes"), col("valid"))
      .orderBy("id", "track")
  }

  val q226Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS nt FROM range(0, $EbmlN) t(r)),
       tr AS (
         SELECT *, CAST(unnest(range(0, nt)) AS INT) AS track FROM base),
       facts AS (
         SELECT *, (id + track) % 2 = 0 AS is_video FROM tr)
       SELECT id,
         CASE WHEN id % 2 = 0 THEN 'webm' ELSE 'matroska' END AS doctype,
         CAST(CASE WHEN id % 2 = 0 THEN 4 ELSE 2 END AS BIGINT)
           AS doctype_version,
         CAST(CASE WHEN id % 3 = 0 THEN 1000000
              ELSE 1000000 * (1 + id % 2) END AS BIGINT) AS timestamp_scale,
         CAST(1000 + 10 * id AS DOUBLE) AS duration,
         'graft-mux ' || (id % 3) AS muxing_app,
         CAST(nt AS INT) AS n_tracks, track,
         CAST(track + 1 AS BIGINT) AS track_number,
         CAST(CASE WHEN is_video THEN 1 ELSE 2 END AS INT) AS track_type,
         CASE WHEN is_video THEN
              (CASE WHEN id % 4 < 2 THEN 'V_VP9' ELSE 'V_AV1' END)
              ELSE
              (CASE WHEN id % 4 < 2 THEN 'A_OPUS' ELSE 'A_VORBIS' END)
         END AS codec_id,
         CAST(CASE WHEN is_video THEN 320 + 16 * id END AS BIGINT) AS pix_w,
         CAST(CASE WHEN is_video THEN 240 + 8 * id END AS BIGINT) AS pix_h,
         CAST(CASE WHEN NOT is_video THEN 1 + (id + track) % 2 END
           AS BIGINT) AS channels,
         CAST(CASE WHEN NOT is_video THEN
              (CASE WHEN id % 4 < 2 THEN 48000 ELSE 44100 END) END
           AS DOUBLE) AS sample_hz,
         CAST(1 + id % 2 AS INT) AS n_clusters,
         CAST(CASE WHEN id % 2 = 0 THEN 69 ELSE 170 END AS BIGINT)
           AS cluster_bytes,
         true AS valid
       FROM facts ORDER BY id, track"""

  // ---------------------------------------------------------------
  // q227 — Ogg COMMENT headers (RFC 7845 §5.2 OpusTags / Vorbis I
  // comments): the metadata layer a curation pipeline reads for
  // language/licensing/provenance tags. Both specs share the
  // vendor + length-prefixed "KEY=value" list; the walk enforces the
  // second-packet-must-be-comments law, exact consumption (with the
  // Vorbis framing bit), the FIRST-'=' split, the key character
  // range, and strict UTF-8 — while case is PRESERVED and a
  // canonical upper form is emitted alongside (field names are
  // case-insensitive per spec). 40 files: Opus always (empty value
  // at seq 0 on i%5=0, '=' embedded in values on odd seq, é on even
  // i), a Vorbis stream with a LANGUAGE tag on odd i. Strictness is
  // spec-gated in OggLakeSpec.
  private val OggTagsN = 40

  def q227(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.OggLake.oggTagsFixture(s, OggTagsN)
    graft.operators.OggLake.tagsOgg(fx, "id", "media")
      .select(col("id"), col("stream"), col("serial"), col("codec"),
        col("vendor"), col("seq"), col("key"), col("key_upper"),
        col("value"), col("valid"))
      .orderBy("id", "stream", "seq")
  }

  val q227Sql: String =
    s"""WITH base AS (SELECT r AS id FROM range(0, $OggTagsN) t(r)),
       ca AS (
         SELECT id, CAST(unnest(range(0, 1 + id % 3)) AS INT) AS seq
         FROM base),
       rows_a AS (
         SELECT id, 0 AS stream, 1000 + id AS serial, 'opus' AS codec,
           'graft-vendor ' || (id % 4) AS vendor, seq,
           CASE seq % 3 WHEN 0 THEN 'Title' WHEN 1 THEN 'ARTIST'
                ELSE 'lang' END AS key,
           CASE seq % 3 WHEN 0 THEN 'TITLE' WHEN 1 THEN 'ARTIST'
                ELSE 'LANG' END AS key_upper,
           CASE WHEN id % 5 = 0 AND seq = 0 THEN ''
                ELSE 'v' || ((id * 7 + seq) % 10)
                  || (CASE WHEN seq % 2 = 1 THEN '=x' ELSE '' END)
                  || (CASE WHEN id % 2 = 0 THEN 'é' ELSE '' END)
           END AS value
         FROM ca),
       rows_b AS (
         SELECT id, 1 AS stream, 2000 + id AS serial, 'vorbis' AS codec,
           'graft-vorbis ' || (id % 3) AS vendor, 0 AS seq,
           'LANGUAGE' AS key, 'LANGUAGE' AS key_upper,
           'l' || (id % 6) AS value
         FROM base WHERE id % 2 = 1),
       u AS (SELECT * FROM rows_a UNION ALL SELECT * FROM rows_b)
       SELECT id, CAST(stream AS INT) AS stream,
         CAST(serial AS BIGINT) AS serial, codec, vendor,
         CAST(seq AS INT) AS seq, key, key_upper, value, true AS valid
       FROM u ORDER BY id, stream, seq"""

  // ---------------------------------------------------------------
  // q228 — Arrow IPC file census (Feather V2 — how HuggingFace
  // datasets cache and exchange tables; the fifth interchange format
  // next to parquet/SafeTensors-NPY-GGUF/Avro): a spec-written
  // FLATBUFFERS walk (root uoffset, signed soffsets, vtables, u32
  // indirections, inline structs — no flatbuffers library) over
  // Footer / Message / Schema / RecordBatch, with the stream-schema-
  // must-match-footer-schema cross law, per-batch node/buffer-layout
  // validation for the flat primitive subset, EXACT int64 column
  // sums (the content hash gate), honest family='other' for types
  // out of subset, and strict rejects for dictionaries and
  // compression. 40 files, 2+i%3 fields cycling int64/float64/utf8/
  // bool, 1-2 batches; body_bytes replays the 8-byte buffer padding
  // law closed-form. Real pyarrow-written files are spec-gated in
  // ArrowLakeSpec.
  private val ArrowN = 40

  def q228(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ArrowLake.arrowFixture(s, ArrowN)
    graft.operators.ArrowLake.extractArrow(fx, "id", "media")
      .select(col("id"), col("version"), col("n_fields"), col("field"),
        col("name"), col("nullable"), col("family"), col("bit_width"),
        col("n_batches"), col("total_rows"), col("body_bytes"),
        col("value_sum"), col("valid"))
      .orderBy("id", "field")
  }

  val q228Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nf, 1 + r % 2 AS nb
         FROM range(0, $ArrowN) t(r)),
       agg AS (
         SELECT id,
           CAST(list_sum([5 + id % 4 + 3 * b
             for b in range(0, nb)]) AS BIGINT) AS total_rows,
           CAST(list_sum([list_sum([
             CASE WHEN (id + cc) % 4 IN (0, 1)
                    THEN 8 * (5 + id % 4 + 3 * b)
                  WHEN (id + cc) % 4 = 3 THEN 8
                  ELSE ((4 * (6 + id % 4 + 3 * b) + 7) // 8) * 8
                    + ((list_sum([1 + length(CAST(
                          id * 100 + cc * 10 + b + 7 * rr AS VARCHAR))
                        for rr in range(0, 5 + id % 4 + 3 * b)]) + 7)
                       // 8) * 8
             END for cc in range(0, nf)])
             for b in range(0, nb)]) AS BIGINT) AS body_bytes
         FROM base),
       fields AS (
         SELECT base.*, CAST(unnest(range(0, nf)) AS INT) AS field
         FROM base)
       SELECT f.id, CAST(4 AS INT) AS version, CAST(nf AS INT) AS n_fields,
         field, 'c' || field AS name, field % 2 = 1 AS nullable,
         CASE (f.id + field) % 4 WHEN 0 THEN 'int' WHEN 1 THEN 'float'
              WHEN 2 THEN 'utf8' ELSE 'bool' END AS family,
         CAST(CASE (f.id + field) % 4 WHEN 0 THEN 64 WHEN 1 THEN 64
              WHEN 3 THEN 1 END AS INT) AS bit_width,
         CAST(nb AS INT) AS n_batches, a.total_rows, a.body_bytes,
         CAST(CASE WHEN (f.id + field) % 4 = 0 THEN
           list_sum([(5 + f.id % 4 + 3 * b)
               * (f.id * 100 + field * 10 + b)
             + 7 * (5 + f.id % 4 + 3 * b) * (4 + f.id % 4 + 3 * b) // 2
             for b in range(0, nb)])
         END AS BIGINT) AS value_sum,
         true AS valid
       FROM fields f JOIN agg a ON f.id = a.id
       ORDER BY f.id, field"""

  // ---------------------------------------------------------------
  // q229 — mixed-MEDIA catalog: the media twin of the q186 document
  // catalog and q215 tensor catalog. One magic-sniff dispatch routes
  // every blob of a mixed crawl bucket to its family walk — images
  // through the parseDHash chain (PNG/BMP/WebP/TIFF here; GIF/JPEG
  // spec-gated), WAV/FLAC through the PCM and constant-subframe
  // walks, MP4/AVI through the box/RIFF walks, Ogg through the
  // CRC-verified page walk, EBML through the VINT walk — and
  // censuses minimal facts on ONE schema; unknown magics census
  // honestly as kind=other while a blob whose magic matches but
  // whose body lies is valid=false; LOSSY VP8 and extended VP8X
  // WebP profiles census header-declared dimensions (no pinnable
  // pixel oracle exists for the lossy pipeline — censusing is the
  // honest posture). 52 blobs routed by i%13 across all thirteen
  // routes. Route/corruption strictness is spec-gated in
  // MediaCatalogSpec/WebpLakeSpec.
  private val MediaN = 52

  def q229(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MediaCatalog.mediaFixture(s, MediaN)
    graft.operators.MediaCatalog.catalogMedia(fx, "id", "media")
      .select(col("id"), col("fmt"), col("kind"), col("width"),
        col("height"), col("channels"), col("sample_rate"),
        col("n_units"), col("valid"))
      .orderBy("id")
  }

  val q229Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS s, r % 13 AS m,
           CASE r % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
                ELSE 48000 END AS rate3
         FROM range(0, $MediaN) t(r))
       SELECT id,
         CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'webp'
              WHEN 3 THEN 'tiff' WHEN 4 THEN 'ogg' WHEN 5 THEN 'ebml'
              WHEN 7 THEN 'wav' WHEN 8 THEN 'flac' WHEN 9 THEN 'mp4'
              WHEN 10 THEN 'avi' WHEN 11 THEN 'webp_lossy'
              WHEN 12 THEN 'webp_ext' ELSE 'other' END AS fmt,
         CASE WHEN m <= 3 OR m >= 11 THEN 'image'
              WHEN m IN (4, 7, 8) THEN 'audio'
              WHEN m IN (5, 9, 10) THEN 'video' ELSE 'other' END AS kind,
         CAST(CASE WHEN m <= 3 THEN 9 * s
              WHEN m = 5 THEN 320 + 16 * id
              WHEN m = 10 THEN 12 + id % 8
              WHEN m = 11 THEN 64 + 2 * id
              WHEN m = 12 THEN 200 + 3 * id END AS INT) AS width,
         CAST(CASE WHEN m <= 3 THEN 8 * s
              WHEN m = 5 THEN 240 + 8 * id
              WHEN m = 10 THEN 8 + id % 5
              WHEN m = 11 THEN 48 + id
              WHEN m = 12 THEN 100 + 2 * id END AS INT) AS height,
         CAST(CASE WHEN m IN (4, 7, 8, 9) THEN 1 + id % 2
              WHEN m = 5 AND id % 2 = 1 THEN 2 END AS INT) AS channels,
         CAST(CASE WHEN m = 4 THEN 48000
              WHEN m = 5 AND id % 2 = 1 THEN 48000
              WHEN m = 7 THEN 8000 * (1 + id % 2)
              WHEN m IN (8, 9) THEN rate3 END AS BIGINT)
           AS sample_rate,
         CAST(CASE WHEN m <= 3 OR m >= 11 THEN 1
              WHEN m = 4 THEN 3 + id % 3
              WHEN m = 5 THEN 1 + id % 2
              WHEN m = 7 THEN 64 + id
              WHEN m = 8 THEN 3 + id % 5
              WHEN m = 9 THEN 1
              WHEN m = 10 THEN 2 + id % 4 END AS INT) AS n_units,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q230 — CSV dialect sniffing: scraped tabular shards arrive with
  // unknown delimiter/quote/header conventions, and ingestion must
  // DETECT the dialect before any reader runs. The sniffer is
  // deterministic and fully specified (candidate grid x quote-aware
  // parse; admissible = every line the same field count >= 2;
  // fewest-fields tie-break — a wrong quote can only inflate the
  // count by splitting quoted delimiters; header iff first row
  // non-numeric and a later row numeric) so the oracle replays its
  // verdicts closed-form. 40 shards sweeping all four delimiters,
  // both quotes, header presence, with every string cell QUOTING a
  // live delimiter — the case naive split-on-comma breaks on.
  // Adversarial strictness is spec-gated in CsvSniffSpec.
  private val CsvN = 40

  def q230(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.CsvSniff.csvFixture(s, CsvN)
    graft.operators.CsvSniff.sniffCsv(fx, "id", "text")
      .select(col("id"), col("n_lines"), col("delim"), col("quote"),
        col("n_fields"), col("has_header"), col("n_numeric"),
        col("valid"))
      .orderBy("id")
  }

  val q230Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nf, 4 + r % 4 AS nr
         FROM range(0, $CsvN) t(r))
       SELECT id,
         CAST(nr + CASE WHEN id % 3 <> 0 THEN 1 ELSE 0 END AS INT)
           AS n_lines,
         CASE id % 4 WHEN 0 THEN ',' WHEN 1 THEN ';' WHEN 2 THEN chr(9)
              ELSE '|' END AS delim,
         CASE id % 2 WHEN 0 THEN '"' ELSE '''' END AS quote,
         CAST(nf AS INT) AS n_fields,
         id % 3 <> 0 AS has_header,
         CAST(list_sum([CASE WHEN (id + j) % 2 = 0 THEN 1 ELSE 0 END
           for j in range(0, nf)]) AS INT) AS n_numeric,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q231 — YAML configuration extraction (the metadata layer of hub
  // corpora: model cards, dataset cards, CI configs): 40 documents
  // exercising double-quoted escapes (incl. \\u00E9), single-quoted
  // '' escapes, plain-scalar resolution under the CLOSED core-schema
  // subset (ints with the no-leading-zero law, exact ×100 floats,
  // strict dates, both null forms), flow sequences (some empty),
  // nested mappings to depth 3, block sequences in BOTH real-world
  // indent styles (deeper than the key, and at the key's own
  // indent), comments and a `---` start marker. One row per leaf in
  // appearance order; containers carry element counts. Lexical
  // strictness (the Norway-problem words, anchors/tags/flow maps,
  // tab law, key uniqueness) is spec-gated in YamlLakeSpec.
  private val YamlN = 40

  def q231(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.yamlFixture(s, YamlN)
    graft.operators.YamlLake.extractYaml(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("valid"))
      .orderBy("id", "seq")
  }

  val q231Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 4 AS na, 1 + r % 3 AS ns
         FROM range(0, $YamlN) t(r)),
       rws AS (
         SELECT id, na, ns,
           CAST(unnest(range(0, 13 + na + ns)) AS INT) AS seq
         FROM base),
       d AS (
         SELECT id, na, ns, seq,
           CASE WHEN seq >= 8 AND seq < 8 + na THEN seq - 8 END AS ij,
           CASE WHEN seq >= 11 + na AND seq < 11 + na + ns
                THEN seq - 11 - na END AS sj,
           CASE WHEN seq < 8 THEN seq
                WHEN seq < 8 + na THEN 100
                WHEN seq = 8 + na THEN 101
                WHEN seq = 9 + na THEN 102
                WHEN seq = 10 + na THEN 103
                WHEN seq < 11 + na + ns THEN 104
                WHEN seq = 11 + na + ns THEN 105
                ELSE 106 END AS pos
         FROM rws)
       SELECT id, seq,
         CASE pos WHEN 0 THEN 'title' WHEN 1 THEN 'count'
           WHEN 2 THEN 'active' WHEN 3 THEN 'score' WHEN 4 THEN 'note'
           WHEN 5 THEN 'empty' WHEN 6 THEN 'born' WHEN 7 THEN 'ids'
           WHEN 100 THEN 'ids.' || ij WHEN 101 THEN 'meta.owner'
           WHEN 102 THEN 'meta.level' WHEN 103 THEN 'steps'
           WHEN 104 THEN 'steps.' || sj WHEN 105 THEN 'build.env.os'
           ELSE 'build.env.jobs' END AS path,
         CASE pos WHEN 0 THEN 'str' WHEN 1 THEN 'int' WHEN 2 THEN 'bool'
           WHEN 3 THEN 'float' WHEN 4 THEN 'str' WHEN 5 THEN 'null'
           WHEN 6 THEN 'date' WHEN 7 THEN 'seq' WHEN 100 THEN 'int'
           WHEN 101 THEN 'str' WHEN 102 THEN 'int' WHEN 103 THEN 'seq'
           WHEN 104 THEN CASE WHEN (id + sj) % 2 = 0 THEN 'int'
             ELSE 'str' END
           WHEN 105 THEN 'str' ELSE 'int' END AS kind,
         CAST(CASE pos WHEN 1 THEN 100 + id
           WHEN 2 THEN CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END
           WHEN 6 THEN (make_date(2024, CAST(1 + id % 12 AS INT),
                CAST(1 + (id * 3) % 28 AS INT))
                - DATE '1970-01-01') * 86400
           WHEN 100 THEN (id * 5 + ij) % 100
           WHEN 102 THEN 1 + id % 5
           WHEN 104 THEN CASE WHEN (id + sj) % 2 = 0
             THEN (id * 3 + sj) % 50 END
           WHEN 106 THEN 2 + id % 4 END AS BIGINT) AS lval,
         CASE pos WHEN 0 THEN 'doc é' || (id % 7)
           WHEN 4 THEN 'plain text ' || (id % 5)
           WHEN 101 THEN 'it''s t' || (id % 6)
           WHEN 104 THEN CASE WHEN (id + sj) % 2 = 1
             THEN 's' || ((id + sj) % 10) END
           WHEN 105 THEN 'linux' || (id % 3) END AS sval,
         CAST(CASE pos WHEN 3 THEN ((id * 13) % 90 + 1) * 100
           + (id * 7) % 100 END AS BIGINT) AS fx100,
         CAST(CASE pos WHEN 7 THEN na WHEN 103 THEN ns END AS INT)
           AS arr_n,
         true AS valid
       FROM d ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q232 — YAML front matter over the Markdown corpus (the q175
  // family composed with the q231 lake): the static-site / model-card
  // convention routes the leading `---` fence through the strict
  // YAML subset parser — per-key rows instead of q175's three pinned
  // projections. Every fourth document has no front matter
  // (has_fm = false), the rest yield title/date/tags/draft rows with
  // the flow-sequence tags expanded per element.
  def q232(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MarkdownLake.markdownFixture(s, MdN)
    graft.operators.YamlLake.extractFrontMatter(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("has_fm"), col("valid"))
      .orderBy("id", "seq")
  }

  val q232Sql: String =
    s"""WITH base AS (
         SELECT r AS id, CASE WHEN r % 4 = 3 THEN 1 ELSE 6 END AS nr
         FROM range(0, $MdN) t(r)),
       rws AS (
         SELECT id, nr, CAST(unnest(range(0, nr)) AS INT) AS seq
         FROM base)
       SELECT id, seq,
         CASE WHEN nr = 6 THEN
           CASE seq WHEN 0 THEN 'title' WHEN 1 THEN 'date'
             WHEN 2 THEN 'tags' WHEN 3 THEN 'tags.0'
             WHEN 4 THEN 'tags.1' ELSE 'draft' END END AS path,
         CASE WHEN nr = 6 THEN
           CASE seq WHEN 0 THEN 'str' WHEN 1 THEN 'date'
             WHEN 2 THEN 'seq' WHEN 3 THEN 'str' WHEN 4 THEN 'str'
             ELSE 'bool' END END AS kind,
         CAST(CASE WHEN nr = 6 AND seq = 1 THEN
             (make_date(2024, CAST(1 + id % 12 AS INT),
              CAST(1 + (id * 3) % 28 AS INT))
              - DATE '1970-01-01') * 86400
           WHEN nr = 6 AND seq = 5 THEN 0 END AS BIGINT) AS lval,
         CASE WHEN nr = 6 AND seq = 0 THEN 'Post ' || id || ' and co'
           WHEN nr = 6 AND seq = 3 THEN 't' || (id % 5)
           WHEN nr = 6 AND seq = 4 THEN 'u' || ((id + 3) % 7)
           END AS sval,
         CAST(NULL AS BIGINT) AS fx100,
         CAST(CASE WHEN nr = 6 AND seq = 2 THEN 2 END AS INT) AS arr_n,
         nr = 6 AS has_fm,
         true AS valid
       FROM rws ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q233 — dialect-applied CSV extraction (q230 composed): after the
  // sniffer detects the dialect, the WHOLE shard is parsed with it
  // into typed per-column stats on one schema — kind `long` (exact
  // BIGINT min/max/sum), `dec2` (≤2-decimal numerics on the EXACT
  // ×100 axis) or `string` (length stats); header names projected;
  // any line drifting from the detected dialect invalidates the
  // shard. 40 shards with kinds cycling per column, every string
  // cell QUOTING a live delimiter AND an embedded newline (RFC 4180
  // sec 2.6 — the record class naive line splitters break on).
  // Typing strictness (mixed
  // long/dec2 promotion, drift reject, overflow reject) is
  // spec-gated in CsvSniffSpec.
  def q233(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.CsvSniff.csvTypedFixture(s, CsvN)
    graft.operators.CsvSniff.extractCsv(fx, "id", "text")
      .select(col("id"), col("col"), col("name"), col("kind"),
        col("lmin"), col("lmax"), col("lsum"), col("n_rows"),
        col("valid"))
      .orderBy("id", "col")
  }

  val q233Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS nf, 4 + r % 4 AS nr,
                r % 3 <> 0 AS hdr
         FROM range(0, $CsvN) t(r)),
       cols AS (
         SELECT id, nf, nr, hdr,
           CAST(unnest(range(0, nf)) AS INT) AS col
         FROM base),
       d AS (SELECT *, (id + col) % 3 AS k FROM cols)
       SELECT id, col,
         CASE WHEN hdr THEN 'h' || col END AS name,
         CASE k WHEN 0 THEN 'long' WHEN 1 THEN 'string'
           ELSE 'dec2' END AS kind,
         CAST(CASE k WHEN 0 THEN id * 10 + col WHEN 1 THEN 6
              ELSE col * 100 + (id + col) % 100 END AS BIGINT) AS lmin,
         CAST(CASE k WHEN 0 THEN id * 10 + col + nr - 1 WHEN 1 THEN 6
              ELSE (nr - 1 + col) * 100 + (id + col) % 100 END
           AS BIGINT) AS lmax,
         CAST(CASE k WHEN 0 THEN nr * (id * 10 + col)
                + nr * (nr - 1) // 2
              WHEN 1 THEN 6 * nr
              ELSE 100 * (col * nr + nr * (nr - 1) // 2)
                + nr * ((id + col) % 100) END AS BIGINT) AS lsum,
         CAST(nr AS INT) AS n_rows,
         true AS valid
       FROM d ORDER BY id, col"""

  // ---------------------------------------------------------------
  // q234 — Opus TOC-byte packet census (RFC 6716 §3.1 over the q225
  // Ogg walk): the TOC byte alone pins each packet's config, stereo
  // flag and frame count, hence its exact duration in 48 kHz samples
  // with NO codec decode; RFC 7845's granule law (final granule =
  // pre-skip + samples − trim, trim smaller than the last packet)
  // cross-checks the page layer against the packet layer. 40
  // single-stream files sweeping all four frame-count codes, SILK/
  // hybrid/CELT configs and an end trim. TOC strictness (the 120 ms
  // law, code-1 parity, zero-count code-3) is spec-gated in
  // OggLakeSpec.
  private val OpusTocN = 40

  def q234(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.OggLake.opusTocFixture(s, OpusTocN)
    graft.operators.OggLake.extractOpusToc(fx, "id", "media")
      .select(col("id"), col("stream"), col("channels"), col("pre_skip"),
        col("n_audio"), col("toc_samples"), col("n_configs"),
        col("max_frames"), col("stereo_pkts"), col("trim_samples"),
        col("valid"))
      .orderBy("id", "stream")
  }

  val q234Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 3 AS na FROM range(0, $OpusTocN) t(r)),
       p AS (
         SELECT id, na,
           [CASE WHEN j % 4 = 3 THEN 16 + (id + j) % 4
                 ELSE (id + j) % 32 END for j in range(0, na)] AS cfgs,
           [CASE j % 4 WHEN 0 THEN 1 WHEN 3 THEN 1 + (id + j) % 3
                 ELSE 2 END for j in range(0, na)] AS frs,
           [(id + j) % 2 for j in range(0, na)] AS sts
         FROM base)
       SELECT id, CAST(0 AS INT) AS stream,
         CAST(1 + id % 2 AS INT) AS channels,
         CAST(100 + id AS INT) AS pre_skip,
         CAST(na AS INT) AS n_audio,
         CAST(list_sum([frs[k] * (CASE WHEN cfgs[k] < 12 THEN
               ([480, 960, 1920, 2880])[cfgs[k] % 4 + 1]
             WHEN cfgs[k] < 16 THEN ([480, 960])[cfgs[k] % 2 + 1]
             ELSE ([120, 240, 480, 960])[cfgs[k] % 4 + 1] END)
           for k in range(1, na + 1)]) AS BIGINT) AS toc_samples,
         CAST(len(list_distinct(cfgs)) AS INT) AS n_configs,
         CAST(list_max(frs) AS INT) AS max_frames,
         CAST(list_sum(sts) AS INT) AS stereo_pkts,
         CAST(id % 3 AS BIGINT) AS trim_samples,
         true AS valid
       FROM p ORDER BY id"""

  // ---------------------------------------------------------------
  // q235 — Arrow IPC: dictionary-encoded columns + compressed bodies
  // (what newer HuggingFace `datasets` writes — string categoricals
  // arrive dictionary-encoded, buffers LZ4-frame or zstd framed):
  // DictionaryEncoding schema fields (Utf8 values, signed 8/16/32/64
  // indices), DictionaryBatch blocks walked BEFORE the data (size +
  // total value chars from the offsets buffer), per-batch index
  // bounds + EXACT index sums as the content gate, and BodyCompression
  // BUFFER framing ([i64 uncompressed length | -1][frame]) with size
  // laws on the UNCOMPRESSED lengths and decompressed-length
  // verification. 40 files cycling none/lz4/zstd and all four index
  // widths; every fifth file ships its dictionary as an initial
  // batch plus a DELTA batch (isDelta = 1 appends — same totals, so
  // the delta walk sits under this hash gate). Real pyarrow
  // dictionary/lz4/zstd/delta/replacement files are conformance
  // resources in ArrowLakeSpec.
  private val ArrowDictN = 40

  def q235(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ArrowLake.arrowDictFixture(s, ArrowDictN)
    graft.operators.ArrowLake.extractArrowDict(fx, "id", "media")
      .select(col("id"), col("field"), col("name"), col("family"),
        col("bit_width"), col("codec"), col("n_batches"),
        col("total_rows"), col("dict_size"), col("dict_chars"),
        col("value_sum"), col("valid"))
      .orderBy("id", "field")
  }

  val q235Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 3 AS cmp, 1 + r % 2 AS nb,
                4 + r % 3 AS b, 3 + r % 3 AS ds,
                ([8, 16, 32, 64])[r % 4 + 1] AS iw
         FROM range(0, $ArrowDictN) t(r)),
       bat AS (
         SELECT id, nb, b, ds,
           CAST(unnest(range(0, nb)) AS INT) AS bi
         FROM base),
       rws AS (
         SELECT id, ds, bi,
           CAST(unnest(range(0, b + 2 * bi)) AS INT) AS rr
         FROM bat),
       agg AS (
         SELECT id, CAST(SUM((id + bi + rr) % ds) AS BIGINT) AS dsum,
           CAST(SUM(id * 100 + 10 + bi + rr * 7) AS BIGINT) AS isum,
           CAST(COUNT(*) AS BIGINT) AS trows
         FROM rws GROUP BY id),
       flds AS (
         SELECT base.*, agg.dsum, agg.isum, agg.trows,
           CAST(unnest(range(0, CASE WHEN id % 2 = 1 THEN 3 ELSE 2 END))
             AS INT) AS fidx
         FROM base JOIN agg USING (id))
       SELECT id, fidx AS field, 'c' || fidx AS name,
         CASE fidx WHEN 0 THEN 'dict' WHEN 1 THEN 'int'
           ELSE 'utf8' END AS family,
         CAST(CASE fidx WHEN 0 THEN iw WHEN 1 THEN 64 END AS INT)
           AS bit_width,
         CASE cmp WHEN 0 THEN 'none' WHEN 1 THEN 'lz4'
           ELSE 'zstd' END AS codec,
         CAST(nb AS INT) AS n_batches,
         trows AS total_rows,
         CAST(CASE WHEN fidx = 0 THEN ds END AS BIGINT) AS dict_size,
         CAST(CASE WHEN fidx = 0 THEN 2 * ds END AS BIGINT)
           AS dict_chars,
         CASE fidx WHEN 0 THEN dsum WHEN 1 THEN isum END AS value_sum,
         true AS valid
       FROM flds ORDER BY id, field"""

  // ---------------------------------------------------------------
  // q236 — parquet census, page grain (q224 extended to the layers a
  // lake audit needs below the chunk): per-column ENCODINGS bitmask
  // (so the census can verify the engine's own DELTA_BINARY_PACKED /
  // dictionary pinning from the OUTSIDE — the O11 cross-gate lives
  // in ParquetLakeSpec), encoding_stats (V1/V2/dictionary page
  // counts, consistency with the dictionary offset), OffsetIndex
  // walks (page offsets/rows strictly increasing, sizes inside the
  // chunk), ColumnIndex walks (null_pages/min/max grain == page
  // count, boundary order), and SBBF bloom headers (power-of-two
  // bitsets, BLOCK/XXHASH/UNCOMPRESSED unions, length law). 40
  // files; real parquet-mr footers exercise the same walks in
  // ParquetLakeSpec (their page indexes parse on every spec run).
  private val PqPagesN = 40

  def q236(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ParquetLake.parquetPagesFixture(s, PqPagesN)
    graft.operators.ParquetLake.extractParquetPages(fx, "id", "media")
      .select(col("id"), col("rg"), col("col"), col("col_path"),
        col("encodings"), col("pages_v1"), col("pages_v2"),
        col("dict_pages"), col("n_pages"), col("has_col_index"),
        col("bloom_bytes"), col("valid"))
      .orderBy("id", "col")
  }

  val q236Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 2 + r % 2 AS nl, r % 4 <> 3 AS idx
         FROM range(0, $PqPagesN) t(r)),
       cols AS (
         SELECT id, idx, CAST(unnest(range(0, nl)) AS INT) AS col
         FROM base),
       d AS (
         SELECT *, (id + col) % 2 = 0 AS evn,
           CAST(2 + (id + col) % 3 AS INT) AS np
         FROM cols)
       SELECT id, CAST(0 AS INT) AS rg, col,
         'c' || col AS col_path,
         CAST(CASE WHEN evn THEN 297 ELSE 9 END AS INT) AS encodings,
         CAST(CASE WHEN evn THEN 0
           ELSE CASE WHEN idx THEN np ELSE 1 END END AS INT) AS pages_v1,
         CAST(CASE WHEN evn THEN CASE WHEN idx THEN np ELSE 1 END
           ELSE 0 END AS INT) AS pages_v2,
         CAST(CASE WHEN evn THEN 1 ELSE 0 END AS INT) AS dict_pages,
         CAST(CASE WHEN idx THEN np END AS INT) AS n_pages,
         idx AS has_col_index,
         CAST(CASE WHEN (id + col) % 3 = 0 THEN 32 *
           (CASE id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) END
           AS BIGINT) AS bloom_bytes,
         true AS valid
       FROM d ORDER BY id, col"""

  // ---------------------------------------------------------------
  // q237 — Arrow IPC STREAM form (`.arrows` — the streaming/RPC
  // sibling of the q228/q235 file walk, and what `datasets` emits
  // over sockets): no magic, no footer — an encapsulated Schema
  // message, dictionary batches strictly before the data, record
  // batches, then the 8-byte EOS marker closing the blob exactly.
  // The fixture carries the q235 content laws VERBATIM in the stream
  // wrapper, so the oracle is q235's and any divergence between the
  // two walks (which share one batch engine) fails the hash gate.
  def q237(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ArrowLake.arrowStreamFixture(s, ArrowDictN)
    graft.operators.ArrowLake.extractArrowDict(fx, "id", "media")
      .select(col("id"), col("field"), col("name"), col("family"),
        col("bit_width"), col("codec"), col("n_batches"),
        col("total_rows"), col("dict_size"), col("dict_chars"),
        col("value_sum"), col("valid"))
      .orderBy("id", "field")
  }

  // ---------------------------------------------------------------
  // q238 — BLOCK-SCALAR front matter (the q232 family over the YAML
  // 1.2 sec 8.1 block-scalar subset): real model/dataset cards put
  // multi-line descriptions, prompts and license text in literal
  // (`|`) / folded (`>`) block scalars, which the strict subset
  // rejected before round 17. 40 text documents sweep literal x
  // folded x clip/strip/keep chomping x interior/trailing empty
  // lines x auto/explicit indentation indicator (both indicator
  // orders) x dedent/EOF close, with every fifth document carrying
  // no front matter. The assembled multi-line values cross the hash
  // gate verbatim (chr(10)-built in the oracle). Header/indent
  // strictness is spec-gated in YamlLakeSpec.
  private val BlockN = 40

  def q238(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.blockFixture(s, BlockN)
    graft.operators.YamlLake.extractFrontMatter(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("has_fm"), col("valid"))
      .orderBy("id", "seq")
  }

  val q238Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           r % 5 <> 4 AS fm,
           r % 2 = 0 AS lit,
           r % 3 AS c,
           (r // 3) % 3 AS te,
           1 + (r // 2) % 3 AS nl,
           r % 5 = 0 AS ex,
           (r % 4 < 2) AND (1 + (r // 2) % 3 >= 2) AS inter,
           r % 7 <> 3 AS tl
         FROM range(0, $BlockN) g(r)),
       a AS (
         SELECT *,
           'line0 w' || (id % 7) AS a0,
           'line1 w' || ((id + 1) % 7) AS a1,
           'line2 w' || ((id + 2) % 7) AS a2,
           CASE WHEN ex AND lit THEN ' ' ELSE '' END AS xi
         FROM base),
       rawv AS (
         SELECT *,
           CASE WHEN lit THEN
             a0 || CASE WHEN inter THEN chr(10) ELSE '' END
                || CASE WHEN nl >= 2 THEN chr(10) || xi || a1 ELSE '' END
                || CASE WHEN nl >= 3 THEN chr(10) || a2 ELSE '' END
           ELSE
             a0 || CASE WHEN nl >= 2 THEN
                     (CASE WHEN inter THEN chr(10) ELSE ' ' END) || a1
                   ELSE '' END
                || CASE WHEN nl >= 3 THEN ' ' || a2 ELSE '' END
           END AS rw
         FROM a),
       vals AS (
         SELECT *,
           CASE c WHEN 1 THEN rw WHEN 0 THEN rw || chr(10)
             ELSE rw || repeat(chr(10), CAST(1 + te AS BIGINT)) END AS v
         FROM rawv),
       rws AS (
         SELECT id, fm, tl, v,
           CAST(unnest(range(0,
             CASE WHEN NOT fm THEN 1 WHEN tl THEN 3 ELSE 2 END)) AS INT)
             AS seq
         FROM vals)
       SELECT id, seq,
         CASE WHEN fm THEN CASE seq WHEN 0 THEN 'name'
           WHEN 1 THEN 'desc' ELSE 'tail' END END AS path,
         CASE WHEN fm THEN CASE seq WHEN 2 THEN 'int'
           ELSE 'str' END END AS kind,
         CAST(CASE WHEN fm AND seq = 2 THEN 100 + id END AS BIGINT)
           AS lval,
         CASE WHEN fm AND seq = 0 THEN 'blk' || (id % 5)
              WHEN fm AND seq = 1 THEN v END AS sval,
         CAST(NULL AS BIGINT) AS fx100,
         CAST(NULL AS INT) AS arr_n,
         fm AS has_fm,
         true AS valid
       FROM rws ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q239 — MULTI-PAGE TIFF page census (the q222 family over the IFD
  // chain): scanned-document corpora are predominantly multi-page,
  // which the lake strict-rejected before round 17. 40 files of
  // 1 + i%4 chained pages — 40 pages on i%20==9, the scanned-book
  // shape past the old 32-page cap — big-endian on odd i, per-page
  // compressions cycling none/LZW/PackBits/CCITT-G4/JPEG
  // (Compression 7, round 18) with single- and 2-row-strip layouts
  // and page-local pixel laws (8-bit gray ramp; bilevel %3 pattern
  // on the G4 pages; SOLID gray on the JPEG pages — the q147
  // quality-1.0 exact-round-trip operating point) — one row per page
  // with the page index, so mixed per-page wire shapes cross the
  // hash gate. Chain strictness (cycles, backward/odd/out-of-bounds
  // next-IFD, the page cap, parseTiff's one-page contract) and the
  // JPEG corruption matrix are spec-gated in TiffLakeSpec.
  private val TiffMultiN = 40

  def q239(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TiffLake.tiffMultiFixture(s, TiffMultiN)
    graft.operators.TiffLake.extractTiffPages(fx, "id", "media")
      .select(col("id"), col("page"), col("n_pages"), col("width"),
        col("height"), col("n_strips"), col("compression"),
        col("gray_sum"), col("n_colors"), col("valid"))
      .orderBy("id", "page")
  }

  val q239Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE WHEN r % 20 = 9 THEN 40 ELSE 1 + r % 4 END AS np
         FROM range(0, $TiffMultiN) g(r)),
       pages AS (
         SELECT id, np, CAST(unnest(range(0, np)) AS INT) AS page
         FROM base),
       d AS (
         SELECT id, np, page,
           (id + page) % 5 AS cm,
           5 + (id + page) % 4 AS w,
           4 + (id + page) % 3 AS h
         FROM pages),
       e AS (
         SELECT id, np, page, cm, w, h, w * h AS n,
           CASE cm WHEN 1 THEN 5 WHEN 2 THEN 32773 WHEN 3 THEN 4
             WHEN 4 THEN 7 ELSE 1 END AS comp,
           CASE WHEN (id + page) % 2 = 0 THEN 1 ELSE (h + 1) // 2 END
             AS nsegs,
           (id * 7 + page * 11) % 256 AS c0,
           (id * 3 + page * 5) % 3 AS b0
         FROM d)
       SELECT id, page, CAST(np AS INT) AS n_pages,
         CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         CAST(nsegs AS INT) AS n_strips,
         CAST(comp AS INT) AS compression,
         CAST(CASE WHEN cm = 3
           THEN 255 * list_sum([CASE WHEN (b0 + k) % 3 <> 0 THEN 1
                                ELSE 0 END for k in range(0, n)])
           WHEN cm = 4 THEN c0 * n
           ELSE list_sum([(c0 + 3 * k) % 256 for k in range(0, n)])
         END AS BIGINT) AS gray_sum,
         CAST(CASE WHEN cm = 3 THEN 2 WHEN cm = 4 THEN 1 ELSE n END
           AS INT) AS n_colors,
         true AS valid
       FROM e ORDER BY id, page"""

  // ---------------------------------------------------------------
  // q240 — FLOW-MAPPING extraction (the other half of the r16
  // verdict's YAML gap, alongside q238's block scalars): one-level
  // `{k: v, ...}` mapping values — the inline-object form CI configs
  // and model cards use for small option groups. 40 documents sweep
  // entry counts 0-3 (including the empty `{}`), quoted values
  // carrying a LIVE comma and close brace (the naive-split breakers,
  // both quote styles), exact x100 floats, no-space-after-comma and
  // padded-brace spacings. Key-uniqueness / nesting / pair-indicator
  // strictness is spec-gated in YamlLakeSpec.
  private val FlowN = 40

  def q240(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.flowFixture(s, FlowN)
    graft.operators.YamlLake.extractYaml(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("valid"))
      .orderBy("id", "seq")
  }

  val q240Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 4 AS ne FROM range(0, $FlowN) g(r)),
       rws AS (
         SELECT id, ne, CAST(unnest(range(0, 4 + ne)) AS INT) AS seq
         FROM base),
       d AS (
         SELECT id, ne, seq,
           CASE WHEN seq = 0 THEN 0
                WHEN seq = 1 THEN 1
                WHEN seq < 2 + ne THEN 10 + (seq - 2)
                WHEN seq = 2 + ne THEN 2
                ELSE 3 END AS pos
         FROM rws)
       SELECT id, seq,
         CASE pos WHEN 0 THEN 'svc' WHEN 1 THEN 'cfg' WHEN 2 THEN 'lims'
           WHEN 3 THEN 'port' WHEN 10 THEN 'cfg.a' WHEN 11 THEN 'cfg.b'
           ELSE 'cfg.c' END AS path,
         CASE pos WHEN 0 THEN 'str' WHEN 1 THEN 'map' WHEN 2 THEN 'map'
           WHEN 3 THEN 'int' WHEN 10 THEN 'int' WHEN 11 THEN 'str'
           ELSE 'float' END AS kind,
         CAST(CASE pos WHEN 3 THEN 1000 + id WHEN 10 THEN 3 * id + 1
           END AS BIGINT) AS lval,
         CASE pos WHEN 0 THEN 's' || (id % 6)
           WHEN 11 THEN CASE WHEN id % 2 = 0 THEN 'd,}' ELSE 's,}' END
             || (id % 7) END AS sval,
         CAST(CASE pos WHEN 12 THEN (1 + id % 9) * 100 + id % 100
           END AS BIGINT) AS fx100,
         CAST(CASE pos WHEN 1 THEN ne WHEN 2 THEN 0 END AS INT) AS arr_n,
         true AS valid
       FROM d ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q241 — PAGE-level exact dedup across scanned documents (the q239
  // lake composed with the dedup family): repeated pages — blank
  // separators, cover sheets, re-scanned originals — are found by
  // grouping decoded pages on their EXACT 24-bit raster (a collision-
  // free signature the oracle replays closed-form; a perceptual hash
  // could alias different content cross-engine). One shuffle: the
  // window partition over (dims, signature); every page reports its
  // duplicate-group size and the group's canonical (first) page.
  // The q239 fixture genuinely contains cross-document duplicates —
  // e.g. doc 0 page 0 and doc 35 page 1 share (i+p) mod 12 (dims)
  // AND 7i+11p mod 256 (the ramp base), hence the full raster —
  // while their WIRE compressions differ (none vs LZW under r18's
  // mod-5 cycle): the dedup is format-invariant by construction.
  def q241(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fx = graft.operators.TiffLake.tiffMultiFixture(s, TiffMultiN)
    val sigs = graft.operators.TiffLake.extractTiffPageSigs(
      fx, "id", "media")
    // canon packs (id, page) on a MaxPages stride — page < MaxPages
    // structurally, so the encoding never aliases (the r17 *10 pack
    // silently assumed page <= 9)
    val stride = graft.operators.TiffLake.MaxPages
    val grp = Window.partitionBy(col("width"), col("height"), col("sig"))
    sigs.select(col("id"), col("page"),
        count(lit(1)).over(grp).cast("int").as("dup_count"),
        min(col("id") * stride + col("page")).over(grp).as("canon"))
      .select(col("id"), col("page"), col("dup_count"),
        expr(s"canon DIV $stride").as("canon_id"),
        expr(s"CAST(canon % $stride AS INT)").as("canon_page"))
      .orderBy("id", "page")
  }

  val q241Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE WHEN r % 20 = 9 THEN 40 ELSE 1 + r % 4 END AS np
         FROM range(0, $TiffMultiN) g(r)),
       pages AS (
         SELECT id, CAST(unnest(range(0, np)) AS INT) AS page
         FROM base),
       e AS (
         SELECT id, page,
           (id + page) % 5 AS cm,
           5 + (id + page) % 4 AS w,
           4 + (id + page) % 3 AS h,
           (5 + (id + page) % 4) * (4 + (id + page) % 3) AS n,
           (id * 7 + page * 11) % 256 AS c0,
           (id * 3 + page * 5) % 3 AS b0
         FROM pages),
       sigs AS (
         SELECT id, page, w, h,
           CASE WHEN cm = 3
             THEN array_to_string([CASE WHEN (b0 + k) % 3 = 0 THEN 0
                    ELSE 16777215 END for k in range(0, n)], ',')
             WHEN cm = 4
             THEN array_to_string([c0 * 65793
                    for k in range(0, n)], ',')
             ELSE array_to_string([((c0 + 3 * k) % 256) * 65793
                    for k in range(0, n)], ',')
           END AS sig
         FROM e),
       grp AS (
         SELECT id, page,
           CAST(COUNT(*) OVER (PARTITION BY w, h, sig) AS INT)
             AS dup_count,
           MIN(id * ${graft.operators.TiffLake.MaxPages} + page)
             OVER (PARTITION BY w, h, sig) AS canon
         FROM sigs)
       SELECT id, page, dup_count,
         CAST(canon // ${graft.operators.TiffLake.MaxPages} AS BIGINT)
           AS canon_id,
         CAST(canon % ${graft.operators.TiffLake.MaxPages} AS INT)
           AS canon_page
       FROM grp ORDER BY id, page"""

  // ---------------------------------------------------------------
  // q242 — BLOCK SEQUENCES OF MAPPINGS (the r17 verdict's single
  // highest-leverage YAML gap): `- key: value` sequence items are
  // the backbone of real hub cards — the model-index/results
  // structure on model cards, configs lists on dataset cards — and
  // strict-rejected before round 18. 40 documents sweep 1-3 mapping
  // items x 3-4 keys per item (str / int / bool / exact-x100 float
  // kinds) x both sequence indent styles (deeper than the key, and
  // at the key's own indent), with a trailing root key closing the
  // sequence by dedent. Continuation-column/indent strictness is
  // spec-gated in YamlLakeSpec.
  private val SeqMapN = 40

  def q242(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.seqMapFixture(s, SeqMapN)
    graft.operators.YamlLake.extractYaml(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("valid"))
      .orderBy("id", "seq")
  }

  // per-item key count is 3 + (i+j)%2, so item j's first row sits at
  // seq = 2 + 3j + |{j'<j : i+j' odd}| = 2 + 3j + (j + i%2) // 2
  val q242Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS n FROM range(0, $SeqMapN) g(r)),
       items AS (
         SELECT id, n, CAST(unnest(range(0, n)) AS INT) AS j FROM base),
       keyrows AS (
         SELECT id, j,
           CAST(unnest(range(0, 3 + (id + j) % 2)) AS INT) AS k
         FROM items),
       itemrows AS (
         SELECT id,
           CAST(2 + 3 * j + (j + id % 2) // 2 + k AS INT) AS seq,
           'results.' || j || CASE k WHEN 0 THEN '.task'
             WHEN 1 THEN '.ep' WHEN 2 THEN '.ok' ELSE '.w' END AS path,
           CASE k WHEN 0 THEN 'str' WHEN 1 THEN 'int' WHEN 2 THEN 'bool'
             ELSE 'float' END AS kind,
           CAST(CASE k WHEN 1 THEN (3 * id + 7 * j) % 100
             WHEN 2 THEN CASE WHEN (id + j) % 2 = 0 THEN 1 ELSE 0 END
             END AS BIGINT) AS lval,
           CASE k WHEN 0 THEN 't' || ((id + j) % 4) END AS sval,
           CAST(CASE k WHEN 3 THEN ((id + 5 * j) % 40 + 1) * 100
             + (11 * id + j) % 100 END AS BIGINT) AS fx100,
           CAST(NULL AS INT) AS arr_n
         FROM keyrows),
       headtail AS (
         SELECT id, CAST(0 AS INT) AS seq, 'model' AS path,
           'str' AS kind, CAST(NULL AS BIGINT) AS lval,
           'm' || (id % 5) AS sval, CAST(NULL AS BIGINT) AS fx100,
           CAST(NULL AS INT) AS arr_n
         FROM base
         UNION ALL
         SELECT id, CAST(1 AS INT), 'results', 'seq',
           CAST(NULL AS BIGINT), NULL, CAST(NULL AS BIGINT),
           CAST(n AS INT)
         FROM base
         UNION ALL
         SELECT id, CAST(2 + 3 * n + (n + id % 2) // 2 AS INT), 'done',
           'int', CAST(10 + id AS BIGINT), NULL, CAST(NULL AS BIGINT),
           CAST(NULL AS INT)
         FROM base)
       SELECT id, seq, path, kind, lval, sval, fx100, arr_n,
         true AS valid
       FROM (SELECT * FROM itemrows UNION ALL SELECT * FROM headtail)
       ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q243 — MULTI-DOCUMENT YAML streams (the r17 verdict's ask #4):
  // config dumps and concatenated dataset shards separate documents
  // with column-0 `---` lines — the multi-page TIFF shape, with a
  // doc index column and every single-document law applied per
  // document. 40 streams sweep 1-3 documents x marker-led /
  // marker-less openers x all four scalar kinds. Separator/empty-doc
  // strictness is spec-gated in YamlLakeSpec.
  private val DocsN = 40

  def q243(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.docsFixture(s, DocsN)
    graft.operators.YamlLake.extractYamlDocs(fx, "id", "media")
      .select(col("id"), col("doc"), col("seq"), col("path"),
        col("kind"), col("lval"), col("sval"), col("fx100"),
        col("arr_n"), col("n_docs"), col("valid"))
      .orderBy("id", "doc", "seq")
  }

  val q243Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 1 + r % 3 AS nd FROM range(0, $DocsN) g(r)),
       docs AS (
         SELECT id, nd, CAST(unnest(range(0, nd)) AS INT) AS doc
         FROM base),
       rws AS (
         SELECT id, nd, doc, CAST(unnest(range(0, 4)) AS INT) AS seq
         FROM docs)
       SELECT id, doc, seq,
         CASE seq WHEN 0 THEN 'app' WHEN 1 THEN 'v' WHEN 2 THEN 'up'
           ELSE 'r' END AS path,
         CASE seq WHEN 0 THEN 'str' WHEN 1 THEN 'int'
           WHEN 2 THEN 'bool' ELSE 'float' END AS kind,
         CAST(CASE seq WHEN 1 THEN (7 * id + 3 * doc) % 50
           WHEN 2 THEN CASE WHEN (id + doc) % 2 = 0 THEN 1 ELSE 0 END
           END AS BIGINT) AS lval,
         CASE seq WHEN 0 THEN 'a' || ((id + doc) % 5) END AS sval,
         CAST(CASE seq WHEN 3 THEN (1 + (id + doc) % 9) * 100
           + (13 * id + doc) % 100 END AS BIGINT) AS fx100,
         CAST(NULL AS INT) AS arr_n,
         CAST(nd AS INT) AS n_docs,
         true AS valid
       FROM rws ORDER BY id, doc, seq"""

  // ---------------------------------------------------------------
  // q244 — MODEL-CARD capstone (the round-18 YAML surfaces composed
  // into the real hub-card shape the r17 verdict motivated): one
  // front-matter fence carrying a plain-scalar license, a flow-seq
  // tags list, a literal block-scalar description, the canonical
  // model-index → results → metrics sequence-of-mappings nest at
  // depth 6, and a trailing root int. 42 documents (every seventh
  // with no front matter) sweep licenses, tag/metric variants and
  // 1-vs-2-metric lists; the assembled block-scalar value and every
  // nested path cross the hash gate.
  private val CardN = 42

  def q244(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.modelCardFixture(s, CardN)
    graft.operators.YamlLake.extractFrontMatter(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("has_fm"), col("valid"))
      .orderBy("id", "seq")
  }

  val q244Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 7 <> 6 AS fm, r % 2 = 0 AS ev
         FROM range(0, $CardN) g(r)),
       fixed AS (
         SELECT id, ev, CAST(unnest(range(0, 12)) AS INT) AS seq
         FROM base WHERE fm),
       fixedrows AS (
         SELECT id, seq,
           CASE seq WHEN 0 THEN 'license' WHEN 1 THEN 'tags'
             WHEN 2 THEN 'tags.0' WHEN 3 THEN 'tags.1'
             WHEN 4 THEN 'desc' WHEN 5 THEN 'model-index'
             WHEN 6 THEN 'model-index.0.name'
             WHEN 7 THEN 'model-index.0.results'
             WHEN 8 THEN 'model-index.0.results.0.task'
             WHEN 9 THEN 'model-index.0.results.0.metrics'
             WHEN 10 THEN 'model-index.0.results.0.metrics.0.type'
             ELSE 'model-index.0.results.0.metrics.0.value'
           END AS path,
           CASE WHEN seq IN (1, 5, 7, 9) THEN 'seq'
             WHEN seq = 11 THEN 'float' ELSE 'str' END AS kind,
           CAST(NULL AS BIGINT) AS lval,
           CASE seq WHEN 0 THEN list_extract(
               ['apache-2.0', 'mit', 'cc-by-4.0'], id % 3 + 1)
             WHEN 2 THEN 'nlp' WHEN 3 THEN 't' || (id % 4)
             WHEN 4 THEN 'Card c' || (id % 5) || chr(10) ||
               'line w' || (id % 3) || chr(10)
             WHEN 6 THEN 'm' || (id % 6)
             WHEN 8 THEN 'cls' || (id % 3)
             WHEN 10 THEN 'acc' END AS sval,
           CAST(CASE seq WHEN 11 THEN (7 * id) % 100 END AS BIGINT)
             AS fx100,
           CAST(CASE seq WHEN 1 THEN 2 WHEN 5 THEN 1 WHEN 7 THEN 1
             WHEN 9 THEN CASE WHEN ev THEN 2 ELSE 1 END END AS INT)
             AS arr_n
         FROM fixed),
       extra AS (
         SELECT id, CAST(12 + k AS INT) AS seq,
           'model-index.0.results.0.metrics.1.' ||
             CASE k WHEN 0 THEN 'type' ELSE 'value' END AS path,
           CASE k WHEN 0 THEN 'str' ELSE 'float' END AS kind,
           CAST(NULL AS BIGINT) AS lval,
           CASE k WHEN 0 THEN 'f1' END AS sval,
           CAST(CASE k WHEN 1 THEN (11 * id) % 100 END AS BIGINT)
             AS fx100,
           CAST(NULL AS INT) AS arr_n
         FROM (SELECT id, CAST(unnest(range(0, 2)) AS INT) AS k
               FROM base WHERE fm AND ev)),
       dl AS (
         SELECT id, CAST(CASE WHEN ev THEN 14 ELSE 12 END AS INT)
             AS seq,
           'downloads' AS path, 'int' AS kind,
           CAST(1000 + 3 * id AS BIGINT) AS lval,
           CAST(NULL AS VARCHAR) AS sval,
           CAST(NULL AS BIGINT) AS fx100, CAST(NULL AS INT) AS arr_n
         FROM base WHERE fm),
       nofm AS (
         SELECT id, CAST(0 AS INT) AS seq,
           CAST(NULL AS VARCHAR) AS path, CAST(NULL AS VARCHAR) AS kind,
           CAST(NULL AS BIGINT) AS lval, CAST(NULL AS VARCHAR) AS sval,
           CAST(NULL AS BIGINT) AS fx100, CAST(NULL AS INT) AS arr_n
         FROM base WHERE NOT fm),
       unioned AS (
         SELECT *, true AS has_fm FROM
           (SELECT * FROM fixedrows UNION ALL SELECT * FROM extra
            UNION ALL SELECT * FROM dl)
         UNION ALL
         SELECT *, false AS has_fm FROM nofm)
       SELECT id, seq, path, kind, lval, sval, fx100, arr_n, has_fm,
         true AS valid
       FROM unioned ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q245 — PROMPT LISTS (block scalars as DIRECT sequence items,
  // `- |` — the eval/training-config shape): the last block-scalar
  // position the subset rejected. 40 documents sweep all three
  // chompings x one-vs-two items x both sequence indent styles, with
  // assembled multi-line values crossing the hash gate verbatim and
  // an exact x100 float tail. Column/header strictness is spec-gated
  // in YamlLakeSpec.
  private val PromptsN = 40

  def q245(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.promptsFixture(s, PromptsN)
    graft.operators.YamlLake.extractYaml(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("valid"))
      .orderBy("id", "seq")
  }

  val q245Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 2 = 0 AS ev, r % 3 AS ch
         FROM range(0, $PromptsN) g(r)),
       v AS (
         SELECT id, ev, ch,
           'Ask q' || (id % 3) || ' w' || (id % 5) || chr(10) ||
             'more t' || ((3 * id) % 7) AS raw
         FROM base),
       rws AS (
         SELECT id, ev, ch, raw,
           CAST(unnest(range(0, CASE WHEN ev THEN 5 ELSE 4 END))
             AS INT) AS seq
         FROM v)
       SELECT id, seq,
         CASE WHEN seq = 0 THEN 'name' WHEN seq = 1 THEN 'prompts'
           WHEN seq = 2 THEN 'prompts.0'
           WHEN seq = 3 AND ev THEN 'prompts.1' ELSE 'temp' END AS path,
         CASE WHEN seq = 1 THEN 'seq'
           WHEN seq = (CASE WHEN ev THEN 4 ELSE 3 END) THEN 'float'
           ELSE 'str' END AS kind,
         CAST(NULL AS BIGINT) AS lval,
         CASE WHEN seq = 0 THEN 'p' || (id % 4)
           WHEN seq = 2 THEN
             CASE WHEN ch = 1 THEN raw ELSE raw || chr(10) END
           WHEN seq = 3 AND ev THEN 'Short s' || (id % 7) END AS sval,
         CAST(CASE WHEN seq = (CASE WHEN ev THEN 4 ELSE 3 END)
           THEN (1 + id % 3) * 100 + (id % 10) * 10 END AS BIGINT)
           AS fx100,
         CAST(CASE WHEN seq = 1 THEN CASE WHEN ev THEN 2 ELSE 1 END
           END AS INT) AS arr_n,
         true AS valid
       FROM rws ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q246 — PYPROJECT-shaped TOML (dotted table headers, string
  // arrays, [[array-of-tables]] — the three structures real
  // pyproject.toml / Cargo.toml files put their load-bearing
  // metadata in, all strict-rejected before round 18): [tool.fmt]
  // dotted headers, deps string arrays in both quote styles (the
  // empty [] staying the untyped arr census), and [[bin]] elements
  // landing under bin.<idx>. 40 documents; kind-conflict and
  // homogeneity strictness is spec-gated in TomlLakeSpec.
  private val PyprojN = 40

  def q246(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TomlLake.pyprojectFixture(s, PyprojN)
    graft.operators.TomlLake.extractToml(fx, "id", "media")
      .select(col("id"), col("seq"), col("tbl"), col("key"),
        col("kind"), col("lval"), col("sval"), col("fx100"),
        col("arr_n"), col("valid"))
      .orderBy("id", "seq")
  }

  val q246Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 3 AS nd, 1 + r % 2 AS nb
         FROM range(0, $PyprojN) g(r)),
       fixed AS (
         SELECT id, nd, CAST(unnest(range(0, 6)) AS INT) AS seq
         FROM base),
       fixedrows AS (
         SELECT id, seq,
           CASE WHEN seq = 0 THEN '' WHEN seq <= 3 THEN 'project'
             ELSE 'tool.fmt' END AS tbl,
           CASE seq WHEN 0 THEN 'title' WHEN 1 THEN 'name'
             WHEN 2 THEN 'version' WHEN 3 THEN 'deps'
             WHEN 4 THEN 'line' ELSE 'strict' END AS key,
           CASE seq WHEN 3 THEN
               CASE WHEN nd = 0 THEN 'arr' ELSE 'sarr' END
             WHEN 4 THEN 'int' WHEN 5 THEN 'bool'
             ELSE 'str' END AS kind,
           CAST(CASE seq WHEN 3 THEN CASE WHEN nd = 0 THEN 0 END
             WHEN 4 THEN 80 + id % 40
             WHEN 5 THEN CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END
             END AS BIGINT) AS lval,
           CASE seq WHEN 0 THEN 'pkg é' || (id % 7)
             WHEN 1 THEN 'p' || (id % 5)
             WHEN 2 THEN (id % 3) || '.' || (id % 10)
             WHEN 3 THEN CASE WHEN nd > 0 THEN array_to_string(
               ['lib' || ((id + j) % 6) for j in range(0, nd)],
               chr(31)) END
             END AS sval,
           CAST(NULL AS BIGINT) AS fx100,
           CAST(CASE seq WHEN 3 THEN nd END AS INT) AS arr_n
         FROM fixed),
       bins AS (
         SELECT id, t, CAST(unnest(range(0, 2)) AS INT) AS k FROM
           (SELECT id, CAST(unnest(range(0, nb)) AS INT) AS t
            FROM base)),
       binrows AS (
         SELECT id, CAST(6 + 2 * t + k AS INT) AS seq,
           'bin.' || t AS tbl,
           CASE k WHEN 0 THEN 'name' ELSE 'order' END AS key,
           CASE k WHEN 0 THEN 'str' ELSE 'int' END AS kind,
           CAST(CASE k WHEN 1 THEN (3 * id + 7 * t) % 50 END
             AS BIGINT) AS lval,
           CASE k WHEN 0 THEN 'b' || ((id + t) % 5) END AS sval,
           CAST(NULL AS BIGINT) AS fx100, CAST(NULL AS INT) AS arr_n
         FROM bins)
       SELECT id, seq, tbl, key, kind, lval, sval, fx100, arr_n,
         true AS valid
       FROM (SELECT * FROM fixedrows UNION ALL SELECT * FROM binrows)
       ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q247 — HUGO front matter (`+++` TOML fences — the other
  // static-site convention, composing q246's TOML surfaces the way
  // q232/q238 compose the YAML ones): a column-0 `+++` line is
  // unambiguous in the subset since multi-line strings are out. 40
  // text documents (every fifth with no front matter) sweep string
  // arrays in both quote styles, a [params] table and exact x100
  // scores. Fence strictness is spec-gated in TomlLakeSpec.
  private val HugoN = 40

  def q247(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TomlLake.hugoFixture(s, HugoN)
    graft.operators.TomlLake.extractFrontMatterToml(fx, "id", "media")
      .select(col("id"), col("seq"), col("tbl"), col("key"),
        col("kind"), col("lval"), col("sval"), col("fx100"),
        col("arr_n"), col("has_fm"), col("valid"))
      .orderBy("id", "seq")
  }

  val q247Sql: String =
    s"""WITH base AS (
         SELECT r AS id, r % 5 <> 4 AS fm, 1 + r % 2 AS ntag
         FROM range(0, $HugoN) g(r)),
       rws AS (
         SELECT id, ntag, CAST(unnest(range(0, 6)) AS INT) AS seq
         FROM base WHERE fm),
       fmrows AS (
         SELECT id, seq,
           CASE WHEN seq <= 3 THEN '' ELSE 'params' END AS tbl,
           CASE seq WHEN 0 THEN 'title' WHEN 1 THEN 'weight'
             WHEN 2 THEN 'draft' WHEN 3 THEN 'tags'
             WHEN 4 THEN 'author' ELSE 'score' END AS key,
           CASE seq WHEN 0 THEN 'str' WHEN 1 THEN 'int'
             WHEN 2 THEN 'bool' WHEN 3 THEN 'sarr' WHEN 4 THEN 'str'
             ELSE 'float' END AS kind,
           CAST(CASE seq WHEN 1 THEN 10 + id % 20
             WHEN 2 THEN CASE WHEN id % 3 = 0 THEN 1 ELSE 0 END
             END AS BIGINT) AS lval,
           CASE seq WHEN 0 THEN 'Post é' || (id % 7)
             WHEN 3 THEN array_to_string(
               ['t' || ((id + j) % 4) for j in range(0, ntag)],
               chr(31))
             WHEN 4 THEN 'a' || (id % 6) END AS sval,
           CAST(CASE seq WHEN 5 THEN (1 + id % 4) * 100 + (9 * id) % 100
             END AS BIGINT) AS fx100,
           CAST(CASE seq WHEN 3 THEN ntag END AS INT) AS arr_n,
           true AS has_fm
         FROM rws),
       nofm AS (
         SELECT id, CAST(0 AS INT) AS seq, CAST(NULL AS VARCHAR) AS tbl,
           CAST(NULL AS VARCHAR) AS key, CAST(NULL AS VARCHAR) AS kind,
           CAST(NULL AS BIGINT) AS lval, CAST(NULL AS VARCHAR) AS sval,
           CAST(NULL AS BIGINT) AS fx100, CAST(NULL AS INT) AS arr_n,
           false AS has_fm
         FROM base WHERE NOT fm)
       SELECT id, seq, tbl, key, kind, lval, sval, fx100, arr_n,
         has_fm, true AS valid
       FROM (SELECT * FROM fmrows UNION ALL SELECT * FROM nofm)
       ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q248 — DOCKERFILE census (the build layer of code corpora —
  // base-image / stage / port facts are what licensing, security and
  // provenance audits group on): logical-line continuations, the
  // only-ARG-precedes-FROM law, multi-stage FROM ... AS with unique
  // stage names, EXPOSE port censuses, ENV pair grammar with quoted
  // values. 40 files sweep pre-FROM ARGs, two-segment RUN
  // continuations, one-vs-two stages and tagged/untagged images.
  // Structural strictness is spec-gated in DockerLakeSpec.
  private val DockerN = 40

  def q248(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.DockerLake.dockerFixture(s, DockerN)
    graft.operators.DockerLake.extractDocker(fx, "id", "media")
      .select(col("id"), col("seq"), col("stage"), col("instr"),
        col("image"), col("tag"), col("stage_name"), col("n_parts"),
        col("lsum"), col("args"), col("valid"))
      .orderBy("id", "seq")
  }

  val q248Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE WHEN r % 4 = 0 THEN 1 ELSE 0 END AS a,
           CASE WHEN r % 2 = 0 THEN 1 ELSE 0 END AS b
         FROM range(0, $DockerN) g(r)),
       argrows AS (
         SELECT id, CAST(0 AS INT) AS seq, CAST(-1 AS INT) AS stage,
           'ARG' AS instr, CAST(NULL AS VARCHAR) AS image,
           CAST(NULL AS VARCHAR) AS tag,
           CAST(NULL AS VARCHAR) AS stage_name,
           CAST(1 AS INT) AS n_parts, CAST(NULL AS BIGINT) AS lsum,
           'BASE=u' || (id % 3) AS args
         FROM base WHERE a = 1),
       fromrows AS (
         SELECT id, CAST(a AS INT), CAST(0 AS INT), 'FROM',
           'img' || (id % 5), 'v' || (id % 3), 'build',
           CAST(NULL AS INT), CAST(NULL AS BIGINT),
           'img' || (id % 5) || ':v' || (id % 3) || ' AS build'
         FROM base),
       runrows AS (
         SELECT id, CAST(a + 1 AS INT), CAST(0 AS INT), 'RUN',
           NULL, NULL, NULL, CAST(NULL AS INT), CAST(NULL AS BIGINT),
           'apk add pkg' || (id % 7) || ' && echo done' || (id % 4)
         FROM base),
       envrows AS (
         SELECT id, CAST(a + 2 AS INT), CAST(0 AS INT), 'ENV',
           NULL, NULL, NULL, CAST(2 AS INT), CAST(NULL AS BIGINT),
           'K' || (id % 3) || '=v' || (id % 5) || ' MODE="m ' ||
             (id % 2) || '"'
         FROM base),
       exposerows AS (
         SELECT id, CAST(a + 3 AS INT), CAST(0 AS INT), 'EXPOSE',
           NULL, NULL, NULL, CAST(2 AS INT),
           CAST(17000 + id % 10 + id % 7 AS BIGINT),
           (8000 + id % 10) || ' ' || (9000 + id % 7) || '/tcp'
         FROM base),
       from2rows AS (
         SELECT id, CAST(a + 4 AS INT), CAST(1 AS INT), 'FROM',
           'img' || ((id + 1) % 5), NULL, NULL,
           CAST(NULL AS INT), CAST(NULL AS BIGINT),
           'img' || ((id + 1) % 5)
         FROM base WHERE b = 1),
       copyrows AS (
         SELECT id, CAST(a + 5 AS INT), CAST(1 AS INT), 'COPY',
           NULL, NULL, NULL, CAST(NULL AS INT), CAST(NULL AS BIGINT),
           '--from=build /a /b' || (id % 3)
         FROM base WHERE b = 1),
       cmdrows AS (
         SELECT id, CAST(a + 4 + 2 * b AS INT), CAST(b AS INT), 'CMD',
           NULL, NULL, NULL, CAST(NULL AS INT), CAST(NULL AS BIGINT),
           '["run", "r' || (id % 6) || '"]'
         FROM base)
       SELECT id, seq, stage, instr, image, tag, stage_name, n_parts,
         lsum, args, true AS valid
       FROM (SELECT * FROM argrows UNION ALL SELECT * FROM fromrows
         UNION ALL SELECT * FROM runrows UNION ALL SELECT * FROM envrows
         UNION ALL SELECT * FROM exposerows
         UNION ALL SELECT * FROM from2rows
         UNION ALL SELECT * FROM copyrows
         UNION ALL SELECT * FROM cmdrows)
       ORDER BY id, seq"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_safetensors_extract" -> (q203 _),
    "q204_npy_extract" -> (q204 _),
    "q205_gguf_extract" -> (q205 _),
    "q206_avro_extract" -> (q206 _),
    "q207_sqlite_extract" -> (q207 _),
    "q208_torch_checkpoint" -> (q208 _),
    "q209_msgpack_extract" -> (q209 _),
    "q210_midi_extract" -> (q210 _),
    "q211_bmp_decode" -> (q211 _),
    "q212_image_mixed_neardup" -> (q212 _),
    "q213_rtf_extract" -> (q213 _),
    "q214_proto_census" -> (q214 _),
    "q215_tensor_catalog" -> (q215 _),
    "q216_toml_extract" -> (q216 _),
    "q217_onnx_extract" -> (q217 _),
    "q218_webp_decode" -> (q218 _),
    "q219_mp3_intensity_stereo" -> (q219 _),
    "q220_mp1_intensity_stereo" -> (q220 _),
    "q221_mp2_intensity_stereo" -> (q221 _),
    "q222_tiff_decode" -> (q222 _),
    "q223_image_mixed4_neardup" -> (q223 _),
    "q224_parquet_meta" -> (q224 _),
    "q225_ogg_catalog" -> (q225 _),
    "q226_ebml_catalog" -> (q226 _),
    "q227_ogg_tags" -> (q227 _),
    "q228_arrow_ipc" -> (q228 _),
    "q229_media_catalog" -> (q229 _),
    "q230_csv_sniff" -> (q230 _),
    "q231_yaml_extract" -> (q231 _),
    "q232_front_matter" -> (q232 _),
    "q233_csv_extract" -> (q233 _),
    "q234_opus_toc" -> (q234 _),
    "q235_arrow_dict" -> (q235 _),
    "q236_parquet_pages" -> (q236 _),
    "q237_arrow_stream" -> (q237 _),
    "q238_block_scalars" -> (q238 _),
    "q239_tiff_multipage" -> (q239 _),
    "q240_flow_mappings" -> (q240 _),
    "q241_page_dedup" -> (q241 _),
    "q242_seq_mappings" -> (q242 _),
    "q243_yaml_stream" -> (q243 _),
    "q244_model_cards" -> (q244 _),
    "q245_prompt_lists" -> (q245 _),
    "q246_pyproject_toml" -> (q246 _),
    "q247_hugo_front_matter" -> (q247 _),
    "q248_dockerfile_census" -> (q248 _)
  )

  val oracles: Map[String, String] = Map(
    "q203_safetensors_extract" -> q203Sql,
    "q204_npy_extract" -> q204Sql,
    "q205_gguf_extract" -> q205Sql,
    "q206_avro_extract" -> q206Sql,
    "q207_sqlite_extract" -> q207Sql,
    "q208_torch_checkpoint" -> q208Sql,
    "q209_msgpack_extract" -> q209Sql,
    "q210_midi_extract" -> q210Sql,
    "q211_bmp_decode" -> q211Sql,
    "q212_image_mixed_neardup" -> q212Sql,
    "q213_rtf_extract" -> q213Sql,
    "q214_proto_census" -> q214Sql,
    "q215_tensor_catalog" -> q215Sql,
    "q216_toml_extract" -> q216Sql,
    "q217_onnx_extract" -> q217Sql,
    "q218_webp_decode" -> q218Sql,
    "q219_mp3_intensity_stereo" -> q219Sql,
    "q220_mp1_intensity_stereo" -> q220Sql,
    "q221_mp2_intensity_stereo" -> q221Sql,
    "q222_tiff_decode" -> q222Sql,
    "q223_image_mixed4_neardup" -> q223Sql,
    "q224_parquet_meta" -> q224Sql,
    "q225_ogg_catalog" -> q225Sql,
    "q226_ebml_catalog" -> q226Sql,
    "q227_ogg_tags" -> q227Sql,
    "q228_arrow_ipc" -> q228Sql,
    "q229_media_catalog" -> q229Sql,
    "q230_csv_sniff" -> q230Sql,
    "q231_yaml_extract" -> q231Sql,
    "q232_front_matter" -> q232Sql,
    "q233_csv_extract" -> q233Sql,
    "q234_opus_toc" -> q234Sql,
    "q235_arrow_dict" -> q235Sql,
    "q236_parquet_pages" -> q236Sql,
    // the stream fixture carries the q235 laws verbatim
    "q237_arrow_stream" -> q235Sql,
    "q238_block_scalars" -> q238Sql,
    "q239_tiff_multipage" -> q239Sql,
    "q240_flow_mappings" -> q240Sql,
    "q241_page_dedup" -> q241Sql,
    "q242_seq_mappings" -> q242Sql,
    "q243_yaml_stream" -> q243Sql,
    "q244_model_cards" -> q244Sql,
    "q245_prompt_lists" -> q245Sql,
    "q246_pyproject_toml" -> q246Sql,
    "q247_hugo_front_matter" -> q247Sql,
    "q248_dockerfile_census" -> q248Sql
  )
}
