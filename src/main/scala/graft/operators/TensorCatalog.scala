package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixed-format tensor/model-artifact catalog: magic-byte sniff +
  * dispatch over the five weight-container formats a model-hub crawl
  * actually yields — GGUF, SafeTensors, NPY, PyTorch zip checkpoints,
  * ONNX — unified onto one (id, fmt, seq, name, n_elems, sig) schema.
  * The tensor twin of [[DocCatalog]] (q186) and the audio catalog
  * (q154): blob format labels can't be trusted, so the FIRST
  * operator a real lake runs is a sniffer.
  *
  * Sniff precedence (first match wins; the safetensors and ONNX
  * shapes have no leading magic, so they are guarded fallbacks):
  * `GGUF` → GgufLake; `NUMPY` → TensorLake.extractNpy; `PK` →
  * TorchLake; an 8-byte LE header length whose 9th byte opens a JSON
  * object → TensorLake.extractSafetensors; a leading 0x08 byte (the
  * ModelProto ir_version tag — bare protobuf has no magic) →
  * OnnxLake; anything else (or a sniffed format whose STRICT
  * extractor then rejects) → one valid=false census row, never an
  * error. The two guarded fallbacks can in principle collide (a
  * safetensors header of exactly 8+256k bytes starts 0x08; an ONNX
  * blob could carry '{' at offset 8) — the '{' check runs first and
  * either way the strict loser-parse flags rather than lies.
  *
  * `sig` pins content per family: the md5 digests the Catalyst
  * extractors compute (SafeTensors/NPY), the integer-exact decoded
  * value sums of the byte-walk extractors (GGUF/Torch/ONNX) — so the
  * catalog is still a CONTENT gate, not just a router. */
object TensorCatalog {

  private def sniff(bin: Column): Column =
    when(bin.isNull || length(bin) < 12, "unknown")
      .when(substring(bin, 1, 4) ===
        lit("GGUF".getBytes("US-ASCII")), "gguf")
      .when(substring(bin, 1, 6) ===
        lit(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')), "npy")
      .when(substring(bin, 1, 2) === lit("PK".getBytes("US-ASCII")), "torch")
      .when(substring(bin, 9, 1) === lit("{".getBytes("US-ASCII")),
        "safetensors")
      .when(substring(bin, 1, 1) === lit(Array[Byte](0x08)), "onnx")
      .otherwise("unknown")

  /** One row per tensor (or flagged file) across all five formats. */
  def catalogTensors(df: DataFrame, idCol: String, binCol: String)
    : DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(binCol).as("media"))
      .withColumn("fmt", sniff(col("media")))

    val gguf = GgufLake
      .extractGguf(base.where(col("fmt") === "gguf"), "id", "media")
      .select(col("id"), lit("gguf").as("fmt"), col("tidx").as("seq"),
        col("name"),
        col("numel").as("n_elems"),
        when(col("valid"),
          col("value_sum").cast("long").cast("string")).as("sig"),
        col("valid"))
    val st = TensorLake
      .extractSafetensors(base.where(col("fmt") === "safetensors"),
        "id", "media")
      .select(col("id"), lit("safetensors").as("fmt"),
        // fixture names are 't<k>'; try_cast keeps arbitrary names
        // ANSI-safe (null seq, order still pinned by name)
        substring(col("name"), 2, 8).try_cast("int").as("seq"), col("name"),
        col("n_elems"), col("digest").as("sig"), col("valid"))
    val npy = TensorLake
      .extractNpy(base.where(col("fmt") === "npy"), "id", "media")
      .select(col("id"), lit("npy").as("fmt"),
        when(col("valid"), lit(0)).as("seq"),
        when(col("valid"), lit("")).as("name"),
        col("n_elems"), col("digest").as("sig"), col("valid"))
    val th = TorchLake
      .extractCheckpoint(base.where(col("fmt") === "torch"), "id", "media")
      .select(col("id"), lit("torch").as("fmt"), col("tidx").as("seq"),
        col("tname").as("name"), col("nelem").as("n_elems"),
        when(col("valid"),
          col("value_sum").cast("long").cast("string")).as("sig"),
        col("valid"))
    val onnx = OnnxLake
      .extractOnnx(base.where(col("fmt") === "onnx"), "id", "media")
      .select(col("id"), lit("onnx").as("fmt"), col("tidx").as("seq"),
        col("tname").as("name"), col("nelem").as("n_elems"),
        when(col("valid"),
          col("value_sum").cast("long").cast("string")).as("sig"),
        col("valid"))
    val unknown = base.where(col("fmt") === "unknown")
      .select(col("id"), lit("unknown").as("fmt"),
        lit(null).cast("int").as("seq"),
        lit(null).cast("string").as("name"),
        lit(null).cast("long").as("n_elems"),
        lit(null).cast("string").as("sig"), lit(false).as("valid"))

    gguf.union(st).union(npy).union(th).union(onnx).union(unknown)
  }

  /** Fixture: the five family fixtures interleaved as id = 5m + f
    * (f = 0 gguf, 1 safetensors, 2 npy, 3 torch, 4 onnx) so every
    * partition carries every format; each family keeps its own laws. */
  def tensorCatalogFixture(spark: org.apache.spark.sql.SparkSession,
      perFmt: Int): DataFrame = {
    def remap(df: DataFrame, f: Int): DataFrame =
      df.select((col("id") * 5 + f).as("id"), col("media"))
    remap(GgufLake.ggufFixture(spark, perFmt), 0)
      .union(remap(TensorLake.safetensorsFixture(spark, perFmt), 1))
      .union(remap(TensorLake.npyFixture(spark, perFmt), 2))
      .union(remap(TorchLake.torchFixture(spark, perFmt), 3))
      .union(remap(OnnxLake.onnxFixture(spark, perFmt), 4))
  }
}
