package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Dtdl

/** O22 as an oracle-gated query: DTDL catalog lookup by
  * (board_id, fw_id) with the reference's custom-over-builtin
  * precedence and case-insensitive id matching
  * (`pnpl!DTDL/device_template_manager.py:138-198`).
  *
  * Shape mirrors the reference's deployment: a SMALL template catalog
  * (the reference ships ~40 device templates; this fixture has 13)
  * against MANY devices. The catalog JSON is generated closed-form,
  * parsed through the real [[Dtdl.parseTemplate]] on the driver (the
  * catalog-load contract — bounded, exactly like the reference's
  * in-process template manager), and the per-device resolution is the
  * distributed half: catalog-side precedence collapse (one tiny
  * aggregate) followed by a BROADCAST left join — at 100 TB of device
  * rows the catalog stays a broadcast variable and the join is
  * shuffle-free.
  *
  * The oracle regenerates every parsed statistic (component count,
  * property count, writable count) from the same index formulas in
  * SQL — a parser bug anywhere (component wiring, property lists,
  * writable flags, Enum/Object schema branches) diverges the stats
  * and fails the hash gate.
  */
object DtdlQueries {

  /** Builtin template k (k in 0..9), keyed (B{k%5}, F{k/5}):
    * 1+(k%3) components; component j has 2+((k+j)%3) properties;
    * property p is writable iff (k+j+p) is even. Property schemas
    * cycle scalar double/integer, then an Object and an Enum — the
    * complex branches parse inside the gated path too. */
  private[queries] def builtinJson(k: Int): String = {
    val tplId = s"dtmi:graft:catalog:tpl$k;1"
    val nComp = 1 + (k % 3)
    val comps = (0 until nComp).map { j =>
      s"""{"@type":"Component","name":"comp$j","schema":"dtmi:graft:catalog:tpl$k:c$j;1"}"""
    }.mkString(",")
    val compDocs = (0 until nComp).map { j =>
      val nProp = 2 + ((k + j) % 3)
      val props = (0 until nProp).map { p =>
        val schema = p % 4 match {
          case 0 => "\"double\""
          case 1 => "\"integer\""
          case 2 =>
            """{"@type":"Object","fields":[{"name":"x","schema":"double"},{"name":"y","schema":"double"}]}"""
          case _ =>
            """{"@type":"Enum","valueSchema":"integer","enumValues":[{"name":"off","enumValue":0},{"name":"on","enumValue":1}]}"""
        }
        val writable = (k + j + p) % 2 == 0
        s"""{"@type":"Property","name":"p$p","schema":$schema,"writable":$writable}"""
      }.mkString(",")
      s"""{"@id":"dtmi:graft:catalog:tpl$k:c$j;1","@type":"Interface","contents":[$props]}"""
    }.mkString(",")
    s"""[{"@id":"$tplId","@type":"Interface","contents":[$comps]},$compDocs]"""
  }

  /** Custom template k (k in 0..2), keyed (B{k}, F0) — overrides the
    * builtin entry at the same key: 2 components; component j has
    * k+1 properties, writable iff j == 0. */
  private[queries] def customJson(k: Int): String = {
    val tplId = s"dtmi:graft:custom:tpl$k;1"
    val comps = (0 until 2).map { j =>
      s"""{"@type":"Component","name":"comp$j","schema":"dtmi:graft:custom:tpl$k:c$j;1"}"""
    }.mkString(",")
    val compDocs = (0 until 2).map { j =>
      val props = (0 until (k + 1)).map { p =>
        s"""{"@type":"Property","name":"p$p","schema":"string","writable":${j == 0}}"""
      }.mkString(",")
      s"""{"@id":"dtmi:graft:custom:tpl$k:c$j;1","@type":"Interface","contents":[$props]}"""
    }.mkString(",")
    s"""[{"@id":"$tplId","@type":"Interface","contents":[$comps]},$compDocs]"""
  }

  /** q68: resolve 200 devices (lowercase board/fw ids — the match is
    * case-insensitive) against the parsed catalog; unmatched devices
    * surface as src='none' with zero counts (no NULLs — the driver
    * hashes through pandas, where a nullable BIGINT degrades to
    * float64). */
  def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def stats(json: String): (String, Long, Long, Long) = {
      val t = Dtdl.parseTemplate(json)
      (t.id,
        t.components.size.toLong,
        t.components.values.map(_.properties.size).sum.toLong,
        t.components.values.map(_.properties.count(_.writable)).sum.toLong)
    }
    val builtin = (0 until 10).map { k =>
      val (id, nc, np, nw) = stats(builtinJson(k))
      (s"B${k % 5}", s"F${k / 5}", 1, id, "builtin", nc, np, nw)
    }
    val custom = (0 until 3).map { k =>
      val (id, nc, np, nw) = stats(customJson(k))
      (s"B$k", "F0", 0, id, "custom", nc, np, nw)
    }
    val cat = (custom ++ builtin).toDF(
      "cb", "cf", "prio", "template_id", "src",
      "n_components", "n_props", "n_writable")
    // precedence collapse BEFORE the device join: min_by(prio) keeps
    // the custom row where both exist — one row per (board, fw) key
    val resolved = cat.groupBy("cb", "cf")
      .agg(min_by(
        struct("template_id", "src", "n_components", "n_props", "n_writable"),
        col("prio")).as("r"))
      .select(col("cb"), col("cf"), col("r.*"))
    val devices = s.range(200).select(
      col("id").as("device_id"),
      concat(lit("b"), col("id") % 6).as("board_id"),
      concat(lit("f"), col("id") % 3).as("fw_id"))
    devices
      .join(broadcast(resolved),
        upper(col("board_id")) === col("cb") && upper(col("fw_id")) === col("cf"),
        "left")
      .select(
        col("device_id"), col("board_id"), col("fw_id"),
        coalesce(col("template_id"), lit("NONE")).as("template_id"),
        coalesce(col("src"), lit("none")).as("src"),
        coalesce(col("n_components"), lit(0L)).as("n_components"),
        coalesce(col("n_props"), lit(0L)).as("n_props"),
        coalesce(col("n_writable"), lit(0L)).as("n_writable"))
      .orderBy("device_id")
  }

  // writable count per component: props p in 0..n-1 with (k+j+p) even
  // = (n + 1 - (k+j)%2) // 2 (ceil(n/2) at even k+j, floor at odd)
  val q68Sql: String =
    """WITH builtin AS (
         SELECT 'B'||CAST(k%5 AS VARCHAR) AS board_id,
                'F'||CAST(k//5 AS VARCHAR) AS fw_id, 1 AS prio,
                'dtmi:graft:catalog:tpl'||CAST(k AS VARCHAR)||';1' AS template_id,
                'builtin' AS src,
                CAST(1+(k%3) AS BIGINT) AS n_components,
                CAST(list_sum([2+((k+j)%3) for j in range(0, 1+(k%3))]) AS BIGINT) AS n_props,
                CAST(list_sum([(2+((k+j)%3) + 1 - ((k+j)%2)) // 2 for j in range(0, 1+(k%3))]) AS BIGINT) AS n_writable
         FROM range(10) t(k)),
       custom AS (
         SELECT 'B'||CAST(k AS VARCHAR) AS board_id, 'F0' AS fw_id, 0 AS prio,
                'dtmi:graft:custom:tpl'||CAST(k AS VARCHAR)||';1' AS template_id,
                'custom' AS src,
                CAST(2 AS BIGINT) AS n_components,
                CAST(2*(k+1) AS BIGINT) AS n_props,
                CAST(k+1 AS BIGINT) AS n_writable
         FROM range(3) t(k)),
       resolved AS (
         SELECT * FROM (SELECT * FROM custom UNION ALL SELECT * FROM builtin)
         QUALIFY row_number() OVER (PARTITION BY board_id, fw_id ORDER BY prio) = 1),
       devices AS (
         SELECT i AS device_id, 'b'||CAST(i%6 AS VARCHAR) AS board_id,
                'f'||CAST(i%3 AS VARCHAR) AS fw_id
         FROM range(200) t(i))
       SELECT d.device_id, d.board_id, d.fw_id,
              coalesce(c.template_id, 'NONE') AS template_id,
              coalesce(c.src, 'none') AS src,
              CAST(coalesce(c.n_components, 0) AS BIGINT) AS n_components,
              CAST(coalesce(c.n_props, 0) AS BIGINT) AS n_props,
              CAST(coalesce(c.n_writable, 0) AS BIGINT) AS n_writable
       FROM devices d
       LEFT JOIN resolved c
         ON upper(d.board_id) = c.board_id AND upper(d.fw_id) = c.fw_id
       ORDER BY d.device_id"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_dtdl_catalog" -> (q68 _))

  val oracles: Map[String, String] = Map(
    "q68_dtdl_catalog" -> q68Sql)
}
