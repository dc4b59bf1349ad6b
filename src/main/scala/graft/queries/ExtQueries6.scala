package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 extension queries: the Dockerfile stage graph (exec-form
  * argv + `COPY --from` edges), YAML anchors/aliases/merge keys, the
  * PEP 508 dependency census, and the GitHub-Actions workflow
  * capstone. Same contract as every registry query: a closed-form
  * fixture law the DuckDB oracle replays exactly, ORDER BY over a
  * unique key prefix, column names matched to the oracle SQL. */
object ExtQueries6 {

  // ---------------------------------------------------------------
  // q249 — DOCKERFILE exec form + stage graph (the r18 verdict's #1
  // named gap on the freshest surface): JSON-array argv censuses for
  // CMD/ENTRYPOINT/RUN/SHELL and `COPY --from=<stage|index>` edges
  // resolved through the AS table — the (stage, from_stage) pairs
  // ARE the build graph a provenance audit queries. Strictness
  // (unterminated array, non-string element, unknown stage, forward
  // reference) is spec-gated in DockerLakeSpec.
  private val GraphN = 40

  // a literal backslash for oracle SQL bodies: the s-interpolator
  // processes \" even inside triple quotes, so \ must arrive via
  // interpolation to survive into the SQL text
  private val Bs = "\\"

  def q249(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.DockerLake.dockerGraphFixture(s, GraphN)
    graft.operators.DockerLake.extractDocker(fx, "id", "media")
      .select(col("id"), col("seq"), col("stage"), col("instr"),
        col("image"), col("tag"), col("stage_name"), col("argv_n"),
        col("from_stage"), col("args"), col("valid"))
      .orderBy("id", "seq")
  }

  val q249Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE WHEN r % 4 = 0 THEN 1 ELSE 0 END AS a
         FROM range(0, $GraphN) g(r)),
       r0 AS (
         SELECT id, CAST(0 AS INT) AS seq, CAST(0 AS INT) AS stage,
           'FROM' AS instr, 'base' || (id % 4) AS image,
           'v' || (id % 3) AS tag, 's0' AS stage_name,
           CAST(NULL AS INT) AS argv_n, CAST(NULL AS INT) AS from_stage,
           'base' || (id % 4) || ':v' || (id % 3) || ' AS s0' AS args
         FROM base),
       r1 AS (
         SELECT id, CAST(1 AS INT), CAST(0 AS INT), 'RUN',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR),
           CAST(CASE WHEN id % 2 = 0 THEN 3 END AS INT),
           CAST(NULL AS INT),
           CASE WHEN id % 2 = 0
             THEN '["sh", "-c", "echo r' || (id % 5) || '"]'
             ELSE 'echo r' || (id % 5) END
         FROM base),
       r2 AS (
         SELECT id, CAST(2 AS INT), CAST(0 AS INT), 'SHELL',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(2 AS INT), CAST(NULL AS INT),
           '["shl' || (id % 3) || '", "-c"]'
         FROM base WHERE a = 1),
       r3 AS (
         SELECT id, CAST(2 + a AS INT), CAST(1 AS INT), 'FROM',
           'mid' || (id % 5), CAST(NULL AS VARCHAR), 's1',
           CAST(NULL AS INT), CAST(NULL AS INT),
           'mid' || (id % 5) || ' AS s1'
         FROM base),
       r4 AS (
         SELECT id, CAST(3 + a AS INT), CAST(1 AS INT), 'COPY',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(0 AS INT),
           '--from=s0 /a /m' || (id % 3)
         FROM base),
       r5 AS (
         SELECT id, CAST(4 + a AS INT), CAST(1 AS INT), 'ENTRYPOINT',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR),
           CAST(CASE WHEN id % 5 = 2 THEN 3 ELSE 2 END AS INT),
           CAST(NULL AS INT),
           '["run", "e' || (id % 6) || '"' ||
             CASE WHEN id % 5 = 2 THEN ', "say $Bs"hi$Bs""' ELSE '' END
             || ']'
         FROM base),
       r6 AS (
         SELECT id, CAST(5 + a AS INT), CAST(2 AS INT), 'FROM',
           'out' || (id % 3), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT),
           'out' || (id % 3)
         FROM base),
       r7 AS (
         SELECT id, CAST(6 + a AS INT), CAST(2 AS INT), 'COPY',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(1 AS INT),
           '--from=1 /b /c'
         FROM base),
       r8 AS (
         SELECT id, CAST(7 + a AS INT), CAST(2 AS INT), 'COPY',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(0 AS INT),
           '--from=s0 /d /e' || (id % 2)
         FROM base),
       r9 AS (
         SELECT id, CAST(8 + a AS INT), CAST(2 AS INT), 'CMD',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(2 AS INT), CAST(NULL AS INT),
           '["go", "c' || (id % 7) || '"]'
         FROM base)
       SELECT id, seq, stage, instr, image, tag, stage_name, argv_n,
         from_stage, args, true AS valid
       FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1
         UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
         UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
         UNION ALL SELECT * FROM r6 UNION ALL SELECT * FROM r7
         UNION ALL SELECT * FROM r8 UNION ALL SELECT * FROM r9)
       ORDER BY id, seq"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q249_docker_stage_graph" -> (q249 _)
  )

  val oracles: Map[String, String] = Map(
    "q249_docker_stage_graph" -> q249Sql
  )
}
