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

  // ---------------------------------------------------------------
  // q250 — YAML anchors / aliases / merge keys (the docker-compose
  // and GitLab-CI reuse idiom — the r18 verdict's #2 gap): `&name`
  // on mapping/sequence/scalar nodes, `*name` replay re-rooted at
  // the target path, and `<<: *name` merge with local-key precedence
  // (merged entries emit at mapping close in anchor order, so a
  // local override AFTER the merge line still wins). Cycles,
  // undefined aliases, duplicate anchors and the expansion budget
  // are spec-gated in YamlLakeSpec.
  private val AnchorsN = 40

  def q250(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.YamlLake.anchorsFixture(s, AnchorsN)
    graft.operators.YamlLake.extractYaml(fx, "id", "media")
      .select(col("id"), col("seq"), col("path"), col("kind"),
        col("lval"), col("sval"), col("fx100"), col("arr_n"),
        col("valid"))
      .orderBy("id", "seq")
  }

  val q250Sql: String =
    s"""WITH g AS (
         SELECT r AS id, CAST(unnest(range(0, 18)) AS INT) AS seq,
           r % 2 = 0 AS ev
         FROM range(0, $AnchorsN) t(r)),
       rows0 AS (
         SELECT id, seq,
           CASE seq WHEN 0 THEN 'defaults.image'
             WHEN 1 THEN 'defaults.retries' WHEN 2 THEN 'defaults.ping'
             WHEN 3 THEN 'svc_a.port'
             WHEN 4 THEN CASE WHEN ev THEN 'svc_a.retries'
               ELSE 'svc_a.image' END
             WHEN 5 THEN CASE WHEN ev THEN 'svc_a.image'
               ELSE 'svc_a.retries' END
             WHEN 6 THEN 'svc_a.ping' WHEN 7 THEN 'svc_b.image'
             WHEN 8 THEN 'svc_b.retries' WHEN 9 THEN 'svc_b.ping'
             WHEN 10 THEN 'motto' WHEN 11 THEN 'again'
             WHEN 12 THEN 'nums' WHEN 13 THEN 'nums.0'
             WHEN 14 THEN 'nums.1' WHEN 15 THEN 'copy'
             WHEN 16 THEN 'copy.0' ELSE 'copy.1' END AS path,
           CASE WHEN seq IN (2, 6, 9) THEN 'float'
             WHEN seq IN (12, 15) THEN 'seq'
             WHEN seq IN (1, 3, 8, 13, 16) THEN 'int'
             WHEN seq = 4 THEN CASE WHEN ev THEN 'int' ELSE 'str' END
             WHEN seq = 5 THEN CASE WHEN ev THEN 'str' ELSE 'int' END
             ELSE 'str' END AS kind,
           CAST(CASE seq WHEN 1 THEN id % 4 WHEN 3 THEN 8000 + id % 20
             WHEN 4 THEN CASE WHEN ev THEN 50 + id % 6 END
             WHEN 5 THEN CASE WHEN NOT ev THEN id % 4 END
             WHEN 8 THEN id % 4
             WHEN 13 THEN (3 * id) % 40 WHEN 16 THEN (3 * id) % 40
             END AS BIGINT) AS lval,
           CASE seq WHEN 0 THEN 'img' || (id % 5)
             WHEN 4 THEN CASE WHEN NOT ev THEN 'img' || (id % 5) END
             WHEN 5 THEN CASE WHEN ev THEN 'img' || (id % 5) END
             WHEN 7 THEN 'alt' || (id % 3)
             WHEN 10 THEN 'go ' || (id % 7) WHEN 11 THEN 'go ' || (id % 7)
             WHEN 14 THEN 'n' || (id % 9) WHEN 17 THEN 'n' || (id % 9)
             END AS sval,
           CAST(CASE WHEN seq IN (2, 6, 9)
             THEN (1 + id % 3) * 100 + (7 * id) % 100
             END AS BIGINT) AS fx100,
           CAST(CASE WHEN seq IN (12, 15) THEN 2 END AS INT) AS arr_n
         FROM g)
       SELECT id, seq, path, kind, lval, sval, fx100, arr_n,
         true AS valid
       FROM rows0
       ORDER BY id, seq"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q249_docker_stage_graph" -> (q249 _),
    "q250_yaml_anchors" -> (q250 _)
  )

  val oracles: Map[String, String] = Map(
    "q249_docker_stage_graph" -> q249Sql,
    "q250_yaml_anchors" -> q250Sql
  )
}
