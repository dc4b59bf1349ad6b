package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Dtdl
import graft.plans.TransformChain

class DtdlChainSpec extends SparkSpec {

  private val dtdl =
    """[
      |{"@id":"dtmi:appconfig:board;1","@type":"Interface","contents":[
      |  {"@type":"Component","name":"acc","schema":"dtmi:sensors:acc;6"},
      |  {"@type":"Component","name":"temp","schema":"dtmi:sensors:temp;2"}]},
      |{"@id":"dtmi:sensors:acc;6","@type":"Interface","contents":[
      |  {"@type":"Property","name":"odr","writable":true,
      |   "schema":{"@type":"Enum","valueSchema":"integer","enumValues":[
      |     {"name":"hz26667","enumValue":0}]}},
      |  {"@type":"Property","name":"enable","writable":true,"schema":"boolean"},
      |  {"@type":"Property","name":"sensitivity","schema":"double"},
      |  {"@type":"Property","name":"dim","schema":"integer"},
      |  {"@type":"Property","name":"annotation","schema":"string"},
      |  {"@type":"Property","name":"range","schema":{"@type":"Object","fields":[
      |     {"name":"lo","schema":"double"},{"name":"hi","schema":"double"}]}}]},
      |{"@id":"dtmi:sensors:temp;2","@type":"Interface","contents":[
      |  {"@type":"Property","name":"odr","schema":"double"}]}
      |]""".stripMargin

  test("DTDL parse: root detection, component map, schema mapping (O22)") {
    val t = Dtdl.parseTemplate(dtdl)
    assert(t.id == "dtmi:appconfig:board;1")
    assert(t.components.keySet == Set("acc", "temp"))
    val acc = t.components("acc")
    val types = acc.properties.map(p => p.name -> p.dataType).toMap
    assert(types("odr") == IntegerType) // Enum → ordinal
    assert(types("enable") == BooleanType)
    assert(types("sensitivity") == DoubleType)
    assert(types("dim") == IntegerType)
    assert(types("annotation") == StringType)
    assert(types("range") == StructType(Seq(
      StructField("lo", DoubleType), StructField("hi", DoubleType))))
    assert(acc.properties.find(_.name == "odr").get.writable)
    assert(!acc.properties.find(_.name == "sensitivity").get.writable)
    assert(Dtdl.toStructType(t.components("temp")) ==
      StructType(Seq(StructField("odr", DoubleType))))
  }

  test("catalog lookup: custom template precedence over builtin") {
    val builtin = Dtdl.CatalogEntry("B1", "FW1", Dtdl.Template("builtin", Map.empty))
    val custom = Dtdl.CatalogEntry("b1", "fw1", Dtdl.Template("custom", Map.empty))
    val cat = new Dtdl.Catalog(Seq(builtin), Seq(custom))
    assert(cat.lookup("B1", "FW1").get.id == "custom") // case-insensitive, custom wins
    assert(new Dtdl.Catalog(Seq(builtin), Nil).lookup("B1", "FW1").get.id == "builtin")
    assert(cat.lookup("B2", "FW1").isEmpty)
  }

  test("transform chain: ordered fold, single optimized plan (O20)") {
    import spark.implicits._
    val plugins = Seq(
      TransformChain.Plugin("rename", _.withColumnRenamed("v", "value")),
      TransformChain.Plugin("derive", _.withColumn("dbl", col("value") * 2)),
      TransformChain.Plugin("filter", _.where(col("dbl") > 4)))
    val stages = scala.collection.mutable.ArrayBuffer[String]()
    var started = false
    val out = TransformChain.run(plugins,
      Seq(1, 2, 3).toDF("v"),
      onStart = () => started = true,
      onStage = stages += _)
    assert(started && stages.toSeq == Seq("rename", "derive", "filter"))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(3))
    // the chain must collapse into ONE plan (no per-stage barriers):
    // filter is pushed into the scan-side projection by Catalyst
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cache"))
  }

  test("plugin discovery: ServiceLoader finds registered plugins in (order, name) order") {
    import graft.plans.TransformChain
    val found = TransformChain.discover()
    // the two test plugins are registered in REVERSE of their declared
    // order fields — discovery must sort, not trust file order
    assert(found.map(_.name) == Seq("add_one", "scale_values"),
      s"got ${found.map(_.name)}")
    // composed chain applies add_one (order 20) before scale_values
    // (order 50): v=1 → (1+1)·10 = 20, not 1·10+1 = 11
    import spark.implicits._
    val out = TransformChain.chain(found)(Seq(1L).toDF("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(20L))
  }
}
