package graft.io

import java.nio.file.Files

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("note", StringType)))

  test("CSV round-trip preserves quoted multiline + UTF-8 fields") {
    val dir = Files.createTempDirectory("graft_io").toString + "/csv"
    val df = Seq(
      (1, "Bánh kem", "line1\nline2"),
      (2, "Trà sữa", "has \"quotes\" and, commas")).toDF("id", "name", "note")
    Sinks.writeCsv(df, dir)
    val back = Sinks.readCsv(spark, schema, dir).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("note") == "line1\nline2")
    assert(back(0).getAs[String]("name") == "Bánh kem")
    assert(back(1).getAs[String]("note") == "has \"quotes\" and, commas")
  }

  test("CSV append accumulates batches (reference append-mode idiom)") {
    val dir = Files.createTempDirectory("graft_io").toString + "/acc"
    Sinks.writeCsv(Seq((1, "a", "x")).toDF("id", "name", "note"), dir)
    Sinks.writeCsv(Seq((2, "b", "y")).toDF("id", "name", "note"), dir,
      SaveMode.Append)
    val back = Sinks.readCsv(spark, schema, dir)
    assert(back.count() == 2)
  }

  test("corrupt rows null out under PERMISSIVE instead of failing") {
    val dir = Files.createTempDirectory("graft_io").toFile
    Files.writeString(new java.io.File(dir, "bad.csv").toPath,
      "id,name,note\n1,ok,fine\nnot_an_int,broken,row\n")
    val back = Sinks.readCsv(spark, schema, dir.getAbsolutePath)
      .orderBy(col("id").asc_nulls_last).collect()
    assert(back.length == 2)
    assert(back(0).getAs[Int]("id") == 1)
    assert(back(1).isNullAt(0)) // bad int → null, row survives
  }

  test("partitioned parquet prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_io").toString + "/part"
    val df = Seq((1, "Cakes"), (2, "Tea"), (3, "Cakes")).toDF("id", "cat")
    Sinks.writePartitioned(df, dir, "cat")
    val pruned = spark.read.parquet(dir).filter($"cat" === "Tea")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cat"), scan)
    assert(pruned.count() == 1)
  }

  test("ORC round-trip preserves types and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_io").toString + "/orc"
    val df = Seq(
      (1L, "Bánh kem", 89000.0, Seq("s", "m")),
      (2L, "Trà sữa", 45000.0, Seq("l"))).toDF("id", "name", "price", "sizes")
    Sinks.writeOrc(df, dir)
    val back = Sinks.readOrc(spark, dir)
    // file-source reads come back nullable (same as parquet) — compare
    // names and types, not nullability
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "ORC round-trip changed the schema")
    assert(back.orderBy("id").collect().map(_.getAs[String]("name")).toSeq
      == Seq("Bánh kem", "Trà sữa"))
    // same pushdown contract as the parquet internal stage
    val q = back.filter($"price" > 50000.0).select("id", "name")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(price"), plan)
    assert(!plan.contains("sizes"), "column pruning failed: " + plan)
  }

  test("JSON document scan reads seed-url-style maps") {
    val dir = Files.createTempDirectory("graft_io").toFile
    Files.writeString(new java.io.File(dir, "urls.json").toPath,
      """{"site": "bakery", "urls": ["https://a/1", "https://a/2"]}""")
    val df = Sinks.readJson(spark, dir.getAbsolutePath)
      .select(col("site"), explode(col("urls")).as("url"))
    assert(df.count() == 2)
  }

  test("jdbc writer carries the reference batch contract") {
    val w = Sinks.jdbcWriter(Seq((1, "x")).toDF("id", "v"), "app_data.t")
    // options are private; round-trip through the writer's toString is
    // not stable — assert via reflection-free behavior: building the
    // writer must not throw and jdbcProps carries fetchsize
    assert(Sinks.jdbcProps().getProperty("fetchsize") == "50")
    assert(w != null)
  }

  /** S8/S9/S10 live: embedded Derby (ships with Spark) stands in for the
    * reference's Postgres (`psql_load.sql:3-7`) — batched write (120
    * rows > 2 batches at 50), append accumulation, then the S10
    * read-back join (`generate_embeddings.py:283-305` idiom). */
  test("JDBC round-trip: batched write, append, read-back join (Derby)") {
    val url = "jdbc:derby:memory:graft_sinks;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val df = (1 to 120).map(i => (i, s"name_$i")).toDF("id", "v")
    Sinks.jdbcWriter(df, "products_t", batchSize = 50)
      .option("url", url).option("driver", driver).save()
    Sinks.jdbcWriter(Seq((121, "name_121")).toDF("id", "v"), "products_t")
      .option("url", url).option("driver", driver).save()

    val back = Sinks.readJdbc(spark, url, "products_t")
    assert(back.count() == 121)
    // read-back join against the in-engine frame (S10)
    val joined = back.join(df, "id")
      .filter(back("v") === df("v"))
    assert(joined.count() == 120)
    // overwrite truncates and replaces
    Sinks.jdbcWriter(Seq((1, "only")).toDF("id", "v"), "products_t",
      mode = SaveMode.Overwrite)
      .option("url", url).option("driver", driver).save()
    assert(Sinks.readJdbc(spark, url, "products_t").count() == 1)
  }
}
