package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.exceptions._
import graft.sinks.Writer
import graft.sinks.Writer.WriteOptions
import graft.sources.{FsOps, Reader}
import graft.sources.Reader.ReadOptions

/** Coverage for the sources package (flagged untested in round 1):
  * suffix/mtime filters, schema validation, fwf/csv/json readers,
  * listing, copy, and the three mergeDatasets modes.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.read(spark, sf, "orders")

  test("readParquet validateSchema raises on diverging file schemas") {
    val root = tmpDir("src-diverge")
    orders.limit(5).write.parquet(s"$root/a.parquet")
    orders.limit(5).withColumn("extra", lit(1))
      .write.parquet(s"$root/b.parquet")
    intercept[InvalidSchemaConvergence] {
      Reader.readParquet(spark,
        Seq(s"$root/a.parquet", s"$root/b.parquet"),
        ReadOptions(validateSchema = true)).collect()
    }
    // mergeSchema instead unions the columns
    val merged = Reader.readParquet(spark,
      Seq(s"$root/a.parquet", s"$root/b.parquet"),
      ReadOptions(mergeSchema = true))
    assert(merged.columns.contains("extra"))
    assert(merged.count() == 10)
  }

  test("suffix and ignore-suffix filters select files on read") {
    val root = tmpDir("src-suffix")
    orders.limit(3).coalesce(1).write.csv(s"$root/keep")
    Files.write(s"$root/keep/notes.txt", "hello")
    val csvOnly = FsOps.listObjects(spark, s"$root/keep",
      suffix = Seq(".csv"))
    assert(csvOnly.nonEmpty)
    assert(csvOnly.forall(_.path.endsWith(".csv")))
    val noCsv = FsOps.listObjects(spark, s"$root/keep",
      ignoreSuffix = Seq(".csv"))
    assert(noCsv.map(_.path).forall(_.endsWith("notes.txt")))
  }

  private object Files {
    def write(path: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
    }
  }

  test("last-modified window filters listings") {
    val root = tmpDir("src-mtime")
    Files.write(s"$root/f1.txt", "a")
    val all = FsOps.listObjects(spark, root)
    assert(all.size == 1)
    val cut = all.head.modifiedMs
    assert(FsOps.listObjects(spark, root,
      lastModifiedEnd = Some(cut - 10000)).isEmpty)
    assert(FsOps.listObjects(spark, root,
      lastModifiedBegin = Some(cut - 10000)).size == 1)
  }

  test("readFwf projects fixed-width columns with dtype casts") {
    val root = tmpDir("src-fwf")
    Files.write(s"$root/data.txt",
      "alpha 12345.50\nbeta  29999.25\n")
    val df = Reader.readFwf(spark, Seq(s"$root/data.txt"),
      widths = Seq(6, 2, 6), names = Seq("name", "num", "val"),
      dtype = Map("num" -> "int", "val" -> "double"))
    val rows = df.select(trim($"name"), $"num", $"val")
      .as[(String, Int, Double)].collect().toSeq
    assert(rows == Seq(("alpha", 12, 345.5), ("beta", 29, 999.25)))
  }

  test("readJson handles both json-lines and multiLine orients") {
    val root = tmpDir("src-json")
    Files.write(s"$root/lines/a.json",
      """{"x": 1, "y": "a"}""" + "\n" + """{"x": 2, "y": "b"}""")
    assert(Reader.readJson(spark, Seq(s"$root/lines")).count() == 2)
    Files.write(s"$root/multi/a.json",
      """[{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]""")
    assert(Reader.readJson(spark, Seq(s"$root/multi"), lines = false)
      .count() == 2)
  }

  test("readCsv applies explicit schema and column projection") {
    val root = tmpDir("src-csv")
    Writer.toCsv(spark, orders.select($"o_orderkey", $"o_totalprice"),
      root, WriteOptions(dataset = true, mode = "overwrite"))
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType)))
    val back = Reader.readCsv(spark, Seq(root), schema = Some(schema),
      opts = ReadOptions(columns = Seq("o_orderkey")))
    assert(back.columns.toSeq == Seq("o_orderkey"))
    assert(back.count() == orders.count())
  }

  test("projected-partition read computes paths instead of listing") {
    val root = tmpDir("src-projection")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    // project F and O plus a value that doesn't exist on disk
    val df = Reader.readProjectedPartitions(spark, root,
      Seq("o_orderstatus" -> Seq("F", "O", "X")))
    assert(df.columns.contains("o_orderstatus")) // basePath keeps it
    assert(df.count() ==
      orders.filter($"o_orderstatus".isin("F", "O")).count())
    intercept[NoFilesFound] {
      Reader.readProjectedPartitions(spark, root,
        Seq("o_orderstatus" -> Seq("ZZZ")))
    }
  }

  test("dtype override casts columns through the Athena type bridge") {
    val root = tmpDir("src-dtype")
    orders.limit(20).write.mode("overwrite").parquet(root)
    val df = Reader.readParquet(spark, Seq(root),
      ReadOptions(dtype = Map("o_orderkey" -> "string",
        "o_totalprice" -> "decimal(12,2)")))
    assert(df.schema("o_orderkey").dataType.typeName == "string")
    assert(df.schema("o_totalprice").dataType.sql == "DECIMAL(12,2)")
    intercept[InvalidArgumentValue] {
      Reader.readParquet(spark, Seq(root),
        ReadOptions(dtype = Map("nope" -> "int"))).collect()
    }
  }

  test("readParquetMetadata splits partition columns from data columns") {
    val root = tmpDir("src-meta")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    val (cols, parts) = Reader.readParquetMetadata(spark, root,
      dataset = true)
    assert(parts.keySet == Set("o_orderstatus"))
    assert(cols.contains("o_totalprice") && !cols.contains("o_orderstatus"))
  }

  test("copyObjects parallel copy preserves relative layout") {
    val src = tmpDir("src-copy-a")
    val dst = tmpDir("src-copy-b")
    Files.write(s"$src/x/f1.txt", "1")
    Files.write(s"$src/y/f2.txt", "2")
    val copied = FsOps.copyObjects(spark,
      FsOps.listObjects(spark, src).map(_.path), src, dst)
    assert(copied.size == 2)
    assert(FsOps.doesObjectExist(spark, s"$dst/x/f1.txt"))
    assert(FsOps.doesObjectExist(spark, s"$dst/y/f2.txt"))
    intercept[InvalidArgumentValue] {
      FsOps.copyObjects(spark, Seq(s"$src-other/f.txt"), src, dst)
    }
  }

  test("mergeDatasets append/overwrite/overwrite_partitions semantics") {
    val src = tmpDir("src-merge-src")
    val dst = tmpDir("src-merge-dst")
    Writer.toParquet(spark, orders.filter($"o_orderstatus" === "F"), src,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    // seed target with a different partition + a non-partition dir
    Writer.toParquet(spark, orders.filter($"o_orderstatus" === "O"), dst,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    Files.write(s"$dst/extras/keep.txt", "keep me")

    FsOps.mergeDatasets(spark, src, dst, "overwrite_partitions")
    // the stray extras/ dir breaks partition discovery on the root, so
    // read the k=v dirs explicitly with a basePath
    val back = spark.read.option("basePath", dst)
      .parquet(s"$dst/o_orderstatus=*")
    assert(back.filter($"o_orderstatus" === "F").count() ==
      orders.filter($"o_orderstatus" === "F").count())
    assert(back.filter($"o_orderstatus" === "O").count() ==
      orders.filter($"o_orderstatus" === "O").count())
    // non-k=v directory survives overwrite_partitions
    assert(FsOps.doesObjectExist(spark, s"$dst/extras/keep.txt"))

    FsOps.mergeDatasets(spark, src, dst, "overwrite")
    assert(FsOps.listObjects(spark, dst).map(_.path)
      .forall(p => !p.contains("o_orderstatus=O")))
    intercept[InvalidArgumentValue] {
      FsOps.mergeDatasets(spark, src, dst, "bogus")
    }
  }

  test("distributed mergeDatasets mirrors byte-identically to the driver path") {
    val src = tmpDir("src-dist-src")
    val dstDriver = tmpDir("src-dist-drv")
    val dstExec = tmpDir("src-dist-exec")
    // multi-partition dataset: several k=v dirs, several files each
    Writer.toParquet(spark, orders.repartition(3), src,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    FsOps.mergeDatasets(spark, src, dstDriver, "append")
    FsOps.mergeDatasets(spark, src, dstExec, "append", distributed = true)

    def bytesByRel(root: String): Map[String, Seq[Byte]] =
      FsOps.listObjects(spark, root).map { o =>
        val rel = o.path.substring(o.path.indexOf(root) + root.length)
        rel -> java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(o.path.stripPrefix("file:"))).toSeq
      }.toMap
    val drv = bytesByRel(dstDriver)
    val exec = bytesByRel(dstExec)
    assert(drv.nonEmpty && drv.keys.size > 2)
    assert(exec.keySet == drv.keySet)
    drv.foreach { case (rel, bytes) => assert(exec(rel) == bytes, rel) }
  }

  test("overlapping source/target trees are rejected, not truncated") {
    val root = tmpDir("src-overlap")
    Files.write(s"$root/data/f.txt", "precious")
    // self-copy would open each file and truncate the same inode
    intercept[InvalidArgumentValue] {
      FsOps.mergeDatasets(spark, s"$root/data", s"$root/data", "append")
    }
    // parent/child overlaps can clobber not-yet-copied sources
    intercept[InvalidArgumentValue] {
      FsOps.copyObjects(spark, Seq(s"$root/data/f.txt"),
        s"$root/data", root)
    }
    intercept[InvalidArgumentValue] {
      FsOps.mergeDatasets(spark, root, s"$root/data", "append")
    }
    // the data survived the rejections
    assert(FsOps.listObjects(spark, s"$root/data").head.size > 0)
  }

  test("waitObjects times out waiting for a missing object") {
    intercept[ServiceApiError] {
      FsOps.waitObjects(spark, Seq("/nonexistent/file"), exist = true,
        delayMs = 1, maxAttempts = 3)
    }
  }

  test("toLocalChunks yields bounded row groups") {
    val chunks = Reader.toLocalChunks(orders.limit(25), 10).toSeq
    assert(chunks.map(_.size) == Seq(10, 10, 5))
  }

  test("compactDataset collapses small files, preserving content") {
    import spark.implicits._
    val root = tmpDir("src-compact")
    val df = (1L to 500L).map(i => (i, s"row-$i")).toDF("id", "s")
    df.repartition(16).write.parquet(s"$root/flat")
    val before = FsOps.listObjects(spark, s"$root/flat")
      .count(_.path.endsWith(".parquet"))
    assert(before == 16)
    val stats = FsOps.compactDataset(spark, s"$root/flat",
      targetFileMb = 64)
    assert(stats.filesBefore == 16 && stats.rows == 500L)
    val after = FsOps.listObjects(spark, s"$root/flat")
      .count(_.path.endsWith(".parquet"))
    assert(after == stats.filesAfter && after < before)
    val back = spark.read.parquet(s"$root/flat")
      .as[(Long, String)].collect().toSet
    assert(back == (1L to 500L).map(i => (i, s"row-$i")).toSet)
    // staging names are gone
    assert(!FsOps.doesObjectExist(spark, s"$root/flat__compact_tmp"))
    assert(!FsOps.doesObjectExist(spark, s"$root/flat__compact_bak"))
  }

  test("compactDataset preserves hive partition layout") {
    import spark.implicits._
    val root = tmpDir("src-compact-part")
    val df = (1L to 300L).map(i => (i, (i % 3).toString, s"v$i"))
      .toDF("id", "p", "s")
    df.repartition(10).write.partitionBy("p")
      .parquet(s"$root/ds")
    val stats = FsOps.compactDataset(spark, s"$root/ds",
      targetFileMb = 64, partitionCols = Seq("p"))
    assert(stats.rows == 300L && stats.filesAfter < stats.filesBefore)
    // one file per partition at this size, directories intact
    val dirs = FsOps.listDirectories(spark, s"$root/ds").sorted
    assert(dirs.map(_.split('/').last).toSet ==
      Set("p=0", "p=1", "p=2"))
    val back = spark.read.parquet(s"$root/ds")
      .select("id", "p", "s").as[(Long, String, String)]
      .collect().toSet
    assert(back == (1L to 300L)
      .map(i => (i, (i % 3).toString, s"v$i")).toSet)
    assert(FsOps.listObjects(spark, s"$root/ds")
      .count(_.path.endsWith(".parquet")) == 3)
    intercept[graft.exceptions.InvalidArgumentValue] {
      FsOps.compactDataset(spark, s"$root/ds", targetFileMb = 0)
    }
  }
}
