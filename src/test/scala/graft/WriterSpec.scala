package graft

import org.apache.spark.sql.functions._

import graft.exceptions._
import graft.sinks.Writer
import graft.sinks.Writer.WriteOptions
import graft.sources.{FsOps, Reader}
import graft.sources.Reader.ReadOptions

/** Dataset-write lifecycle mirroring the reference's routine suite
  * (reference: tests/test__routines.py:13-263): overwrite → append →
  * schema-evolution guard → overwrite_partitions, plus file-mode and
  * maxRowsByFile sizing.
  */
class WriterSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.read(spark, sf, "orders")

  test("dataset overwrite then append doubles the row count") {
    val root = tmpDir("writer-lifecycle")
    val opts = WriteOptions(dataset = true,
      partitionCols = Seq("o_orderstatus"), mode = "overwrite")
    Writer.toParquet(spark, orders, root, opts)
    val n1 = spark.read.parquet(root).count()
    assert(n1 == orders.count())
    Writer.toParquet(spark, orders, root, opts.copy(mode = "append"))
    assert(spark.read.parquet(root).count() == 2 * n1)
  }

  test("overwrite after append resets the dataset") {
    val root = tmpDir("writer-reset")
    val opts = WriteOptions(dataset = true, mode = "overwrite")
    Writer.toParquet(spark, orders, root, opts)
    Writer.toParquet(spark, orders, root, opts.copy(mode = "append"))
    Writer.toParquet(spark, orders.limit(10), root, opts)
    assert(spark.read.parquet(root).count() == 10)
  }

  test("overwrite_partitions replaces only touched partitions") {
    val root = tmpDir("writer-owp")
    val opts = WriteOptions(dataset = true,
      partitionCols = Seq("o_orderstatus"), mode = "overwrite")
    Writer.toParquet(spark, orders, root, opts)
    val fCount = orders.filter($"o_orderstatus" === "F").count()
    val otherCount = orders.filter($"o_orderstatus" =!= "F").count()
    // replace partition F with just one row
    Writer.toParquet(spark,
      orders.filter($"o_orderstatus" === "F").limit(1), root,
      opts.copy(mode = "overwrite_partitions"))
    val back = spark.read.parquet(root)
    assert(back.filter($"o_orderstatus" === "F").count() == 1)
    assert(back.filter($"o_orderstatus" =!= "F").count() == otherCount)
    assert(fCount > 1) // the test is vacuous otherwise
  }

  test("schema_evolution=false rejects a new column on append") {
    val root = tmpDir("writer-evolve")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val widened = orders.withColumn("extra", lit(1))
    val e = intercept[InvalidArgumentValue] {
      Writer.toParquet(spark, widened, root,
        WriteOptions(dataset = true, mode = "append",
          schemaEvolution = false))
    }
    assert(e.getMessage.contains("extra"))
  }

  test("schema_evolution=false rejects a changed column type") {
    val root = tmpDir("writer-evolve-type")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val retyped = orders.withColumn("o_totalprice",
      $"o_totalprice".cast("string"))
    val e = intercept[InvalidArgumentValue] {
      Writer.toParquet(spark, retyped, root,
        WriteOptions(dataset = true, mode = "append",
          schemaEvolution = false))
    }
    assert(e.getMessage.contains("o_totalprice"))
  }

  test("schema_evolution=false tolerates partition-type inference") {
    // a long partition column reads back as int via Hive partition
    // inference — appending the identical frame must NOT be rejected
    val root = tmpDir("writer-evolve-part")
    val withYear = orders.withColumn("o_year",
      year($"o_orderdate").cast("long"))
    val opts = WriteOptions(dataset = true, partitionCols = Seq("o_year"),
      mode = "overwrite")
    Writer.toParquet(spark, withYear, root, opts)
    Writer.toParquet(spark, withYear, root,
      opts.copy(mode = "append", schemaEvolution = false))
    assert(spark.read.parquet(root).count() == 2 * orders.count())
  }

  test("schema_evolution=true allows appending a widened frame") {
    val root = tmpDir("writer-evolve-ok")
    Writer.toParquet(spark, orders.limit(5), root,
      WriteOptions(dataset = true, mode = "overwrite"))
    Writer.toParquet(spark, orders.limit(5).withColumn("extra", lit(1)),
      root, WriteOptions(dataset = true, mode = "append"))
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.contains("extra"))
    assert(merged.count() == 10)
  }

  test("file mode with singleFile writes exactly one data file") {
    val root = tmpDir("writer-single")
    Writer.toParquet(spark, orders, root,
      WriteOptions(singleFile = true, mode = "overwrite"))
    val files = FsOps.listObjects(spark, root,
      suffix = Seq(".parquet"))
    assert(files.size == 1)
  }

  test("maxRowsByFile splits output into bounded files") {
    val root = tmpDir("writer-maxrows")
    val n = orders.count()
    Writer.toParquet(spark, orders.repartition(1), root,
      WriteOptions(mode = "overwrite", maxRowsByFile = Some(100)))
    val files = FsOps.listObjects(spark, root, suffix = Seq(".parquet"))
    assert(files.size >= (n / 100).toInt)
    assert(spark.read.parquet(root).count() == n)
  }

  test("graft.write.concurrent conf drives the default file fan-out") {
    val root = tmpDir("writer-conf-fpp")
    spark.conf.set(GraftSession.confKeys.concurrentWrites, "2")
    try {
      Writer.toParquet(spark, orders, root,
        WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
          mode = "overwrite"))
      val perPartition = FsOps.listObjects(spark, root,
          suffix = Seq(".parquet"))
        .groupBy(_.path.split('/').takeRight(2).head)
      assert(perPartition.values.forall(_.size <= 2))

      // the fan-out must also DELIVER parallelism from a single input
      // partition (the salt hashes the row, not spark_partition_id,
      // which would cap fan-out at input width = exactly 1 file per
      // dir here). AQE's partition coalescing legitimately re-merges
      // the tiny test shuffle (at real scale partitions exceed the
      // advisory size and stay apart), so it's off for this check;
      // (value, salt) hash collisions can still merge a pair, hence
      // exists-not-forall.
      val root1 = tmpDir("writer-conf-fpp-1part")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        Writer.toParquet(spark, orders.repartition(1), root1,
          WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
            mode = "overwrite"))
      } finally spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "true")
      val fanned = FsOps.listObjects(spark, root1, suffix = Seq(".parquet"))
        .groupBy(_.path.split('/').takeRight(2).head)
      assert(fanned.values.forall(_.size <= 2))
      assert(fanned.values.exists(_.size == 2))
    } finally spark.conf.unset(GraftSession.confKeys.concurrentWrites)
  }

  test("lifecycle matrix: concurrent {1,8} x partitioned/unpartitioned") {
    // the reference runs its routine lifecycle across use_threads ×
    // concurrent_partitioning (tests/test__routines.py:13-466); the
    // engine analogue is the graft.write.concurrent fan-out × the
    // partition layout — a commit bug that only shows under fan-out
    // (e.g. per-file salting breaking overwrite_partitions' touched-
    // partition discovery) surfaces here, not in the single-cell tests
    val nAll = orders.count()
    val fCount = orders.filter($"o_orderstatus" === "F").count()
    val otherCount = orders.filter($"o_orderstatus" =!= "F").count()
    assert(fCount > 1 && otherCount > 0)
    for (conc <- Seq("1", "8"); parted <- Seq(true, false)) {
      val cell = s"conc=$conc parted=$parted"
      spark.conf.set(GraftSession.confKeys.concurrentWrites, conc)
      try {
        val root = tmpDir(s"writer-matrix-$conc-$parted")
        val pcols = if (parted) Seq("o_orderstatus") else Nil
        val opts = WriteOptions(dataset = true, partitionCols = pcols,
          mode = "overwrite")
        Writer.toParquet(spark, orders, root, opts)
        assert(spark.read.parquet(root).count() == nAll,
          s"$cell: overwrite")
        Writer.toParquet(spark, orders, root, opts.copy(mode = "append"))
        assert(spark.read.parquet(root).count() == 2 * nAll,
          s"$cell: append")
        // the evolution guard must hold in every cell
        val e = intercept[InvalidArgumentValue] {
          Writer.toParquet(spark, orders.withColumn("extra", lit(1)),
            root, opts.copy(mode = "append", schemaEvolution = false))
        }
        assert(e.getMessage.contains("extra"), s"$cell: evolution")
        if (parted) {
          // replace partition F with one row; others stay intact
          Writer.toParquet(spark,
            orders.filter($"o_orderstatus" === "F").limit(1), root,
            opts.copy(mode = "overwrite_partitions"))
          val back = spark.read.parquet(root)
          assert(back.filter($"o_orderstatus" === "F").count() == 1,
            s"$cell: overwrite_partitions touched")
          assert(back.filter($"o_orderstatus" =!= "F").count() ==
            2 * otherCount, s"$cell: overwrite_partitions untouched")
          // fan-out ceiling holds per leaf directory
          val perDir = FsOps.listObjects(spark, root,
              suffix = Seq(".parquet"))
            .groupBy(_.path.split('/').takeRight(2).head)
          assert(perDir.values.forall(_.size <= conc.toInt * 2),
            s"$cell: fan-out runaway (append doubles files)")
        }
        // overwrite resets the dataset regardless of history
        Writer.toParquet(spark, orders.limit(10), root,
          opts.copy(mode = "overwrite"))
        assert(spark.read.parquet(root).count() == 10, s"$cell: reset")
      } finally spark.conf.unset(GraftSession.confKeys.concurrentWrites)
    }
  }

  test("fan-out salt survives dotted column names") {
    // col("price.usd") parses as struct access — the salt must quote
    val root = tmpDir("writer-dotcol")
    val df = orders.select($"o_orderkey",
      $"o_totalprice".as("price.usd"), $"o_orderstatus")
    Writer.toParquet(spark, df, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite", filesPerPartition = Some(2)))
    assert(spark.read.parquet(root).count() == orders.count())
  }

  test("empty/duplicate/mode validation raises the reference errors") {
    val root = tmpDir("writer-validate")
    intercept[InvalidDataFrame] {
      Writer.toParquet(spark,
        orders.select($"o_orderkey", $"o_orderkey"), root)
    }
    intercept[InvalidArgumentValue] {
      Writer.toParquet(spark, orders, root,
        WriteOptions(dataset = true, mode = "nope"))
    }
    intercept[InvalidArgumentCombination] {
      Writer.toParquet(spark, orders, root,
        WriteOptions(partitionCols = Seq("o_orderstatus")))
    }
    intercept[InvalidArgumentCombination] {
      Writer.toParquet(spark, orders, root,
        WriteOptions(mode = "overwrite_partitions"))
    }
  }

  test("csv and json dataset round trips preserve values") {
    val csvRoot = tmpDir("writer-csv")
    val df = orders.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
      $"o_totalprice")
    Writer.toCsv(spark, df, csvRoot,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    val csvBack = Reader.readCsv(spark, Seq(csvRoot))
    assert(csvBack.count() == df.count())
    assert(csvBack.agg(round(sum("o_totalprice"), 2)).head.getDouble(0) ==
      df.agg(round(sum("o_totalprice"), 2)).head.getDouble(0))

    val jsonRoot = tmpDir("writer-json")
    Writer.toJson(spark, df, jsonRoot,
      WriteOptions(dataset = true, mode = "overwrite"))
    val jsonBack = Reader.readJson(spark, Seq(jsonRoot))
    assert(jsonBack.count() == df.count())
  }

  test("partition filter on read prunes to the selected partition") {
    val root = tmpDir("writer-prune")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    val back = Reader.readParquet(spark, Seq(root),
      ReadOptions(dataset = true,
        partitionFilter = Some(col("o_orderstatus") === "F")))
    assert(back.count() ==
      orders.filter($"o_orderstatus" === "F").count())
    // the physical plan must contain the partition filter (pruned scan)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("o_orderstatus"))
  }
}
