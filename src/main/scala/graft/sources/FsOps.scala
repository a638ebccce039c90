package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

import graft.exceptions._

/** Filesystem maintenance operators (SURVEY.md §2.6; reference
  * awswrangler/s3/_list.py, _delete.py, _copy.py, _describe.py,
  * _wait.py). Path-scheme-agnostic: Hadoop `FileSystem` resolves
  * local/S3A/HDFS from the URI, and S3A supplies the multipart
  * upload / ranged-read machinery the reference hand-rolled in
  * s3/_fs.py (597 LoC — deleted from scope by design, SURVEY §2.7).
  *
  * These are driver-side control-plane calls by nature (they were in
  * the reference too) — except the byte-moving pair
  * `copyObjects`/`mergeDatasets`, which additionally offer
  * `distributed = true` to run the copy as a Spark job when the data
  * plane is bigger than one machine's bandwidth.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(hadoopConf(spark)), p)
  }

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  case class ObjectInfo(path: String, size: Long, modifiedMs: Long,
                        isDirectory: Boolean)

  private def toInfo(st: FileStatus): ObjectInfo =
    ObjectInfo(st.getPath.toString, st.getLen, st.getModificationTime,
               st.isDirectory)

  /** List leaf objects under a path/glob, with suffix keep/drop filters
    * and a last-modified window (reference: s3/_list.py:209-274).
    * `_SUCCESS`/`_started`/`_committed` marker files always excluded,
    * matching the reference's `_SUCCESS` rule (s3/_read.py:22-29).
    */
  def listObjects(spark: SparkSession, path: String,
                  suffix: Seq[String] = Nil,
                  ignoreSuffix: Seq[String] = Nil,
                  lastModifiedBegin: Option[Long] = None,
                  lastModifiedEnd: Option[Long] = None): Seq[ObjectInfo] = {
    val (filesystem, p) = fs(spark, path)
    val statuses: Seq[FileStatus] = {
      val globbed = Option(filesystem.globStatus(p)).getOrElse(Array.empty)
      val roots =
        if (globbed.nonEmpty) globbed.toSeq
        else if (filesystem.exists(p)) Seq(filesystem.getFileStatus(p))
        else Seq.empty
      roots.flatMap { st =>
        if (st.isDirectory) {
          val it = filesystem.listFiles(st.getPath, true)
          val buf = mutable.Buffer.empty[FileStatus]
          while (it.hasNext) buf += it.next()
          buf.toSeq
        } else Seq(st)
      }
    }
    statuses.iterator
      .filter(st => !st.isDirectory)
      .map(toInfo)
      .filter(o => !isMarker(o.path))
      .filter(o => suffix.isEmpty || suffix.exists(o.path.endsWith))
      .filter(o => !ignoreSuffix.exists(o.path.endsWith))
      .filter(o => lastModifiedBegin.forall(o.modifiedMs >= _))
      .filter(o => lastModifiedEnd.forall(o.modifiedMs <= _))
      .toSeq.sortBy(_.path)
  }

  private def isMarker(path: String): Boolean = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    name == "_SUCCESS" || name.startsWith("_started") ||
      name.startsWith("_committed") || name.startsWith(".")
  }

  /** Immediate child directories (reference: s3.list_directories). */
  def listDirectories(spark: SparkSession, path: String): Seq[String] = {
    val (filesystem, p) = fs(spark, path)
    if (!filesystem.exists(p)) Seq.empty
    else filesystem.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.toString).sorted
  }

  def doesObjectExist(spark: SparkSession, path: String): Boolean = {
    val (filesystem, p) = fs(spark, path)
    filesystem.exists(p)
  }

  /** {path -> size} for a path/glob (reference: s3.size_objects). */
  def sizeObjects(spark: SparkSession, path: String): Map[String, Long] =
    listObjects(spark, path).map(o => o.path -> o.size).toMap

  /** Full metadata per object (reference: s3.describe_objects). */
  def describeObjects(spark: SparkSession, path: String): Map[String, ObjectInfo] =
    listObjects(spark, path).map(o => o.path -> o).toMap

  /** Recursive delete of paths/prefixes (reference: s3.delete_objects;
    * batching/retry are Hadoop-FS concerns here).
    */
  def deleteObjects(spark: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { path =>
      val (filesystem, p) = fs(spark, path)
      if (filesystem.exists(p)) filesystem.delete(p, true)
    }

  /** Copy a list of objects under targetDir, keeping file names
    * (reference: s3.copy_objects). Containment is validated for ALL
    * paths before any byte moves.
    *
    * Two execution modes:
    *   - `distributed = false` (default, reference parity): copies fan
    *     out on a driver thread pool, exactly the reference's
    *     ThreadPoolExecutor shape — right for control-plane-sized
    *     listings, but every byte funnels through one JVM's NIC;
    *   - `distributed = true` (the 100 TB path): the (src, dst) pairs
    *     become a Spark job and each EXECUTOR copies its slice, so
    *     aggregate copy bandwidth scales with the cluster instead of
    *     the driver. Only file paths ever sit on the driver.
    */
  def copyObjects(spark: SparkSession, paths: Seq[String],
                  sourceDir: String, targetDir: String,
                  distributed: Boolean = false): Seq[String] = {
    val conf = hadoopConf(spark)
    val srcRoot = qualified(spark, sourceDir)
    val dstRoot = qualified(spark, targetDir)
    // overlapping trees are a data-loss trap, not a copy: src == dst
    // truncates every file against itself (copy opens the source,
    // then create(overwrite) truncates the same inode), and a
    // parent/child overlap can overwrite not-yet-copied sources
    if (srcRoot == dstRoot ||
        srcRoot.startsWith(dstRoot + "/") ||
        dstRoot.startsWith(srcRoot + "/"))
      throw InvalidArgumentValue(
        s"source ($srcRoot) and target ($dstRoot) trees overlap")
    val planned = paths.map { src =>
      // containment must be segment-aligned: /data/ab/f is NOT under
      // /data/a, so compare against the root plus a trailing separator
      val s = qualified(spark, src)
      if (!(s.startsWith(srcRoot + "/") || s == srcRoot))
        throw InvalidArgumentValue(s"$src not under source_path $sourceDir")
      val rel = s.stripPrefix(srcRoot).stripPrefix("/")
      s -> s"$dstRoot/$rel"
    }
    if (distributed && planned.nonEmpty) {
      val serConf =
        new org.apache.spark.util.SerializableConfiguration(conf)
      val slices = math.min(planned.size,
        spark.sparkContext.defaultParallelism * 4)
      spark.sparkContext.parallelize(planned, slices)
        .foreachPartition { it: Iterator[(String, String)] =>
          val c = serConf.value
          it.foreach { case (src, dst) =>
            val sP = new Path(src)
            val dP = new Path(dst)
            val dFs = dP.getFileSystem(c)
            dFs.mkdirs(dP.getParent)
            // copy to a dot-prefixed temp (invisible to listObjects'
            // marker filter) and rename into place: speculative or
            // zombie duplicate attempts must never stream into the
            // SAME destination path concurrently
            val tmp = new Path(dP.getParent,
              s".graft-tmp-${java.util.UUID.randomUUID()}-${dP.getName}")
            FileUtil.copy(sP.getFileSystem(c), sP, dFs, tmp, false, true, c)
            dFs.delete(dP, false)
            if (!dFs.rename(tmp, dP)) {
              dFs.delete(tmp, false)
              throw new java.io.IOException(s"rename $tmp -> $dst failed")
            }
          }
        }
      planned.map(_._2)
    } else
      parallelMap(planned) { case (src, dst) =>
        val (sFs, sP) = fs(spark, src)
        val (dFs, dP) = fs(spark, dst)
        dFs.mkdirs(dP.getParent)
        FileUtil.copy(sFs, sP, dFs, dP, false, true, conf)
        dst
      }
  }

  /** Bounded-pool parallel map for driver-side fan-out (listing-scale
    * metadata and copy work; the reference used ThreadPoolExecutor the
    * same way).
    */
  private[graft] def parallelMap[A, B](items: Seq[A], maxThreads: Int = 16)
                                      (f: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.min(items.size, maxThreads))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    finally pool.shutdown()
  }

  private def normalized(p: String): String = p.stripSuffix("/")

  /** Fully-qualified URI form (adds the `file:`/`s3a:` scheme), so
    * bare paths and listing output compare equal.
    */
  private def qualified(spark: SparkSession, p: String): String = {
    val (filesystem, path) = fs(spark, p)
    normalized(path.makeQualified(
      filesystem.getUri, filesystem.getWorkingDirectory).toString)
  }

  /** Mirror a dataset prefix into another with the three reference
    * write modes (reference: s3.merge_datasets, s3/_copy.py:44-151):
    * append (add files), overwrite (delete target first),
    * overwrite_partitions (delete only the `k=v` partition dirs that
    * exist in the source).
    */
  def mergeDatasets(spark: SparkSession, sourcePath: String,
                    targetPath: String, mode: String = "append",
                    distributed: Boolean = false): Seq[String] = {
    val src = qualified(spark, sourcePath)
    val dst = qualified(spark, targetPath)
    val objects = listObjects(spark, src)
    if (objects.isEmpty) return Seq.empty
    mode match {
      case "append" => ()
      case "overwrite" => deleteObjects(spark, Seq(dst))
      case "overwrite_partitions" =>
        // only true Hive `k=v` partition dirs are replaced (reference:
        // s3/_copy.py:131-138); arbitrary nesting in the target survives
        val partitionDirs = objects.map(_.path)
          .map(p => p.stripPrefix(src + "/"))
          .filter(_.contains('/'))
          .map(rel => rel.substring(0, rel.lastIndexOf('/')))
          .filter(_.split('/').forall(seg =>
            seg.indexOf('=') > 0 && seg.indexOf('=') < seg.length - 1))
          .distinct
        deleteObjects(spark, partitionDirs.map(d => s"$dst/$d"))
      case other =>
        throw InvalidArgumentValue(
          s"mode must be append|overwrite|overwrite_partitions, got $other")
    }
    copyObjects(spark, objects.map(_.path), src, dst, distributed)
  }

  case class CompactStats(filesBefore: Int, filesAfter: Int,
                          bytes: Long, rows: Long)

  /** Small-files compaction: rewrite a parquet dataset into
    * ~`targetFileMb` files — the standing maintenance job of any
    * long-lived ingest (streaming sinks and partitioned appends
    * accrete kilobyte files; at 100 TB the scan's task-setup cost is
    * dominated by file COUNT, not bytes).
    *
    * Sizing comes from data already in hand: bytes from the listing,
    * rows from a count (parquet footer metadata), so
    * `maxRecordsPerFile ≈ targetFileMb / avgRowBytes` and the input is
    * coalesced to ceil(bytes/target) write tasks. Partitioned
    * datasets pass `partitionCols`: layout is preserved and
    * compaction happens within each partition directory
    * (one file per partition plus maxRecordsPerFile splits).
    *
    * Not atomic (neither are the reference's S3 ops): the sequence is
    * write to `<path>__compact_tmp` → rename original to
    * `<path>__compact_bak` → rename tmp into place → delete bak, so
    * every failure point leaves a complete copy of the data under one
    * of the three names.
    */
  def compactDataset(spark: SparkSession, path: String,
                     targetFileMb: Int = 128,
                     partitionCols: Seq[String] = Seq.empty)
      : CompactStats = {
    if (targetFileMb <= 0)
      throw InvalidArgumentValue(
        s"targetFileMb must be positive: $targetFileMb")
    val dst = qualified(spark, path)
    val dataFiles = listObjects(spark, dst)
      .filter(_.path.endsWith(".parquet"))
    if (dataFiles.isEmpty) return CompactStats(0, 0, 0L, 0L)
    val bytes = dataFiles.map(_.size).sum
    val df = spark.read.parquet(dst)
    val rows = df.count()
    if (rows == 0L) return CompactStats(dataFiles.size, 0, bytes, 0L)
    val targetBytes = targetFileMb.toLong * 1024 * 1024
    val maxRecords = math.max(1L, targetBytes / math.max(1L, bytes / rows))
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = dst + "__compact_tmp"
    val bak = dst + "__compact_bak"
    val writer = (if (partitionCols.isEmpty) df.repartition(nOut)
                  else df.repartition(partitionCols.map(
                    org.apache.spark.sql.functions.col): _*))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecords)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(tmp)
    val (fileSystem, p) = fs(spark, dst)
    val (_, tmpP) = fs(spark, tmp)
    val (_, bakP) = fs(spark, bak)
    if (!fileSystem.rename(p, bakP))
      throw InvalidArgumentValue(s"could not stage original to $bak")
    if (!fileSystem.rename(tmpP, p)) {
      fileSystem.rename(bakP, p) // roll back
      throw InvalidArgumentValue(s"could not move compacted data to $dst")
    }
    fileSystem.delete(bakP, true)
    val after = listObjects(spark, dst)
      .count(_.path.endsWith(".parquet"))
    CompactStats(dataFiles.size, after, bytes, rows)
  }

  /** boto3 s3.get_bucket_location surface — the one §2.6 call with no
    * Hadoop counterpart (bucket location is an S3 control-plane
    * attribute, not a filesystem one), so it takes an injected client
    * like Sts/Logs do.
    */
  trait BucketClient {
    /** Raw LocationConstraint; null/empty for the legacy us-east-1. */
    def bucketLocation(bucket: String): String
  }

  /** reference: s3.get_bucket_region (s3/_describe.py:163-196) — maps
    * the API's null LocationConstraint to "us-east-1".
    */
  def getBucketRegion(client: BucketClient, bucket: String): String = {
    if (bucket == null || bucket.isEmpty)
      throw InvalidArgumentValue("bucket must be non-empty")
    Option(client.bucketLocation(bucket)).filter(_.nonEmpty)
      .getOrElse("us-east-1")
  }

  /** Poll-wait for object existence (reference: s3.wait_objects_exist;
    * mostly obsolete under strongly-consistent stores — kept for parity).
    */
  def waitObjects(spark: SparkSession, paths: Seq[String], exist: Boolean,
                  delayMs: Long = 200, maxAttempts: Int = 20): Unit = {
    paths.foreach { path =>
      var attempt = 0
      while (doesObjectExist(spark, path) != exist) {
        attempt += 1
        if (attempt >= maxAttempts)
          throw ServiceApiError(s"timeout waiting for $path exist=$exist")
        Thread.sleep(delayMs)
      }
    }
  }
}
