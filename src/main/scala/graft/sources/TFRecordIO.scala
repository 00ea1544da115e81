package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.serialization.TFRecordCodec

/** TFRecord source/sink (SURVEY §2.1 S2/S5). TFRecord files are NOT
  * splittable mid-file (no sync markers), so read parallelism is one
  * partition per file — the same granularity Beam/tf.data get
  * (data_loaders.py:116-122). Sharding on write is one file per Spark
  * partition (`num_shards` = `repartition(n)` upstream, auto = leave the
  * existing partitioning, mirroring tfds_pipelines.py:49-51).
  */
object TFRecordIO {

  /** Write one binary column as TFRecord shard files
    * `prefix-SSSSS-of-NNNNN<suffix>` (reference naming,
    * integration_test.py:46). Compression is AUTO by file name, the
    * Beam WriteToTFRecord contract (compression_type=AUTO infers from
    * file_name_suffix): a `.gz` suffix gzips each whole shard — the
    * layout `tf.data.TFRecordDataset(compression_type="GZIP")` reads.
    * Returns the shard paths. */
  def write(records: Dataset[Array[Byte]], dir: String,
            prefix: String = "groups.tfrecord", suffix: String = ""): Seq[String] = {
    val numShards = records.rdd.getNumPartitions
    val written = records.rdd.mapPartitionsWithIndex { (idx, it) =>
      val conf = new Configuration()
      val shard = f"$prefix-$idx%05d-of-$numShards%05d$suffix"
      val path = new Path(dir, shard)
      val fs = path.getFileSystem(conf)
      val raw = fs.create(path, true)
      val out: java.io.OutputStream =
        if (shard.endsWith(".gz")) new java.util.zip.GZIPOutputStream(raw)
        else raw
      try it.foreach(TFRecordCodec.writeRecord(out, _))
      finally out.close()
      Iterator.single(path.toString)
    }.collect()
    written.toSeq
  }

  /** Read TFRecord files matching `pattern` into a DataFrame of
    * (file string, record binary), one read task per file.
    * `shuffleSeed` reproduces the loader's seeded file-order shuffle
    * (tf.data list_files(shuffle, seed), data_loaders.py:98-100). */
  def read(spark: SparkSession, pattern: String,
           shuffleSeed: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val conf = new Configuration()
    val globPath = new Path(pattern)
    val fs = globPath.getFileSystem(conf)
    val sortedFiles = Option(fs.globStatus(globPath)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted.toSeq
    val files = shuffleSeed match {
      case Some(seed) => new scala.util.Random(seed).shuffle(sortedFiles)
      case None => sortedFiles
    }
    require(files.nonEmpty, s"TFRecordIO.read: no files match $pattern")
    spark.sparkContext
      .parallelize(files, files.length)
      .mapPartitions { it =>
        val conf = new Configuration()
        it.flatMap { f =>
          val p = new Path(f)
          val in = p.getFileSystem(conf).open(p)
          // lazy record iterator, one record in memory at a time (a
          // record can be a ~2GB packed group — eager materialization
          // would need the whole shard on heap); the stream closes on
          // exhaustion. AUTO decompression by file name, mirroring the
          // write side (and tf.data's compression_type="GZIP").
          val base: java.io.InputStream =
            if (f.endsWith(".gz")) new java.util.zip.GZIPInputStream(in)
            else in
          val din = new java.io.DataInputStream(base)
          new Iterator[(String, Array[Byte])] {
            private var nextRec = advance()
            private def advance(): Option[Array[Byte]] = {
              val r = TFRecordCodec.readRecord(din)
              if (r.isEmpty) din.close()
              r
            }
            override def hasNext: Boolean = nextRec.isDefined
            override def next(): (String, Array[Byte]) = {
              val r = nextRec.get
              nextRec = advance()
              (f, r)
            }
          }
        }
      }
      .toDF("file", "record")
  }
}
