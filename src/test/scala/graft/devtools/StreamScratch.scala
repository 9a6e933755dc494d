package graft.streaming

import org.apache.spark.sql.SparkSession

/** Dev scratch: time the append-mode streaming path at varying chunk counts
  * (not part of the API). */
object StreamScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).map(_.split(':')).foreach { case Array(c, p, rest @ _*) =>
      val chunks = c.toInt
      spark.conf.set("spark.sql.shuffle.partitions", p.toInt)
      // optional third field: state-store provider ("rocksdb" | "hdfs")
      if (rest.headOption.contains("rocksdb"))
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      val work = java.nio.file.Files.createTempDirectory(s"ss-$chunks").toString
      val t0 = System.nanoTime()
      val n = Streams.streamWindowedAppendFromParquet(spark, dir, work, chunks).count()
      println(f"[scratch] chunks=$chunks parts=$p ${rest.headOption.getOrElse("hdfs")}: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
