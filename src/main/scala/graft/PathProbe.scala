package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PathProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/tmp/pathprobe/out"
    Seq((1, "a b"), (2, "50%"), (3, "x+y")).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(d)
    val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(
      spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(d), true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        println("DISK toString  = " + f.toString)
        println("DISK toUri     = " + f.toUri.toString)
        println("QUAL toUri     = " + fs.makeQualified(f).toUri.toString)
        println("QUAL toString  = " + fs.makeQualified(f).toString)
      }
    }
    spark.read.parquet(d).select(col("_metadata.file_path")).distinct()
      .collect().foreach(r => println("META file_path = " + r.getString(0)))
    spark.stop()
  }
}
