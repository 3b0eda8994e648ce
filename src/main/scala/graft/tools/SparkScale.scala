package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: pure-CPU Spark task scaling (no IO, no encoders). */
object SparkScale {
  def main(args: Array[String]): Unit = {
    Seq(8, 32, 8, 32).foreach { level =>
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val sc = spark.sparkContext
      // pure CPU: sum of splitmix over ranges, `level*2` partitions
      def run(): Double = {
        val t0 = System.nanoTime()
        sc.parallelize(0 until level * 2, level * 2).map { p =>
          var s = 0L
          var i = 0L
          val n = 400000000L / (level * 2)
          while (i < n) { s ^= graft.ops.Hashing.mix(i); i += 1 }
          s
        }.reduce(_ ^ _)
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      println(f"[sparkscale] level=$level wall=${run()}%.2f s")
      spark.stop()
    }
  }
}
