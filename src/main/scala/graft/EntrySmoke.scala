package graft


/** Local stand-in for the driver's flagship smoke check: calls
  * `SparkEntry.entry` exactly as the driver does and prints the row count
  * (driver contract: rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.driverLocal()
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
