import org.apache.spark.sql.SparkSession
import graft.dsl.Dsl._, graft.exec.Compiler, graft.model.TestGraph
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val c = new Compiler(TestGraph(spark, d))
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"TIME $name ${(System.nanoTime()-t0)/1e9}")
    }
    t("warm-lineitem-count")(c.run(g().nWithLabel("Lineitem").count().t).collect())
    t("repeat2-a")(c.run(g().nWithLabelWhere("Order", eq_("o_orderstatus","F")).repeat(sub().out(), 2).count().t).collect())
    t("repeat2-b")(c.run(g().nWithLabelWhere("Order", eq_("o_orderstatus","F")).repeat(sub().out(), 2).count().t).collect())
    t("hop1")(c.run(g().nWithLabelWhere("Order", eq_("o_orderstatus","F")).out().count().t).collect())
    spark.stop()
  }
}
