package graft.ingest

import graft.SparkSpec
import graft.model.Schemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class OrdersSpec extends SparkSpec {

  lazy val orders = SampleData.orders(spark, 500, seed = 9L)

  test("orders schema matches the declared nested schema") {
    assert(orders.schema.map(f => (f.name, f.dataType)) ===
      Schemas.orders.map(f => (f.name, f.dataType)))
  }

  test("totalAmount equals the sum of price*quantity over items") {
    val bad = orders.select(col("totalAmount"),
        aggregate(col("items"), lit(0).cast(DecimalType(12, 2)),
          (acc, it) => (acc + it.getField("price") * it.getField("quantity"))
            .cast(DecimalType(12, 2))).as("recomputed"))
      .filter(col("totalAmount") =!= col("recomputed"))
    assert(bad.count() === 0)
  }

  test("items arrays have 1..5 elements with valid category prices") {
    val sizes = orders.select(size(col("items")).as("n"))
      .agg(min("n"), max("n")).collect()(0)
    assert(sizes.getInt(0) >= 1 && sizes.getInt(1) <= 5)
    val item = orders.select(explode(col("items")).as("it"))
    val badPrice = item.filter(
      (col("it.category") === "Electronics" &&
        (col("it.price") < 299.99 || col("it.price") > 1299.99)) ||
      (col("it.category") === "Books" &&
        (col("it.price") < 4.99 || col("it.price") > 49.99)))
    assert(badPrice.count() === 0)
    assert(item.filter(col("it.quantity") < 1 || col("it.quantity") > 5).count() === 0)
  }

  test("generator is deterministic per seed") {
    val a = SampleData.orders(spark, 50, seed = 3L).collect().toSeq
    val b = SampleData.orders(spark, 50, seed = 3L).collect().toSeq
    assert(a === b)
  }
}
