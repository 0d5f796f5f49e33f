package graft.lang

import graft.SparkSpec
import scala.util.Random

/** Randomized statement sequences applied to BOTH the distributed
  * Interpreter and a trivially-correct driver-side model (a list of
  * maps, the reference's own data structure). Final states must agree —
  * this exercises the insert/update/delete interplay no single spec
  * scenario covers.
  */
class RandomizedInterpreterSpec extends SparkSpec {

  private val names = Vector("ada", "bob", "cyd", "dee", "eli")

  test("interpreter state matches a driver-side model over random scripts") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val it = new Interpreter(spark)
      it.executeScript("CREATE NODE P (name: string, age: int);")
      var model = Vector.empty[(String, Option[Long])]

      (1 to 25).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // insert (age sometimes absent)
            val n = names(rnd.nextInt(names.size))
            if (rnd.nextBoolean()) {
              val a = rnd.nextInt(90).toLong
              it.executeScript(s"INSERT NODE P (name: '$n', age: $a);")
              model :+= (n, Some(a))
            } else {
              it.executeScript(s"INSERT NODE P (name: '$n');")
              model :+= (n, None)
            }
          case 2 => // update age by name
            val n = names(rnd.nextInt(names.size))
            val a = rnd.nextInt(90).toLong
            it.executeScript(s"UPDATE NODE P SET age: $a WHERE name: '$n';")
            model = model.map { case (mn, ma) => if (mn == n) (mn, Some(a)) else (mn, ma) }
          case _ => // delete by name
            val n = names(rnd.nextInt(names.size))
            it.executeScript(s"DELETE NODE P WHERE name: '$n';")
            model = model.filterNot(_._1 == n)
        }
      }

      val got = it.nodes("P").collect()
        .map(r => (r.getAs[String]("name"),
          if (r.isNullAt(r.fieldIndex("age"))) None else Some(r.getAs[Long]("age"))))
        .sorted.toSeq
      assert(got === model.sorted, s"seed=$seed")
    }
  }
}
