package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.ClassifierTraining

class ClassifierTrainingSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("gradient step matches the hand-computed value at w = 0") {
    // z = 0 for every row -> p = 0.5; resid = 0.5 - y
    val feats = Seq((1.0, 1.0), (0.0, -1.0)).toDF("y", "x1")
    val r = ClassifierTraining.logregGradientStep(
      feats, "y", Seq("x1"), weights = Seq(0.0, 0.0), lr = 1.0).collect()(0)
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("grad_bias") == 0.0)
    assert(r.getAs[Double]("grad_x1") == -0.5)
    assert(r.getAs[Double]("w_bias") == 0.0)
    assert(r.getAs[Double]("w_x1") == 0.5) // w - lr * grad = 0 - 1 * (-0.5)
  }

  test("driver loop over steps shrinks the gradient on separable data") {
    val feats = (1 to 50).map(i => (1.0, 1.0 + i / 100.0)) ++
      (1 to 50).map(i => (0.0, -1.0 - i / 100.0))
    val df = feats.toDF("y", "x1")
    var w = Seq(0.0, 0.0)
    var gNorms = Vector.empty[Double]
    (1 to 5).foreach { _ =>
      val r: Row = ClassifierTraining.logregGradientStep(
        df, "y", Seq("x1"), w, lr = 2.0).collect()(0)
      gNorms :+= math.abs(r.getAs[Double]("grad_x1"))
      w = Seq(r.getAs[Double]("w_bias"), r.getAs[Double]("w_x1"))
    }
    assert(w(1) > 1.0, s"x1 weight should grow positive, got ${w(1)}")
    assert(gNorms.last < gNorms.head,
      s"gradient magnitude should shrink: $gNorms")
  }

  test("weight arity is validated") {
    val df = Seq((1.0, 1.0)).toDF("y", "x1")
    intercept[IllegalArgumentException] {
      ClassifierTraining.logregGradientStep(df, "y", Seq("x1"), Seq(0.0), 0.1)
    }
  }
}
