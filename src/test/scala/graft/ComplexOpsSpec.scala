package graft

import org.apache.spark.sql.functions._

import graft.functions.ComplexOps._

class ComplexOpsSpec extends SparkSpec {
  import spark.implicits._

  private val z = Seq((3.0, 4.0, 1.0, -2.0)).toDF("ar", "ai", "br", "bi")
    .select(complex(col("ar"), col("ai")).as("a"), complex(col("br"), col("bi")).as("b"))

  test("amp, phase, arithmetic on hand values") {
    val r = z.select(
      amp(col("a")).as("amp"),
      phase(col("a")).as("ph"),
      re(sub(col("a"), col("b"))).as("sr"), im(sub(col("a"), col("b"))).as("si"),
      re(mul(col("a"), col("b"))).as("mr"), im(mul(col("a"), col("b"))).as("mi"))
      .as[(Double, Double, Double, Double, Double, Double)].head()
    assert(r._1 == 5.0)
    assert(math.abs(r._2 - math.toDegrees(math.atan2(4.0, 3.0))) < 1e-12)
    assert((r._3, r._4) == (2.0, 6.0))
    // (3+4i)(1-2i) = 3-6i+4i-8i² = 11-2i
    assert((r._5, r._6) == (11.0, -2.0))
  }

  test("Stokes identities: I²=Q²+U²+V² for pure single-correlation signal") {
    // xx = (2, 0), yy = (0, 0), xy = yx = 0 → I = Q = 1, U = V = 0
    val df = Seq((2.0, 0.0)).toDF("r", "i").select(
      complex(col("r"), col("i")).as("xx"),
      complex(lit(0.0), lit(0.0)).as("yy"),
      complex(lit(0.0), lit(0.0)).as("xy"),
      complex(lit(0.0), lit(0.0)).as("yx"))
    val r = df.select(
      re(stokesI(col("xx"), col("yy"))).as("i"),
      re(stokesQ(col("xx"), col("yy"))).as("q"),
      re(stokesU(col("xy"), col("yx"))).as("u"),
      re(stokesV(col("xy"), col("yx"))).as("v"))
      .as[(Double, Double, Double, Double)].head()
    assert(r == ((1.0, 1.0, 0.0, 0.0)))
  }

  test("stokesV extracts circular polarization: xy = i, yx = -i → V = 1") {
    val df = spark.range(1).select(
      complex(lit(0.0), lit(1.0)).as("xy"), complex(lit(0.0), lit(-1.0)).as("yx"))
    val v = df.select(re(stokesV(col("xy"), col("yx"))).as("v"),
      im(stokesV(col("xy"), col("yx"))).as("vi"))
      .as[(Double, Double)].head()
    assert(v == ((1.0, 0.0)))
  }
}
