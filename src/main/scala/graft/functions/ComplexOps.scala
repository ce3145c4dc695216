package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex-number column support. Spark has no native complex type; the
  * engine's convention (SURVEY.md §1.1) is `struct<re: double, im: double>`
  * — all operations below are plain codegen'd expressions over that struct.
  *
  * Mirrors the reference's axis-mapper surface for visibility data
  * (`shade_ms/data_mappers.py :: data_mappers` — amp/phase/real/imag [U])
  * plus column arithmetic (residuals `CORRECTED_DATA-MODEL_DATA` [U]) and
  * Stokes products from correlation pairs [U].
  */
object ComplexOps {

  def complex(re: Column, im: Column): Column =
    struct(re.as("re"), im.as("im"))

  def re(z: Column): Column = z.getField("re")
  def im(z: Column): Column = z.getField("im")

  /** `abs(z)` (`data_mappers['amp']` [U]). */
  def amp(z: Column): Column = sqrt(re(z) * re(z) + im(z) * im(z))

  /** `degrees(angle(z))` (`data_mappers['phase']` [U]). */
  def phase(z: Column): Column = degrees(atan2(im(z), re(z)))

  def add(a: Column, b: Column): Column = complex(re(a) + re(b), im(a) + im(b))

  /** Residuals: `CORRECTED_DATA - MODEL_DATA` [U]. */
  def sub(a: Column, b: Column): Column = complex(re(a) - re(b), im(a) - im(b))

  def mul(a: Column, b: Column): Column = complex(
    re(a) * re(b) - im(a) * im(b),
    re(a) * im(b) + im(a) * re(b))

  def conj(z: Column): Column = complex(re(z), -im(z))

  def scale(z: Column, k: Column): Column = complex(re(z) * k, im(z) * k)

  /** Stokes products from linear-feed correlations (XX, XY, YX, YY):
    * I=(XX+YY)/2, Q=(XX−YY)/2, U=(XY+YX)/2, V=(XY−YX)/2i — the corr
    * handling in `data_mappers.py` [U]. */
  def stokesI(xx: Column, yy: Column): Column = scale(add(xx, yy), lit(0.5))
  def stokesQ(xx: Column, yy: Column): Column = scale(sub(xx, yy), lit(0.5))
  def stokesU(xy: Column, yx: Column): Column = scale(add(xy, yx), lit(0.5))
  /** V = (XY−YX)/(2i): division by i maps (re, im) → (im, −re). */
  def stokesV(xy: Column, yx: Column): Column = {
    val d = sub(xy, yx)
    complex(im(d) * 0.5, -re(d) * 0.5)
  }
}
