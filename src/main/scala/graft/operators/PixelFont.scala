package graft.operators

import java.awt.image.BufferedImage

/** Minimal 5×7 bitmap font for plot decorations (titles, tick labels,
  * colorbar scales). Drawing text with `Graphics2D.drawString` would pull
  * in AWT's font machinery — fontconfig, platform font files, per-JVM
  * antialiasing — which both breaks on headless containers with no fonts
  * installed and makes PNG bytes environment-dependent. A built-in glyph
  * table costs ~60 lines and makes every decorated pixel deterministic
  * (ShadePlotSpec pins bytes across renders). Lowercase maps to
  * uppercase; unknown characters draw as a hollow box. */
object PixelFont {

  val glyphW = 5
  val glyphH = 7

  // 7 rows of 5 cells; 'X' = lit
  private val glyphs: Map[Char, Seq[String]] = Map(
    '0' -> Seq(".XXX.", "X...X", "X..XX", "X.X.X", "XX..X", "X...X", ".XXX."),
    '1' -> Seq("..X..", ".XX..", "..X..", "..X..", "..X..", "..X..", ".XXX."),
    '2' -> Seq(".XXX.", "X...X", "....X", "...X.", "..X..", ".X...", "XXXXX"),
    '3' -> Seq("XXXXX", "....X", "...X.", "..XX.", "....X", "X...X", ".XXX."),
    '4' -> Seq("...X.", "..XX.", ".X.X.", "X..X.", "XXXXX", "...X.", "...X."),
    '5' -> Seq("XXXXX", "X....", "XXXX.", "....X", "....X", "X...X", ".XXX."),
    '6' -> Seq("..XX.", ".X...", "X....", "XXXX.", "X...X", "X...X", ".XXX."),
    '7' -> Seq("XXXXX", "....X", "...X.", "..X..", ".X...", ".X...", ".X..."),
    '8' -> Seq(".XXX.", "X...X", "X...X", ".XXX.", "X...X", "X...X", ".XXX."),
    '9' -> Seq(".XXX.", "X...X", "X...X", ".XXXX", "....X", "...X.", ".XX.."),
    'A' -> Seq(".XXX.", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    'B' -> Seq("XXXX.", "X...X", "X...X", "XXXX.", "X...X", "X...X", "XXXX."),
    'C' -> Seq(".XXXX", "X....", "X....", "X....", "X....", "X....", ".XXXX"),
    'D' -> Seq("XXXX.", "X...X", "X...X", "X...X", "X...X", "X...X", "XXXX."),
    'E' -> Seq("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "XXXXX"),
    'F' -> Seq("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "X...."),
    'G' -> Seq(".XXXX", "X....", "X....", "X..XX", "X...X", "X...X", ".XXXX"),
    'H' -> Seq("X...X", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    'I' -> Seq(".XXX.", "..X..", "..X..", "..X..", "..X..", "..X..", ".XXX."),
    'J' -> Seq("..XXX", "...X.", "...X.", "...X.", "...X.", "X..X.", ".XX.."),
    'K' -> Seq("X...X", "X..X.", "X.X..", "XX...", "X.X..", "X..X.", "X...X"),
    'L' -> Seq("X....", "X....", "X....", "X....", "X....", "X....", "XXXXX"),
    'M' -> Seq("X...X", "XX.XX", "X.X.X", "X.X.X", "X...X", "X...X", "X...X"),
    'N' -> Seq("X...X", "XX..X", "X.X.X", "X..XX", "X...X", "X...X", "X...X"),
    'O' -> Seq(".XXX.", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    'P' -> Seq("XXXX.", "X...X", "X...X", "XXXX.", "X....", "X....", "X...."),
    'Q' -> Seq(".XXX.", "X...X", "X...X", "X...X", "X.X.X", "X..X.", ".XX.X"),
    'R' -> Seq("XXXX.", "X...X", "X...X", "XXXX.", "X.X..", "X..X.", "X...X"),
    'S' -> Seq(".XXXX", "X....", "X....", ".XXX.", "....X", "....X", "XXXX."),
    'T' -> Seq("XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "..X.."),
    'U' -> Seq("X...X", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    'V' -> Seq("X...X", "X...X", "X...X", "X...X", "X...X", ".X.X.", "..X.."),
    'W' -> Seq("X...X", "X...X", "X...X", "X.X.X", "X.X.X", "XX.XX", "X...X"),
    'X' -> Seq("X...X", "X...X", ".X.X.", "..X..", ".X.X.", "X...X", "X...X"),
    'Y' -> Seq("X...X", "X...X", ".X.X.", "..X..", "..X..", "..X..", "..X.."),
    'Z' -> Seq("XXXXX", "....X", "...X.", "..X..", ".X...", "X....", "XXXXX"),
    '.' -> Seq(".....", ".....", ".....", ".....", ".....", ".XX..", ".XX.."),
    ',' -> Seq(".....", ".....", ".....", ".....", ".XX..", "..X..", ".X..."),
    ':' -> Seq(".....", ".XX..", ".XX..", ".....", ".XX..", ".XX..", "....."),
    '-' -> Seq(".....", ".....", ".....", "XXXXX", ".....", ".....", "....."),
    '+' -> Seq(".....", "..X..", "..X..", "XXXXX", "..X..", "..X..", "....."),
    '=' -> Seq(".....", ".....", "XXXXX", ".....", "XXXXX", ".....", "....."),
    '/' -> Seq("....X", "...X.", "...X.", "..X..", ".X...", ".X...", "X...."),
    '(' -> Seq("...X.", "..X..", ".X...", ".X...", ".X...", "..X..", "...X."),
    ')' -> Seq(".X...", "..X..", "...X.", "...X.", "...X.", "..X..", ".X..."),
    '%' -> Seq("XX..X", "XX.X.", "...X.", "..X..", ".X...", ".X.XX", "X..XX"),
    '_' -> Seq(".....", ".....", ".....", ".....", ".....", ".....", "XXXXX"),
    ' ' -> Seq(".....", ".....", ".....", ".....", ".....", ".....", "....."),
    '?' -> Seq("XXXXX", "X...X", "X...X", "X...X", "X...X", "X...X", "XXXXX"))

  /** Pixel width of `text` at `scale` (glyphs + 1-px letter spacing). */
  def width(text: String, scale: Int = 1): Int =
    if (text.isEmpty) 0 else (text.length * (glyphW + 1) - 1) * scale

  /** Draw `text` with its top-left corner at (x0, y0); out-of-bounds
    * pixels are clipped, not errors. */
  def draw(img: BufferedImage, x0: Int, y0: Int, text: String, rgb: Int,
      scale: Int = 1): Unit = {
    var cx = x0
    // Locale.ROOT: default-locale toUpperCase maps 'i' to dotted İ on
    // tr_TR JVMs — a glyph we don't have — breaking byte determinism
    text.toUpperCase(java.util.Locale.ROOT).foreach { ch =>
      val g = glyphs.getOrElse(ch, glyphs('?'))
      for {
        r <- 0 until glyphH; c <- 0 until glyphW if g(r).charAt(c) == 'X'
        sy <- 0 until scale; sx <- 0 until scale
      } {
        val px = cx + c * scale + sx
        val py = y0 + r * scale + sy
        if (px >= 0 && px < img.getWidth && py >= 0 && py < img.getHeight)
          img.setRGB(px, py, rgb)
      }
      cx += (glyphW + 1) * scale
    }
  }
}
