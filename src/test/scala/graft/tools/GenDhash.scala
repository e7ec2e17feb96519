package graft.tools
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import java.io.ByteArrayOutputStream

object GenDhash {
  def main(args: Array[String]): Unit = {
    def mkPng(v: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(9, 8, BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 9) r.setSample(x, y, 0, v(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // closed-form expected hash from the pixel formula
    def expected(v: (Int, Int) => Int): Long = {
      var bits = 0L; var i = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        if (v(x + 1, y) > v(x, y)) bits |= (1L << i)
        i += 1
      }
      bits
    }
    val fA = (x: Int, y: Int) => (x * 37 + y * 11) % 256
    val fB = (x: Int, y: Int) => 255 - ((x * 53 + y * 29) % 256)
    for ((name, f) <- Seq(("A", fA), ("B", fB))) {
      val png = mkPng(f)
      val got = graft.ops.Multimodal.dHashOf(png)
      println(s"$name png_hex=${png.map("%02x".format(_)).mkString}")
      println(s"$name expected=${expected(f)} got=$got match=${got.contains(expected(f))}")
    }
  }
}
