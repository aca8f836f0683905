package graft.multimodal

/** Shared PNG fixture for perceptual-hash specs: 32×24 black/white 4×3
  * blocks aligned to aHash's 8×8 grid. The block pattern is a
  * splitmix64-mixed function of the seed, so distinct seeds land ~32
  * aHash bits apart (uncorrelated), while `perturb` flips exactly ONE
  * block — aHash hamming distance 1. (A smooth gradient fixture fails
  * here: aHash thresholds against the image mean, which a constant
  * seed offset doesn't move.) */
object TestImages {
  def seededPng(seed: Int, perturb: Boolean = false): Array[Byte] = {
    var z = seed.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val pattern = (z ^ (z >>> 31)) ^ (if (perturb) 1L else 0L)
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y / 3) * 8 + (x / 4)
        img.setRGB(x, y,
          if (((pattern >>> cell) & 1L) == 1L) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
