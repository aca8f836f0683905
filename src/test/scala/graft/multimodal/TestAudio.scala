package graft.multimodal

/** Shared WAV fixture for envelope-hash specs: an amplitude-MODULATED
  * tone (the envelope varies, so gradient bits are decisive — a flat
  * constant-amplitude tone makes every envelope comparison a numeric
  * coin flip; the envelopeHash scaladoc carries that caveat).
  * `perturbAt` nudges one sample by one quantization step; `gain`
  * scales uniformly — both must stay within a couple of hash bits. */
object TestAudio {
  def seededWav(seed: Int, perturbAt: Int = -1, gain: Double = 1.0): Array[Byte] = {
    val n = 4000
    val pcm = Array.tabulate[Byte](n) { j =>
      val amp = 0.3 + 0.7 * math.abs(math.sin(j * 0.003 + seed))
      val v = math.sin(j * 0.25 + seed) * amp * 100 * gain
      v.toByte
    }
    if (perturbAt >= 0) pcm(perturbAt) = (pcm(perturbAt) + 2).toByte
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
