package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** SURVEY.md §2 (LLM-pipeline extensions) — multimodal preprocessing beyond
  * the decode round-trip in [[LlmVector]]: the decode→resize chain and
  * frame sampling, the two transforms every image/video training pipeline
  * runs before anything model-specific.
  *
  * Payloads are deterministic synthetic media derived from `documents.text`
  * (the container ships no image/audio libraries beyond the JDK — the
  * builder-prompt stub rule), but the Spark-side plumbing is the real
  * thing: binary columns built and consumed per-partition (codec setup
  * amortized, blobs never touch the driver), frame arrays flowing through
  * `posexplode` and a hash aggregate. At 100 TB swap the synthetic
  * construction for real camera/render payloads; every plan shape here
  * survives unchanged.
  */
object LlmMultimodal {

  /** Pre-pays the JVM's one-time image-codec costs (VERDICT r15 #4 —
    * the recurring "transient" first sample on llm_multimodal_decode):
    * the first PNG encode/decode in a process walks the ImageIO plugin
    * registry and classloads the PNG reader/writer + deflater paths,
    * and the per-pixel render/decode loops need a few hundred
    * thousand iterations before C2 compiles them (measured in
    * isolation: reps decline 2.1 → 1.3 → 1.1 s — classload alone only
    * removed ~0.15 s, the rest is JIT). 512 round-trips of ~500-px
    * images ≈ 250 k loop iterations per kernel — past the OSR
    * threshold — for ~0.3 s of warmup. local-mode executor threads
    * share the JVM, so one driver-side pass warms every multimodal
    * row; Bench/TimeQ call this in their UNTIMED warmup so per-query
    * numbers are codec-steady-state (the same policy as the session/
    * codegen warmup — on a real cluster this cost recurs once per
    * executor JVM, not per query). */
  def warmMediaCodecs(): Unit = {
    var i = 0
    var sink = 0L
    while (i < 512) {
      val png = Pixels.encodePng("imageio warmup " + ("x" * (i % 97)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      var j = 0
      val (w, h) = (img.getWidth, img.getHeight)
      while (j < w * h) { sink += img.getRGB(j % w, j / w) & 0xff; j += 1 }
      i += 1
    }
    require(sink != 0, "codec warmup decoded all-zero pixels")
  }
  def specs: Seq[Spec] = Seq(resize, frameSample, audioFeatures)

  /** Audio feature extraction — windowed RMS energy + zero-crossing rate,
    * the two features every speech/audio curation pipeline computes before
    * anything model-specific (silence trimming, energy filters, rough
    * voicedness). The waveform is a deterministic 256-sample sawtooth
    * derived from doc_id (the container ships no audio codecs — stub rule;
    * sample generation is libm-free: multiply, divide-by-2^6, floor, so
    * every sample is IEEE-exact in both engines). The FRAMING MATH is the
    * real thing: 4 frames of 64 samples, per-frame sum-of-squares →
    * `sqrt(E/64)` (sqrt is correctly-rounded — exact parity), crossings
    * via consecutive-pair sign products. Everything is built-in array
    * HOFs (`transform`/`slice`/`zip_with`/`aggregate`) — map-only, no
    * shuffle until the final ORDER BY; at 100 TB swap the synthetic
    * generator for a real PCM decode (the [[Pixels]] mapPartitions
    * pattern) and the framing plan is unchanged. HOF lambdas are
    * interpreted per element (~1k evals/doc here — fine); a hot
    * production path would promote the frame kernel to a codegen'd
    * native expression exactly as `graft_cosine` did. */
  private val audioFeatures = Spec(
    "llm_multimodal_audio",
    """WITH base AS (
      |  SELECT doc_id, (doc_id % 7) + 1 AS k FROM documents),
      |pcm AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 256),
      |      t -> 2.0 * ((k * t) / 64.0 - floor((k * t) / 64.0)) - 1.0)
      |      AS samples
      |  FROM base),
      |frames AS (
      |  SELECT doc_id, f.frame_id,
      |    samples[f.frame_id * 64 + 1 : f.frame_id * 64 + 64] AS fr
      |  FROM pcm CROSS JOIN (SELECT unnest(range(0, 4)) AS frame_id) f)
      |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
      |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(fr, x -> x * x)), (a, b) -> a + b) / 64.0) AS rms,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, 64),
      |      i -> CASE WHEN fr[i] * fr[i + 1] < 0
      |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |    (a, b) -> a + b) AS BIGINT) AS zcr
      |FROM frames ORDER BY doc_id, frame_id""".stripMargin) { (s, d) =>
    val frameLen = 64
    Tables.documents(s, d)
      .select(col("doc_id"), ((col("doc_id") % 7) + 1).as("k"))
      .withColumn("samples", transform(sequence(lit(0), lit(255)), t => {
        val phase = (col("k") * t).cast("double") / lit(64.0)
        lit(2.0) * (phase - floor(phase)) - lit(1.0)
      }))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          f => slice(col("samples"), f * frameLen + 1, lit(frameLen)))))
      .select(col("doc_id"), col("pos").cast("long").as("frame_id"),
        col("col").as("fr"))
      .select(col("doc_id"), col("frame_id"),
        sqrt(aggregate(col("fr"), lit(0.0),
          (acc, x) => acc + x * x) / lit(64.0)).as("rms"),
        aggregate(
          zip_with(slice(col("fr"), 1, 63), slice(col("fr"), 2, 63),
            (a, b) => when(a * b < 0, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("zcr"))
      .orderBy(col("doc_id"), col("frame_id"))
  }

  /** Decode → nearest-neighbor resize to a fixed 8×6 thumbnail — the
    * standard first transform of an image-training pipeline (uniform
    * tensor shape). The PNG is built and parsed with the in-JDK codec
    * (javax.imageio, like llm_multimodal_decode); the resize kernel is an
    * explicit integer nearest-neighbor map (sx = ⌊dx·w/8⌋, sy = ⌊dy·h/6⌋)
    * rather than AWT's scaler so the oracle can predict every output pixel
    * from the source text. Lossless-PNG + integer index math ⇒ bit-exact
    * parity with the SQL below, NULL text decoding as the empty document
    * (COALESCE on both sides). */
  private val resize = Spec(
    "llm_multimodal_resize",
    """SELECT doc_id,
      |  CAST((length(text) % 32) + 4 AS BIGINT) AS width,
      |  CAST((length(text) % 24) + 3 AS BIGINT) AS height,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(generate_series(1, 48),
      |      i -> CAST(i AS BIGINT) *
      |        CASE WHEN length(text) = 0 THEN 0
      |             ELSE ascii(text[((
      |               CAST(floor(((i - 1) // 8) * ((length(text) % 24) + 3)
      |                 / 6.0) AS BIGINT) * ((length(text) % 32) + 4)
      |               + CAST(floor(((i - 1) % 8) * ((length(text) % 32) + 4)
      |                 / 8.0) AS BIGINT))
      |               % length(text)) + 1]) % 256
      |        END)),
      |    (x, y) -> x + y) AS BIGINT) AS px_checksum
      |FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val pngs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, Pixels.encodePng(text)) }
      }.toDF("doc_id", "png").as[(Long, Array[Byte])]
    pngs.mapPartitions { it =>
      Pixels.useMemCache // per-executor: no temp file per decoded image
      it.map { case (id, png) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        val (w, h) = (img.getWidth, img.getHeight)
        var checksum = 0L
        var i = 0
        while (i < 48) {
          val sx = ((i % 8) * w) / 8
          val sy = ((i / 8) * h) / 6
          checksum += (i + 1).toLong * (img.getRGB(sx, sy) & 0xff)
          i += 1
        }
        (id, w.toLong, h.toLong, checksum)
      }
    }.toDF("doc_id", "width", "height", "px_checksum")
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over a synthetic "video": the document is sliced into
    * F = (len % 6) + 2 codepoint ranges (frames, as binary blobs), every
    * 2nd frame is kept — the stride-sampling every video pipeline applies
    * before feature extraction — and a per-doc aggregate summarizes the
    * kept frames. The frame array flows through `posexplode` and a hash
    * aggregate: frames are rows, not driver state, so a 2-hour 100 TB
    * video corpus shards by (doc, frame) exactly like this. Frame
    * boundaries are integer floor division on CODEPOINT indices (slices
    * re-encoded as UTF-8), so a multi-byte character cannot shift them. */
  private val frameSample = Spec(
    "llm_multimodal_framesample",
    """SELECT doc_id,
      |  CAST((length(text) % 6) + 2 AS BIGINT) AS n_frames,
      |  CAST(((length(text) % 6) + 2 + 1) // 2 AS BIGINT) AS n_sampled,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(generate_series(0, (length(text) % 6) + 1),
      |      j -> CASE WHEN j % 2 = 1 THEN 0 ELSE
      |        CAST(j + 1 AS BIGINT) * list_reduce(
      |          list_prepend(CAST(0 AS BIGINT),
      |            list_transform(generate_series(
      |                CAST(floor(j * length(text)
      |                  / ((length(text) % 6) + 2.0)) AS BIGINT) + 1,
      |                CAST(floor((j + 1) * length(text)
      |                  / ((length(text) % 6) + 2.0)) AS BIGINT)),
      |              p -> CAST(ascii(text[p]) AS BIGINT))),
      |          (x, y) -> x + y)
      |      END)),
      |    (x, y) -> x + y) AS BIGINT) AS frame_checksum
      |FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val cps =
            if (text == null) Array.empty[Int] else text.codePoints().toArray
          val n = cps.length
          val f = (n % 6) + 2
          val blobs = (0 until f).map { j =>
            val lo = (j * n) / f
            val hi = ((j + 1) * n) / f
            new String(cps, lo, hi - lo).getBytes("UTF-8")
          }
          (id, blobs)
        }
      }.toDF("doc_id", "frames")
    // Stride-sample, then per-frame feature extraction over the exploded
    // blobs (each frame is a row by the time features run — the shape that
    // shards a real video corpus by (doc, frame)), then the per-doc agg.
    val sampled = frames
      .select(col("doc_id"), size(col("frames")).as("n_frames"),
        posexplode(col("frames")).as(Seq("pos", "frame")))
      .filter(col("pos") % 2 === 0)
      .as[(Long, Int, Int, Array[Byte])]
    sampled.mapPartitions { it =>
      it.map { case (id, nf, pos, frame) =>
        var fsum = 0L
        val cps = new String(frame, "UTF-8").codePoints().iterator()
        while (cps.hasNext) fsum += cps.next().toLong
        (id, nf, pos, fsum)
      }
    }.toDF("doc_id", "n_frames", "pos", "fsum")
      .groupBy(col("doc_id"))
      .agg(
        first(col("n_frames")).cast("long").as("n_frames"),
        count(lit(1)).as("n_sampled"),
        sum((col("pos") + 1) * col("fsum")).as("frame_checksum"))
      .orderBy(col("doc_id"))
  }
}

/** Shared synthetic-media kernels for the multimodal operators (also used
  * by llm_multimodal_decode's sibling pipeline shape in [[LlmVector]]). */
private[operators] object Pixels {

  /** ImageIO's DEFAULT stream wrapper is file-cached: every
    * `ImageIO.read`/`write` call creates (and deletes) a temp file,
    * even over in-memory byte arrays. At 32 concurrent tasks that is
    * per-row filesystem churn — the round-16 scale probe measured it
    * as a 1.35 super-linear slope on llm_multimodal_decode (9.2 s at
    * the 32× amplification). Memory-cached streams are strictly
    * better for these small per-row images; the setter is JVM-global
    * and idempotent, triggered lazily by every encode/decode path. */
  lazy val useMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** text → grayscale PNG, the same construction llm_multimodal_decode
    * documents: w = (n % 32) + 4, h = (n % 24) + 3, pixel i = codepoint
    * (i mod n) masked to a byte (0 for the empty document). */
  def encodePng(text: String): Array[Byte] = {
    useMemCache
    val cps =
      if (text == null) Array.empty[Int] else text.codePoints().toArray
    val n = cps.length
    val w = (n % 32) + 4
    val h = (n % 24) + 3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val b = if (n == 0) 0 else cps(i % n) % 256
      img.setRGB(i % w, i / w, (b << 16) | (b << 8) | b)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

}
