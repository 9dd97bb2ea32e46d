package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.transform.Transform

/** Named-dataset catalog with attached default transformer chains — the
  * analog of fuel's named datasets (MNIST/CIFAR/... are H5PYDataset
  * subclasses binding a filename plus `default_transformers`; reference:
  * fuel/datasets/base.py:43-49,83-95 and fuel/transformers/defaults.py).
  *
  * `register` binds name → (loader, key order, default transforms);
  * [[defaultStream]] is fuel's `DataStream.default_stream`: load, then fold
  * the dataset's default chain over it. Catalyst collapses the chain into
  * the scan projection, so defaults cost nothing when unused downstream.
  */
final class Catalog(spark: SparkSession) {
  private case class Entry(load: () => DataFrame, order: Seq[Column], defaults: Seq[Transform])
  private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  def register(name: String, load: () => DataFrame, order: Seq[Column],
      defaults: Seq[Transform] = Nil): this.type = {
    entries(name) = Entry(load, order, defaults)
    this
  }

  /** Register every test table from `dir` with its natural key order. */
  def registerTestTables(dir: String): this.type = {
    val keys: Map[String, Seq[String]] = Map(
      "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
      "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber"),
      "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    keys.foreach { case (n, ks) =>
      register(n, () => Tables.load(spark, dir, n), ks.map(col))
    }
    this
  }

  /** Register one split of a split-partitioned artifact — e.g. a
    * [[graft.text.Curation.materializeTokens]] output — as a named dataset
    * with its default transformer chain. This completes fuel's
    * named-dataset story for the engine's OWN curated artifacts (MNIST
    * binds a filename plus `default_transformers`,
    * fuel/datasets/mnist.py:24-27; here the training loop asks the
    * catalog for e.g. "curated_tokens/train" and gets the split-PRUNED
    * scan with the defaults folded in — Catalyst collapses the chain
    * into the scan projection). */
  def registerSplit(name: String, path: String, split: String, order: Seq[Column],
      defaults: Seq[Transform] = Nil): this.type =
    register(name, () => SplitSource.read(spark, path, split), order, defaults)

  /** fuel's public-dataset MNIST binding re-expressed over a parquet
    * fixture (fuel/datasets/mnist.py:7-33 binds filename `mnist.hdf5`
    * plus `default_transformers = uint8_pixels_to_floatX(('features',))`,
    * i.e. ScaleAndShift(1/255, 0) then Cast(floatX) —
    * fuel/transformers/defaults.py:6-13). Expected schema at `path`:
    * (idx bigint, features array<...> of raw pixel ints in [0, 255],
    * label). [[defaultStream]] then yields floatX features in [0, 1] —
    * the exact `default_stream` contract a fuel user gets from
    * `MNIST(('train',)).default_stream()`. Any MNIST-shaped parquet
    * works; tests exercise it over a deterministic mini fixture. */
  def registerMnist(path: String, name: String = "mnist-mini"): this.type = {
    import graft.transform.{Cast, ScaleAndShift}
    register(name, () => spark.read.parquet(path),
      Seq(col("idx")),
      Seq(ScaleAndShift(1.0 / 255, 0.0, Seq("features")),
        Cast("floatX", Seq("features"))))
  }

  /** fuel's CIFAR-10 binding re-expressed over a parquet fixture with a
    * BINARY-image default chain (fuel/datasets/cifar10.py:6-26 binds
    * `cifar10.hdf5` plus the same `uint8_pixels_to_floatX` defaults):
    * where MNIST's fixture carries raw pixel int arrays, this one
    * carries ENCODED image bytes — the storage shape of every web-scale
    * image corpus — so the default chain must run the real codec:
    * [[graft.image.ImageOps.imagesFromBytes]] (PNG/JPEG decode →
    * Frame), then [[graft.image.ImageOps.pxToUnit]] (uint8 → unit
    * floats), then the floatX cast. Expected schema at `path`:
    * (idx bigint, features binary — encoded image bytes, label).
    * [[defaultStream]] yields (idx, features array<floatX> in [0, 1],
    * label) — `CIFAR10(('train',)).default_stream()`'s contract over
    * codec-backed storage. */
  def registerCifar10(path: String, name: String = "cifar10-mini"): this.type = {
    import graft.transform.{Cast, Mapping}
    import graft.image.ImageOps
    register(name, () => spark.read.parquet(path),
      Seq(col("idx")),
      Seq(Mapping(replace = Seq("features" -> ImageOps.imagesFromBytes(col("features")))),
        Mapping(replace = Seq("features" -> ImageOps.pxToUnit(col("features")))),
        Cast("floatX", Seq("features"))))
  }

  /** fuel's YouTubeAudio binding over a parquet fixture with a
    * binary-AUDIO default chain (fuel/datasets/youtube_audio.py:5-30
    * binds `youtube_audio/{id}.hdf5` exposing a raw waveform source):
    * the fixture carries WAV bytes; the default chain runs the real
    * javax.sound codec ([[graft.image.AudioOps.decodeWav]]) and lands
    * the unit-amplitude float waveform — the third modality (after
    * MNIST's scalar arrays and CIFAR-10's encoded images) through the
    * SAME default-transformer mechanism. Expected schema at `path`:
    * (idx bigint, features binary — WAV bytes, label optional).
    * [[defaultStream]] yields (idx, features array<floatX> in [-1, 1],
    * ...). */
  def registerYoutubeAudio(path: String, name: String = "youtube-audio-mini"): this.type = {
    import graft.transform.{Cast, Mapping}
    import graft.image.AudioOps
    register(name, () => spark.read.parquet(path),
      Seq(col("idx")),
      Seq(Mapping(replace = Seq("features" -> AudioOps.decodeWav(col("features")))),
        Mapping(replace = Seq("features" -> col("features")("pcm"))),
        Cast("floatX", Seq("features"))))
  }

  /** fuel's TABULAR bindings — Adult/Iris (fuel/datasets/adult.py:5,
    * iris.py:27) — re-expressed over a split-partitioned parquet
    * fixture. These are the catalog's null case and complete the
    * `default_transformers` contract matrix: where MNIST/CIFAR/audio
    * attach codec-or-rescale chains, Adult binds its splits with an
    * EMPTY default chain (the `Dataset.default_transformers = ()` base
    * contract, fuel/datasets/base.py:43-49), so `default_stream` must
    * be the identity on the raw split-pruned scan — no extra
    * projection, no cast, nothing. Expected storage at `path`: any
    * tabular schema with an `idx` key, partitioned by `split`
    * (train/test — Adult's `which_sets`). */
  def registerAdult(path: String, name: String = "adult-mini"): this.type =
    registerTabular(path, name, Seq("train", "test"))

  /** Iris (fuel/datasets/iris.py:5): the same empty-default tabular
    * binding with fuel's OTHER split shape — a single 'all' split of
    * all 150 examples (`which_sets` valid value is 'all', iris.py:22)
    * where Adult binds train/test. Parameterized, not copied: both
    * bindings are [[registerTabular]] with their split lists. */
  def registerIris(path: String, name: String = "iris-mini"): this.type =
    registerTabular(path, name, Seq("all"))

  /** fuel's SVHN binding — the FIFTH catalog shape: RAGGED per-example
    * companion sources (fuel/datasets/svhn.py:22-45,
    * fuel/converters/svhn.py:55-72,133-138). Format 1 stores full
    * house-number scenes: encoded image bytes of VARIABLE size plus
    * five variable-length bounding-box companion arrays per example
    * (bbox_labels/heights/widths/lefts/tops — one entry per digit box,
    * the converter's vlen datasets), each declaring its
    * ('bounding_box', ...) axis labels; format 2 stores 32×32 cropped
    * digits as scalar pixel arrays with no companions. The filename is
    * format-PARAMETERIZED exactly like fuel's
    * `_filename = 'svhn_format_{}.hdf5'` (svhn.py:34): the binding
    * reads `$path/svhn_format_$whichFormat`, and the splits are
    * train/test/'extra' (the somewhat-easier extra training set,
    * svhn.py:27-31), each registered as `name/split` over the
    * partition-PRUNED scan. Defaults = uint8_pixels_to_floatX on
    * ('features',) only (svhn.py:35) applied to the format's storage
    * shape — codec decode → unit floats → floatX for format 1's
    * encoded bytes (CIFAR-10's chain), rescale → floatX for format 2's
    * scalar arrays (MNIST's chain); the ragged companions pass through
    * the chain untouched.
    *
    * Expected storage: parquet partitioned by `split`, with
    * (idx bigint, features binary | array<int>, and for format 1 the
    * five bbox_* array<int> companions). Ragged arrays are native
    * parquet lists — no shapes table, no vlen special dtype: the
    * Spark-first translation of the converter's
    * vlen-dataset + `_shapes` + `_vlen_axis_labels` triple. */
  def registerSvhn(path: String, whichFormat: Int = 1,
      name: String = ""): this.type = {
    require(whichFormat == 1 || whichFormat == 2,
      s"registerSvhn: which_format must be 1 or 2 (svhn.py:22), got $whichFormat")
    import graft.transform.{Cast, Mapping, ScaleAndShift}
    import graft.image.ImageOps
    import graft.types.AxisLabels
    val nm = if (name.isEmpty) s"svhn-format-$whichFormat-mini" else name
    val dataPath = s"$path/svhn_format_$whichFormat"
    val bboxAxes = Seq(
      "bbox_labels" -> Seq("bounding_box", "index"),
      "bbox_heights" -> Seq("bounding_box", "height"),
      "bbox_widths" -> Seq("bounding_box", "width"),
      "bbox_lefts" -> Seq("bounding_box", "x"),
      "bbox_tops" -> Seq("bounding_box", "y"))
    val defaults =
      if (whichFormat == 1)
        Seq(Mapping(replace = Seq("features" -> ImageOps.imagesFromBytes(col("features")))),
          Mapping(replace = Seq("features" -> ImageOps.pxToUnit(col("features")))),
          Cast("floatX", Seq("features")))
      else
        Seq(ScaleAndShift(1.0 / 255, 0.0, Seq("features")),
          Cast("floatX", Seq("features")))
    Seq("train", "test", "extra").foreach { s =>
      register(s"$nm/$s", () => {
        val df = SplitSource.read(spark, dataPath, s)
        val withFeat = AxisLabels.set(df, "features",
          Seq("channel", "height", "width"))
        // Only label companions the stored schema carries (format 2 has
        // none) — the label describes the SOURCE, so it is attached at
        // load, not by a transform.
        bboxAxes.foldLeft(withFeat) { case (d, (c, axes)) =>
          if (d.columns.contains(c)) AxisLabels.set(d, c, axes) else d
        }
      }, Seq(col("idx")), defaults)
    }
    this
  }

  /** CIFAR-100 (fuel/datasets/cifar100.py:6-46): CIFAR-10's encoded-image
    * binding shape with TWO label granularities riding the same scan —
    * coarse_label (20 superclasses) and fine_label (100 classes) — and
    * the same `uint8_pixels_to_floatX` defaults on ('features',) ONLY,
    * so both label columns pass through untouched. Split-aware
    * (train/test — cifar100.py's `which_sets`); expected storage:
    * parquet partitioned by `split` with (idx bigint, features binary,
    * coarse_label int, fine_label int). */
  def registerCifar100(path: String, name: String = "cifar100-mini"): this.type = {
    import graft.transform.{Cast, Mapping}
    import graft.image.ImageOps
    Seq("train", "test").foreach { s =>
      registerSplit(s"$name/$s", path, s, Seq(col("idx")),
        Seq(Mapping(replace = Seq("features" -> ImageOps.imagesFromBytes(col("features")))),
          Mapping(replace = Seq("features" -> ImageOps.pxToUnit(col("features")))),
          Cast("floatX", Seq("features"))))
    }
    this
  }

  /** BinarizedMNIST (fuel/datasets/binarized_mnist.py:6-41): unlabeled
    * {0,1} pixels with the train/valid/TEST split triple and NO default
    * transformers — the class declares none, so the base `()` contract
    * applies (binarization happened at dataset creation; there is
    * nothing left to rescale). */
  def registerBinarizedMnist(path: String,
      name: String = "binarized-mnist-mini"): this.type =
    registerTabular(path, name, Seq("train", "valid", "test"))

  /** CalTech101Silhouettes (fuel/datasets/caltech101_silhouettes.py:6-34):
    * size-PARAMETERIZED filename (`caltech101_silhouettes{16|28}.hdf5` —
    * SVHN's parameterized-name pattern with a size instead of a format),
    * train/valid/test splits, empty defaults (the silhouettes are
    * already binary masks). Invalid sizes reject loudly, matching the
    * reference's ValueError. */
  def registerCaltech101Silhouettes(path: String, size: Int = 28,
      name: String = ""): this.type = {
    require(size == 16 || size == 28,
      s"registerCaltech101Silhouettes: size must be 16 or 28 " +
        s"(caltech101_silhouettes.py:29), got $size")
    val nm = if (name.isEmpty) s"caltech101-silhouettes$size-mini" else name
    registerTabular(s"$path/caltech101_silhouettes$size", nm,
      Seq("train", "valid", "test"))
  }

  /** fuel's ILSVRC2010/2012 bindings (fuel/datasets/imagenet.py:7,44:
    * `ilsvrc<year>.hdf5`, splits train/valid/test, and
    * `default_transformers = rgb_images_from_encoded_bytes(('encoded_images',))`
    * — DECODE ONLY, no rescale and no floatX cast: the chain is ToBytes +
    * ImagesFromBytes, fuel/transformers/defaults.py:40-42). Storage shape
    * at `$path/ilsvrc$year`: (idx bigint, filename string, targets int —
    * nullable for unlabeled splits, encoded_images binary) partitioned by
    * `split` — exactly what [[Ilsvrc.shapeTrain]]/[[Ilsvrc.shapeFlat]]
    * land from the tar-of-tars ingest ([[Archive.tarEntries]]). The
    * year parameterizes the filename (imagenet.py's two classes differ
    * only in it — SVHN's pattern with a year instead of a format). */
  def registerIlsvrc(path: String, year: Int = 2010,
      name: String = ""): this.type = {
    require(year == 2010 || year == 2012,
      s"registerIlsvrc: year must be 2010 or 2012 (imagenet.py:7,44), got $year")
    import graft.transform.Mapping
    import graft.image.ImageOps
    import graft.types.AxisLabels
    val nm = if (name.isEmpty) s"ilsvrc$year-mini" else name
    Seq("train", "valid", "test").foreach { s =>
      register(s"$nm/$s", () =>
        AxisLabels.set(SplitSource.read(spark, s"$path/ilsvrc$year", s),
          "encoded_images", Seq("bytes")),
        Seq(col("idx")),
        Seq(Mapping(replace = Seq("encoded_images" ->
          ImageOps.imagesFromBytes(col("encoded_images"))))))
    }
    this
  }

  /** fuel's CelebA binding (fuel/datasets/celeba.py:33-50): the
    * format-PARAMETERIZED filename `celeba_{aligned_cropped|64}.hdf5`
    * (SVHN's pattern), train/valid/test splits, the standard
    * `uint8_pixels_to_floatX(('features',))` defaults — and the shape
    * that is NEW to the catalog: a WIDE integer target matrix, 40
    * binary attribute annotations per image
    * (fuel/converters/celeba.py:35-39, ('batch', 'target') axes),
    * which must pass through the features-only default chain untouched.
    * Storage: parquet partitioned by `split` with (idx bigint,
    * features binary — encoded image bytes, targets array<int> of 40). */
  def registerCelebA(path: String, whichFormat: String = "aligned_cropped",
      name: String = ""): this.type = {
    require(whichFormat == "aligned_cropped" || whichFormat == "64",
      s"registerCelebA: which_format must be 'aligned_cropped' or '64' " +
        s"(celeba.py:30), got '$whichFormat'")
    import graft.transform.{Cast, Mapping}
    import graft.image.ImageOps
    import graft.types.AxisLabels
    val nm = if (name.isEmpty) s"celeba-$whichFormat-mini" else name
    Seq("train", "valid", "test").foreach { s =>
      register(s"$nm/$s", () => {
        val df = SplitSource.read(spark, s"$path/celeba_$whichFormat", s)
        AxisLabels.set(
          AxisLabels.set(df, "features", Seq("channel", "height", "width")),
          "targets", Seq("target"))
      }, Seq(col("idx")),
        Seq(Mapping(replace = Seq("features" -> ImageOps.imagesFromBytes(col("features")))),
          Mapping(replace = Seq("features" -> ImageOps.pxToUnit(col("features")))),
          Cast("floatX", Seq("features"))))
    }
    this
  }

  /** fuel's DogsVsCats binding (fuel/datasets/dogs_vs_cats.py:6-30):
    * RAGGED decoded image rows — the converter stores each example as a
    * vlen uint8 pixel array with a (channel, height, width) shapes
    * companion (fuel/converters/dogs_vs_cats.py:47-66), i.e. every
    * image keeps its own size; here that is a native parquet list
    * `image_features array<int>` plus `image_features_shapes array<int>`
    * (SVHN format 1's raggedness, applied to the pixel payload itself).
    * Two reference quirks preserved exactly: the defaults are
    * `ScaleAndShift(1/255, 0)` on ('image_features',) ONLY — no floatX
    * cast (dogs_vs_cats.py:24-25 declares just the one transformer) —
    * and the test split has NO targets source (the Kaggle test set is
    * unlabeled; the split dict omits it, dogs_vs_cats.py converter
    * :105-107), which lands here as a null targets column on test rows. */
  def registerDogsVsCats(path: String,
      name: String = "dogs-vs-cats-mini"): this.type = {
    import graft.transform.ScaleAndShift
    import graft.types.AxisLabels
    Seq("train", "test").foreach { s =>
      register(s"$name/$s", () => {
        val df = SplitSource.read(spark, path, s)
        AxisLabels.set(
          AxisLabels.set(df, "image_features", Seq("channel", "height", "width")),
          "image_features_shapes", Seq("shape"))
      }, Seq(col("idx")),
        Seq(ScaleAndShift(1.0 / 255, 0.0, Seq("image_features"))))
    }
    this
  }

  /** The shared tabular binding: each split registered as `name/split`
    * over the split-partitioned scan, empty default chain. */
  private def registerTabular(path: String, name: String,
      splits: Seq[String]): this.type = {
    splits.foreach { s =>
      registerSplit(s"$name/$s", path, s, Seq(col("idx")), defaults = Nil)
    }
    this
  }

  def names: Seq[String] = entries.keys.toSeq

  /** Raw load (no defaults). */
  def load(name: String): DataFrame = entry(name).load()

  /** The dataset's natural total order (for schemes / stable indexing). */
  def order(name: String): Seq[Column] = entry(name).order

  /** fuel `DataStream.default_stream`: load + fold the default transformer
    * chain (fuel/streams.py:180-183). */
  def defaultStream(name: String): DataFrame = {
    val e = entry(name)
    e.defaults.foldLeft(e.load())((df, t) => t(df))
  }

  private def entry(name: String): Entry =
    entries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown dataset '$name'; registered: ${names.mkString(", ")}"))
}

object Catalog {
  def forTestData(spark: SparkSession, dir: String): Catalog =
    new Catalog(spark).registerTestTables(dir)
}
