package graft.serialization

import scala.collection.mutable

import ProtoWire.{Reader, Writer}

/** `tf.train.SequenceExample` packing of a group's serialized examples —
  * the reference's `create_sequence_example`
  * (dataset_grouper/serialization.py:51-62): each group becomes ONE
  * SequenceExample whose feature list `'serialized_bytes'` holds one
  * bytes Feature per example. An empty group yields an empty-but-present
  * feature list (serialization_test.py:45-58).
  */
object SequenceExampleCodec {

  val BytesFeatureName = "serialized_bytes"

  /** Wrap a group's example bytes into SequenceExample proto bytes. */
  def encode(examples: Seq[Array[Byte]]): Array[Byte] = {
    val featureList = new Writer // FeatureList: repeated Feature feature = 1
    examples.foreach { ex =>
      val bytesList = new Writer // BytesList: repeated bytes value = 1
      bytesList.writeBytesField(1, ex)
      val feature = new Writer // Feature.bytes_list = 1
      feature.writeMessageField(1, bytesList)
      featureList.writeMessageField(1, feature)
    }
    val entry = new Writer // map<string, FeatureList> entry
    entry.writeStringField(1, BytesFeatureName)
    entry.writeMessageField(2, featureList)
    val featureLists = new Writer // FeatureLists.feature_list = 1
    featureLists.writeMessageField(1, entry)
    val seqExample = new Writer // SequenceExample.feature_lists = 2
    seqExample.writeMessageField(2, featureLists)
    seqExample.toByteArray
  }

  /** Extract the per-example bytes back out (the loader's
    * `parse_sequence_example` path, data_loaders.py:62-68). */
  def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    val se = new Reader(bytes)
    while (se.hasNext) {
      val (field, wt) = se.readTag()
      if (field == 2 && wt == ProtoWire.WtLenDelim) { // feature_lists
        val fls = se.subReader()
        while (fls.hasNext) {
          val (f, w) = fls.readTag()
          if (f == 1 && w == ProtoWire.WtLenDelim) { // map entry
            val entry = fls.subReader()
            var key: String = null
            var listReader: Reader = null
            while (entry.hasNext) {
              val (ef, ew) = entry.readTag()
              ef match {
                case 1 => key = new String(entry.readBytes(), "UTF-8")
                case 2 => listReader = entry.subReader()
                case _ => entry.skip(ew)
              }
            }
            if (key == BytesFeatureName && listReader != null) {
              while (listReader.hasNext) {
                val (lf, lw) = listReader.readTag()
                if (lf == 1 && lw == ProtoWire.WtLenDelim) { // Feature
                  val feature = listReader.subReader()
                  while (feature.hasNext) {
                    val (ff, fw) = feature.readTag()
                    if (ff == 1 && fw == ProtoWire.WtLenDelim) { // bytes_list
                      val bl = feature.subReader()
                      while (bl.hasNext) {
                        val (bf, bw) = bl.readTag()
                        if (bf == 1 && bw == ProtoWire.WtLenDelim)
                          out += bl.readBytes()
                        else bl.skip(bw)
                      }
                    } else feature.skip(fw)
                  }
                } else listReader.skip(lw)
              }
            }
          } else fls.skip(w)
        }
      } else se.skip(wt)
    }
    out.toSeq
  }
}
