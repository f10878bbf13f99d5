package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

import graft.scbf._

/** Hadoop-filesystem plumbing shared by the scan and write paths, so the
 * connector works against any Hadoop-compatible store (local, HDFS,
 * object stores), not just `java.io`. */
object ScbfUtil {

  /** Test hook: data files opened for decode (local-mode specs assert a
   * stats-answered aggregate opens ZERO data files). */
  val dataFileOpens = new java.util.concurrent.atomic.AtomicLong(0)

  /** RandomInput over FSDataInputStream's positioned reads. */
  final class HadoopInput(
      stream: org.apache.hadoop.fs.FSDataInputStream) extends ScbfReader.RandomInput {
    def readFully(offset: Long, length: Int): Array[Byte] = {
      val out = new Array[Byte](length)
      stream.readFully(offset, out, 0, length)
      out
    }
    def close(): Unit = stream.close()
  }

  def open(path: Path, conf: Configuration): ScbfReader.RandomInput =
    new HadoopInput(path.getFileSystem(conf).open(path))

  def readHeader(file: FileStatus, conf: Configuration): ScbfHeader = {
    val in = open(file.getPath, conf)
    try ScbfReader.readHeader(in) finally in.close()
  }

  /** Hadoop Configuration is not Serializable; standard writable-based
   * wrapper so tasks receive the driver's filesystem settings. */
  final class SerializableConf(@transient var value: Configuration) extends Serializable {
    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }
}
