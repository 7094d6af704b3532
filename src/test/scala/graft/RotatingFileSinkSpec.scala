package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks.RotatingFileWriter

/** W2 rotation parity with the reference WriterFile (WriterFile.cpp:43-235):
  * numbered/timestamp/sequence masks, size-triggered switching, zero fill,
  * restart continuation, and the no-rotation constraints. */
class RotatingFileSinkSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_rotate").toString

  private def names(dir: String): Seq[String] =
    new File(dir).list().sorted.toSeq

  private def read(dir: String, name: String): String =
    new String(Files.readAllBytes(new File(dir, name).toPath), "UTF-8")

  test("numbered mode rotates by max-file-size with zero fill") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/out.%3i.json", maxFileSize = 20)
    (1 to 5).foreach(i => w.write(s"mmmmmmmm$i")) // 10 bytes each with \n
    assert(names(dir) == Seq("out.000.json", "out.001.json", "out.002.json"))
    assert(read(dir, "out.000.json") == "mmmmmmmm1\nmmmmmmmm2\n")
    assert(read(dir, "out.002.json") == "mmmmmmmm5\n")
  }

  test("append restart continues in the highest existing file") {
    val dir = tmp()
    val w1 = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 20)
    (1 to 3).foreach(i => w1.write(s"mmmmmmmm$i")) // files 0 (2 msgs), 1
    // append=true restart: scans dir, resumes at number 1 (its size is
    // re-read, so the next write still fits in file 1)
    val w2 = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 20)
    w2.write("mmmmmmmm4")
    assert(names(dir) == Seq("out.0.json", "out.1.json"))
    assert(read(dir, "out.1.json") == "mmmmmmmm3\nmmmmmmmm4\n")
    // append=false restart: starts past the highest existing number
    val w3 = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 20,
      append = false)
    w3.write("mmmmmmmm5")
    assert(names(dir).contains("out.2.json"))
    assert(read(dir, "out.2.json") == "mmmmmmmm5\n")
  }

  test("append restart into a full file rotates before the first write") {
    val dir = tmp()
    val w1 = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 20)
    (1 to 2).foreach(i => w1.write(s"mmmmmmmm$i")) // file 0 exactly full
    val w2 = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 20)
    w2.write("mmmmmmmm3") // 0 is full → must open 1, not overflow 0
    assert(read(dir, "out.0.json") == "mmmmmmmm1\nmmmmmmmm2\n")
    assert(read(dir, "out.1.json") == "mmmmmmmm3\n")
  }

  test("oversized message still writes into an empty file") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/out.%i.json", maxFileSize = 5)
    w.write("mmmmmmmmmm") // 11 bytes > 5: reference warns and proceeds
    assert(read(dir, "out.0.json") == "mmmmmmmmmm\n")
    w.write("x") // next write rotates
    assert(read(dir, "out.1.json") == "x\n")
  }

  test("timestamp mode names files from the clock at switch time, " +
      "rendered by timestamp-format (reference default %F_%T)") {
    val dir = tmp()
    var now = 1000L
    val w = new RotatingFileWriter(s"$dir/log-%t.json", maxFileSize = 20,
      clock = () => now)
    w.write("mmmmmmmm1"); w.write("mmmmmmmm2")
    now = 2000L
    w.write("mmmmmmmm3") // overflow → new file at new timestamp
    assert(names(dir) == Seq("log-1970-01-01_00:00:01.json",
      "log-1970-01-01_00:00:02.json"))
  }

  test("timestamp-format: custom strftime pattern + %s epoch + unknown " +
      "specifier passes through literally (glibc behavior)") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/out-%t.json", maxFileSize = 1000,
      clock = () => 86400000L, timestampFormat = "%Y%m%d-%H%M%S")
    w.write("x")
    assert(names(dir) == Seq("out-19700102-000000.json"))
    assert(graft.sinks.Strftime.format("%s", 1500L) == "1")
    assert(graft.sinks.Strftime.format("%q%%", 0L) == "%q%")
    assert(graft.sinks.Strftime.format("%F_%T", 0L) == "1970-01-01_00:00:00")
    assert(graft.sinks.Strftime.format("%y.%j.%e", 0L) == "70.001. 1")
  }

  test("write-buffer-flush-size: messages buffer until the threshold, " +
      "rotation flushes the outgoing file's tail first") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/b.%i.json", maxFileSize = 30,
      flushSize = 15)
    w.write("aaaa") // 5 bytes buffered, below threshold: not on disk yet
    assert(new java.io.File(dir, "b.0.json").length() == 0L)
    w.write("bbbbbbbbbb") // 11 more → 16 ≥ 15: flushes
    assert(read(dir, "b.0.json") == "aaaa\nbbbbbbbbbb\n")
    w.write("cccc") // buffered again
    w.write("ddddddddddddd") // would overflow 30: rotate — the buffered
    // "cccc" must land in the OLD file before the switch
    assert(read(dir, "b.0.json") == "aaaa\nbbbbbbbbbb\ncccc\n")
    w.flush() // end-of-batch flush drains the new file's buffer
    assert(read(dir, "b.1.json") == "ddddddddddddd\n")
  }

  test("sequence mode switches files on redo-sequence change") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/seq-%s.json", maxFileSize = 1000)
    w.write("a", seq = 7)
    w.onSequence(8)
    w.write("b", seq = 8)
    assert(names(dir) == Seq("seq-7.json", "seq-8.json"))
    assert(read(dir, "seq-8.json") == "b\n")
  }

  test("no-rotation mask: append required, stray % rejected, size optional") {
    val dir = tmp()
    // plain name with append works without max-file-size
    val w = new RotatingFileWriter(s"$dir/plain.json")
    w.write("x"); w.write("y")
    assert(read(dir, "plain.json") == "x\ny\n")
    // reference ConfigurationException 30006: no rotation token + no append
    intercept[IllegalArgumentException] {
      new RotatingFileWriter(s"$dir/plain2.json", append = false)
    }
    // 30005: unknown % token
    intercept[IllegalArgumentException] {
      new RotatingFileWriter(s"$dir/bad.%x.json", maxFileSize = 10)
    }
    // 30007: rotation token without max-file-size
    intercept[IllegalArgumentException] {
      new RotatingFileWriter(s"$dir/out.%i.json")
    }
  }

  test("CRLF newline option") {
    val dir = tmp()
    val w = new RotatingFileWriter(s"$dir/crlf.json", newLine = "\r\n")
    w.write("a")
    assert(read(dir, "crlf.json") == "a\r\n")
  }
}
