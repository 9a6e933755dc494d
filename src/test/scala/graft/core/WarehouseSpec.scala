package graft.core

import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {

  test("sourceStamp: an existing but FILE-LESS directory reads 'absent' like a missing path") {
    // an interrupted corpus write leaves the directory with zero files —
    // pre-fix this crashed the caller (Bench.warmCheck / ensure* startup)
    // with `empty.max` instead of reading as cold
    val d = java.nio.file.Files.createTempDirectory("stamp-empty")
    assert(Warehouse.sourceStamp(d.toString) == "absent")
    assert(Warehouse.sourceStamp(d.resolve("never-written").toString) == "absent")
    // a real file still stamps
    val f = d.resolve("part.parquet")
    java.nio.file.Files.write(f, "x".getBytes)
    assert(Warehouse.sourceStamp(d.toString).startsWith("src="))
  }
}
