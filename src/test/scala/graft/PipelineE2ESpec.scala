package graft

/** End-to-end topology smoke: live streaming egress → segment store →
  * leveled compaction → streaming ingress replay past a checkpoint,
  * all legs in one run (the reference's full deployment shape).
  */
class PipelineE2ESpec extends SparkSuite {
  test("full replication topology delivers exactly the past-checkpoint messages") {
    assert(graft.tools.PipelineDemo.run(spark, sf, tmpDir("pipeline-e2e")))
  }
}
