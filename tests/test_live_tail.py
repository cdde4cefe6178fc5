"""Live-tail mode: processing-time trigger (the reference's 10s flush
ticker, producer_batch.go:54-61) — the stream stays up while the log grows,
checkpoints advance as files arrive, graceful stop commits the last epoch."""

import glob
import os
import shutil
import time

from go_dcp_kafka_spark.gen import fold_oracle
from go_dcp_kafka_spark.sources.changelog import stream_change_log
from go_dcp_kafka_spark.streaming.runner import CdcPipeline
from tests.conftest import assert_frames_equal


def test_live_tail_processing_time_trigger(spark, gen_result, log_info, tmp_path):
    files = sorted(glob.glob(os.path.join(log_info["dir"], "chunk-*.parquet")))
    src = str(tmp_path / "src")
    os.makedirs(src)
    for f in files[:3]:
        shutil.copy2(f, src)

    pipe = CdcPipeline(spark, str(tmp_path / "t"), run_id="live")
    stream = stream_change_log(spark, src, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(pipe.apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        # wait until the first files are consumed (checkpoints advance)
        while time.time() < deadline and len(pipe.checkpoints.load()) == 0:
            time.sleep(0.5)
        assert len(pipe.checkpoints.load()) > 0, "no checkpoint progress on live tail"

        # the tail grows mid-flight
        for f in files[3:]:
            shutil.copy2(f, src)
        # drained = the source reports idle progress after all files landed
        idle = 0
        while time.time() < deadline and idle < 3:
            time.sleep(1.0)
            lp = q.lastProgress
            if lp is not None and lp["numInputRows"] == 0:
                idle += 1
            elif lp is not None:
                idle = 0
        assert idle >= 3, "live tail never drained"
    finally:
        q.stop()
        q.awaitTermination(60)

    assert_frames_equal(pipe.read_table().toPandas(), fold_oracle(gen_result.events))
