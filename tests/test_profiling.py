import time

from whisper_tpu.profiling import StageTimer, device_memory_stats


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("front_end"):
        time.sleep(0.01)
    with timer.stage("decode"):
        time.sleep(0.02)
    with timer.stage("decode"):
        time.sleep(0.02)
    report = timer.report(audio_seconds=30.0)
    assert report["decode_seconds"] >= 0.04
    assert timer.counts["decode"] == 2
    assert report["rtf"] > 0
    assert report["total_seconds"] >= report["front_end_seconds"]


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
