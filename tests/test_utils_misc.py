"""Small utility tests: profiling meters, seeding, logging contracts."""

import time

import numpy as np

from egm_unet_tpu.utils.logging import MetricLogger, ResultsWriter, SmoothedValue
from egm_unet_tpu.utils.profiling import StepTimer, device_synchronized
from egm_unet_tpu.utils.seeding import Seeds


def test_smoothed_value_window():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.avg == 3.0  # window holds 2,3,4
    assert v.global_avg == 2.5
    assert v.value == 4


def test_step_timer():
    t = StepTimer()
    with t.phase("step"):
        time.sleep(0.01)
    with t.phase("step"):
        time.sleep(0.01)
    assert t.fps("step") > 0
    assert "step" in t.summary()


def test_device_synchronized_returns_time():
    a = device_synchronized()
    b = device_synchronized()
    assert b >= a


def test_seeds_deterministic_and_distinct():
    s = Seeds(root=7)
    k1, k2 = s.numpy("data"), s.numpy("data")
    assert k1.integers(0, 1000) == k2.integers(0, 1000)
    assert s.numpy("data").integers(0, 1 << 30) != s.numpy("model").integers(0, 1 << 30)


def test_results_writer_format(tmp_path):
    p = str(tmp_path / "results.txt")
    w = ResultsWriter(p)
    w.write_epoch(3, 1.234, 0.02, "global correct: 90.0\nmean IoU: 85.0", 0.91)
    text = open(p).read()
    # the reference's results-file block fields (ref: train.py:144-149)
    assert "[epoch: 3]" in text
    assert "train_loss: 1.2340" in text
    assert "lr: 0.020000" in text
    assert "dice coefficient: 0.910" in text
    assert "mean IoU: 85.0" in text


def test_metric_logger_log_every(capsys):
    logger = MetricLogger()
    for item in logger.log_every(range(5), print_freq=2, header="T:"):
        logger.update(loss=float(item))
    out = capsys.readouterr().out
    assert "T: [0/5]" in out and "Total time" in out
