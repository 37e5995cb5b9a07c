"""Metrics + qtype-bucket tests (reference: util/misc.py:27-172, 361-532)."""
import numpy as np

from flipped_tpu.utils.metrics import (MetricLogger, SmoothedValue, log_qtype,
                                       qtype_frequencies)
from flipped_tpu.preprocess import (chunk_and_stack, log_mel_spectrogram,
                                    mel_filterbank)


def test_smoothed_value_weighted_global_avg():
    v = SmoothedValue(window_size=3)
    v.update(1.0, n=1)
    v.update(3.0, n=3)
    assert abs(v.global_avg - (1 + 9) / 4) < 1e-9
    v.update(5.0); v.update(7.0); v.update(9.0)
    assert v.median == 7.0  # window keeps last 3
    assert v.value == 9.0


def test_metric_logger_averages():
    ml = MetricLogger()
    ml.update(n=2, acc=0.5)
    ml.update(n=6, acc=1.0)
    assert abs(ml.averages()["acc"] - (0.5 * 2 + 1.0 * 6) / 8) < 1e-9


def test_qtype_frequencies_and_groups():
    qtypes = np.array([1, 2, 3, 3, 6])
    correct = np.array([1, 0, 1, 1, 0], np.float32)
    freq = qtype_frequencies(qtypes, correct, range(1, 9))
    assert freq[3] == [2.0, 2.0]
    assert freq[0] == [3.0, 5.0]

    ml = MetricLogger()
    log_qtype("nextqa", qtypes, correct, ml)
    avgs = ml.averages()
    # C group = qtypes 1,2 → 1/2; T group = 3,4,5 → 2/2; D = 6,7,8 → 0/1
    assert abs(avgs["C"] - 0.5) < 1e-9
    assert abs(avgs["T"] - 1.0) < 1e-9
    assert abs(avgs["D"] - 0.0) < 1e-9
    assert abs(avgs["Total"] - 0.6) < 1e-9


def test_qtype_weighted_across_batches():
    """Epoch-level global averages must be count-weighted across batches."""
    ml = MetricLogger()
    log_qtype("star", np.array([1, 1]), np.array([1.0, 1.0]), ml)
    log_qtype("star", np.array([1, 1, 1, 1]), np.array([0., 0., 0., 0.]), ml)
    assert abs(ml.averages()["In"] - 2 / 6) < 1e-9


def test_log_mel_pipeline():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wav = 0.5 * np.sin(2 * np.pi * 440 * t)
    mel = log_mel_spectrogram(wav)
    assert mel.shape[1] == 128
    assert mel.shape[0] > 90  # ~1 s at 10 ms hop
    assert np.isfinite(mel).all()
    # 440 Hz tone: energy concentrated in low mel bins
    profile = mel.mean(0)
    assert profile[:32].max() > profile[64:].max()

    chunks = chunk_and_stack(mel, n_chunks=10, image_size=32)
    assert chunks.shape == (10, 3, 32, 32)
    # per-chunk normalization → ~zero mean
    assert abs(float(chunks[0].mean())) < 1e-3


def test_mel_filterbank_covers_spectrum():
    fb = mel_filterbank(64, 512, 16000)
    assert fb.shape == (64, 257)
    # every filter has some support, coverage is contiguous
    assert (fb.sum(1) > 0).all()
