"""Offline L0 feature-extraction tests: the numpy mel pipeline, the 3-crop
fusion transform, video→wav orchestration, and the wav→mel CLI path —
covering the reference's preprocess/ scripts (audio_loader.py:35-87,
extract_audio_features.py:24-99, extract_raw_audio.py:9-38) without
torchaudio/moviepy/ffmpeg."""
import os
import wave

import numpy as np
import pytest

from flipped_tpu.preprocess import (chunk_and_stack, log_mel_spectrogram,
                                    mel_filterbank, three_crop_mel)
from flipped_tpu.preprocess.extract import (audio_backend, extract_audio_mels,
                                            extract_raw_audio, extract_wav,
                                            write_wav)


def _sine(seconds: float, sr: int = 16000, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


class TestMel:
    def test_log_mel_shape_and_dc_invariance(self):
        wav = _sine(1.0)
        mel = log_mel_spectrogram(wav)
        # 25 ms window / 10 ms hop at 16 kHz → ~98 frames, 128 bins
        assert mel.shape == (98, 128)
        # DC offset is removed before the fbank (reference:
        # audio_loader.py:75) → same mels above the leakage-noise floor
        # (float32 quantization of the offset signal perturbs bins that are
        # ~1e-7 energy; clamp the log floor before comparing)
        shifted = log_mel_spectrogram(wav + 0.3)
        np.testing.assert_allclose(np.maximum(shifted, -5.0),
                                   np.maximum(mel, -5.0),
                                   rtol=1e-3, atol=1e-2)

    def test_filterbank_rows_cover_spectrum(self):
        fb = mel_filterbank()
        assert fb.shape == (128, 257)
        # continuous triangular weights: the narrow lowest-frequency
        # triangles may miss every FFT bin center, but the vast majority of
        # rows must carry energy (the integer-bin variant zeroed dozens)
        assert int((fb.sum(axis=1) > 0).sum()) >= 120
        assert (fb.sum(axis=1)[8:] > 0).all()

    def test_chunk_and_stack(self):
        mel = log_mel_spectrogram(_sine(2.0))
        imgs = chunk_and_stack(mel, n_chunks=10)
        assert imgs.shape == (10, 3, 224, 224)
        # per-chunk normalization
        assert abs(float(imgs[0].mean())) < 1e-3


class TestThreeCrop:
    def test_long_audio_deterministic_crops(self):
        t, n_mels, target = 300, 128, 100
        mel = np.arange(t, dtype=np.float32)[:, None].repeat(n_mels, 1)
        fusion = three_crop_mel(mel, target)
        assert fusion.shape == (3, n_mels, target)
        # rng=None → first index of each third of [0, T-target] = [0..200]
        # array_split(201, 3) → starts 0, 67, 134
        assert float(fusion[0, 0, 0]) == 0.0
        assert float(fusion[1, 0, 0]) == 67.0
        assert float(fusion[2, 0, 0]) == 134.0
        # each crop is a contiguous window
        np.testing.assert_allclose(fusion[2, 0], np.arange(134, 234))

    def test_long_audio_random_crops_within_parts(self):
        t, target = 300, 100
        mel = np.arange(t, dtype=np.float32)[:, None].repeat(8, 1)
        fusion = three_crop_mel(mel, target, np.random.default_rng(0))
        starts = [float(fusion[i, 0, 0]) for i in range(3)]
        assert 0 <= starts[0] <= 66
        assert 67 <= starts[1] <= 133
        assert 134 <= starts[2] <= 200

    def test_short_audio_repeat_pad(self):
        mel = np.arange(40, dtype=np.float32)[:, None].repeat(8, 1)
        fusion = three_crop_mel(mel, 100)
        assert fusion.shape == (3, 8, 100)
        # repeat-tiling (reference: extract_audio_features.py:73-76)
        np.testing.assert_allclose(fusion[0, 0, :40], np.arange(40))
        np.testing.assert_allclose(fusion[0, 0, 40:80], np.arange(40))
        np.testing.assert_allclose(fusion[0], fusion[1])

    def test_equal_length_stacks_identity(self):
        mel = np.random.default_rng(1).standard_normal((50, 8)).astype(np.float32)
        fusion = three_crop_mel(mel, 50)
        np.testing.assert_allclose(fusion[0], mel.T)
        np.testing.assert_allclose(fusion[1], mel.T)


class TestRawAudio:
    def test_wav_roundtrip(self, tmp_path):
        wav = _sine(0.5)
        p = str(tmp_path / "a.wav")
        write_wav(p, wav)
        with wave.open(p) as w:
            assert w.getframerate() == 16000
            back = np.frombuffer(w.readframes(w.getnframes()),
                                 np.int16).astype(np.float32) / 32767
        np.testing.assert_allclose(back, wav, atol=1e-3)

    def test_extract_raw_audio_orchestration(self, tmp_path):
        """Walks videos, converts each, skips failures (reference
        try/except, extract_raw_audio.py:33-38) — backend injected since
        neither ffmpeg nor moviepy exists in CI."""
        vdir = tmp_path / "videos"
        vdir.mkdir()
        for name in ("a.mp4", "b.mkv", "broken.mp4", "notvideo.txt"):
            (vdir / name).write_bytes(b"x")
        out = str(tmp_path / "wavs")

        def fake_to_wav(video_path, wav_path, sr):
            if "broken" in video_path:
                raise ValueError("no audio stream")
            write_wav(wav_path, _sine(0.1), sr)

        done = extract_raw_audio(str(vdir), out, to_wav=fake_to_wav)
        assert done == 2
        assert sorted(os.listdir(out)) == ["a.wav", "b.wav"]

    def test_extract_wav_errors_without_backend(self, tmp_path, monkeypatch):
        if audio_backend() is not None:
            pytest.skip("a real backend exists here")
        with pytest.raises(RuntimeError, match="ffmpeg"):
            extract_wav("x.mp4", str(tmp_path / "x.wav"))


class TestAudioMelCLI:
    def test_wav_dir_to_mel_fusions(self, tmp_path):
        wdir = tmp_path / "wavs"
        wdir.mkdir()
        write_wav(str(wdir / "clip1.wav"), _sine(2.0))
        write_wav(str(wdir / "clip2.wav"), _sine(0.2))  # shorter than target
        out = str(tmp_path / "mels")
        n = extract_audio_mels(str(wdir), out, target_length=128)
        assert n == 2
        for stem in ("clip1", "clip2"):
            arr = np.load(os.path.join(out, stem + ".npy"))
            assert arr.shape == (3, 128, 128)
            assert np.isfinite(arr).all()
