from .mel import (chunk_and_stack, hz_to_mel, log_mel_spectrogram,
                  mel_filterbank, mel_to_hz, three_crop_mel)

__all__ = ["chunk_and_stack", "hz_to_mel", "log_mel_spectrogram",
           "mel_filterbank", "mel_to_hz", "three_crop_mel"]
