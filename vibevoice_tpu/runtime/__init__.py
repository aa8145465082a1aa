from .audio_runtime import NativeAudioRing, native_available, native_resample

__all__ = ["NativeAudioRing", "native_available", "native_resample"]
