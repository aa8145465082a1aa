from .audio import AudioNormalizer, VibeVoiceAudioProcessor
from .processor import VibeVoiceProcessor
from .text_tokenizer import ByteFallbackTokenizer, VibeVoiceTextTokenizer, load_text_tokenizer

__all__ = [
    "AudioNormalizer",
    "VibeVoiceAudioProcessor",
    "VibeVoiceProcessor",
    "VibeVoiceTextTokenizer",
    "ByteFallbackTokenizer",
    "load_text_tokenizer",
]
