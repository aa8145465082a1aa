from .engine import ContinuousEngine, EngineRequest
from .generate import VibeVoiceGenerationOutput, VibeVoiceGenerator
from .state import GenState

__all__ = ["VibeVoiceGenerator", "VibeVoiceGenerationOutput", "GenState",
           "ContinuousEngine", "EngineRequest"]
