"""TPU-native Qwen3-TTS inference framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of AtomGradient/swift-qwen3-tts
(Swift/MLX, Apple Silicon) for TPU hardware. See SURVEY.md for the reference
structural analysis and README.md for usage.
"""

from .config import (
    CodePredictorConfig,
    ModelConfig,
    QuantizationConfig,
    RopeScalingConfig,
    SpeakerEncoderConfig,
    TalkerConfig,
    TokenizerConfig,
    TokenizerDecoderConfig,
    TokenizerEncoderConfig,
)

from .tts import (
    AudioChunkEvent,
    AudioEvent,
    GenerationInfo,
    InfoEvent,
    Qwen3TTSError,
    Qwen3TTSModel,
    TokenEvent,
)

__version__ = "0.1.0"
