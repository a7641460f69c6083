"""rustpotter_tpu — a TPU-native streaming wakeword-spotting framework.

A from-scratch JAX/XLA/Pallas implementation with the capability surface of the
rustpotter reference library (GiviMAD/rustpotter v3.0.2): PCM audio in → MFCC
features → banded-DTW template scoring or classifier-NN scoring → debounced
detection events. Designed TPU-first: the compute path is batched over streams,
jit-compiled, and shardable over a device mesh; templates and model weights are
replicated; detections merge via collectives.

Public API parity map (reference src/lib.rs:1-21):
  Rustpotter            → runtime.detector.Rustpotter
  RustpotterConfig      → config.RustpotterConfig (+ nested configs)
  RustpotterDetection   → runtime.detector.RustpotterDetection
  WakewordRef/Model/V2  → wakewords.files
  Wakeword build/train  → wakewords.builder / wakewords.trainer
  AudioEncoder/filters  → audio.*
Plus the TPU-native additions: runtime.batch (batched stream runtime) and
parallel.* (mesh sharding).
"""

from .config import (
    AudioFmt,
    BandPassConfig,
    DetectorConfig,
    Endianness,
    FiltersConfig,
    GainNormalizationConfig,
    RustpotterConfig,
    SampleFormat,
    ScoreMode,
    VADMode,
)
from .wakewords.builder import (
    build_wakeword_ref_from_buffers,
    build_wakeword_ref_from_files,
)
from .wakewords.files import (
    ModelType,
    TensorData,
    WakewordModel,
    WakewordRef,
    WakewordV2,
    load_wakeword,
    save_wakeword,
)
from .audio.encoder import AudioEncoder
from .audio.filters import BandPassFilter, GainNormalizerFilter
from .wakewords.trainer import (
    WakewordModelTrainOptions,
    train_from_buffers,
    train_from_dirs,
)
from .runtime.detector import Rustpotter, RustpotterDetection
from .runtime.batch import BatchedDetector

__version__ = "0.1.0"

__all__ = [
    "AudioEncoder",
    "AudioFmt",
    "BandPassConfig",
    "BandPassFilter",
    "BatchedDetector",
    "GainNormalizerFilter",
    "Rustpotter",
    "RustpotterDetection",
    "WakewordModelTrainOptions",
    "train_from_buffers",
    "train_from_dirs",
    "DetectorConfig",
    "Endianness",
    "FiltersConfig",
    "GainNormalizationConfig",
    "ModelType",
    "RustpotterConfig",
    "SampleFormat",
    "ScoreMode",
    "TensorData",
    "VADMode",
    "WakewordModel",
    "WakewordRef",
    "WakewordV2",
    "build_wakeword_ref_from_buffers",
    "build_wakeword_ref_from_files",
    "load_wakeword",
    "save_wakeword",
    "__version__",
]
