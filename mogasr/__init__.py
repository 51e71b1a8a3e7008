"""mogasr-tpu: a TPU-native speech-recognition framework (JAX/Pallas/pjit).

Built from scratch with the capabilities of the reference repo
taufikxu/MOG-ASR (see SURVEY.md): LibriSpeech audio front end, diagonal-GMM
and neural (MLP/LSTM) acoustic scorers, on-device Viterbi/beam decoding and
forced alignment, EM and SGD training, data-parallel evaluation over ICI.
"""

__version__ = "0.1.0"

from mogasr.config import (  # noqa: F401
    BatchConfig,
    DecodeConfig,
    FrontendConfig,
    GmmConfig,
    MeshConfig,
    PipelineConfig,
    TopologyConfig,
    TrainConfig,
)
