"""vct — a TPU-native video classification + captioning framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capability surface of
AhmadRifqi86/video-classif (see SURVEY.md): video ingest with content-aware
frame sampling, the LRCN model family (frozen CNN backbones + LSTM/GRU/Mamba
temporal heads), VideoMamba, an S2VT captioner with on-device beam search,
a jitted train/eval engine, hyperparameter sweeps, and a serving stack —
designed for TPU from the start (SPMD over device meshes, functional
transforms, Pallas kernels on the hot ops).
"""

__version__ = "0.1.0"

from vct.core.config import Config, load_config  # noqa: F401
