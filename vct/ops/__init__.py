"""Pallas TPU kernels for the hot ops (the framework's "native" tier —
SURVEY.md §2: the reference has no native code of its own; its CUDA reach was
through cuDNN/OpenCV bindings)."""
