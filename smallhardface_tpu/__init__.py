"""smallhardface_tpu: a TPU-native (JAX/XLA/Pallas) re-build of the
smallhardface face detector framework (reference: bairdzhang/smallhardface).

Compute path: jitted JAX/XLA graphs + Pallas kernels on TPU meshes.
Runtime path: Python orchestration + native C++ host extensions (csrc/).
"""

__version__ = "0.1.0"
