"""qml_cutensornet_tpu: a TPU-native quantum-kernel SVM framework.

A from-scratch rebuild of the capabilities of the reference repo
``mmetcalf14/qml-cutensornet`` (distributed quantum-kernel SVM on the Elliptic
Bitcoin dataset), redesigned for TPUs:

- The MPS tensor-network simulation engine (reference: pytket-cutensornet
  ``MPSxGate`` on CUDA / ITensors.jl on CPU) is pure JAX/XLA with optional
  Pallas kernels: every datapoint circuit in a batch evolves inside ONE
  compiled XLA program (``vmap`` over datapoints, ``lax.scan`` over gates).
- The distributed Gram-matrix build (reference: mpi4py ring round-robin of
  pickled MPS objects, gpu_backend/kernel_state_ansatz.py:106-452) is a
  ``shard_map`` over a ``jax.sharding.Mesh`` with ``lax.ppermute`` ring
  exchange of fixed-shape padded MPS batches over ICI.
- The classical ML layer (sklearn SVC on the precomputed kernel) and the
  data pipeline (Elliptic preprocessing, stratified sampling, scaler chain)
  reproduce the reference semantics exactly (main.py:21-143, 196-236).
"""

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.gram import build_kernel_matrix

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "entanglement_graph",
    "KernelStateAnsatz",
    "build_kernel_matrix",
    "__version__",
]
