"""Worker process for the 2-process jax.distributed test.

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh. The sharded Gram build must agree with the single-device
engine computed locally on each process. This is the DCN (multi-host)
analog of the reference's 8-node Slurm jobs
(runs/runtime_scaling/slurm_scripts/32gpus.sh) exercised at CI scale.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port>
"""

import os
import pathlib
import sys

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

import numpy as np

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.parallel.gram import build_kernel_matrix_sharded
from qml_cutensornet_tpu.parallel.mesh import make_mesh

assert jax.process_count() == n_procs, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * n_procs

rng = np.random.default_rng(7)
nq, reps, nn, gamma = 5, 2, 2, 0.8
emap = q.entanglement_graph(nq, nn)
ansatz = q.KernelStateAnsatz(nq, reps, gamma, emap)
cfg = SimConfig(chi=4, precision="f64")
X = rng.uniform(0, 2, size=(19, nq))  # not divisible by 8
Y = rng.uniform(0, 2, size=(9, nq))

mesh = make_mesh()  # all 8 global devices
assert mesh.devices.size == 4 * n_procs

K = build_kernel_matrix_sharded(ansatz, X, cfg=cfg, mesh=mesh)
K_rect = build_kernel_matrix_sharded(ansatz, X, Y=Y, cfg=cfg, mesh=mesh)

# Golden: the single-device engine, computed independently on THIS process
# (process-local arrays only — no cross-process communication involved).
K_ref = q.build_kernel_matrix(ansatz, X, truncation_error=1e-16, cfg=cfg)
K_rect_ref = q.build_kernel_matrix(ansatz, X, Y=Y, truncation_error=1e-16, cfg=cfg)

np.testing.assert_allclose(K, K_ref, atol=1e-10)
np.testing.assert_allclose(K_rect, K_rect_ref, atol=1e-10)
print(f"proc {proc_id}/{n_procs}: OK sym={K.shape} rect={K_rect.shape}", flush=True)
jax.distributed.shutdown()
