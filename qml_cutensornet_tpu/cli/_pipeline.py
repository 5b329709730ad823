"""Shared CLI pipeline: argv parsing, engine config, data prep, Gram builds.

The reference CLI contract (README.md:72-84, main.py:79-93) is positional:

    python main.py <backend> <num_features> <layers> <gamma> <distance>
                   <n_illicit> <n_licit> <data_seed> <data_file>

We preserve it exactly (BASELINE.json requires this), accepting backend
values GPU / CPU (mapped to our engine with the matching truncation
criterion) and the native TPU. TPU-specific knobs that have no slot in the
positional contract come from environment variables:

    QMLTPU_CHI         bond cap (default: min(2^(nq//2), 64)); "auto" probes
                       a feature sample with utils/autotune.choose_chi until
                       QMLTPU_FID_TARGET (default 1-1e-9) is met, capped at
                       QMLTPU_AUTO_CHI_MAX (default 256)
    QMLTPU_CKPT_INTERVAL  min seconds between checkpoint saves (default 0 =
                       save after every tile, like the reference cpu:279-282)
    QMLTPU_PRECISION   f32 | f64            (default f32)
    QMLTPU_SVD         subspace | svd | eigh (default subspace — the
                       matmul-only TPU fast path; "svd" is the QDWH-accurate
                       reference path)
    QMLTPU_POWER_PRECISION  matmul precision for the subspace POWER
                       multiplies only (default "inherit"; "high" = 3-pass
                       bf16, the large-chi speed candidate — the
                       orthonormalizations and final factors stay at full
                       precision, see SimConfig.power_precision)
    QMLTPU_FUSED_SPLIT 1 enables the fused Pallas subspace-split + Q+R
                       kernels (TPU f32; default 1 since the on-chip A/B:
                       chi64 2.85 -> 2.64 s, 2.4x at chi128, 3.9x at
                       chi256 vs the unfused controls — runs/perf_ab/;
                       see ops/pallas_split.py)
    QMLTPU_FUSED_GATE  1 additionally builds theta and applies the two-site
                       gate INSIDE the split kernel (phase 2 — theta never
                       round-trips HBM; requires QMLTPU_FUSED_SPLIT;
                       default 0 pending the on-chip A/B, runs/perf_ab)
    QMLTPU_MGS_PAIR    1 runs every Pallas orthonormalization's within-panel
                       loop two columns at a time (block-2 BCGS2 — halves
                       the serial chain that dominates per-op latency at
                       chi >= 128; default 0 pending the on-chip A/B,
                       runs/perf_ab; see SimConfig.mgs_pair)
    QMLTPU_OVERSAMPLE  subspace oversampling p: iterate with chi+p basis
                       columns, keep the top-chi by weight (default 16
                       when chi >= 128 where the A/B measured it free,
                       else 0; keep chi+p a multiple of 16 for the fused
                       kernel — see SimConfig.oversample)
    QMLTPU_BRICK_CAPS  1 enables per-pair structural bond caps in the brick
                       engine (exact; edge pairs dispatch at sliced shapes
                       — see ops/vidal.structural_caps; default 0 until
                       benched)
    QMLTPU_TILE_PRECISION  matmul precision for the Gram-tile contractions
                       only (default "inherit"; "high" = 3-pass bf16 —
                       measure parity before relying on it)
    QMLTPU_TILE_BLOCK  sites contracted per tile-scan step from pre-combined
                       [chi, 2^k, chi] blocks (k=2 is FLOP/storage-neutral
                       and halves the scan's carry round-trips; default 2
                       since the on-chip A/B — 2.47 s vs 2.57 s at chi64,
                       runs/perf_ab/bench_tileblk2; see SimConfig.tile_block)
    QMLTPU_ROUTING     tracked | reference | brick  (default tracked)
    QMLTPU_SIM_BATCH   circuits per compiled batch (default 32)
    QMLTPU_TILE        Gram tile side (default 32)
    QMLTPU_MESH        device count for the sharded Gram build (default:
                       all local devices when more than one)
    QMLTPU_SHARD_MPS   "all" or a device count: shard each state's SITE
                       axis over the mesh during brick evolution (tensor
                       parallelism over the chain, parallel/sharded_mps.py;
                       needs QMLTPU_ROUTING=brick, single-controller)
    QMLTPU_CHECKPOINT  1 to enable per-tile checkpoint/resume
    QMLTPU_PLATFORM    force a JAX platform (e.g. "cpu") — useful because
                       some harnesses shim the JAX_PLATFORMS env var
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
import sys

import numpy as np

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.gram import build_kernel_matrix
from qml_cutensornet_tpu.utils.data import load_and_prepare
from qml_cutensornet_tpu.utils.naming import run_info

INPUT_ERROR_MSG = (
    "\nCall script as 'python main.py <backend> <num_features> <layers> <gamma> "
    "<distance> <n_illicit> <n_licit> <data_seed> <data_file>'."
    "\nThe value of <backend> must be GPU, CPU or TPU."
)

# The truncation error assigned to the simulation (main.py:73).
TRUNCATION_ERROR = 1e-16

# Memo for QMLTPU_CHI=auto probes (train + test Gram share one probe).
_auto_chi_cache: dict = {}


@dataclasses.dataclass
class RunParams:
    backend: str
    num_features: int
    reps: int
    gamma: float
    nearest_neighbors: int
    n_illicit: int
    n_licit: int
    data_seed: int
    data_file: str

    @property
    def entanglement_map(self):
        return entanglement_graph(nq=self.num_features, nn=self.nearest_neighbors)


def init_platform() -> None:
    """Apply QMLTPU_PLATFORM before the first JAX backend use."""
    platform = os.environ.get("QMLTPU_PLATFORM")
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass


def parse_argv(argv=None) -> RunParams:
    init_platform()
    argv = sys.argv if argv is None else argv
    if len(argv) <= 9:
        raise ValueError(INPUT_ERROR_MSG)
    backend = str(argv[1])
    if backend not in ("GPU", "CPU", "TPU"):
        raise ValueError(INPUT_ERROR_MSG)
    return RunParams(
        backend=backend,
        num_features=int(argv[2]),
        reps=int(argv[3]),
        gamma=float(argv[4]),
        nearest_neighbors=int(argv[5]),
        n_illicit=int(argv[6]),
        n_licit=int(argv[7]),
        data_seed=int(argv[8]),
        data_file=str(argv[9]),
    )


def default_chi(num_features: int) -> int:
    return int(min(2 ** (num_features // 2), 64))


def sim_config(params: RunParams, sample_features=None) -> SimConfig:
    """Build the engine config. ``QMLTPU_CHI=auto`` probes the bond cap with
    utils/autotune.choose_chi on a small sample of the (scaled) training
    features, targeting ``QMLTPU_FID_TARGET`` (default 1-1e-9, the
    fidelity regime where truncation is below the 1e-6 kernel parity
    budget). The chosen chi is recorded in the profiling JSON ("chi" key)."""
    chi_env = os.environ.get("QMLTPU_CHI")
    criterion = "cutoff" if params.backend == "CPU" else "fidelity"
    base = SimConfig(
        chi=1,
        truncation_error=TRUNCATION_ERROR,
        criterion=criterion,
        precision=os.environ.get("QMLTPU_PRECISION", "f32"),
        svd_method=os.environ.get("QMLTPU_SVD", "subspace"),
        subspace_iters=int(os.environ.get("QMLTPU_SUBSPACE_ITERS", 2)),
        oversample=int(os.environ.get("QMLTPU_OVERSAMPLE", 0)),
        power_precision=os.environ.get("QMLTPU_POWER_PRECISION", "inherit"),
        tile_precision=os.environ.get("QMLTPU_TILE_PRECISION", "inherit"),
        fused_split=os.environ.get("QMLTPU_FUSED_SPLIT", "1") != "0",
        fused_gate=os.environ.get("QMLTPU_FUSED_GATE", "0") != "0",
        mgs_pair=os.environ.get("QMLTPU_MGS_PAIR", "0") != "0",
        brick_struct_caps=os.environ.get("QMLTPU_BRICK_CAPS", "0") != "0",
        tile_block=int(os.environ.get("QMLTPU_TILE_BLOCK", 2)),
    )
    if chi_env == "auto":
        if sample_features is None:
            raise ValueError("QMLTPU_CHI=auto needs sample features (call via build()).")
        from qml_cutensornet_tpu.utils.autotune import choose_chi

        target = float(os.environ.get("QMLTPU_FID_TARGET", 1.0 - 1e-9))
        sample = np.asarray(sample_features)[: int(os.environ.get("QMLTPU_AUTO_SAMPLE", 8))]
        memo_key = (dataclasses.astuple(params), base, target, sample.shape)
        chi = _auto_chi_cache.get(memo_key)
        if chi is None:
            chi = choose_chi(
                make_ansatz(params).schedule,
                sample,
                dataclasses.replace(base, chi=8),
                fidelity_target=target,
                chi_max=int(os.environ.get("QMLTPU_AUTO_CHI_MAX", 256)),
                verbose=True,
            )
            _auto_chi_cache[memo_key] = chi
            print(f"QMLTPU_CHI=auto selected chi={chi}")
    elif chi_env is not None:
        chi = int(chi_env)
    else:
        chi = default_chi(params.num_features)
    # Subspace oversampling default: ON (p=16) once chi >= 128, where the
    # on-chip A/B measured it FREE (runs/perf_ab/bench_over16_chi128: same
    # 7.40 s wall as without, parity 5.8e-8 -> 1.1e-8 — the split is
    # dispatch-bound there so the extra columns ride along). At chi 64 the
    # same knob costs ~14% wall (bench_over16), so it stays opt-in below
    # 128. QMLTPU_OVERSAMPLE always wins when set.
    over_env = os.environ.get("QMLTPU_OVERSAMPLE")
    oversample = int(over_env) if over_env is not None else (16 if chi >= 128 else 0)
    # Tile site-blocking default gates on chi: k=2's pre-combined blocks
    # double the live tile-input HBM and its step temps scale with 2^k
    # (models/simulate.tile_overlaps_sq NOTE), and only chi <= 128 arms
    # have been measured on chip; above that the default stays per-site
    # until an A/B banks a win. QMLTPU_TILE_BLOCK always wins when set.
    tb_env = os.environ.get("QMLTPU_TILE_BLOCK")
    tile_block = int(tb_env) if tb_env is not None else (2 if chi <= 128 else 1)
    return dataclasses.replace(
        base, chi=chi, oversample=oversample, tile_block=tile_block
    )


def engine_kwargs() -> dict:
    kwargs = dict(
        sim_batch=int(os.environ.get("QMLTPU_SIM_BATCH", 32)),
        tile=int(os.environ.get("QMLTPU_TILE", 32)),
        checkpoint=os.environ.get("QMLTPU_CHECKPOINT", "0") == "1",
    )
    mesh_size = os.environ.get("QMLTPU_MESH")
    import jax

    n_dev = len(jax.devices())
    if mesh_size is None and n_dev > 1:
        mesh_size = n_dev
    if mesh_size is not None and int(mesh_size) > 1:
        from qml_cutensornet_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(int(mesh_size))
    return kwargs


def make_ansatz(params: RunParams) -> KernelStateAnsatz:
    return KernelStateAnsatz(
        num_qubits=params.num_features,
        reps=params.reps,
        gamma=params.gamma,
        entanglement_map=params.entanglement_map,
        hadamard_init=True,
        routing=os.environ.get("QMLTPU_ROUTING", "tracked"),
    )


def echo_params(params: RunParams, n_procs: int) -> None:
    """Parameter echo in the reference's format (main.py:95-113)."""
    print("\nUsing the following parameters:")
    print("")
    print(f"\tn_procs: {n_procs}")
    print(f"\tbackend: {params.backend}")
    print("")
    print(f"\tnum_features: {params.num_features}")
    print(f"\treps: {params.reps}")
    print(f"\tgamma: {params.gamma}")
    print(f"\tinteraction distance: {params.nearest_neighbors}")
    print(f"\tentanglement_map: {params.entanglement_map}")
    print("")
    print(f"\tn_illicit: {params.n_illicit}")
    print(f"\tn_licit: {params.n_licit}")
    print("")
    print(f"\tdata_seed: {params.data_seed}")
    print(f"\tdata_file: {params.data_file}")
    print("")
    sys.stdout.flush()


def prepare(params: RunParams):
    return load_and_prepare(
        "datasets/" + params.data_file,
        params.num_features,
        params.n_illicit,
        params.n_licit,
        params.data_seed,
    )


def info_names(params: RunParams):
    args = (
        params.num_features,
        params.reps,
        params.gamma,
        params.nearest_neighbors,
        params.n_illicit,
        params.data_seed,
        params.data_file,
    )
    return run_info("train", *args), run_info("test", *args)


def build(params: RunParams, ansatz, X, Y=None, info_file=None):
    pathlib.Path("kernels").mkdir(exist_ok=True)
    pathlib.Path("data").mkdir(exist_ok=True)
    return build_kernel_matrix(
        ansatz,
        X=np.asarray(X),
        Y=None if Y is None else np.asarray(Y),
        info_file=info_file,
        truncation_error=TRUNCATION_ERROR,
        cfg=sim_config(params, sample_features=X),
        loglevel=20,
        **engine_kwargs(),
    )
