"""Simulation configuration.

The reference exposes two truncation knobs for its two backends:

- GPU (pytket-cutensornet): ``Config(truncation_fidelity=1-eps)`` — keep the
  smallest leading set of singular values whose squared weight is at least a
  ``1-eps`` fraction of the total (gpu_backend/kernel_state_ansatz.py:141-144).
- CPU (ITensors.jl): ``apply(gates, mps; cutoff=eps)`` — discard the smallest
  trailing set of squared singular values whose relative weight is at most
  ``eps`` (KernelPkg/src/KernelPkg.jl:68).

Both rules coincide: discard the largest trailing set of squared singular
values summing to at most ``eps`` of the total. We implement that rule once
and accept either criterion name, plus a hard bond-dimension cap ``chi``
(needed on TPU where shapes must be static) and cuTensorNet's
``value_of_zero`` absolute floor (main_track_mem.py:168-172).

All arithmetic is REAL (re, im)-pair arithmetic (see ops/cpx.py): the TPU
backend has no complex dtype support, and the explicit lowering is also the
MXU-friendly layout. ``precision`` selects the underlying real dtype.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_REAL_DTYPES = {"f32": jnp.float32, "f64": jnp.float64}


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static configuration for the MPS engine.

    Attributes:
        chi: hard cap on the virtual bond dimension. All MPS tensors are
            padded to ``[chi, 2, chi]`` so every shape in the compiled
            program is static. Truncated entries are exactly zeroed so
            padding never leaks into contractions.
        truncation_error: relative discarded squared-singular-value weight
            allowed per two-site gate (the reference's ``eps``; both its
            backends use 1e-16, main.py:73).
        criterion: "fidelity" (cuTensorNet convention) or "cutoff"
            (ITensors convention). Mathematically identical here; kept for
            API parity with the two reference backends.
        value_of_zero: absolute floor below which singular values are
            treated as exact zeros (cuTensorNet ``value_of_zero``).
        precision: "f32" or "f64" — the real dtype underlying the (re, im)
            pair representation. "f64" requires ``jax_enable_x64`` and is
            the parity-test mode; "f32" is the TPU production mode.
        svd_method: "svd" decomposes the real embedding [[Re,-Im],[Im,Re]]
            of theta with ``jnp.linalg.svd`` (accurate; every real singular
            triple lifts exactly to a complex one). "eigh" eigendecomposes
            the real embedding of theta^H theta (matmul-heavy QDWH-eig on
            TPU; squares the condition number — fine for truncation).
        renormalize: if True, rescale the state to unit norm after each
            truncation. The reference backends leave the state unnormalized
            and track the accumulated fidelity instead; we do the same by
            default.
    """

    chi: int = 64
    truncation_error: float = 1e-16
    criterion: str = "fidelity"
    value_of_zero: float = 0.0
    precision: str = "f32"
    svd_method: str = "svd"
    renormalize: bool = False
    # Power iterations for svd_method="subspace" (matmul-only truncated
    # factorization; see ops/svd.py). 2 suffices for exact-rank regimes;
    # raise for aggressive truncation with slowly decaying spectra.
    subspace_iters: int = 2
    # Subspace OVERSAMPLING (randomized-SVD style, svd_method="subspace"
    # only): iterate with ``keep + oversample`` basis columns and select the
    # top-``keep`` by captured weight before masking. A wider iterate
    # captures weak directions near the truncation cut that a keep-width
    # subspace can rotate away from, sharpening fidelity at ~(1 +
    # oversample/keep) extra cost in the factorization stage. keep+oversample
    # multiples of 16 keep the fused Pallas kernel eligible (PANEL=16). Default 0
    # (off) pending the on-chip fidelity-vs-time A/B (runs/perf_ab).
    oversample: int = 0
    # MXU accumulation precision for f32 data. TPUs default to bfloat16
    # matmul passes for f32 inputs, which injects ~1e-2 relative error into
    # deep circuits — far outside the 1e-6 parity budget. "highest" forces
    # full f32 accumulation (6-pass bf16; JAX's "float32" is an ALIAS of
    # it, not a cheaper mode); "high" is the 3-pass variant; "bfloat16"
    # is fastest and only fit for exploratory runs.
    matmul_precision: str = "highest"
    # Precision for the subspace-iteration POWER multiplies only
    # (theta^H v and theta w in ops/svd._split_subspace). The power basis
    # is re-orthonormalized at full precision and the factors (r, s2) are
    # recomputed at full precision from q, so imprecision here perturbs
    # only WHICH subspace is kept — a second-order truncation effect,
    # bounded by the spectrum's flatness at the cut. "high" (3-pass bf16
    # on TPU, ~2x cheaper than the 6-pass "highest") is the candidate for
    # the large-chi regime where these multiplies dominate; "inherit"
    # (default) keeps the ambient cfg.matmul_precision.
    power_precision: str = "inherit"
    # Precision for the Gram-tile transfer-matrix contractions ONLY
    # (models/simulate.tile_overlaps_sq): tile entries are plain inner
    # products, no orthogonality at stake, and the kernel NORMALIZATION
    # divides out first-order norm errors — so "high" (3-pass) is the
    # measured-2x candidate for the dot-dominated large-N regime. The
    # parity impact must be measured before changing the default.
    tile_precision: str = "inherit"
    # Sites contracted per transfer-matrix scan step in the Gram-tile
    # contraction (models/simulate.tile_overlaps_sq). The tile scan is
    # latency/bandwidth bound (the [By,Bx,chi,chi] carry round-trips HBM
    # every step, ~80 MB at the bench config); pre-combining k adjacent
    # site tensors per STATE into [chi, 2^k, chi] blocks (cheap — per
    # state, not per pair) cuts the scan to n/k steps with larger matmul
    # operands. Scan FLOPs and combined-tensor SIZE both scale as
    # 2^k/(2k) relative to k=1 — k=2 is scan-traffic- and FLOP-neutral —
    # but PEAK live memory is not neutral: the combined blocks coexist
    # with the un-donated inputs (~+100% tile-input HBM at k=2) and the
    # per-step matmul temps grow with 2^k, so tile sizing must account
    # for k (bench.py does). k=4 doubles scan FLOPs for 4x fewer steps —
    # only worth it if latency still dominates after k=2. Applies to the
    # single-chip tile engine (models/gram.py) only; the multi-chip ring
    # (parallel/gram.py) scans per-site regardless — its per-step grain
    # is the ring iteration, so the lever has less to cut there.
    # On-chip A/B (runs/perf_ab/bench_tileblk2):
    # k=2 took the chi64 bench 2.565 -> 2.470 s (tiles 0.64 -> 0.54) at
    # parity 5.8e-8, so the pipeline/bench env default is 2
    # (QMLTPU_TILE_BLOCK); the dataclass default stays 1 like the other
    # measured knobs (fused_split) so direct library callers opt in.
    tile_block: int = 1
    # Fused Pallas kernels (ops/pallas_split.py subspace-split chain and
    # ops/pallas_qr.py Q+R canonical-move launch). Carried in the config —
    # a STATIC jit argument — rather than read from the environment at
    # trace time, because nested-jit jaxpr caches (ops/svd.truncated_svd)
    # are keyed on static args and would silently reuse stale env-read
    # routing across in-process A/B flips. fused_interpret forces Pallas
    # interpret mode so CPU CI can pin the real TPU routing end to end.
    fused_split: bool = False
    fused_interpret: bool = False
    # Block-2 within-panel BCGS2 in every Pallas orthonormalization
    # (ops/pallas_qr.orth_rows_body pair variant): projects column pairs
    # against the panel prefix in ONE dot_general (MXU) then MGS2's the
    # second column against the first — halves the serial per-column chain
    # that dominates per-op latency at chi >= 128. Static config for the
    # same jaxpr-cache reason as fused_split (the QMLTPU_MGS_PAIR env knob
    # is only a construction-time default wired in bench.py/cli/_pipeline,
    # plus a call-time fallback for direct ops-module users). Default off
    # pending the on-chip A/B decision rule (runs/perf_ab).
    mgs_pair: bool = False
    # Phase 2 of the fused split (ops/pallas_split._make_gate_split_kernel):
    # ALSO build theta and apply the two-site gate inside the kernel, so
    # theta never round-trips HBM and two XLA matmul dispatches per gate op
    # disappear (~3.5 theta-sized HBM transfers saved per op). Requires
    # fused_split; default off pending the on-chip A/B (runs/perf_ab).
    fused_gate: bool = False
    # Per-pair STRUCTURAL bond caps in the brick engine (ops/vidal.py): a
    # bond j real-site bipartition (l left, r right) admits Schmidt rank at
    # most min(2^l, 2^r), so edge pairs can run their theta contractions and
    # factorization at sliced [cap, 2, cap] shapes — EXACT under the
    # zero-padding invariant (kept rank never exceeds the structural bound;
    # entries beyond it are exact zeros), saving the edge-pair fraction of
    # the cubic work (~14% of pairs at nq=100 chi=128, more at chi=512
    # where 9 bonds/side sit under cap — docs/ROADMAP.md). Static config
    # (not env-at-trace) for the same jaxpr-cache reason as fused_split.
    # Default off until the on-chip A/B (runs/perf_ab) clears the decision
    # rule; whole-chain engine only (the site-sharded engine needs uniform
    # per-shard shapes).
    brick_struct_caps: bool = False

    def __post_init__(self):
        if self.criterion not in ("fidelity", "cutoff"):
            raise ValueError(f"Unknown truncation criterion: {self.criterion}")
        if self.svd_method not in ("svd", "eigh", "subspace"):
            raise ValueError(f"Unknown svd_method: {self.svd_method}")
        if self.precision not in _REAL_DTYPES:
            raise ValueError(f"Unknown precision: {self.precision}")
        _prec = ("highest", "float32", "high", "bfloat16_3x", "tensorfloat32",
                 "bfloat16", "default")
        if self.matmul_precision not in _prec:
            raise ValueError(f"Unknown matmul_precision: {self.matmul_precision}")
        if self.power_precision not in ("inherit",) + _prec:
            raise ValueError(f"Unknown power_precision: {self.power_precision}")
        if self.tile_precision not in ("inherit",) + _prec:
            raise ValueError(f"Unknown tile_precision: {self.tile_precision}")
        if self.chi < 1:
            raise ValueError("chi must be >= 1")
        if self.oversample < 0:
            raise ValueError("oversample must be >= 0")
        if not 1 <= self.tile_block <= 8:
            raise ValueError("tile_block must be in 1..8")

    @property
    def real_dtype(self):
        return _REAL_DTYPES[self.precision]

    @property
    def resolved_tile_precision(self) -> str:
        return (self.matmul_precision if self.tile_precision == "inherit"
                else self.tile_precision)
