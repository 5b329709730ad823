"""Automatic bond-dimension selection.

The reference has no equivalent: its engines grow chi dynamically and only
memory limits apply. A static-shape TPU engine needs chi fixed up front, so
this utility probes a sample of datapoints at doubling chi values until the
accumulated truncation fidelity clears a target — the dynamic-chi behavior
recovered as a cheap pre-pass (each probe is a compiled batched run over a
handful of circuits).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from qml_cutensornet_tpu.config import SimConfig


def choose_chi(
    schedule,
    sample_features: np.ndarray,
    cfg: SimConfig,
    fidelity_target: float = 1.0 - 1e-6,
    chi_start: int = 8,
    chi_max: int = 256,
    verbose: bool = False,
) -> int:
    """Smallest chi in {chi_start, 2*chi_start, ...} <= chi_max whose MIN
    sample fidelity reaches ``fidelity_target`` (or chi_max if none does).
    Also stops early when no state saturates the cap (chi was not the
    binding constraint)."""
    import jax

    from qml_cutensornet_tpu.models.simulate import make_chunked_simulator

    x = np.asarray(sample_features, dtype=np.float64)
    chi = chi_start
    while True:
        probe_cfg = dataclasses.replace(cfg, chi=int(chi))
        sim = make_chunked_simulator(schedule, probe_cfg)
        out = jax.block_until_ready(sim(x))
        min_fid = float(np.min(np.asarray(out.fidelity)))
        max_bond = int(np.max(np.asarray(out.bond_dims)))
        if verbose:
            print(f"choose_chi: chi={chi} min_fidelity={min_fid:.3e} max_bond={max_bond}")
        if min_fid >= fidelity_target or max_bond < chi or 2 * chi > chi_max:
            return int(chi)
        chi *= 2
