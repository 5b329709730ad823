"""Memory-aware tile clamp (models/gram._auto_tile).

The tile scan's carry ``M [tile, tile, chi, chi]`` plus XLA's lane-padded
remat copies OOMed a 16 GB v5e at tile=32 / chi=512 next to the resident
states (the crossover CPU-criterion d10 failure); the clamp must shrink
the tile there while leaving every measured-good small-chi config alone.
"""

from qml_cutensornet_tpu.models.gram import _auto_tile


def test_large_chi_clamps():
    # The observed-OOM config: nq=100, chi bucket 512, requested tile 32.
    assert _auto_tile(32, 512, 100, 5, 5) == 8


def test_small_chi_untouched():
    # The north-star bench configs (must not change measured defaults).
    assert _auto_tile(100, 64, 32, 100, 100) == 100
    assert _auto_tile(100, 128, 32, 100, 100) == 100
    assert _auto_tile(50, 256, 32, 100, 100) == 50
    # Crossover d6/d8 chi192 CLI runs (worked on chip at tile 32).
    assert _auto_tile(32, 192, 100, 5, 5) == 32


def test_monotone_and_floor():
    prev = None
    for chi in (64, 128, 256, 384, 512, 768, 1024):
        t = _auto_tile(64, chi, 100, 64, 64)
        # Floor 2 since round 5: at chi=1024 nq=100 the two tile input
        # blocks are 13.4 GB/side at tile=8 — the old floor of 8 made the
        # chi1024 tile program ask 33 GB and die at compile.
        assert t >= 2
        if prev is not None:
            assert t <= prev  # larger chi never grows the tile
        prev = t
    assert _auto_tile(64, 1024, 100, 64, 64) == 2


def test_env_budget(monkeypatch):
    monkeypatch.setenv("QMLTPU_TILE_BYTES", "1e12")
    assert _auto_tile(32, 512, 100, 5, 5) == 32
    monkeypatch.delenv("QMLTPU_TILE_BYTES")
