"""Multi-chip distribution: device mesh, sharded simulation, ring Gram build."""
