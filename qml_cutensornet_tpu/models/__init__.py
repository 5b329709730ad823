"""Circuit ansatz, gate scheduling, batched simulation, Gram build, SVM."""
