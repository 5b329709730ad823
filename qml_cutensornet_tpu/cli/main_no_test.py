"""Train-Gram-only entry point (reference ``main_no_test.py``): identical to
``main`` through the train-Gram build and ``kernels/{train_info}.npy`` save,
then exits — no test kernel, no SVC. Used by all timing benchmarks."""

from __future__ import annotations

import time

import numpy as np

from qml_cutensornet_tpu.cli import _pipeline as pipe


def main(argv=None) -> None:
    params = pipe.parse_argv(argv)

    import jax

    pipe.echo_params(params, n_procs=len(jax.devices()))

    x_train, y_train, x_test, y_test = pipe.prepare(params)
    ansatz = pipe.make_ansatz(params)
    train_info, _ = pipe.info_names(params)

    time0 = time.perf_counter()
    kernel_train = pipe.build(params, ansatz, X=x_train, info_file=train_info)
    time1 = time.perf_counter()
    print(f"Built kernel matrix on training set. Time: {round(time1 - time0, 2)} seconds\n")
    np.save(f"kernels/{train_info}.npy", kernel_train)


if __name__ == "__main__":
    main()
