"""Build + validate a dataset's index files (reference CLI: check_dataset.py).

The reference fans the per-sample validity check out over Ray CPU workers
(datasets.py:17-35); here host threads decode frames and the actual pipeline
check runs *batched on the accelerator* via the same jitted preprocessing
program used in training.
"""

import argparse

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="MSRA",
                        help="choose from MSRA, ICVL, NYU, HAND17")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--check_batch", type=int, default=64)
    args = parser.parse_args()

    from pixelwiseregression_tpu.cli.common import apply_platform_override
    from pixelwiseregression_tpu.utils.compile_cache import enable_compile_cache

    apply_platform_override()  # PWR_PLATFORM=cpu must work tunnel-independent
    enable_compile_cache()

    import jax
    from pixelwiseregression_tpu.data.loader import stack_records
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import get_source, SPECS

    spec = SPECS[args.dataset]
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
    )

    check_jit = jax.jit(lambda b: preprocess_batch(b, jax.random.PRNGKey(0), cfg)["valid"])

    def device_check(source, records):
        flags = []
        bs = args.check_batch
        for i in range(0, len(records), bs):
            chunk = records[i : i + bs]
            batch, count = stack_records(chunk, pad_to=bs)
            flags.extend(np.asarray(check_jit(batch))[:count].tolist())
        return flags

    dataset = get_source(args.dataset, path=args.data_path, check_fn=device_check)
    print("Data ready!")
