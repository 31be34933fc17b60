"""make_benchmark CLI: generates the reference rrLR directory layout, and
the generated data round-trips through the SR evaluation harness."""
import os

import numpy as np
from PIL import Image

from lerf_tpu.cli.make_benchmark import main as make_benchmark
from lerf_tpu.data.benchmarks import SRBenchmark


def test_generates_rr_layout(tmp_path):
    hr_dir = tmp_path / "MySet" / "HR"
    os.makedirs(hr_dir)
    rng = np.random.RandomState(0)
    for name in ["a.png", "b.png"]:
        Image.fromarray(rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)) \
            .save(hr_dir / name)

    make_benchmark(["--hrDir", str(hr_dir), "--scales", "2,1.5x2.0",
                    "--platform", "cpu"])

    bench = SRBenchmark(str(tmp_path), "MySet")
    assert len(bench) == 2
    lr, hr, name = bench.pair(0, 2, 2)
    assert lr.shape == (12, 16, 3) and hr.shape == (24, 32, 3)
    lr2, _, _ = bench.pair(1, 1.5, 2.0)
    assert lr2.shape == (16, 16, 3)
