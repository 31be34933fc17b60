"""Train LeRF networks or fine-tune LUTs.

Drop-in equivalent of the reference driver (resample/train_model.py):

    # train LeRF-G (scripts.sh:2-6)
    python -m lerf_tpu.cli.train -e models/lerf-g --twoStage --outC 3

    # fine-tune transferred LUTs (scripts.sh:27-30)
    python -m lerf_tpu.cli.train -e models/lerf-g --twoStage --outC 3 \
        --lutft --lr0 1e-4 --totalIter 2000
"""
from __future__ import annotations

import sys

from ..config import TrainConfig, parse_config
from ..train.loop import train


def main(argv=None):
    cfg = parse_config(TrainConfig, argv)
    return train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
