"""Serving daemon: hold the compiled dynamic programs in one long-lived
process and serve them over HTTP.

    # LUT form (bit-parity deploy), bucketed so heterogeneous client
    # image shapes share one program per shape bucket
    python -m lerf_tpu.cli.serve -e models/lerf-g --port 8008 --bucket 64

    # network form
    python -m lerf_tpu.cli.serve -e models/lerf-g --form net --twoStage \
        --outC 3 --port 8008

    curl -X POST --data-binary @in.png \
        'http://127.0.0.1:8008/v1/upscale?scale=2.5' > out.png
    curl -X POST --data-binary @in.png \
        'http://127.0.0.1:8008/v1/warp?matrix=1,0,0,0,1,0,0,0,1&outSize=512x512' \
        > warped.png

The reference has no serving entry point (its deploy surface is the batch
eval drivers); endpoints + concurrency model documented in
:mod:`lerf_tpu.serve.httpd`.
"""
from __future__ import annotations

import dataclasses
import sys

from ..config import parse_config
from ..serve import make_server
from .upscale import UpscaleConfig, build_predictor

__all__ = ["ServeConfig", "main"]


@dataclasses.dataclass
class ServeConfig(UpscaleConfig):
    host: str = "127.0.0.1"
    port: int = 8008
    geometry: str = "host"       # host | device (warp rings in-program)


def main(argv=None, *, serve_forever: bool = True):
    cfg = parse_config(ServeConfig, argv)
    pred = build_predictor(cfg)
    server = make_server(pred, host=cfg.host, port=cfg.port,
                         granularity=cfg.bucket, geometry=cfg.geometry)
    print(f"lerf-tpu {cfg.form} daemon on "
          f"http://{cfg.host}:{server.server_address[1]} "
          f"(bucket={cfg.bucket}, geometry={cfg.geometry})", flush=True)
    if serve_forever:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    return server


if __name__ == "__main__":
    main(sys.argv[1:])
